"""Dedup + similarity kernels and ops (functions/dedup.py, ops_dedup.py):
hash determinism, minhash invariants, simhash banding completeness, planted
near-dup recovery, and LSH-ANN recall vs the brute-force baseline."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from sharesci_ray.functions import dedup as dd

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_md5_int60_matches_reference():
    for s in ["", "hello", "a b c", "ünïcode"]:
        expect = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert dd.md5_int60([s])[0] == expect
        assert 0 <= expect < 2**60


def test_hash_strings_gather_equals_per_string():
    arr = pa.array(["x", "y", "x", "z", "y", "x"])
    got = dd.hash_strings(arr)
    exp = dd.md5_int60(arr.to_pylist())
    assert (got == exp).all()


def test_token_shingles_never_cross_rows():
    col = pa.array(["alpha beta gamma delta", "one two three", "tiny"])
    sh, parent = dd.token_shingles(col, k=3)
    assert sh.to_pylist() == [
        "alpha beta gamma",
        "beta gamma delta",
        "one two three",
    ]
    assert parent.tolist() == [0, 0, 1]  # row 2 (<3 tokens) emits nothing


def test_minhash_duplicate_shingles_are_noops():
    h = np.array([123456789, 123456789, 42], dtype=np.int64)
    p = np.array([0, 0, 0], dtype=np.int64)
    rows_a, sig_a = dd.minhash_signatures(h, p, 1)
    rows_b, sig_b = dd.minhash_signatures(h[1:], p[:2], 1)
    assert (sig_a == sig_b).all()


def test_minhash_identical_sets_identical_sigs():
    h = np.array([11, 22, 33, 33, 22, 11], dtype=np.int64)
    p = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    _rows, sigs = dd.minhash_signatures(h, p, 2)
    assert (sigs[0] == sigs[1]).all()


def test_simhash_deterministic_and_tf_weighted():
    a = dd.simhash60(pa.array(["hash join hash join hash join scan"]))
    b = dd.simhash60(pa.array(["hash join hash join hash join scan"]))
    assert a[0] == b[0] != 0
    assert 0 <= a[0] < 2**60


def test_simhash_chunks_pigeonhole():
    sim = np.array([0b111, 0], dtype=np.int64)  # hamming 3
    ch = dd.simhash_chunks(sim)
    assert (ch[0] == ch[1]).sum() >= 1  # at least one shared chunk


def test_hamming60():
    a = np.array([0b1011], dtype=np.int64)
    b = np.array([0b0010], dtype=np.int64)
    assert dd.hamming60(a, b)[0] == 2


def test_popcount64_matches_python():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 2**63 - 1, size=200, dtype=np.int64).astype(np.uint64)
    vals = np.concatenate([vals, np.array([0, 1, 2**64 - 1], dtype=np.uint64)])
    got = dd.popcount64(vals)
    exp = np.array([bin(int(v)).count("1") for v in vals], dtype=np.int64)
    assert (got == exp).all()


def test_band_keys_vectorized_matches_scalar_formula():
    """The numpy band-fold must equal the per-doc scalar definition
    key = (Σ_j sig_j·A^(r-1-j) mod P31) mod P31 — the same formula the
    oracle SQL computes via sum((mh*powv)%P31)%P31."""
    rng = np.random.RandomState(11)
    sigs = rng.randint(0, dd.P31, size=(7, dd.N_PERMS)).astype(np.int64)
    ids = np.arange(7, dtype=np.int64)
    t = dd.band_keys(ids, sigs)
    rows = list(
        zip(t["doc_id"].to_pylist(), t["band"].to_pylist(), t["band_key"].to_pylist())
    )
    for d, band, key in rows:
        seg = sigs[d, band * dd.BAND_ROWS : (band + 1) * dd.BAND_ROWS]
        exp = (
            sum((int(s) * int(dd.BAND_POWS[j])) % dd.P31 for j, s in enumerate(seg))
            % dd.P31
        )
        assert key == exp
    assert len(rows) == 7 * dd.N_BANDS


# ---------------------------------------------------------------------------
# ops (sf0.001 end-to-end; driver-parity vs SQL runs in test_driver_parity)
# ---------------------------------------------------------------------------

def test_planted_near_dups_recovered(ray_session):
    """The testdata generator plants near-identical documents; exact Jaccard
    must find them and minhash-LSH candidates must cover every Jaccard pair
    (at J≥0.8, 4x4 LSH misses with probability (1-0.8^4)^4 ≈ 4%/pair; the
    planted pairs are J≈0.99 → miss prob < 1e-5)."""
    from sharesci_ray.pipelines.ops_dedup import dedup_minhash_lsh, near_dup_jaccard

    jac = near_dup_jaccard(SF).to_pandas()
    assert len(jac) > 0, "no planted near-dups found at sf0.001"
    assert (jac["jaccard"] >= 0.8).all()
    assert (jac["inter"] <= jac["union_sz"]).all()

    cand = dedup_minhash_lsh(SF).to_pandas()
    cand_set = set(zip(cand["doc_a"], cand["doc_b"]))
    jac_pairs = set(zip(jac["doc_a"], jac["doc_b"]))
    missed = jac_pairs - cand_set
    assert not missed, f"LSH candidates missed high-jaccard pairs: {missed}"


def test_simhash_pairs_subset_of_low_hamming(ray_session):
    from sharesci_ray.pipelines.ops_dedup import dedup_simhash, doc_simhash

    sims = doc_simhash(SF).to_pandas().set_index("doc_id")["simhash"]
    pairs = dedup_simhash(SF).to_pandas()
    for _, r in pairs.iterrows():
        h = bin(int(sims[r["doc_a"]]) ^ int(sims[r["doc_b"]])).count("1")
        assert h == r["hamming"] <= 3
    # completeness vs brute force over all pairs
    ids = sims.index.to_numpy()
    vals = sims.to_numpy()
    brute = set()
    # canonicalize (min, max): `ids` rides to_pandas() block order, which
    # is not deterministic — the raw (ids[i], ids[i+1+j]) orientation
    # would encode that order into the expectation
    for i in range(len(ids)):
        x = vals[i] ^ vals[i + 1 :]
        for j in np.flatnonzero(np.array([bin(int(v)).count("1") for v in x]) <= 3):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            brute.add((min(a, b), max(a, b)))
    got = {(min(a, b), max(a, b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert got == brute


def test_ann_lsh_recall_vs_brute_force(ray_session):
    """verify=True computes recall@10 vs the exact brute-force truth and
    raises below the contract threshold — so merely completing IS the
    recall assertion; re-check the emitted column and output shape here."""
    from sharesci_ray.pipelines.ops_dedup import _LSH_MIN_RECALL, ann_lsh_topk

    approx = ann_lsh_topk(SF, verify=True).to_pandas()
    assert float(approx["recall10"].mean()) >= _LSH_MIN_RECALL
    # approx output is well-formed top-k
    assert (approx.groupby("query_id")["rank"].min() == 1).all()
    # the default (no-verify) path returns the same ranking without the
    # recall column and without paying the brute-force truth cost
    fast = ann_lsh_topk(SF).to_pandas()
    a = fast.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = approx[["query_id", "rank", "neighbor_id"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    assert a.equals(b)


def test_near_dup_embedding_threshold(ray_session):
    from sharesci_ray.pipelines.ops_dedup import near_dup_embedding

    pairs = near_dup_embedding(SF).to_pandas()
    assert (pairs["vec_a"] < pairs["vec_b"]).all()


def test_connected_components_long_chain_pointer_doubling(ray_session):
    """VERDICT r3 #6: a planted 200-edge chain (diameter 200) — which the
    pre-doubling 64-round propagation bound would have REJECTED (loud
    RuntimeError) — converges in O(log diameter) pointer-doubling rounds
    and labels every node with the chain minimum."""
    import ray.data

    from sharesci_ray.pipelines.ops_dedup import _connected_components

    n = 200
    pairs = pa.table(
        {
            "doc_a": pa.array(list(range(n)), pa.int64()),
            "doc_b": pa.array(list(range(1, n + 1)), pa.int64()),
        }
    )
    labels = (
        _connected_components(ray.data.from_arrow(pairs), max_rounds=12)
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert len(labels) == n + 1
    assert (labels["label"] == 0).all()


def test_near_dup_embedding_default_equals_exact_scan(ray_session):
    """VERDICT r3 #4: the default LSH-candidate + exact-verify plan returns
    the SAME pairs as the O(B²) all-pairs reference kernel on sf0.01
    (measured LSH recall 59/59 there) — the scale-safe plan loses nothing
    on the testdata."""
    from sharesci_ray.pipelines.ops_dedup import near_dup_embedding

    sf = "/root/testdata/sf0.01"
    default = (
        near_dup_embedding(sf)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    exact = (
        near_dup_embedding(sf, exact_scan=True)
        .to_pandas()
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    assert len(default) > 0
    assert default.astype("int64").equals(exact.astype("int64"))


def test_near_dup_embedding_verify_first_equals_lsh_first(ray_session):
    """sf1 stress finding: the occupancy gate's verify-first plan (blocked
    cosine scan + candidate post-filter) must return the IDENTICAL pair set
    as the LSH-first candidate-materialization plan — the two are the same
    set algebra ({cos ≥ τ} ∩ {Hamming ≤ r in any table}) evaluated in
    opposite order.  Forcing the gate low exercises the flip on sf0.01,
    where the default plan is still LSH-first."""
    import sharesci_ray.pipelines.ops_dedup as od

    sf = "/root/testdata/sf0.01"
    lsh_first = od.near_dup_embedding(sf).to_pandas()
    old = od._CAND_PAIR_CUTOFF
    od._CAND_PAIR_CUTOFF = 0
    try:
        # n²/8 term: sf0.01 est_pairs (~40k at 200 vectors) clears it, so
        # cutoff=0 forces the verify-first branch
        verify_first = od.near_dup_embedding(sf).to_pandas()
    finally:
        od._CAND_PAIR_CUTOFF = old
    a = set(map(tuple, lsh_first[["vec_a", "vec_b"]].to_numpy()))
    b = set(map(tuple, verify_first[["vec_a", "vec_b"]].to_numpy()))
    assert len(a) > 0
    assert a == b


def test_drop_empty_blocks_heals_sparse_shuffles(ray_session):
    """Ray 2.49 stores 0-row blocks schema-less; drop_empty_blocks must
    remove them (keeping values) and type a fully-empty dataset."""
    import ray.data

    from sharesci_ray.pipelines.util import drop_empty_blocks

    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    ds = ray.data.from_items([{"k": i % 3, "v": i} for i in range(30)])

    def emit(g: pa.Table) -> pa.Table:
        if int(g["k"][0].as_py()) == 0:
            return schema.empty_table()
        return pa.table({"doc_a": g["v"], "doc_b": g["v"]}, schema=schema)

    out = drop_empty_blocks(
        ds.groupby("k").map_groups(emit, batch_format="pyarrow"), schema
    )
    assert out.count() == 20
    assert set(out.schema().names) == {"doc_a", "doc_b"}

    def never(g: pa.Table) -> pa.Table:
        return schema.empty_table()

    empty = drop_empty_blocks(
        ds.groupby("k").map_groups(never, batch_format="pyarrow"), schema
    )
    assert empty.count() == 0
    assert set(empty.schema().names) == {"doc_a", "doc_b"}


# ---------------------------------------------------------------------------
# df-cap pre-pass: a planted hot shingle must not blow up pair emission, and
# the engine must stay value-identical to the capped oracle SQL
# ---------------------------------------------------------------------------

def _hot_shingle_corpus(tmp_path):
    """60 docs all sharing one stopword-like shingle; two planted near-dups."""
    import pyarrow.parquet as pq

    n = 60
    texts = []
    for i in range(n):
        # common hot shingle 'include stdio header' in EVERY doc + unique tail
        uniq = " ".join(f"uniq{i}tok{j} filler{i * 7 + j}" for j in range(6))
        texts.append(f"include stdio header {uniq}")
    # planted near-dup pair: docs n and n+1 share almost all shingles
    base = " ".join(f"shared{j} common{j} token{j}" for j in range(12))
    texts.append(base + " tailone onlyhere")
    texts.append(base + " tailtwo otherend")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "hotshingle"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_hot_shingle_df_cap_jaccard(ray_session, tmp_path):
    """With cap=8 the hot shingle (df=60) is excluded from the universe on
    both sides; the planted near-dup pair must still be found, and engine ≡
    capped DuckDB oracle value-for-value."""
    import duckdb

    from sharesci_ray.pipelines.ops_dedup import _jaccard_sql, near_dup_jaccard

    sf = _hot_shingle_corpus(tmp_path)
    cap = 8
    eng = (
        near_dup_jaccard(sf, cap=cap)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = (
        con.execute(_jaccard_sql(cap=cap))
        .df()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(eng) == len(ora) > 0
    assert set(zip(eng["doc_a"], eng["doc_b"])) == set(zip(ora["doc_a"], ora["doc_b"]))
    assert (eng["inter"].to_numpy() == ora["inter"].to_numpy()).all()
    assert {(60, 61)} <= set(zip(eng["doc_a"], eng["doc_b"]))


def test_hot_bucket_cap_minhash(ray_session, tmp_path):
    """A degenerate band bucket (many docs with identical signatures) larger
    than the cap is dropped by _emit_pairs AND by the oracle SQL — parity
    holds with the cap binding."""
    import duckdb
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_dedup import _minhash_sql, dedup_minhash_lsh

    # 20 IDENTICAL docs (one giant LSH bucket in every band) + 2 near-dups
    texts = ["exact duplicate content shared by everyone here now"] * 20
    base = " ".join(f"planted{j} pair{j} token{j}" for j in range(12))
    texts += [base + " endone", base + " endtwo"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "hotbucket"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    sf = str(d)

    cap = 8
    eng = dedup_minhash_lsh(sf, cap=cap).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(_minhash_sql(cap=cap)).df()
    eng_pairs = set(zip(eng["doc_a"], eng["doc_b"]))
    ora_pairs = set(zip(ora["doc_a"], ora["doc_b"]))
    assert eng_pairs == ora_pairs
    # the 20-doc duplicate cluster (190 pairs) was dropped by the cap...
    assert not any(a < 20 and b < 20 for a, b in eng_pairs)
    # ...but the small planted pair survives
    assert (20, 21) in eng_pairs


def test_ivf_assignment_ties_and_probe():
    """_ivf_assign ties resolve to the smallest centroid id (the SQL twin's
    ORDER BY d DESC, cid), and assignment is the exact argmax of the
    integer dots on random lattices."""
    import numpy as np

    from sharesci_ray.pipelines.ops_dedup import _ivf_assign

    rng = np.random.default_rng(3)
    quant = rng.integers(-(1 << 20), 1 << 20, size=(64, 16)).astype(np.int64)
    cent = rng.integers(-(1 << 20), 1 << 20, size=(5, 16)).astype(np.int64)
    cent[3] = cent[1]  # duplicate centroid → guaranteed ties
    got = _ivf_assign(quant, cent)
    dots = quant @ cent.T
    for i in range(quant.shape[0]):
        best = dots[i].max()
        assert dots[i][got[i]] == best
        assert got[i] == min(np.flatnonzero(dots[i] == best))  # smallest cid on tie


def test_ivf_recall_gate(ray_session):
    """verify=True raises below the recall floor and annotates recall10
    when above it (sf0.001: same 500-row embeddings table)."""
    import numpy as np

    from sharesci_ray.pipelines.ops_dedup import _IVF_MIN_RECALL, ann_ivf_topk

    t = ann_ivf_topk("/root/testdata/sf0.001", verify=True)  # raises below gate
    rec = t["recall10"].to_numpy()
    assert ((rec >= 0.0) & (rec <= 1.0)).all()
    # one recall value per query, constant within a query's rows
    per_q = {}
    for q, r in zip(t["query_id"].to_numpy(), rec):
        per_q.setdefault(int(q), set()).add(float(r))
    assert all(len(v) == 1 for v in per_q.values())
    assert float(np.mean([v.pop() for v in per_q.values()])) >= _IVF_MIN_RECALL


def test_benchmark_contamination_planted(ray_session):
    """A corpus doc sharing a 3-token shingle with a benchmark doc is
    flagged with the exact distinct-shingle overlap count; disjoint docs
    are absent; benchmark docs themselves never appear."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_dedup import (
        _CONTAM_BENCH_DOCS,
        benchmark_contamination,
    )

    bench_text = "alpha bravo charlie delta echo foxtrot"
    rows = pa.table(
        {
            "doc_id": pa.array(
                list(range(_CONTAM_BENCH_DOCS)) + [100, 101, 102], pa.int64()
            ),
            "text": pa.array(
                [bench_text] * _CONTAM_BENCH_DOCS
                + [
                    # shares shingles: 'bravo charlie delta', 'charlie delta echo'
                    "zulu bravo charlie delta echo yankee",
                    # no 3-token shingle in common (different order)
                    "echo delta charlie bravo alpha foxtrot",
                    # exact copy of the benchmark doc → every shingle shared
                    bench_text,
                ]
            ),
        }
    )
    d = tempfile.mkdtemp(prefix="contam_")
    pq.write_table(rows, os.path.join(d, "documents.parquet"))
    got = (
        benchmark_contamination(d)
        .to_pandas()
        .set_index("doc_id")["n_shared"]
        .to_dict()
    )
    assert set(got) == {100, 102}
    assert got[100] == 2
    assert got[102] == 4  # 6 tokens → 4 shingles, all shared


def test_cross_source_pairs_subset(ray_session):
    """Cross-source pairs are exactly the near_dup_jaccard pairs whose two
    docs carry different sources — no pair invented, none dropped."""
    import duckdb as _dd

    from sharesci_ray.pipelines.ops_dedup import (
        cross_source_dup_pairs,
        near_dup_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    all_pairs = near_dup_jaccard(sf).to_pandas()
    got = cross_source_dup_pairs(sf).to_pandas()
    src = _dd.sql(
        f"SELECT doc_id, source FROM read_parquet('{sf}/documents.parquet')"
    ).df().set_index("doc_id")["source"]
    exp = {
        (a, b)
        for a, b in zip(all_pairs["doc_a"], all_pairs["doc_b"])
        if src.loc[a] != src.loc[b]
    }
    assert set(zip(got["doc_a"], got["doc_b"])) == exp
    for _, r in got.iterrows():
        assert r["source_a"] == src.loc[r["doc_a"]]
        assert r["source_b"] == src.loc[r["doc_b"]]
        assert r["source_a"] != r["source_b"]


def test_ann_filtered_subset_semantics(ray_session):
    """Every filtered neighbor passes the label predicate, and for queries
    whose unfiltered top-k already satisfies it the two ops agree."""
    import duckdb as _dd

    from sharesci_ray.pipelines.ops_dedup import (
        _FILTER_LABELS,
        ann_topk_cosine,
        ann_topk_filtered,
    )

    sf = "/root/testdata/sf0.001"
    got = ann_topk_filtered(sf).to_pandas()
    labels = _dd.sql(
        f"SELECT vec_id, label FROM read_parquet('{sf}/embeddings.parquet')"
    ).df().set_index("vec_id")["label"]
    assert got["neighbor_id"].map(labels).isin(_FILTER_LABELS).all()

    plain = ann_topk_cosine(sf).to_pandas()
    for qid, sub in plain.groupby("query_id"):
        if sub["neighbor_id"].map(labels).isin(_FILTER_LABELS).all():
            f = got[got["query_id"] == qid].sort_values("rank")
            s = sub.sort_values("rank")
            assert list(f["neighbor_id"]) == list(s["neighbor_id"]), qid


# ---------------------------------------------------------------------------
# dedup_spans: planted boilerplate span — exact coverage accounting and
# cleaned-text reconstruction, engine ≡ oracle on the planted corpus
# ---------------------------------------------------------------------------

def test_dedup_spans_planted_boilerplate(ray_session, tmp_path):
    """A 7-token license span shared by docs 0, 1 and 3 must be removed
    from each (3 duplicated 5-windows → exactly the 7 span tokens
    covered); the boundary windows leaking into each doc's unique text
    occur in one doc only, so unique tokens survive untouched."""
    import duckdb
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_dedup import _dedup_spans_sql, dedup_spans

    span = "licensed under the apache license version two"
    texts = [
        f"alphaone alphatwo alphathree {span} betaone betatwo betathree betafour",
        f"gammaone gammatwo {span} deltaone deltatwo deltathree",
        "ceeone ceetwo ceethree ceefour ceefive ceesix",
        span,
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "spans"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    sf = str(d)

    got = dedup_spans(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["n_tokens"]) == [14, 12, 6, 7]
    assert list(got["n_dup_tokens"]) == [7, 7, 0, 7]
    assert got["text_clean"][0] == (
        "alphaone alphatwo alphathree betaone betatwo betathree betafour"
    )
    assert got["text_clean"][1] == "gammaone gammatwo deltaone deltatwo deltathree"
    assert got["text_clean"][2] == texts[2]
    assert got["text_clean"][3] == ""

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    ora = con.execute(_dedup_spans_sql()).df().sort_values("doc_id").reset_index(drop=True)
    for c in ["n_tokens", "n_dup_tokens", "text_clean"]:
        assert list(got[c]) == list(ora[c]), c


# ---------------------------------------------------------------------------
# sketches: HLL accuracy vs the exact distinct, CMS overestimate guarantee
# ---------------------------------------------------------------------------

def test_hll_estimate_tracks_exact_distinct(ray_session):
    """The HLL estimate must land within 5 standard errors (5·1.04/√m ≈
    16%) of the TRUE distinct-shingle count — computed independently here
    with DuckDB — and the harmonic sum must be consistent with v_zero."""
    import duckdb

    from sharesci_ray.functions import dedup as dd
    from sharesci_ray.functions.text import SQL_TOKENIZE
    from sharesci_ray.pipelines.ops_dedup import _HLL_M, distinct_shingles_hll

    sf = "/root/testdata/sf0.001"
    row = distinct_shingles_hll(sf).to_pandas().iloc[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    toks = SQL_TOKENIZE.format(col="text")
    exact = con.execute(
        f"""WITH toks AS (SELECT doc_id, {toks} AS t FROM documents),
        sh AS (SELECT unnest({dd.sql_shingles('t')}) AS s FROM toks
               WHERE len(t) >= {dd.SHINGLE_K})
        SELECT count(DISTINCT s) FROM sh"""
    ).df().iloc[0, 0]
    rel_err = abs(row["estimate"] - exact) / exact
    assert rel_err < 5 * 1.04 / _HLL_M ** 0.5, (row["estimate"], exact)
    assert row["m"] == _HLL_M
    # each zero register contributes exactly 2^51 to the scaled sum
    assert row["s_scaled"] >= row["v_zero"] * (1 << 51)


def test_cms_never_underestimates(ray_session):
    """CMS guarantee: est ≥ true for every probe term, and with the test
    vocabulary ≪ w=2048 columns there are no collisions, so est == true —
    any slack here would mean the hash routing diverged between the
    sketch build and the probe."""
    from sharesci_ray.pipelines.ops_dedup import term_counts_cms

    df = term_counts_cms("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 24
    assert (df["est_count"] >= df["true_count"]).all()
    assert (df["true_count"] > 0).any()  # not every probe term need occur
    assert (df["est_count"] == df["true_count"]).all()


def test_source_overlap_hll_merge_law(ray_session):
    """HLL merge invariants on every pair: union ≥ max(single estimates)
    (register max can only raise the estimate... i.e. lower the harmonic
    sum), intersection = inclusion–exclusion exactly, and a source's
    self-consistency — the union of all pairs never exceeds the corpus
    estimate from distinct_shingles_hll by more than noise (it is the
    SAME register algebra, so union-of-all == corpus exactly when
    merged; spot-check one triangle inequality instead)."""
    from sharesci_ray.pipelines.ops_dedup import source_overlap_hll

    df = source_overlap_hll("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 190  # C(20, 2)
    assert (df["est_union"] >= df[["est_a", "est_b"]].max(axis=1) - 1e-9).all()
    assert np.allclose(df["est_inter"], (df["est_a"] + df["est_b"]) - df["est_union"])
    # union is subadditive: never exceeds the sum of the parts
    assert (df["est_union"] <= df["est_a"] + df["est_b"] + 1e-9).all()
