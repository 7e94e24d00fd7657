"""Embedding stage + persisted vector index (ops_embed.py): actor-model
determinism, artifact-only query path, and the end-to-end
text → vectors → persisted index → top-k chain.  Oracle parity for the two
registry ops is covered generically by test_driver_parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_hash_embedder_unit_vectors_and_determinism(ray_session):
    """Two independently constructed actors (two 'model loads') produce
    identical unit vectors; the all-zero edge (no tokens) stays zero."""
    from sharesci_ray.pipelines.ops_embed import EMBED_DIM, HashEmbedder

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["getValue index scan", "hashJoin merge", "42 7"]),
        }
    )
    a, b = HashEmbedder(), HashEmbedder()
    ta, tb = a(t), b(t)
    ma = np.array(ta["embedding"].to_pylist())
    mb = np.array(tb["embedding"].to_pylist())
    assert (ma == mb).all()
    assert ma.shape == (3, EMBED_DIM)
    norms = np.linalg.norm(ma, axis=1)
    assert np.allclose(norms[:2], 1.0)
    assert norms[2] == 0.0  # pure-int tokens are dropped by the tokenizer


def test_ivf_persisted_matches_inline_op(ray_session):
    """The persisted-artifact query returns exactly ann_ivf_topk's ranking
    (same integer assignment/probe math), and repeat calls serve from the
    cached artifact WITHOUT touching the corpus tables."""
    import sharesci_ray.pipelines.ops_embed as E
    from sharesci_ray.pipelines.ops_dedup import ann_ivf_topk

    got = (
        E.ann_ivf_persisted(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        ann_ivf_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(ref.astype("int64"))

    # artifact built and cached: poison the corpus reader — the query path
    # must not call it (reads sidecars + probed cid= partitions only)
    real = E.read_table

    def poisoned(*a, **k):
        raise AssertionError("persisted query path re-scanned the corpus")

    E.read_table = poisoned
    try:
        again = (
            E.ann_ivf_persisted(SF)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        E.read_table = real
    assert again.astype("int64").equals(ref.astype("int64"))


def test_text_to_vectors_to_index_end_to_end(ray_session, tmp_path):
    """The full chain of the brief: documents text → HashEmbedder vectors →
    build_vector_index artifact → top-k from the artifact.  Ranking is
    checked against an in-test numpy brute force restricted to the probed
    lists (the IVF contract)."""
    from sharesci_ray.pipelines.ops_embed import (
        _ivf_assign,
        _quantize,
        build_vector_index,
        document_vectors,
        query_vector_index,
    )

    vecs = document_vectors(SF).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = str(tmp_path / "vidx")
    nq, nc, k, n_probe = 5, 4, 3, 2
    meta = build_vector_index(vecs, out, n_queries=nq, n_lists=nc)
    assert meta["n_vectors"] == vecs.count()

    got = query_vector_index(out, k=k, n_probe=n_probe).to_pandas()

    # numpy truth over the same vectors, same probe rule
    rows = sorted(vecs.take_all(), key=lambda r: int(r["vec_id"]))
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([int(r["vec_id"]) for r in rows])
    cent_q = _quantize(mat[nq : nq + nc])
    assign = _ivf_assign(_quantize(mat), cent_q)
    nrm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    for q in range(nq):
        dots = _quantize(mat[q : q + 1]) @ cent_q.T
        probed = set(np.argsort(-dots[0], kind="stable")[:n_probe].tolist())
        cand = np.flatnonzero(
            np.isin(assign, list(probed)) & (ids != q)
        )
        sims = nrm[q] @ nrm[cand].T
        order = cand[np.lexsort((ids[cand], -sims))][:k]
        mine = got[got["query_id"] == q].sort_values("rank")
        assert list(mine["neighbor_id"]) == [int(ids[i]) for i in order]


def test_lsh_persisted_matches_inline_op(ray_session):
    """The persisted multi-table LSH artifact returns exactly
    ann_lsh_topk's ranking, and repeat calls serve from the cached
    artifact WITHOUT touching the corpus tables."""
    import sharesci_ray.pipelines.ops_embed as E
    from sharesci_ray.pipelines.ops_dedup import ann_lsh_topk

    got = (
        E.ann_lsh_persisted(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        ann_lsh_topk(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(ref.astype("int64"))

    real = E.read_table

    def poisoned(*a, **k):
        raise AssertionError("persisted LSH query path re-scanned the corpus")

    E.read_table = poisoned
    try:
        again = (
            E.ann_lsh_persisted(SF)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        E.read_table = real
    assert again.astype("int64").equals(ref.astype("int64"))


def test_ann_docs_topk_invariants(ray_session):
    """End-to-end text→embed→ANN op: k rows per query, no self-neighbor,
    ranks dense from 1 (oracle parity is covered by test_driver_parity)."""
    from sharesci_ray.pipelines.ops_embed import ann_docs_topk

    df = ann_docs_topk(SF).to_pandas()
    assert set(df["query_id"].unique()) == set(range(10))
    for q, g in df.groupby("query_id"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, 11))
        assert (g["neighbor_id"] != q).all()


def test_vector_scorer_actor_matches_batch_path(ray_session):
    """The VectorScorerActor serving pool returns exactly
    query_vector_index's ranking when fed the artifact's own fixture
    queries — one load per actor, lists cached across batches."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from sharesci_ray.pipelines.ops_embed import (
        _vector_index_for,
        query_vector_index,
        query_vectors,
    )

    idx = _vector_index_for(SF)
    q_t = pq.read_table(os.path.join(idx, "queries.parquet")).rename_columns(
        ["query_id", "embedding"]
    )
    got = (
        query_vectors(idx, ray.data.from_arrow(q_t), concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        query_vector_index(idx)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(ref.astype("int64"))


def test_update_vector_index_equals_fresh_build(ray_session, tmp_path):
    """Incremental append ≡ fresh build over the union: same top-k ranking
    (frozen centroids → identical assignment), meta counts updated, and a
    crashed update's orphan delta file is invisible to queries and swept
    by the next update."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_embed import (
        build_vector_index,
        query_vector_index,
        update_vector_index,
    )
    from sharesci_ray.sources.corpus import read_table

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()
    cut = n - 40
    base = emb.filter(lambda r: r["vec_id"] < cut)
    delta = emb.filter(lambda r: r["vec_id"] >= cut)

    d_inc = str(tmp_path / "inc")
    build_vector_index(base, d_inc)
    meta0 = __import__("json").load(open(os.path.join(d_inc, "meta.json")))
    meta1 = update_vector_index(d_inc, delta)
    assert meta1["n_vectors"] == meta0["n_vectors"] + 40 == n
    assert meta1["updates"] == 1

    d_full = str(tmp_path / "full")
    build_vector_index(emb, d_full)

    got = (
        query_vector_index(d_inc)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ref = (
        query_vector_index(d_full)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.astype("int64").equals(ref.astype("int64"))

    # rejected: overlapping id space
    import pytest as _pt

    with _pt.raises(ValueError, match="extend the id space"):
        update_vector_index(d_inc, delta)

    # orphan delta (crash after file write, before meta commit): plant an
    # uncommitted parquet with absurd rows — queries must not see it
    cid0 = sorted(meta1["files"])[0]
    committed = meta1["files"][cid0][0]
    orphan_src = os.path.join(d_inc, "lists", f"cid={cid0}", committed)
    orphan_dst = os.path.join(d_inc, "lists", f"cid={cid0}", "updX-orphan.parquet")
    t = pq.read_table(orphan_src)
    pq.write_table(
        t.set_column(
            0, "vec_id", pc.add(t["vec_id"], 1_000_000)
        ),
        orphan_dst,
    )
    again = (
        query_vector_index(d_inc)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert again.astype("int64").equals(ref.astype("int64"))
    # the next update sweeps it
    more = emb.filter(lambda r: r["vec_id"] >= cut).map_batches(
        lambda tb: tb.set_column(
            tb.schema.get_field_index("vec_id"),
            "vec_id",
            pc.add(tb["vec_id"], 10_000),
        ),
        batch_format="pyarrow",
    )
    update_vector_index(d_inc, more)
    assert not os.path.exists(orphan_dst)


def test_build_vector_index_rebuild_overwrites(ray_session, tmp_path):
    """A rebuild into an existing artifact dir replaces it atomically
    (tmp + rename), leaving no stale lists behind."""
    import os

    from sharesci_ray.pipelines.ops_embed import build_vector_index
    from sharesci_ray.sources.corpus import read_table

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    out = str(tmp_path / "vidx2")
    build_vector_index(emb, out)
    marker = os.path.join(out, "lists", "stale_leftover")
    os.makedirs(marker)
    build_vector_index(emb, out)
    assert not os.path.exists(marker)
    assert os.path.exists(os.path.join(out, "meta.json"))


def test_knn_graph_ivf_matches_numpy_reference(ray_session):
    """Full-output check vs an independent numpy replay of the candidate
    rule (quantized argmax assignment, top-P probe, exact cosine within
    probed lists, top-k by score desc / id asc)."""
    import pyarrow.parquet as pq

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.functions.dedup import ANN_NQ
    from sharesci_ray.pipelines.ops_embed import (
        KNN_GRAPH_K,
        KNN_GRAPH_PROBE,
        knn_graph_ivf,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = vx.quantize(mat)
    cent = q[np.argsort(ids)][ANN_NQ : ANN_NQ + vx.IVF_C]
    dots = q @ cent.T
    assign = np.argmax(dots, axis=1)
    order = np.argsort(-dots, axis=1, kind="stable")[:, :KNN_GRAPH_PROBE]
    normed = vx.normalize(mat)
    want = {}
    for i in range(ids.size):
        cand = np.flatnonzero(np.isin(assign, order[i]) & (ids != ids[i]))
        s = normed[cand] @ normed[i]
        top = cand[np.lexsort((ids[cand], -s))][:KNN_GRAPH_K]
        want[int(ids[i])] = [int(x) for x in ids[top]]

    got = {}
    for r in knn_graph_ivf(SF).take_all():
        got.setdefault(int(r["query_id"]), {})[int(r["rank"])] = int(
            r["neighbor_id"]
        )
    got_lists = {
        qid: [ranks[k] for k in sorted(ranks)] for qid, ranks in got.items()
    }
    assert got_lists == {k: v for k, v in want.items() if v}


def test_knn_label_vote_matches_numpy_reference(ray_session):
    """Predicted label == majority label of the exact top-k cosine
    neighbors (self excluded), ties to the smallest label."""
    import pyarrow.parquet as pq

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.functions.dedup import ANN_K, ANN_NQ
    from sharesci_ray.pipelines.ops_ml import knn_label_vote

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    lab = t["label"].to_numpy().astype(np.int64)
    normed = vx.normalize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    want = {}
    for i in np.flatnonzero(ids < ANN_NQ):
        others = np.flatnonzero(ids != ids[i])
        s = normed[others] @ normed[i]
        top = others[np.lexsort((ids[others], -s))][:ANN_K]
        labs, counts = np.unique(lab[top], return_counts=True)
        w = int(np.argmax(counts))
        want[int(ids[i])] = (int(labs[w]), int(counts[w]))

    got = {
        int(r["query_id"]): (int(r["pred_label"]), int(r["votes"]))
        for r in knn_label_vote(SF).take_all()
    }
    assert got == want


def test_pq_adc_scores_match_direct_reconstruction(ray_session):
    """The ADC lookup-table score must equal the direct integer dot of the
    quantized query against the RECONSTRUCTED (codebook) vector — the PQ
    identity score(q,v) = <q, decode(encode(v))> — replayed here with an
    independent numpy path over every (query, neighbor) the op emitted."""
    import pyarrow.parquet as pq

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.functions.dedup import ANN_NQ
    from sharesci_ray.pipelines.ops_embed import _pq_train, ann_pq_topk

    cb = _pq_train(SF)
    assert cb.shape == (vx.PQ_M, vx.PQ_K, vx.PQ_SUB)

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    quant = vx.quantize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    codes = vx.pq_encode(quant, cb)
    assert codes.min() >= 0 and codes.max() < vx.PQ_K
    by_id = {int(i): k for k, i in enumerate(ids)}

    out = ann_pq_topk(SF).to_pandas()
    assert len(out) > 0
    for r in out.itertuples(index=False):
        q_row = quant[by_id[int(r.query_id)]]
        v_codes = codes[by_id[int(r.neighbor_id)]]
        recon = np.concatenate([cb[m, v_codes[m]] for m in range(vx.PQ_M)])
        assert int(q_row @ recon) == int(r.score_q)
    # ranks dense per query, self never a neighbor
    for qid, grp in out.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == list(range(1, len(grp) + 1))
        assert qid not in set(grp["neighbor_id"])
    assert out["query_id"].nunique() == ANN_NQ


def test_pq_training_rounds_change_codebook(ray_session):
    """Lloyd's rounds must actually move the codebooks off the seed rows
    (guards against a silent no-op training loop)."""
    import pyarrow.parquet as pq

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.pipelines.ops_embed import _pq_train

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy().astype(np.int64)
    quant = vx.quantize(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    seed = quant[np.argsort(ids)][: vx.PQ_K]
    seed_cb = np.stack(
        [seed[:, m * vx.PQ_SUB:(m + 1) * vx.PQ_SUB] for m in range(vx.PQ_M)]
    )
    cb = _pq_train(SF)
    assert not np.array_equal(cb, seed_cb)


def test_ivfpq_persisted_artifact_only_and_codes_exact(ray_session, tmp_path):
    """The IVF×PQ artifact: stored codes match an independent pq_encode
    recompute; serving never re-reads the corpus (sidecars + probed cid=
    code partitions only); low n_probe actually prunes partitions; and the
    registry op's cached-artifact output equals a fresh tmp-dir build."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    import sharesci_ray.pipelines.ops_embed as E
    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.functions.dedup import ANN_K, ANN_NQ

    out = str(tmp_path / "pqidx")
    meta = E.build_pq_index(SF, out)
    assert meta["files"] == E._list_files(out, "codes")
    assert len(meta["files"]) == vx.IVF_C  # every list materialized

    # stored codes ≡ pq_encode over the raw embeddings (independent path)
    codes_t = pq.read_table(os.path.join(out, "codes"))
    emb_t = pq.read_table(f"{SF}/embeddings.parquet")
    quant = vx.quantize(np.array(emb_t["embedding"].to_pylist(), np.float64))
    want = vx.pq_encode(quant, E._pq_train(SF))
    by_id = {int(i): k for k, i in enumerate(emb_t["vec_id"].to_numpy())}
    got_ids = codes_t["vec_id"].to_numpy().astype(np.int64)
    got = np.stack(
        [codes_t[f"code{m}"].to_numpy().astype(np.int64) for m in range(vx.PQ_M)],
        axis=1,
    )
    assert len(got_ids) == emb_t.num_rows
    rows = np.array([by_id[int(i)] for i in got_ids])
    assert np.array_equal(got, want[rows])

    # serving is artifact-only: poison the corpus reader
    real = E.read_table

    def poisoned(*a, **k):
        raise AssertionError("PQ persisted query path re-scanned the corpus")

    E.read_table = poisoned
    try:
        res = (
            E.query_pq_index(out)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        E.read_table = real
    assert res["query_id"].nunique() == ANN_NQ
    for qid, grp in res.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= ANN_K
        assert qid not in set(grp["neighbor_id"])

    # registry op (cached /tmp artifact) ≡ this fresh build's ranking
    ref = (
        E.ann_ivfpq_persisted(SF)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert res.astype("int64").equals(ref.astype("int64"))

    # n_probe=1 must scan strictly fewer code partitions than probe=8
    seen: list[list[str]] = []
    real_rp = ray.data.read_parquet

    def spy(paths, **k):
        seen.append(list(paths) if isinstance(paths, list) else [paths])
        return real_rp(paths, **k)

    ray.data.read_parquet = spy
    try:
        E.query_pq_index(out, n_probe=1).materialize()
        E.query_pq_index(out, n_probe=vx.IVF_PROBE).materialize()
    finally:
        ray.data.read_parquet = real_rp

    def cids(paths):
        return {p.split("cid=")[1].split(os.sep)[0] for p in paths if "cid=" in p}

    assert len(cids(seen[0])) < len(cids(seen[1]))
    assert cids(seen[0]) <= cids(seen[1])


def test_cluster_top_terms_invariants(ray_session):
    """Structural checks on the corpus data map: dense per-cluster ranks
    with the (count desc, term asc) tie-break, cluster doc counts summing
    to the corpus size (every doc is assigned exactly once), and term
    counts bounded by the cluster's total token mass."""
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_embed import _CTT_TOP, cluster_top_terms

    out = cluster_top_terms(SF).to_pandas()
    n_corpus = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows

    per_cluster_docs = out.groupby("cluster_id")["n_docs"].first()
    assert per_cluster_docs.sum() == n_corpus

    for cid, grp in out.groupby("cluster_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert len(grp) <= _CTT_TOP
        # ranking is (n desc, term asc)
        key = list(zip(-grp["n_occurrences"], grp["term"]))
        assert key == sorted(key)
        assert (grp["n_occurrences"] > 0).all()


def test_build_pq_index_crash_safe_and_overwrites(ray_session, tmp_path):
    """The PQ artifact commits by tmp-dir + atomic rename: an orphaned
    half-written `.tmp` from a crashed build is swept by the next build,
    a rebuild replaces stale codes dirs, and a missing meta.json (the
    single commit point) makes the query path fail loudly."""
    import os

    import pytest as _pytest

    from sharesci_ray.pipelines.ops_embed import build_pq_index, query_pq_index

    out = str(tmp_path / "pqidx2")
    # simulate a crash: a stale half-written tmp dir with garbage inside
    os.makedirs(out + ".tmp/codes/cid=0")
    with open(out + ".tmp/garbage", "w") as f:
        f.write("torn")
    build_pq_index(SF, out)
    assert not os.path.exists(out + ".tmp")  # swept and renamed away
    assert os.path.exists(os.path.join(out, "meta.json"))

    marker = os.path.join(out, "codes", "stale_leftover")
    os.makedirs(marker)
    build_pq_index(SF, out)
    assert not os.path.exists(marker)

    res = query_pq_index(out).to_pandas()
    assert res["query_id"].nunique() == 10

    os.remove(os.path.join(out, "meta.json"))
    with _pytest.raises(FileNotFoundError):
        query_pq_index(out)


def test_query_rejects_foreign_qscale(ray_session, tmp_path):
    """ADVICE r4: meta.json carries the quantization constant derived from
    the kernel (not a hardcoded literal), and every artifact reader
    validates it — an artifact built under a different QSCALE must be
    refused, not silently mis-scored."""
    import json
    import os

    import pytest

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.pipelines.ops_embed import build_vector_index, query_vector_index
    from sharesci_ray.sources.corpus import read_table

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    out = str(tmp_path / "vidx_qs")
    build_vector_index(emb, out)
    mp = os.path.join(out, "meta.json")
    meta = json.load(open(mp))
    assert meta["qscale_log2"] == vx.QSCALE_LOG2  # derived, not hardcoded
    meta["qscale_log2"] = vx.QSCALE_LOG2 + 1
    json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="qscale"):
        query_vector_index(out)


def test_delete_compact_vector_index_equals_fresh_build(ray_session, tmp_path):
    """VERDICT r4 #5 'done' criterion: tombstone delete + compaction give
    the vector artifact the BM25 side's full maintenance story.
    query-from-artifact after delete_vectors (tombstone-filtered read)
    AND after compact_vector_index (rewritten lists) must both equal a
    fresh build over the survivors; compaction must clear tombstones,
    drop superseded files, and sweep crash orphans idempotently."""
    import json
    import os

    import pyarrow.parquet as pq

    from sharesci_ray.functions import dedup as dd
    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.pipelines.ops_embed import (
        build_vector_index,
        compact_vector_index,
        delete_vectors,
        query_vector_index,
    )
    from sharesci_ray.sources.corpus import read_table

    emb = read_table(SF, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()
    # retire ids beyond the fixture range (queries + centroids stay put,
    # so the fresh build derives identical sidecars)
    fixture_hi = dd.ANN_NQ + vx.IVF_C
    doomed = list(range(n - 30, n)) + list(range(fixture_hi, fixture_hi + 10))
    assert min(doomed) >= fixture_hi

    d_live = str(tmp_path / "live")
    build_vector_index(emb, d_live)
    meta0 = json.load(open(os.path.join(d_live, "meta.json")))

    d_ref = str(tmp_path / "ref")
    doomed_set = set(doomed)
    build_vector_index(
        emb.filter(lambda r: r["vec_id"] not in doomed_set), d_ref
    )
    ref = (
        query_vector_index(d_ref)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )

    meta1 = delete_vectors(d_live, doomed)
    assert meta1["deletes"] == 1 and meta1["tombstone_files"]
    got_tomb = (
        query_vector_index(d_live)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got_tomb.astype("int64").equals(ref.astype("int64"))

    # plant a crash orphan: an uncommitted stage dir + a stray list file
    cid0 = sorted(meta1["files"])[0]
    stray = os.path.join(d_live, "lists", f"cid={cid0}", "genX-orphan.parquet")
    src = os.path.join(d_live, "lists", f"cid={cid0}", meta1["files"][cid0][0])
    pq.write_table(pq.read_table(src), stray)
    os.makedirs(os.path.join(d_live, "compact-99.stage"), exist_ok=True)

    meta2 = compact_vector_index(d_live)
    assert meta2["generation"] == 1
    assert meta2["tombstone_files"] == []
    assert meta2["n_vectors"] == meta0["n_vectors"] - len(doomed)
    assert not os.path.exists(stray)
    assert not os.path.exists(os.path.join(d_live, "compact-99.stage"))
    # every committed file is generation-salted; superseded files are gone
    for cid, names in meta2["files"].items():
        assert all(nm.startswith("gen1-") for nm in names)
        on_disk = sorted(
            os.listdir(os.path.join(d_live, "lists", f"cid={cid}"))
        )
        assert on_disk == sorted(names), cid

    got_comp = (
        query_vector_index(d_live)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got_comp.astype("int64").equals(ref.astype("int64"))

    # compaction is idempotent (a second run is a no-op rewrite)
    meta3 = compact_vector_index(d_live)
    assert meta3["n_vectors"] == meta2["n_vectors"]
    got_again = (
        query_vector_index(d_live)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got_again.astype("int64").equals(ref.astype("int64"))


def test_delete_compact_pq_artifact(ray_session, tmp_path):
    """The same maintenance pair works on the IVF×PQ codes artifact:
    retired vec_ids disappear from top-k under the tombstone filter, the
    compacted artifact serves the IDENTICAL ranking (filter ≡ physical
    removal), and the codes files carry no tombstoned rows afterwards."""
    import json
    import os

    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_embed import (
        build_pq_index,
        compact_vector_index,
        delete_vectors,
        query_pq_index,
    )

    d = str(tmp_path / "pqidx")
    build_pq_index(SF, d)
    base = (
        query_pq_index(d)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    # retire the 10 most-served neighbors — the ranking MUST change
    doomed = base["neighbor_id"].value_counts().head(10).index.astype(int).tolist()
    meta1 = delete_vectors(d, doomed)
    assert meta1["tombstone_files"]
    after = (
        query_pq_index(d)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert not after["neighbor_id"].isin(doomed).any()
    assert not after.equals(base)

    meta2 = compact_vector_index(d)
    assert meta2["tombstone_files"] == [] and meta2["generation"] == 1
    comp = (
        query_pq_index(d)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert comp.equals(after)
    # physical check: no tombstoned vec_id survives in any committed file
    meta = json.load(open(os.path.join(d, "meta.json")))
    for cid, names in meta["files"].items():
        for nm in names:
            t = pq.read_table(
                os.path.join(d, "codes", f"cid={cid}", nm), columns=["vec_id"]
            )
            assert not any(v in set(doomed) for v in t["vec_id"].to_pylist())
