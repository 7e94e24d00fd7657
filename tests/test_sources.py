"""Sources: query-set reader (S3) and lazy (preload=False) index access."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from sharesci_ray.sources.corpus import read_queries


def test_read_queries_json_and_parquet(ray_session, tmp_path):
    rows = [{"query_id": 0, "text": "table scan"}, {"query_id": 1, "text": "hash join"}]
    jpath = str(tmp_path / "q.jsonl")
    with open(jpath, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ppath = str(tmp_path / "q.parquet")
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["table scan", "hash join"]),
            }
        ),
        ppath,
    )
    for path in (jpath, ppath):
        got = read_queries(path).to_pandas().sort_values("query_id")
        assert list(got["text"]) == ["table scan", "hash join"]
        assert str(got["query_id"].dtype) == "int64"


def test_scorer_lazy_preload_equivalent(ray_session):
    """preload=False (lazy per-bucket load, the 10^12-doc mode) returns
    identical results to the eager path."""
    from sharesci_ray.pipelines.ops import _index_for
    from sharesci_ray.pipelines.query import ScorerActor

    bd = _index_for("/root/testdata/sf0.001")
    eager = ScorerActor(bd, k=10, scorer="bmw", preload=True)
    lazy = ScorerActor(bd, k=10, scorer="bmw", preload=False)
    for q in ["table scan", "hash join merge", "slow query plan", "zz_oov"]:
        de, se = eager.score_query(q)
        dl, sl = lazy.score_query(q)
        assert (de == dl).all() and (se == sl).all()


def test_read_corpus_any_formats_equivalent(ray_session, tmp_path):
    """The same corpus ingested from Parquet, JSON-lines and CSV must be
    row-identical after normalization — and an index built from the JSONL
    ingest must rank exactly like one built from the Parquet ingest."""
    import json

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.build import BuildConfig, build_index
    from sharesci_ray.pipelines.query import ScorerActor
    from sharesci_ray.sources.corpus import read_corpus_any
    from sharesci_ray.sources.synth import make_corpus

    corpus = make_corpus(40, seed=99)
    pq.write_table(corpus, str(tmp_path / "c.parquet"))
    with open(tmp_path / "c.jsonl", "w") as f:
        for r in corpus.to_pylist():
            f.write(json.dumps(r) + "\n")
    pacsv.write_csv(corpus, str(tmp_path / "c.csv"))

    def rows(ds):
        return sorted(
            (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
            for r in ds.take_all()
        )

    base = rows(read_corpus_any(str(tmp_path / "c.parquet")))
    assert rows(read_corpus_any(str(tmp_path / "c.jsonl"))) == base
    assert rows(read_corpus_any(str(tmp_path / "c.csv"))) == base
    assert len(base) == 40

    # end-to-end: JSONL-ingested index ranks identically to Parquet's
    d_pq = str(tmp_path / "idx_pq")
    d_jl = str(tmp_path / "idx_jl")
    cfg = BuildConfig(n_buckets=4)
    build_index(read_corpus_any(str(tmp_path / "c.parquet")), d_pq, cfg, resume=False)
    build_index(read_corpus_any(str(tmp_path / "c.jsonl")), d_jl, cfg, resume=False)
    s1 = ScorerActor(d_pq, k=5, scorer="daat")
    s2 = ScorerActor(d_jl, k=5, scorer="daat")
    for q in ["table scan", "hash join", "merge sort fast"]:
        d1, sc1 = s1.score_query(q)
        d2, sc2 = s2.score_query(q)
        assert (d1 == d2).all() and (sc1 == sc2).all()
