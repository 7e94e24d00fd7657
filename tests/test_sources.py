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
