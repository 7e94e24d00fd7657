"""Relational extension ops (ops_relational.py): pii_scrub redaction
semantics, the as-of join merge kernel's edge cases, exact grouped
quantiles, and the wide pivot.  Parity vs the DuckDB oracles is covered
generically by test_driver_parity; these tests pin the hand-checkable
edge cases the oracle comparison can't isolate."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_pii_scrub_kernel(ray_session):
    from sharesci_ray.pipelines.ops_relational import pii_scrub

    df = pii_scrub(SF).to_pandas()
    assert (df["n_redacted"] >= 1).all()  # every props row has {"k": N}
    assert df["props_clean"].str.contains("<NUM>").all()
    assert not df["props_clean"].str.contains(r"\d", regex=True).any()


def test_asof_join_edges(ray_session):
    """Hand-built group: purchase before any view drops out; equal-ts view
    matches (>= semantics); tie on (user, ts) resolves to max cents."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from sharesci_ray.pipelines import ops_relational as R

    us = pa.timestamp("us")
    rows = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 10, 11, 12, 13], pa.int64()),
            "user_id": pa.array([7] * 7, pa.int64()),
            "ts": pa.array([100, 250, 300, 50, 200, 300, 300], pa.int64()).cast(us),
            "event_type": pa.array(
                ["purchase", "purchase", "purchase", "view", "view", "view", "view"]
            ),
            "value": pa.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    d = tempfile.mkdtemp(prefix="asof_edge_")
    pq.write_table(rows, os.path.join(d, "events.parquet"))
    res = R.asof_join_events(d).to_pandas().sort_values("event_id").reset_index(drop=True)
    # purchase@100: latest view <=100 is ts=50 (cents 100)
    # purchase@250: latest view <=250 is ts=200 (cents 200)
    # purchase@300: equal-ts views at 300 -> max cents 400
    assert list(res["event_id"]) == [1, 2, 3]
    assert list(res["view_cents"]) == [100, 200, 400]
    assert list(res["view_ts"].astype("datetime64[us]").astype("int64")) == [50, 200, 300]


def test_asof_no_prior_view_drops(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from sharesci_ray.pipelines import ops_relational as R

    us = pa.timestamp("us")
    rows = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([100, 100], pa.int64()).cast(us),
            "event_type": pa.array(["purchase", "view"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    d = tempfile.mkdtemp(prefix="asof_none_")
    pq.write_table(rows, os.path.join(d, "events.parquet"))
    # user 1 has no view at all; user 2 has no purchase — empty result
    assert R.asof_join_events(d).count() == 0


def test_grouped_quantiles_formula(ray_session):
    from sharesci_ray.pipelines.ops_relational import grouped_quantiles

    df = grouped_quantiles(SF).to_pandas().set_index("event_type")
    con = duckdb.connect()
    con.execute("SET threads=1")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    truth = con.execute(
        """
        SELECT event_type, list(cents ORDER BY cents) AS xs
        FROM (SELECT event_type, CAST(round(value*100) AS BIGINT) AS cents FROM events)
        GROUP BY event_type
        """
    ).fetchall()
    for et, xs in truth:
        xs = np.array(sorted(xs))
        n = xs.size
        assert df.loc[et, "n"] == n
        for col, q in (("p50_cents", 0.5), ("p90_cents", 0.9), ("p99_cents", 0.99)):
            assert df.loc[et, col] == xs[int(np.floor((n - 1) * q))]


def test_pivot_counts_sum_to_total(ray_session):
    from sharesci_ray.pipelines.ops_relational import pivot_event_counts
    from sharesci_ray.sources.corpus import read_table

    df = pivot_event_counts(SF).to_pandas()
    total = int(df[[c for c in df.columns if c.startswith("n_")]].sum().sum())
    assert total == read_table(SF, "events", columns=["event_id"]).count()
