"""ML extension ops (ops_ml.py): the window-join merge kernel vs a
brute-force reference, k-means invariants (determinism, label range,
integer-exactness of the centroid update), the leakage-safety property of
split_by_cluster, and balance_sources' mix bound.  Parity vs the DuckDB
oracles is covered generically by test_driver_parity; these tests pin the
properties the oracle comparison can't isolate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_range_merge_group_vs_bruteforce():
    """Kernel-level property: the searchsorted window merge must equal the
    brute-force O(n²) definition on random histories (incl. equal
    timestamps and empty windows)."""
    from sharesci_ray.pipelines.ops_ml import _WINDOW_US, range_merge_group

    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(1, 40)
        ts = rng.randint(0, 4 * _WINDOW_US, size=n).astype(np.int64)
        side = rng.randint(0, 2, size=n).astype(np.int8)
        cents = rng.randint(0, 1000, size=n).astype(np.int64)
        group = pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "user_id": pa.array(np.full(n, 9), pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "cents": pa.array(cents, pa.int64()),
                "is_left": pa.array(side, pa.int8()),
            }
        )
        out = range_merge_group(group)
        got = {
            int(e): (int(nv), int(vc))
            for e, nv, vc in zip(
                out["event_id"].to_pylist(),
                out["n_views"].to_pylist(),
                out["views_cents"].to_pylist(),
            )
        }
        for i in range(n):
            if side[i] != 1:
                continue
            m = (side == 0) & (ts <= ts[i]) & (ts > ts[i] - _WINDOW_US)
            assert got[i] == (int(m.sum()), int(cents[m].sum())), (trial, i)


def test_range_merge_group_empty_and_no_left():
    from sharesci_ray.pipelines.ops_ml import range_merge_group

    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "cents": pa.array([], pa.int64()),
            "is_left": pa.array([], pa.int8()),
        }
    )
    assert range_merge_group(empty).num_rows == 0
    only_views = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([3, 3], pa.int64()),
            "ts": pa.array([10, 20], pa.int64()).cast(pa.timestamp("us")),
            "cents": pa.array([5, 6], pa.int64()),
            "is_left": pa.array([0, 0], pa.int8()),
        }
    )
    assert range_merge_group(only_views).num_rows == 0


def test_kmeans_deterministic_and_total(ray_session):
    """Two runs produce identical labels (integer-exact pipeline — no
    float drift), every vector is labeled exactly once, and labels are in
    [0, K)."""
    from sharesci_ray.pipelines.ops_ml import KMEANS_K, kmeans_embeddings

    a = kmeans_embeddings(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = kmeans_embeddings(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    assert a["vec_id"].is_unique
    assert a["cluster_id"].between(0, KMEANS_K - 1).all()
    # Lloyd's from K distinct seeds on this data should keep >1 cluster
    assert a["cluster_id"].nunique() > 1


def test_kmeans_assignment_is_nearest_centroid(ray_session):
    """Replay the engine's rounds in-process and check the final labels
    are argmax of the integer centroid dot — i.e. the map_batches/
    groupby plumbing didn't perturb the math."""
    import pyarrow.parquet as pq

    from sharesci_ray.functions import vectors as vx
    from sharesci_ray.pipelines.ops_ml import (
        KMEANS_K,
        KMEANS_ROUNDS,
        kmeans_embeddings,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(t["vec_id"].to_numpy())
    q = vx.quantize(vx.embedding_matrix(t))[order]
    cent = q[:KMEANS_K].copy()
    for _ in range(KMEANS_ROUNDS):
        asg = vx.ivf_assign(q, cent)
        for c in range(KMEANS_K):
            m = asg == c
            if m.any():
                cent[c] = np.floor_divide(q[m].sum(axis=0), int(m.sum()))
    want = vx.ivf_assign(q, cent)
    got = (
        kmeans_embeddings(SF)
        .to_pandas()
        .sort_values("vec_id")["cluster_id"]
        .to_numpy()
    )
    assert np.array_equal(got, want)


def test_split_by_cluster_leakage_safe(ray_session):
    """THE property the op exists for: every document in a near-dup
    cluster lands in the same split, and the split distribution is
    roughly 80/10/10 by cluster."""
    from sharesci_ray.pipelines.ops_ml import split_by_cluster

    df = split_by_cluster(SF).to_pandas()
    per_cluster = df.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    assert set(df["split"].unique()) <= {"train", "valid", "test"}
    assert (df["split"] == "train").mean() > 0.5  # 80% target, small-n slack


def test_ann_recall_report_bounds(ray_session):
    """Recall rows are one per query, n_hit in [0, K], recall == n_hit/K
    exactly, and the oracle composition re-resolves (callable SQL)."""
    from sharesci_ray.functions.dedup import ANN_K, ANN_NQ
    from sharesci_ray.pipelines.ops import ORACLE_SQL
    from sharesci_ray.pipelines.ops_ml import ann_recall_report

    df = ann_recall_report(SF).to_pandas()
    assert len(df) == ANN_NQ and df["query_id"].is_unique
    assert df["n_hit"].between(0, ANN_K).all()
    assert (df["recall"] == df["n_hit"] / ANN_K).all()
    sql = ORACLE_SQL["ann_recall_report"]
    assert callable(sql) and "FROM (" in sql()


def test_balance_sources_mix_bound(ray_session):
    """Every source is downsampled toward the smallest source's size:
    kept-per-source stays within binomial noise of min_count, and the
    kept set is a subset rule (re-running never changes membership)."""
    from sharesci_ray.pipelines.ops_ml import balance_sources

    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    full_counts = src.to_pandas()["source"].value_counts()
    m = int(full_counts.min())

    a = balance_sources(SF).to_pandas()
    b = balance_sources(SF).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # deterministic
    kept = a["source"].value_counts()
    for s, n_full in full_counts.items():
        k = int(kept.get(s, 0))
        # expectation m * (n_full/n_full) = m; allow 4 sigma binomial slack
        sigma = (m * max(1 - m / n_full, 0.0)) ** 0.5
        assert abs(k - m) <= max(4 * sigma, 8), (s, k, m)


def test_label_propagation_clamps_seeds_and_grows_monotonically(ray_session):
    """Seeds keep their table labels with labeled_round 0; every labeled
    node is a seed or labeled in round 1 or 2; round-1 nodes must have a
    seed out-neighbor in the graph."""
    import pyarrow.parquet as pq

    from sharesci_ray.pipelines.ops_embed import knn_graph_ivf
    from sharesci_ray.pipelines.ops_ml import LP_SEEDS, label_propagation_knn

    truth = {
        int(r["vec_id"]): int(r["label"])
        for r in pq.read_table(
            f"{SF}/embeddings.parquet", columns=["vec_id", "label"]
        ).to_pylist()
    }
    rows = label_propagation_knn(SF).take_all()
    by_id = {int(r["vec_id"]): r for r in rows}
    assert len(by_id) == len(rows)  # one row per node
    seeds = {v for v in by_id if v < LP_SEEDS}
    assert seeds == {v for v in truth if v < LP_SEEDS}
    for v in seeds:
        assert int(by_id[v]["label"]) == truth[v]
        assert int(by_id[v]["labeled_round"]) == 0
    edges = {}
    for r in knn_graph_ivf(SF).take_all():
        edges.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    for v, r in by_id.items():
        rd = int(r["labeled_round"])
        assert rd in (0, 1, 2)
        if rd == 1:
            assert edges[v] & seeds, f"round-1 node {v} has no seed neighbor"
