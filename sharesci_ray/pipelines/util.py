"""Small shared pipeline utilities.

(ref: n/a — SURVEY.md §0: reference checkout empty.)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count, ``default`` when Ray is uninitialised — the one
    probe every parallelism heuristic shares."""
    import ray as _ray

    try:
        return int(_ray.cluster_resources().get("CPU", default))
    except Exception:  # pragma: no cover - uninitialised Ray
        return default


def join_partitions(
    *datasets: ray.data.Dataset,
    bytes_per_partition: int = 64 << 20,
    lo: int = 4,
) -> int:
    """Shuffle parallelism for ``Dataset.join`` / wide exchanges, sized from
    what is known WITHOUT executing the plan: the plan-inferable input size
    (parquet footer metadata survives projections) and the cluster CPU count.

    A hard-coded small constant (the round-2 shape) is a 4-reducer
    bottleneck the moment data grows; a bare CPU-proportional number
    over-partitions tiny dimension joins.  So: when any input's size is
    statically known, one partition per ``bytes_per_partition`` (clamped to
    [lo, 4·cpus]); when nothing is known, half a partition per core — wide
    enough that no reducer sees more than ~2 cores' worth of data, small
    enough not to drown sf0.01 joins in scheduling.
    """
    cpus = cluster_cpus()
    size = 0
    for ds in datasets:
        try:
            s = ds._logical_plan.dag.infer_metadata().size_bytes
        except Exception:
            s = None
        if s:
            size = max(size, int(s))
    if size:
        need = -(-size // bytes_per_partition)
        return int(min(max(lo, need), 4 * cpus))
    return max(lo, cpus // 2)


def drop_empty_blocks(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Materialize ``ds`` and drop its 0-row blocks.

    Ray 2.49 loses the schema of empty blocks (a 0-row block is stored with
    ZERO columns): a sparse-keyed ``groupby``/shuffle emits such blocks for
    empty partitions, and a downstream ``Dataset.join`` then dies with
    "No match ... for key field" when a join partition receives only
    schema-less empties.  This helper is the containment: only block REFS
    travel through the driver (metadata row counts come from the bundle
    metadata — no block is fetched), so it is safe at any data size; the
    materialization cost is the same .materialize() the shuffle already paid.

    ``schema`` is used when every block is empty — the healed dataset then
    is a single typed empty block instead of a schema-less one.
    """
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


# Broadcast-vs-join gate for filtered dimension tables (VERDICT r4 #2).
# Monkeypatch to 0 in tests to force every caller onto its join plan.
BROADCAST_CAP_BYTES = 32 << 20


def fetch_if_small(
    ds: ray.data.Dataset, schema: pa.Schema, cap: int | None = None
) -> tuple[pa.Table | None, ray.data.Dataset]:
    """Size-gate a (possibly filtered) dimension: ``(table, ds)`` when its
    exact materialized size is under the broadcast cap — the caller may
    bring the table to the driver (is_in scan pruning, O(1) lookup maps) —
    else ``(None, ds)`` and the caller must hash-join the returned
    distributed dataset instead.

    The decision uses the MATERIALIZED size from block metadata (filter
    selectivity is measured, never guessed; no block reaches the driver
    for the check), and the materialized blocks are reused by whichever
    plan runs.  The returned dataset is healed of schema-less empty
    blocks so it is always join-safe."""
    mat = drop_empty_blocks(ds.materialize(), schema)
    limit = BROADCAST_CAP_BYTES if cap is None else cap
    if mat.materialize().size_bytes() < limit:
        import ray as _ray

        tbl = pa.concat_tables(
            _ray.get(mat.to_arrow_refs()), promote_options="default"
        )
        return tbl.combine_chunks(), mat
    return None, mat
