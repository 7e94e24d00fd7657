"""Small shared pipeline utilities.

(ref: n/a — SURVEY.md §0: reference checkout empty.)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


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
