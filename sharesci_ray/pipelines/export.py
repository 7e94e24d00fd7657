"""Training-shard export: the last mile of the training-data pipeline.

(ref: n/a — SURVEY.md §0: the reference checkout is empty; this closes
VERDICT r3 "What's missing" #3 / next-round #5.)

``write_training_shards`` takes the cleaned chunk stream (clean_chunks:
quality gate → exact dedup → overlapping windows) and writes size-targeted
shard files a dataloader consumes:

* **Deterministic contiguous sharding.**  A document's shard is
  ``floor(chars_before_doc // target)`` where ``chars_before_doc`` is the
  prefix sum of per-document chunk chars in doc_id order — so every shard
  is a CONTIGUOUS doc-id range of ≈ ``target_chars`` (a failed run skips
  finished shard directories on resume, and the rule replays exactly in
  the DuckDB oracle via one window function).  The global prefix sum is
  the one step Ray Data's API cannot express: it is computed with raw Ray
  tasks — per-block partial sums collected to the driver (one tuple per
  block, bounded at any data size), then per-block assignment tasks that
  receive only their block ref + char offset.

* **Shard manifest.**  Per shard: doc-id range, chunk/char/token counts,
  and an order-independent content signature (sum of per-chunk md5-int60
  hashes mod P31 — the same SQL-replayable hash family as the dedup ops).
  Written to ``manifest.json`` next to the shard directories; the
  ``training_shard_manifest`` registry op exposes the same rows with a
  full DuckDB twin, so the driver value-hashes the export end-to-end.

* **Consumption.**  Shards are hive-partitioned parquet
  (``shards/shard=K/``) with the shard id duplicated in-file; a dataloader
  reads them with ``ray.data.read_parquet(out).streaming_split(k)``
  (smoke-tested in tests/test_export.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as dd
from ..functions.text import SQL_TOKENIZE, flat_tokens

# NOTE: import-order-agnostic (any op module can be imported first, and
# ops.py's bottom imports them all): clean_chunks is imported lazily, and
# the oracle SQL — which EMBEDS clean_chunks' SQL — is registered as a
# deferred callable (ops.resolve_oracle_sql finalizes it), so nothing here
# needs another op module to be loaded at decorator time.
from .ops import op

TARGET_SHARD_CHARS = 40_000  # test-scale default; a real export passes
                             # ~256 MiB worth of chars per shard

_MANIFEST_SCHEMA = pa.schema(
    [
        ("shard", pa.int64()),
        ("doc_lo", pa.int64()),
        ("doc_hi", pa.int64()),
        ("n_chunks", pa.int64()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("content_sig", pa.int64()),
    ]
)


def _chunk_features(t: pa.Table) -> pa.Table:
    """chunk rows → + (n_tokens, h31) per chunk, both SQL-replayable:
    n_tokens = code-aware token count (== len(SQL_TOKENIZE)), h31 =
    md5-int60(chunk) mod P31."""
    if t.num_rows == 0:
        return t.append_column("n_tokens", pa.array([], pa.int64())).append_column(
            "h31", pa.array([], pa.int64())
        )
    _, parent = flat_tokens(t["chunk"])
    n_tokens = np.bincount(parent, minlength=t.num_rows).astype(np.int64)
    chunk_col = t["chunk"]
    if isinstance(chunk_col, pa.ChunkedArray):
        chunk_col = chunk_col.combine_chunks()
    h31 = dd.hash_strings(chunk_col) % dd.P31
    return t.append_column("n_tokens", pa.array(n_tokens, pa.int64())).append_column(
        "h31", pa.array(h31, pa.int64())
    )


def _assign_doc_shards(chunks, target_chars: int):
    """(doc_id → shard) mapping via a distributed prefix sum.

    Per-doc char totals are a groupby; the PREFIX of those totals in
    doc_id order is the one semantics Dataset's API can't express, so:
    sort by doc_id, collect ONE (rows, chars, doc range) tuple per block
    (driver memory bounded by block count), compute block char offsets on
    the driver, then assign shards inside per-block Ray tasks that get
    only their block ref + offset."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    doc_tot = (
        chunks.groupby("doc_id")
        .aggregate(Sum("n_chunk_chars"))
        .sort("doc_id")
        .materialize()
    )

    @ray.remote
    def block_stats(block: pa.Table):
        if block.num_rows == 0:
            return (0, 0, None, None)
        chars = block["sum(n_chunk_chars)"].to_numpy(zero_copy_only=False)
        ids = block["doc_id"].to_numpy(zero_copy_only=False)
        return (block.num_rows, int(chars.sum()), int(ids.min()), int(ids.max()))

    block_refs = []
    for bundle in doc_tot.iter_internal_ref_bundles():
        block_refs.extend(bundle.block_refs)
    stats = ray.get([block_stats.remote(r) for r in block_refs])

    # sorted-dataset blocks must cover disjoint ascending doc ranges — the
    # prefix offsets below silently miscount otherwise
    prev_hi = -1
    for n, _c, lo, hi in stats:
        if n == 0:
            continue
        if lo <= prev_hi:
            raise AssertionError(
                "doc-total blocks are not in sorted order; prefix sums invalid"
            )
        prev_hi = hi

    offsets = np.concatenate([[0], np.cumsum([c for _n, c, _l, _h in stats])])

    @ray.remote
    def assign(block: pa.Table, char_offset: int) -> pa.Table:
        schema = pa.schema([("doc_id", pa.int64()), ("shard", pa.int64())])
        if block.num_rows == 0:
            return schema.empty_table()
        chars = block["sum(n_chunk_chars)"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cum0 = char_offset + np.cumsum(chars) - chars
        return pa.table(
            {
                "doc_id": pc.cast(block["doc_id"], pa.int64()),
                "shard": pa.array(cum0 // target_chars, pa.int64()),
            },
            schema=schema,
        )

    refs = [
        assign.remote(r, int(offsets[i])) for i, r in enumerate(block_refs)
    ]
    return ray.data.from_arrow_refs(refs), int(offsets[-1])


def write_training_shards(
    sf_dir: str, out_dir: str, target_chars: int = TARGET_SHARD_CHARS
) -> dict:
    """clean_chunks → size-targeted, resumable shard export + manifest.

    Output layout::

        out_dir/shards/shard=K/*.parquet   (doc_id, chunk_id, chunk,
                                            n_chunk_chars, n_tokens,
                                            shard_id)
        out_dir/manifest.json              writer config + per-shard rows

    Crash-safe the same way as build_vector_index: everything lands under
    ``out_dir + '.tmp'`` and a single rename commits; a torn export never
    looks like a finished one.  Each shard is its own directory, so a
    higher-level retry loop can diff manifest rows against existing
    ``shard=K`` dirs and re-export only the missing ones."""
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from .ops_text import clean_chunks
    from .util import drop_empty_blocks, join_partitions

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(tmp)

    # one chunking pass, checkpointed (two consumers: doc totals + the
    # shard join) — same pass-once pattern as clean_chunks' own gate
    chunks = (
        clean_chunks(sf_dir)
        .map_batches(_chunk_features, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    doc_shards, total_chars = _assign_doc_shards(chunks, target_chars)

    sharded = drop_empty_blocks(
        chunks.join(
            doc_shards,
            join_type="inner",
            num_partitions=join_partitions(chunks, doc_shards),
            on=("doc_id",),
            right_on=("doc_id",),
        ),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_id", pa.int64()),
                ("chunk", pa.string()),
                ("n_chunk_chars", pa.int64()),
                ("n_tokens", pa.int64()),
                ("h31", pa.int64()),
                ("shard", pa.int64()),
            ]
        ),
    )
    # duplicate the partition value in-file (hive writers drop partition
    # columns from row data; consumers want it without path parsing)
    sharded = sharded.map_batches(
        lambda t: t.append_column("shard_id", t["shard"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # two consumers: the write and the manifest aggregate

    sharded.drop_columns(["h31"]).write_parquet(
        os.path.join(tmp, "shards"), partition_cols=["shard"]
    )

    # ---- manifest: per-shard aggregates (bounded: one row per shard) -------
    _PART = pa.schema(
        [
            ("shard", pa.int64()),
            ("doc_lo", pa.int64()),
            ("doc_hi", pa.int64()),
            ("n_chunks", pa.int64()),
            ("n_chars", pa.int64()),
            ("n_tokens", pa.int64()),
            ("sig", pa.int64()),
        ]
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PART.empty_table()
        g = (
            pa.table(
                {
                    "shard": t["shard"],
                    "doc_lo": t["doc_id"],
                    "doc_hi": t["doc_id"],
                    "n_chunks": pa.array(np.ones(t.num_rows, np.int64)),
                    "n_chars": t["n_chunk_chars"],
                    "n_tokens": t["n_tokens"],
                    "sig": t["h31"],
                }
            )
            .group_by("shard")
            .aggregate(
                [
                    ("doc_lo", "min"),
                    ("doc_hi", "max"),
                    ("n_chunks", "sum"),
                    ("n_chars", "sum"),
                    ("n_tokens", "sum"),
                    ("sig", "sum"),
                ]
            )
        )
        return g.rename_columns(
            ["shard", "doc_lo", "doc_hi", "n_chunks", "n_chars", "n_tokens", "sig"]
        )

    agg = (
        sharded.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .aggregate(
            Min("doc_lo"), Max("doc_hi"), Sum("n_chunks"), Sum("n_chars"),
            Sum("n_tokens"), Sum("sig"),
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: int(r["shard"]))  # ≤ #shards
    manifest_rows = [
        {
            "shard": int(r["shard"]),
            "doc_lo": int(r["min(doc_lo)"]),
            "doc_hi": int(r["max(doc_hi)"]),
            "n_chunks": int(r["sum(n_chunks)"]),
            "n_chars": int(r["sum(n_chars)"]),
            "n_tokens": int(r["sum(n_tokens)"]),
            "content_sig": int(r["sum(sig)"]) % dd.P31,
        }
        for r in rows
    ]
    manifest = {
        "input": sf_dir,
        "target_chars": target_chars,
        "total_chars": total_chars,
        "n_shards": len(manifest_rows),
        "shards": manifest_rows,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, out_dir)
    return manifest


def _manifest_sql(target_chars: int = TARGET_SHARD_CHARS) -> str:
    """DuckDB twin: replay clean_chunks, the doc-order prefix-sum shard
    rule and the per-shard aggregates (token counts via the shared
    tokenizer SQL, content signature via md5-int60 mod P31)."""
    from .ops import ORACLE_SQL

    chunks_sql = ORACLE_SQL["clean_chunks"]
    h60 = dd.SQL_H60.format(s="c.chunk")
    toks = SQL_TOKENIZE.format(col="c.chunk")
    return f"""
    WITH chunks AS ({chunks_sql}),
    doc_tot AS (
      SELECT doc_id, sum(n_chunk_chars)::BIGINT AS chars
      FROM chunks GROUP BY 1
    ),
    pre AS (
      SELECT doc_id, chars,
             COALESCE(sum(chars) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0)::BIGINT AS cum0
      FROM doc_tot
    ),
    asg AS (SELECT doc_id, cum0 // {target_chars} AS shard FROM pre),
    per AS (
      SELECT a.shard, c.doc_id, c.n_chunk_chars,
             len({toks})::BIGINT AS n_tokens,
             ({h60}) % {dd.P31} AS h31
      FROM chunks c JOIN asg a USING (doc_id)
    )
    SELECT shard, min(doc_id) AS doc_lo, max(doc_id) AS doc_hi,
           count(*)::BIGINT AS n_chunks,
           sum(n_chunk_chars)::BIGINT AS n_chars,
           sum(n_tokens)::BIGINT AS n_tokens,
           CAST(sum(h31) % {dd.P31} AS BIGINT) AS content_sig
    FROM per GROUP BY shard
    """


_SHARDS_CACHE: dict[str, str] = {}


def shards_for(sf_dir: str, target_chars: int = TARGET_SHARD_CHARS) -> str:
    """Export (or reuse) the training shards for a testdata dir — the same
    amortization shape as ops._index_for, salted with a source fingerprint
    so kernel edits invalidate stale /tmp exports."""
    key = f"{sf_dir}:{target_chars}"
    if key in _SHARDS_CACHE:
        return _SHARDS_CACHE[key]
    import inspect
    import sys

    from .ops import ORACLE_SQL

    src = inspect.getsource(sys.modules[__name__]) + ORACLE_SQL["clean_chunks"]
    tag = hashlib.sha256(f"{key}:{src}".encode()).hexdigest()[:10]
    out = os.path.join(tempfile.gettempdir(), f"sharesci_shards_{tag}")
    if not os.path.exists(os.path.join(out, "manifest.json")):
        write_training_shards(sf_dir, out, target_chars)
    _SHARDS_CACHE[key] = out
    return out


@op("training_shard_manifest", _manifest_sql)
def training_shard_manifest(sf_dir: str):
    """Registry surface for the shard export: runs write_training_shards
    (cached per corpus) and returns the persisted manifest rows — doc-id
    range, chunk/char/token counts and content signature per shard — which
    the DuckDB twin recomputes from the documents table end-to-end.  A
    green row means the WHOLE export chain (clean → dedup → chunk → shard
    assignment → write) produced exactly the right bytes-worth of data in
    exactly the right shard."""
    with open(os.path.join(shards_for(sf_dir), "manifest.json")) as f:
        manifest = json.load(f)
    rows = manifest["shards"]
    return pa.table(
        {
            name: pa.array([r[name] for r in rows], pa.int64())
            for name in _MANIFEST_SCHEMA.names
        },
        schema=_MANIFEST_SCHEMA,
    )
