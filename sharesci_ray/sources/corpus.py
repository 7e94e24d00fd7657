"""Corpus sources / adapters (SURVEY.md §2.1 S1-S3).

The engine's native input is a Parquet table (repo, path, commit, lang,
content) — BASELINE.json:15.  The driver's testdata ``documents`` table
(doc_id, text, lang, source, n_chars) is adapted to that shape here
(FIXTURES.md A1 adapter).  All reads prune columns at the source.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(paths: str | list[str], **kwargs) -> ray.data.Dataset:
    """S1: read a native corpus Parquet table with column pruning."""
    return ray.data.read_parquet(paths, columns=CORPUS_COLUMNS, **kwargs)


def read_corpus_any(path: str | list[str], **kwargs) -> ray.data.Dataset:
    """S1 variant: corpus ingest from Parquet, JSON-lines or CSV, detected
    by file extension.  Parquet stays the fast path (column pruning at the
    read); the text formats are row-major, so the projection to
    CORPUS_COLUMNS happens in the first map instead, and every column is
    normalized to string (CSV readers infer ints for numeric-looking
    commits/paths, JSON readers can emit nulls for missing keys — both
    would poison the docvec sort keys downstream)."""
    first = path[0] if isinstance(path, list) else path
    if first.endswith((".json", ".jsonl")):
        ds = ray.data.read_json(path, **kwargs)
    elif first.endswith(".csv"):
        ds = ray.data.read_csv(path, **kwargs)
    else:
        return read_corpus(path, **kwargs)

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: pc.fill_null(pc.cast(t[c], pa.string()), "")
                for c in CORPUS_COLUMNS
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None, **kwargs) -> ray.data.Dataset:
    """S2: read one driver testdata table."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )


def _documents_to_corpus_batch(batch: pa.Table) -> pa.Table:
    # repo constant + zero-padded numeric id as path: the engine assigns doc
    # ids by STRING sort of (repo, path, ...), so this makes engine-id order
    # == numeric doc_id order.  With repo:=source and path:=str(id), a
    # score TIE between docs from different sources broke toward source
    # order while the DuckDB oracle breaks toward numeric doc_id — wrong
    # top-k rows whenever a tie group straddles the rank cut.
    padded = pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 12, "0")
    return pa.table(
        {
            "repo": pa.array(["d"] * batch.num_rows, pa.string()),
            "path": padded,
            "commit": pa.array(["t0"] * batch.num_rows, pa.string()),
            "lang": batch["lang"],
            "content": batch["text"],
        }
    )


def documents_as_corpus(sf_dir: str, num_blocks: int | None = None) -> ray.data.Dataset:
    """Adapter: testdata documents table → native corpus shape (streaming).

    The testdata files are single-row-group parquet, which Ray can't split
    below one block — so this adapter (and ONLY this sandbox adapter; a real
    corpus has thousands of files and must not be repartitioned) splits to
    ``num_blocks`` (default 2× cluster CPUs) so downstream map_batches
    stages actually parallelize.
    """
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    if num_blocks is None:
        try:
            import ray as _ray

            num_blocks = 2 * int(_ray.cluster_resources().get("CPU", 8))
        except Exception:
            num_blocks = 16
    ds = ds.repartition(num_blocks)
    return ds.map_batches(_documents_to_corpus_batch, batch_format="pyarrow", zero_copy_batch=True)


def corpus_from_table(table: pa.Table, parallelism: int = -1) -> ray.data.Dataset:
    """Wrap an in-memory corpus table (tests / synthetic benches).
    ``parallelism > 0`` splits into that many blocks (from_arrow yields ONE
    block, which would serialize every downstream map stage)."""
    ds = ray.data.from_arrow(table)
    if parallelism and parallelism > 0:
        ds = ds.repartition(parallelism)
    return ds


def read_queries(path: str) -> ray.data.Dataset:
    """S3: read a (query_id:int64, text:string) query set from JSON-lines or
    Parquet (by extension).  Query sets are tiny — they broadcast to the
    scorer pool, they are never the wide side of anything."""
    if path.endswith(".json") or path.endswith(".jsonl"):
        ds = ray.data.read_json(path)
    else:
        ds = ray.data.read_parquet(path, columns=["query_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": pc.cast(t["query_id"], pa.int64()),
                "text": pc.cast(t["text"], pa.string()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
