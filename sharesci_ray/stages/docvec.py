"""Stages 00-02: fingerprint → deterministic doc ids → per-doc term vectors.

SURVEY.md §3.1 stages 00/01/02 (ref: n/a, §0 — reference checkout empty;
contract BASELINE.json:15: per-row content sha256 invariant; M1/M2/M3/M4/M9).

Scale notes
-----------
* ``add_fingerprint`` is a stateless ``map_batches`` over zero-copy Arrow.
* Doc-id assignment is the one place the Dataset API can't express the
  semantics (a global dense index over a sorted dataset), so we drop to raw
  block refs: sort (range-shuffle, happens once), read per-block row counts
  (cheap metadata-sized tasks), prefix-sum ON THE DRIVER (one int per block),
  then attach ``doc_id = offset + arange(n)`` per block.  No data is pulled to
  the driver, only counts; this is exactly a distributed prefix-sum.
* Sort keys include the content sha as final tie-break so duplicate
  (repo,path,commit) rows still get deterministic, resume-stable doc ids.
* Term-vector extraction tokenizes ONCE per document (pure pyarrow RE2
  kernels + one Arrow hash-aggregation per batch) and drops ``content``
  immediately after (wide-record hygiene, M6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import sha256_column
from ..functions.text import flat_tokens

SORT_KEYS = ["repo", "path", "commit", "content_sha256"]


def add_fingerprint(batch: pa.Table) -> pa.Table:
    """M1: append hex sha256 of content (the per-row invariant column)."""
    return batch.append_column("content_sha256", sha256_column(batch["content"]))


@ray.remote
def _block_num_rows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _attach_doc_ids(block: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + block.num_rows, dtype=np.int64))
    return block.append_column("doc_id", ids)


def assign_doc_ids(ds: ray.data.Dataset, base: int = 0) -> ray.data.Dataset:
    """M9: dense deterministic int64 doc ids via sort + distributed prefix-sum.

    ``base`` offsets the id space — incremental updates assign the delta
    corpus ids starting at the existing doc count (append semantics)."""
    sorted_ds = ds.sort(SORT_KEYS).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + base if counts else []
    out = [_attach_doc_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


def to_term_vectors(batch: pa.Table, tokenizer=flat_tokens) -> pa.Table:
    """M2/M3/M4 (doc-level): content → sorted (terms, tfs) lists + doc_len.

    Output schema: doc_id, repo, path, commit, lang, content_sha256,
    doc_len:int64, terms:list<string>, tfs:list<int32>.  ``content`` is
    dropped here (M6).  Terms within a doc are sorted ascending — the scorer
    and oracle both rely on deterministic order.

    ``tokenizer`` is the §2.11 hook: a vectorized callable
    ``(string column) -> (flat token array, row index per token)``; the
    default is the shared code-aware tokenizer (functions/text.py).
    """
    flat, parent = tokenizer(batch["content"])
    n_rows = batch.num_rows
    # per-(row, term) counts via Arrow hash aggregation (C++, vectorized)
    pairs = pa.table(
        {"row": pa.array(parent, type=pa.int64()), "term": flat}
    ).group_by(["row", "term"]).aggregate([([], "count_all")])
    # sort by (row, term) so each doc's term list is sorted
    pairs = pairs.sort_by([("row", "ascending"), ("term", "ascending")])
    rows = pairs["row"].to_numpy(zero_copy_only=False)
    counts = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(counts, rows + 1, 1)
    offsets = np.cumsum(counts)
    terms_col = pairs["term"].combine_chunks() if isinstance(pairs["term"], pa.ChunkedArray) else pairs["term"]
    tfs_flat = pc.cast(pairs["count_all"], pa.int32())
    tfs_flat = tfs_flat.combine_chunks() if isinstance(tfs_flat, pa.ChunkedArray) else tfs_flat
    off32 = pa.array(offsets, type=pa.int32())  # batches are << 2^31 tokens
    terms_list = pa.ListArray.from_arrays(off32, terms_col)
    tfs_list = pa.ListArray.from_arrays(off32, tfs_flat)
    # doc_len = total token occurrences per row (sum of tfs)
    doc_len = np.zeros(n_rows, dtype=np.int64)
    np.add.at(doc_len, parent, 1)
    out = {
        "doc_id": batch["doc_id"],
        "repo": batch["repo"],
        "path": batch["path"],
        "commit": batch["commit"],
        "lang": batch["lang"],
        "content_sha256": batch["content_sha256"],
        "doc_len": pa.array(doc_len),
        "terms": terms_list,
        "tfs": tfs_list,
    }
    return pa.table(out)


def explode_postings(batch: pa.Table) -> pa.Table:
    """M4: term-vector rows → postings rows (term, doc_id, tf, dl).

    Pure Arrow flatten — no Python per row.  ``dl`` (doc length) is carried
    with every posting so segments are self-contained at query time (no
    global doc-length broadcast needed at 10^12-doc scale; costs ~1 byte per
    posting after varbyte).
    """
    terms = batch["terms"].combine_chunks() if isinstance(batch["terms"], pa.ChunkedArray) else batch["terms"]
    flat_terms = pc.list_flatten(terms)
    parent = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
    dls = batch["doc_len"].to_numpy(zero_copy_only=False)[parent]
    tfs = pc.list_flatten(batch["tfs"])
    return pa.table(
        {
            "term": flat_terms,
            "doc_id": pa.array(doc_ids),
            "tf": tfs,
            "dl": pa.array(dls.astype(np.int32)),
        }
    )
