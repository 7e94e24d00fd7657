"""Training-shard export (export.py): shard round-trip vs the chunk
stream, manifest consistency with parquet footer metadata, contiguous
doc-range shards, crash-safe commit, and the streaming_split consumption
path.  Oracle parity for training_shard_manifest is covered generically
by test_driver_parity."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _export(tmp_path_factory):
    from sharesci_ray.pipelines.export import write_training_shards

    out = str(tmp_path_factory.mktemp("shards")) + "/exp"
    manifest = write_training_shards(SF, out, target_chars=40_000)
    return out, manifest


def test_shards_roundtrip_equal_chunk_stream(ray_session, tmp_path_factory):
    """Reading every shard file back yields EXACTLY the clean_chunks rows
    (no loss, no duplication), and each doc's chunks live in one shard."""
    from sharesci_ray.pipelines.ops_text import clean_chunks

    out, manifest = _export(tmp_path_factory)
    files = sorted(glob.glob(os.path.join(out, "shards", "**", "*.parquet"),
                             recursive=True))
    back = pa.concat_tables(pq.read_table(f) for f in files)
    chunks = clean_chunks(SF).to_pandas()

    b = back.to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    c = chunks.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert len(b) == len(c) == sum(r["n_chunks"] for r in manifest["shards"])
    assert (b["doc_id"].values == c["doc_id"].values).all()
    assert (b["chunk_id"].values == c["chunk_id"].values).all()
    assert (b["chunk"].values == c["chunk"].values).all()

    # one shard per doc, and shards are contiguous non-overlapping ranges
    per_doc = b.groupby("doc_id")["shard_id"].nunique()
    assert (per_doc == 1).all()
    rows = manifest["shards"]
    for prev, cur in zip(rows, rows[1:]):
        assert prev["doc_hi"] < cur["doc_lo"]


def test_manifest_matches_parquet_footers(ray_session, tmp_path_factory):
    """Per-shard manifest row counts equal the parquet footer row counts of
    that shard's files, and sizes stay near the char target."""
    out, manifest = _export(tmp_path_factory)
    for row in manifest["shards"]:
        files = glob.glob(
            os.path.join(out, "shards", f"shard={row['shard']}", "*.parquet")
        )
        footer_rows = sum(pq.read_metadata(f).num_rows for f in files)
        assert footer_rows == row["n_chunks"], row
    # size targeting: every shard except the last sits within one document's
    # chars of the target (the prefix rule can under/overshoot a boundary by
    # at most the boundary doc)
    sizes = [r["n_chars"] for r in manifest["shards"]]
    assert sum(sizes) == manifest["total_chars"]
    max_doc = max(
        r["n_chars"] / max(r["doc_hi"] - r["doc_lo"], 1)
        for r in manifest["shards"]
    ) * 4  # loose per-doc bound from shard averages
    assert all(abs(s - 40_000) <= max_doc for s in sizes[:-1]), sizes


def test_streaming_split_consumption(ray_session, tmp_path_factory):
    """The dataloader path: read the shard dir, streaming_split(2), consume
    both splits concurrently, total rows match the manifest."""
    import threading

    import ray.data

    out, manifest = _export(tmp_path_factory)
    ds = ray.data.read_parquet(os.path.join(out, "shards"))
    splits = ds.streaming_split(2, equal=False)
    counts = [0, 0]

    def consume(i):
        for batch in splits[i].iter_batches(batch_format="pyarrow"):
            counts[i] += batch.num_rows

    threads = [threading.Thread(target=consume, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sum(counts) == sum(r["n_chunks"] for r in manifest["shards"])
    assert min(counts) > 0  # both consumers actually got data


def test_export_commit_is_atomic(ray_session, tmp_path_factory):
    """A pre-existing debris dir (torn export) is replaced; the committed
    dir always has manifest.json + every shard dir the manifest names."""
    from sharesci_ray.pipelines.export import write_training_shards

    out = str(tmp_path_factory.mktemp("shards_atomic")) + "/exp"
    os.makedirs(out + ".tmp/shards/shard=99", exist_ok=True)  # torn debris
    manifest = write_training_shards(SF, out, target_chars=40_000)
    assert not os.path.exists(out + ".tmp")
    assert json.load(open(os.path.join(out, "manifest.json")))["n_shards"] == len(
        manifest["shards"]
    )
    for row in manifest["shards"]:
        assert os.path.isdir(os.path.join(out, "shards", f"shard={row['shard']}"))
    assert not os.path.isdir(os.path.join(out, "shards", "shard=99"))
