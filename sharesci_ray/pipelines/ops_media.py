"""Multimodal operators: binary media columns through actor-pool stages
(task brief; ref: n/a — SURVEY.md §0).

The media "table" is synthesized deterministically from the documents
table's doc_ids (functions/media.py FIMG/FVID formats) — the brief mandates
no external data.  The *decode stages must parse actual bytes*; the oracle
recomputes only what is id-derivable (dimensions, frame counts) from the
synth formula in SQL, which checks the synth→binary→decode roundtrip.
Pixel statistics are not SQL-expressible → those ops are rows-only checked
by the driver and value-checked in tests/test_media_ops.py.

Scale shape: blobs ride the object store as Arrow binary columns;
decode stages run as actor pools (state: codec tables in ``__init__``)
with SMALL batch_size (64) so batch × concurrency payload stays bounded —
the pattern for real images where one batch can be hundreds of MB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import media as md
from ..sources.corpus import read_table
from .ops import op

_N_MEDIA = 200  # first N doc_ids become media rows
_MEDIA_BATCH = 64

# SQL twins of the closed-form payload formula (functions/media.py
# payload_values): pixel/sample value at flat index expressed over a doc_id
# column ``d.doc_id`` and an index expression — lets the oracle recompute
# PIXEL SUMS / AUDIO ENERGY from the id formula while the engine must parse
# the actual blob bytes.
_W = "(8 + d.doc_id % 9)"
_H = "(6 + d.doc_id % 7)"


def _px_sql(seed_expr: str, idx_expr: str, mod: int) -> str:
    return (
        f"(({seed_expr}) * {md.PAYLOAD_A} + ({idx_expr}) * {md.PAYLOAD_B} "
        f"+ {md.PAYLOAD_C}) % {mod}"
    )


def media_dataset(sf_dir: str, kind: str = "image"):
    """documents.doc_id → (media_id, media_type, blob) binary-column Dataset.

    Stands in for `read_parquet` over a real media table; blob synthesis is
    itself a stateless map_batches so blobs are born distributed — never on
    the driver.
    """
    ids = read_table(sf_dir, "documents", columns=["doc_id"])

    makers = {
        "image": md.synth_image_blob,
        "video": md.synth_video_blob,
        "audio": md.synth_audio_blob,
    }

    def synth(batch: pa.Table) -> pa.Table:
        keep = [d for d in batch["doc_id"].to_pylist() if d < _N_MEDIA]
        make = makers[kind]
        return pa.table(
            {
                "media_id": pa.array(keep, pa.int64()),
                "media_type": pa.array([kind] * len(keep), pa.string()),
                "blob": pa.array([make(d) for d in keep], pa.binary()),
            }
        )

    return ids.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


class ImageDecoder:
    """Actor-pool decode stage: state (codec dispatch table) built once per
    actor in __init__, per-batch work parses every blob's real bytes."""

    def __init__(self) -> None:
        self.codecs = {b"FIMG": md.decode_image}  # real formats would register here

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, cs, sums, npx = [], [], [], [], []
        for blob in batch["blob"].to_pylist():
            w, h, c, px = self.codecs[blob[:4]](blob)
            ws.append(w)
            hs.append(h)
            cs.append(c)
            sums.append(int(px.sum(dtype=np.int64)))
            npx.append(w * h * c)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "channels": pa.array(cs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "n_px": pa.array(npx, pa.int64()),
            }
        )


def _decoded(sf_dir: str):
    return media_dataset(sf_dir, "image").map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=_MEDIA_BATCH,
        concurrency=(1, 4),
        num_cpus=1,
    )


@op(
    "media_decode_meta",
    f"""
    SELECT doc_id AS media_id,
           8 + doc_id % 9 AS width,
           6 + doc_id % 7 AS height,
           3 AS channels
    FROM documents WHERE doc_id < {_N_MEDIA}
    """,
)
def media_decode_meta(sf_dir: str):
    """Decode stage roundtrip: dimensions parsed from blob BYTES must equal
    the id-formula the oracle computes (synth→decode integrity)."""
    dec = _decoded(sf_dir)
    return dec.select_columns(["media_id", "width", "height", "channels"])


@op(
    "media_image_features",
    f"""
    SELECT media_id, px_sum, n_px, px_sum::DOUBLE / n_px AS mean_px FROM (
      SELECT d.doc_id AS media_id,
             sum({_px_sql('d.doc_id', 'r.i', 256)})::BIGINT AS px_sum,
             count(*)::BIGINT AS n_px
      FROM documents d JOIN range(0, 16 * 12 * 3) r(i)
        ON r.i < {_W} * {_H} * 3
      WHERE d.doc_id < {_N_MEDIA}
      GROUP BY d.doc_id
    )
    """,
)
def media_image_features(sf_dir: str):
    """Feature extraction over decoded pixels (int sums; mean = one int/int
    division).  The oracle recomputes the pixel sums from the closed-form
    payload formula — the engine must parse the blob bytes to match."""
    dec = _decoded(sf_dir)

    def feat(t: pa.Table) -> pa.Table:
        s = t["px_sum"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n_px"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "media_id": t["media_id"],
                "px_sum": t["px_sum"],
                "n_px": t["n_px"],
                "mean_px": pa.array(s / n, pa.float64()),
            }
        )

    return dec.map_batches(feat, batch_format="pyarrow", zero_copy_batch=True)


class ImageResizer:
    """Actor-pool resize stage (nearest-neighbor, pure numpy — the PIL path
    is stubbed in functions/media.py:decode_real_image)."""

    def __init__(self, out_w: int = 4, out_h: int = 4) -> None:
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        sums = []
        for blob in batch["blob"].to_pylist():
            _w, _h, _c, px = md.decode_image(blob)
            r = md.resize_nearest(px, self.out_w, self.out_h)
            sums.append(int(r.sum(dtype=np.int64)))
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "out_w": pa.array([self.out_w] * n, pa.int64()),
                "out_h": pa.array([self.out_h] * n, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
            }
        )


_RESIZE_IDX = f"(((y.i * {_H}) // 4) * {_W} + ((x.i * {_W}) // 4)) * 3 + ch.i"


@op(
    "media_resize",
    f"""
    SELECT d.doc_id AS media_id,
           CAST(4 AS BIGINT) AS out_w, CAST(4 AS BIGINT) AS out_h,
           sum({_px_sql('d.doc_id', _RESIZE_IDX, 256)})::BIGINT AS px_sum
    FROM documents d, range(0, 4) y(i), range(0, 4) x(i), range(0, 3) ch(i)
    WHERE d.doc_id < {_N_MEDIA}
    GROUP BY d.doc_id
    """,
)
def media_resize(sf_dir: str):
    """Nearest-neighbor 4×4 resize: the oracle replays the gather indices
    (yi = y·h//4, xi = x·w//4) and the payload formula in SQL; the engine
    decodes real bytes and gathers with numpy."""
    return media_dataset(sf_dir, "image").map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": 4, "out_h": 4},
        batch_format="pyarrow",
        batch_size=_MEDIA_BATCH,
        concurrency=(1, 4),
        num_cpus=1,
    )


class AudioFeatures:
    """Actor-pool audio stage: parse FAUD bytes → integer energy features.
    Real codecs (mp3/wav via soundfile etc.) are not in this container —
    the blob plumbing and actor signature are identical."""

    def __init__(self) -> None:
        self.codecs = {b"FAUD": md.decode_audio}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ns, rates, energy, peak = [], [], [], []
        for blob in batch["blob"].to_pylist():
            n, rate, samples = self.codecs[blob[:4]](blob)
            e, p = md.audio_features(samples)
            ns.append(n)
            rates.append(rate)
            energy.append(e)
            peak.append(p)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "abs_energy": pa.array(energy, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
            }
        )


@op(
    "media_audio_features",
    f"""
    SELECT doc_id AS media_id,
           1000 + (doc_id % 7) * 500 AS n_samples,
           8000 AS sample_rate
    FROM documents WHERE doc_id < {_N_MEDIA}
    """,
)
def media_audio_features(sf_dir: str):
    """Audio decode roundtrip: n_samples/rate parsed from FAUD bytes must
    match the id formula (oracle); energy/peak values are pytest-checked
    (not SQL-expressible)."""
    feats = media_dataset(sf_dir, "audio").map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=_MEDIA_BATCH,
        concurrency=(1, 4),
        num_cpus=1,
    )
    return feats.select_columns(["media_id", "n_samples", "sample_rate"])


@op(
    "media_audio_energy",
    f"""
    SELECT d.doc_id AS media_id,
           (1000 + (d.doc_id % 7) * 500)::BIGINT AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           sum(abs({_px_sql('d.doc_id + 99', 'r.i', 65536)} - 32768))::BIGINT
             AS abs_energy,
           max(abs({_px_sql('d.doc_id + 99', 'r.i', 65536)} - 32768))::BIGINT
             AS peak
    FROM documents d JOIN range(0, 4000) r(i)
      ON r.i < 1000 + (d.doc_id % 7) * 500
    WHERE d.doc_id < {_N_MEDIA}
    GROUP BY d.doc_id
    """,
)
def media_audio_energy(sf_dir: str):
    """Integer audio energy features; oracle replays the int16 sample
    formula in SQL, engine parses FAUD bytes."""
    return media_dataset(sf_dir, "audio").map_batches(
        AudioFeatures,
        batch_format="pyarrow",
        batch_size=_MEDIA_BATCH,
        concurrency=(1, 4),
        num_cpus=1,
    )


@op(
    "media_frame_sample",
    f"""
    SELECT doc_id AS media_id, CAST(f.i AS BIGINT) AS frame_idx
    FROM documents, range(0, 9, 2) f(i)
    WHERE doc_id < {_N_MEDIA} AND f.i < 4 + doc_id % 5
    """,
)
def media_frame_sample(sf_dir: str):
    """Video frame sampling (every 2nd frame): the engine parses FVID bytes
    for the true frame count; the oracle recomputes it from the id formula."""
    vids = media_dataset(sf_dir, "video")

    def sample(batch: pa.Table) -> pa.Table:
        mids, fidx = [], []
        for mid, blob in zip(
            batch["media_id"].to_pylist(), batch["blob"].to_pylist()
        ):
            idx, _sums = md.sample_frames(blob, stride=2)
            mids.extend([mid] * idx.size)
            fidx.extend(idx.tolist())
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
            }
        )

    return vids.map_batches(
        sample, batch_format="pyarrow", batch_size=_MEDIA_BATCH
    )
