"""Multimodal (image/video) column kernels — task brief: treat media as
opaque ``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample as actor-pool map_batches stages.

The sandbox has no image/audio libraries, so real-format decode (JPEG/PNG)
is STUBBED: :func:`decode_real_image` raises ``NotImplementedError`` unless
PIL appears.  Everything Ray-side — schema, batch sizing, actor signature,
output layout — is REAL and exercised against a deterministic fake raster
format:

  FIMG blob:  b'FIMG' | u16 width | u16 height | u8 channels | pixels (w*h*c bytes)
  FVID blob:  b'FVID' | u16 n_frames | u16 width | u16 height | u8 channels | frames

Pixel payloads derive from ``numpy.random.RandomState(media_id)`` — fully
deterministic per id, so tests and the driver's oracle can recompute
dimensions from the id formula while the engine must actually parse bytes.

(ref: n/a — SURVEY.md §0; op required by the task brief, not BASELINE.json.)
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC_IMG = b"FIMG"
MAGIC_VID = b"FVID"
_IMG_HDR = struct.Struct("<4sHHB")
_VID_HDR = struct.Struct("<4sHHHB")


def synth_dims(media_id: int) -> tuple[int, int, int]:
    """Deterministic (width, height, channels) for a media id — the same
    formula the driver oracle uses in SQL (ops_media.py)."""
    return 8 + media_id % 9, 6 + media_id % 7, 3


def synth_n_frames(media_id: int) -> int:
    return 4 + media_id % 5


def synth_image_blob(media_id: int) -> bytes:
    w, h, c = synth_dims(media_id)
    px = np.random.RandomState(media_id % (2**31)).randint(
        0, 256, size=w * h * c, dtype=np.uint8
    )
    return _IMG_HDR.pack(MAGIC_IMG, w, h, c) + px.tobytes()


def synth_video_blob(media_id: int) -> bytes:
    w, h, c = synth_dims(media_id)
    n = synth_n_frames(media_id)
    px = np.random.RandomState((media_id + 7) % (2**31)).randint(
        0, 256, size=n * w * h * c, dtype=np.uint8
    )
    return _VID_HDR.pack(MAGIC_VID, n, w, h, c) + px.tobytes()


def decode_image(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    """FIMG blob → (width, height, channels, pixels[h, w, c] uint8)."""
    magic, w, h, c = _IMG_HDR.unpack_from(blob, 0)
    if magic != MAGIC_IMG:
        raise ValueError(f"not an FIMG blob (magic={magic!r})")
    px = np.frombuffer(blob, dtype=np.uint8, offset=_IMG_HDR.size, count=w * h * c)
    return w, h, c, px.reshape(h, w, c)


def decode_video(blob: bytes) -> tuple[int, int, int, int, np.ndarray]:
    """FVID blob → (n_frames, width, height, channels, frames[n, h, w, c])."""
    magic, n, w, h, c = _VID_HDR.unpack_from(blob, 0)
    if magic != MAGIC_VID:
        raise ValueError(f"not an FVID blob (magic={magic!r})")
    px = np.frombuffer(
        blob, dtype=np.uint8, offset=_VID_HDR.size, count=n * w * h * c
    )
    return n, w, h, c, px.reshape(n, h, w, c)


_AUD_HDR = struct.Struct("<4sIH")
MAGIC_AUD = b"FAUD"


def synth_audio_blob(media_id: int) -> bytes:
    n = 1000 + (media_id % 7) * 500
    rate = 8000
    samples = np.random.RandomState((media_id + 99) % (2**31)).randint(
        -32768, 32768, size=n, dtype=np.int16
    )
    return _AUD_HDR.pack(MAGIC_AUD, n, rate) + samples.tobytes()


def decode_audio(blob: bytes) -> tuple[int, int, np.ndarray]:
    """FAUD blob → (n_samples, sample_rate, int16 samples)."""
    magic, n, rate = _AUD_HDR.unpack_from(blob, 0)
    if magic != MAGIC_AUD:
        raise ValueError(f"not an FAUD blob (magic={magic!r})")
    samples = np.frombuffer(blob, dtype=np.int16, offset=_AUD_HDR.size, count=n)
    return n, rate, samples


def audio_features(samples: np.ndarray) -> tuple[int, int]:
    """(sum of |sample|, peak |sample|) — integer-exact energy features."""
    a = np.abs(samples.astype(np.int64))
    return int(a.sum()), int(a.max()) if a.size else 0


def decode_real_image(blob: bytes) -> np.ndarray:
    """Real-format (JPEG/PNG/...) decode — STUB: requires PIL, which this
    container does not ship.  The FIMG path above exercises the identical
    Ray plumbing (binary column → actor pool → typed metadata out)."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "real image decode needs PIL/pillow (not in this container); "
            "use the FIMG fake-raster path for plumbing tests"
        ) from e
    return np.asarray(Image.open(io.BytesIO(blob)))  # pragma: no cover


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) uint8 raster — pure numpy
    index gather, no image library needed; deterministic."""
    h, w = px.shape[0], px.shape[1]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return px[yi[:, None], xi[None, :], :]


def sample_frames(blob: bytes, stride: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """FVID blob → (sampled frame indices, per-frame pixel sums int64)."""
    n, w, h, c, frames = decode_video(blob)
    idx = np.arange(0, n, stride, dtype=np.int64)
    sums = frames[idx].reshape(idx.size, -1).sum(axis=1, dtype=np.int64)
    return idx, sums
