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

Pixel/sample payloads derive from a CLOSED-FORM integer formula of
(media_id, element index) — fully deterministic per id AND expressible in
one line of SQL, so the driver's oracle can recompute not just dimensions
but pixel sums / audio energy from the id formula while the engine must
actually parse bytes (synth→binary→decode→aggregate roundtrip):

  payload_value(seed, i) = (seed·2654435761 + i·40503 + 12345) mod M
  image/video:  M = 256 (uint8 pixels), seed = media_id (+7 for video)
  audio:        M = 65536, minus 32768 (int16 samples), seed = media_id+99

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


# closed-form payload formula constants (module docstring; mirrored in the
# oracle SQL of ops_media.py — keep in sync)
PAYLOAD_A = 2654435761
PAYLOAD_B = 40503
PAYLOAD_C = 12345


def payload_values(seed: int, n: int, mod: int) -> np.ndarray:
    """The SQL-twin payload formula: (seed·A + i·B + C) mod ``mod``."""
    i = np.arange(n, dtype=np.int64)
    return (seed * PAYLOAD_A + i * PAYLOAD_B + PAYLOAD_C) % mod


def synth_image_blob(media_id: int) -> bytes:
    w, h, c = synth_dims(media_id)
    px = payload_values(media_id, w * h * c, 256).astype(np.uint8)
    return _IMG_HDR.pack(MAGIC_IMG, w, h, c) + px.tobytes()


def synth_video_blob(media_id: int) -> bytes:
    w, h, c = synth_dims(media_id)
    n = synth_n_frames(media_id)
    px = payload_values(media_id + 7, n * w * h * c, 256).astype(np.uint8)
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
    samples = (payload_values(media_id + 99, n, 65536) - 32768).astype(np.int16)
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
