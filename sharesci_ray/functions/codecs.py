"""Posting-list compression kernels: delta + varbyte (LEB128) + block layout.

Pure numpy, vectorized — no Python-per-int loops.  These are the C1/C2/C3
kernels of SURVEY.md §2.8 (ref: n/a, see SURVEY.md §0 — the reference checkout
is empty; algorithms from Zobel & Moffat, ACM Comp. Surv. 2006 and Ding & Suel,
SIGIR 2011).

Encoding layout for one posting list (one term):
  - ``docids``: strictly ascending int64 doc ids → delta-gaps (first value kept
    as-is) → LEB128 varbyte bytes.
  - ``tfs`` / ``dls``: parallel positive int arrays → LEB128 varbyte bytes
    (no delta; tf/dl are small and not monotone).
  - blocks of ``block_size`` postings (default 128): per block we keep the
    first doc id (skip pointer) and the max of an arbitrary float "score bound"
    column (block-max WAND upper bounds).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def varbyte_encode_with_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a non-negative int array. Vectorized.

    Returns (uint8 byte array, per-value byte lengths) — the lengths let a
    caller split one big encoded buffer into per-term slices without
    re-encoding (used by the bucket encoder).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    # number of 7-bit groups per value (>=1); bit_length via log2 is unsafe for
    # > 2^53, so use a shift loop (<=10 iterations, vectorized inside)
    nbytes = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while np.any(tmp > 0):
        nbytes[tmp > 0] += 1
        tmp = tmp >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    maxb = int(nbytes.max())
    for i in range(maxb):
        sel = nbytes > i  # values that have an i-th byte
        pos = starts[sel] + i
        byte = ((v[sel] >> np.uint64(7 * i)) & _MASK7).astype(np.uint8)
        cont = (nbytes[sel] - 1 > i).astype(np.uint8) * _CONT
        out[pos] = byte | cont
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array → bytes (see
    :func:`varbyte_encode_with_lengths`)."""
    out, _ = varbyte_encode_with_lengths(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array. Vectorized via reduceat, with
    near-memcpy fast paths for the dominant all-1-byte (tf) and pure-2-byte
    streams — these carry most query-time decode volume."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = b & _CONT
    if not cont.any():  # every value fits 7 bits
        return b.astype(np.uint64)
    if b.size % 2 == 0:
        pairs = cont.reshape(-1, 2)
        if pairs[:, 0].all() and not pairs[:, 1].any():  # uniform 2-byte values
            lo = b[0::2] & np.uint8(0x7F)
            return lo.astype(np.uint64) | (b[1::2].astype(np.uint64) << np.uint64(7))
    contb = cont != 0
    if not (contb[:-1] & contb[1:]).any():  # mixed 1/2-byte stream (doc gaps)
        term_pos = np.flatnonzero(~contb)
        has_prev = np.zeros(term_pos.size, dtype=bool)
        has_prev[term_pos > 0] = contb[term_pos[term_pos > 0] - 1]
        vals = b[term_pos].astype(np.uint64)
        prev = np.where(term_pos > 0, b[term_pos - 1], 0).astype(np.uint64)
        two = (vals << np.uint64(7)) | (prev & np.uint64(0x7F))
        return np.where(has_prev, two, vals)
    is_last = (b & _CONT) == 0
    # group id for each byte: 0-based index of the value it belongs to
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(is_last[:-1])
    n_vals = int(is_last.sum())
    starts = np.zeros(n_vals, dtype=np.int64)
    # value i starts right after terminator of value i-1
    term_pos = np.flatnonzero(is_last)
    starts[1:] = term_pos[:-1] + 1
    within = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-ascending int array → gaps (first element kept)."""
    v = np.asarray(sorted_vals, dtype=np.int64)
    if v.size == 0:
        return v.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out.astype(np.uint64)


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64).astype(np.int64)


def encode_postings(docids: np.ndarray, values: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted docids, parallel ints) → (docid bytes, value bytes)."""
    return varbyte_encode(delta_encode(docids)), varbyte_encode(values)


def decode_docids(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def decode_values(buf: bytes) -> np.ndarray:
    return varbyte_decode(buf).astype(np.int64)


def sublist_gather(
    flat: np.ndarray, off: np.ndarray, perm: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Gather variable-length segments ``flat[off[p] : off[p]+counts[p]]``
    for each p in ``perm``, concatenated — vectorized (repeat + arange),
    no per-segment Python.  Used to permute per-posting position lists
    alongside a posting sort."""
    counts_perm = counts[perm]
    total = int(counts_perm.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype)
    out_start = np.concatenate([[0], np.cumsum(counts_perm)])[:-1]
    base = np.repeat(off[perm], counts_perm)
    within = np.arange(total, dtype=np.int64) - np.repeat(out_start, counts_perm)
    return flat[base + within]


def delta_within_sublists(flat: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Delta-encode ascending values WITHIN each sublist (first element of
    every sublist kept absolute) — the positional-payload layout: one
    posting's token positions are ascending, across postings they reset."""
    d = np.asarray(flat, dtype=np.int64).copy()
    if d.size:
        d[1:] -= flat[:-1]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        starts = starts[np.asarray(counts) > 0]
        d[starts] = flat[starts]
    return d.astype(np.uint64)


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of delta_within_sublists∘varbyte: blob + per-posting counts
    → flat ascending-within-posting position array (int64)."""
    vals = varbyte_decode(buf).astype(np.int64)
    if vals.size == 0:
        return vals
    counts = np.asarray(counts, dtype=np.int64)
    out = np.cumsum(vals)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    # subtract each sublist's inherited prefix so its first value is absolute
    nz = counts > 0  # zero-count sublists would index past the end
    resets = np.zeros(counts.size, dtype=np.int64)
    resets[nz] = out[starts[nz]] - vals[starts[nz]]
    out -= np.repeat(resets, counts)
    return out


def block_layout(
    docids: np.ndarray, bounds: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Per ``block_size``-posting block: (first docid, max bound).

    ``bounds`` is a float array parallel to ``docids`` (e.g. the normalized
    BM25 term score of each posting); the per-block max is the block-max WAND
    upper bound (Ding & Suel, SIGIR 2011).
    """
    n = docids.size
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    starts = np.arange(0, n, block_size)
    first = np.asarray(docids, dtype=np.int64)[starts]
    bmax = np.maximum.reduceat(np.asarray(bounds, dtype=np.float64), starts)
    return first, bmax
