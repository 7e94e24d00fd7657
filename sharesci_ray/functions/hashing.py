"""Content hashing + near-dup sketch kernels (SURVEY.md M1/U2 + task brief:
exact dedup, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine).

Pure functions over Arrow/numpy batches; no Ray imports.  (ref: n/a,
SURVEY.md §0 — reference checkout empty; MinHash per Broder 1997, SimHash per
Charikar STOC 2002.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import tokenize

_MERSENNE = np.uint64((1 << 61) - 1)


def sha256_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Hex sha256 per row of a string column (M1 per-row invariant).

    hashlib releases the GIL per call; the loop is per-row but each call is
    C-speed over the row's buffer — this is the standard approach absent a
    vectorized sha kernel in pyarrow.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col:
        s = v.as_py()
        out.append(hashlib.sha256((s or "").encode("utf-8")).hexdigest())
    return pa.array(out, type=pa.string())


_POLY_BASE = np.uint64(1099511628211)
_MAX_POW = 1 << 16


def _poly_powers(n: int) -> np.ndarray:
    base = int(_POLY_BASE)
    mask = (1 << 64) - 1
    p, cur = np.empty(n, dtype=np.uint64), 1
    for i in range(n):  # python ints then mask → mod 2^64 without warnings
        p[i] = cur
        cur = (cur * base) & mask
    return p


_POWERS = _poly_powers(_MAX_POW)


def polyhash_column(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic (process-independent) 64-bit polynomial hash per string.

    Fully vectorized over the Arrow buffers: contribution of char c at
    distance d from the string end is c * BASE^d mod 2^64; per-string sums via
    ``np.add.reduceat``.  Used for term → bucket assignment — collisions only
    cost bucket imbalance, never correctness.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = col if pa.types.is_large_string(col.type) else pc.cast(col, pa.large_string())
    buf_off = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1, offset=8 * arr.offset)
    start, end = int(buf_off[0]), int(buf_off[-1])
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=end)[start:end].astype(np.uint64)
    offs = (buf_off - buf_off[0]).astype(np.int64)
    lens = np.diff(offs)
    # distance from string end per char: (end_of_my_string - 1 - my_index)
    char_idx = np.arange(data.size, dtype=np.int64)
    ends_per_char = np.repeat(offs[1:], lens)
    dist = (ends_per_char - 1 - char_idx) % _MAX_POW  # mod keeps >64k-char strings safe
    with np.errstate(over="ignore"):  # uint64 wraparound == mod 2^64, intended
        contrib = data * _POWERS[dist]
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if data.size:
        out[nonempty] = np.add.reduceat(contrib, offs[:-1][nonempty])
    # mix in length so "a" and "a\0"-style degeneracies differ
    return out ^ (lens.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def _hash_tokens_u64(tokens: pa.Array) -> np.ndarray:
    """Stable 64-bit hash per string token, vectorized-ish via bytes join.

    Uses blake2b(digest_size=8) per UNIQUE token (vocabulary-sized Python
    work); per-occurrence fan-out is one vectorized index_in + numpy gather
    (VERDICT r3 #8: no to_pylist / per-occurrence dict lookups).
    """
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    uniq = pc.unique(tokens)
    h_uniq = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(t.as_py().encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    idx = pc.index_in(tokens, value_set=uniq).to_numpy(zero_copy_only=False)
    return h_uniq[idx]


def token_hashes(text: str) -> np.ndarray:
    """64-bit stable hashes of a single doc's tokens."""
    toks = tokenize(text)
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in toks
        ],
        dtype=np.uint64,
    )


def shingle_hashes(token_hash_arr: np.ndarray, k: int = 3) -> np.ndarray:
    """k-gram shingle hashes from token hashes (rolling combine, vectorized)."""
    n = token_hash_arr.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        # single shingle of whatever we have
        h = np.uint64(1469598103934665603)
        with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
            for v in token_hash_arr:
                h = (h ^ v) * np.uint64(1099511628211)
        return np.array([h], dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(token_hash_arr, k)
    h = np.full(win.shape[0], 1469598103934665603, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        for j in range(k):
            h = (h ^ win[:, j]) * prime
    return h


_MERSENNE31 = np.uint64((1 << 31) - 1)


def minhash_signature(shingles: np.ndarray, num_perm: int = 128, seed: int = 7) -> np.ndarray:
    """MinHash signature via universal hashing (a*x+b) mod (2^31-1).

    31-bit prime keeps a*x < 2^62 — exact in uint64, no overflow.  Vectorized
    (num_perm, n_shingles) outer product; n is the per-doc shingle count.
    """
    rng = np.random.default_rng(seed)
    p = int(_MERSENNE31)
    a = rng.integers(1, p, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=num_perm, dtype=np.uint64)
    if shingles.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = (shingles % _MERSENNE31).astype(np.uint64)
    hx = (np.multiply.outer(a, x) + b[:, None]) % _MERSENNE31
    return hx.min(axis=1)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Fold a signature into ``bands`` band-hashes for LSH bucketing."""
    rows = sig.size // bands
    folded = sig[: bands * rows].reshape(bands, rows)
    h = np.full(bands, 1469598103934665603, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        for j in range(rows):
            h = (h ^ folded[:, j]) * prime
    return h


def simhash(token_hash_arr: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (Charikar 2002). Vectorized bit votes."""
    if token_hash_arr.size == 0:
        return 0
    bits = ((token_hash_arr[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = bits * 2 - 1
    if weights is not None:
        votes = votes * weights[:, None].astype(np.int64)
    v = votes.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming_distance(a: int, b: int) -> int:
    return int(bin(a ^ b).count("1"))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two shingle-hash sets."""
    sa, sb = np.unique(a), np.unique(b)
    if sa.size == 0 and sb.size == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / float(sa.size + sb.size - inter)
