"""Deduplication kernels: token shingles, MinHash, LSH bands, SimHash.

(ref: n/a — SURVEY.md §0: the reference checkout is empty.  These ops come
from the task brief's training-data-pipeline requirements; algorithms from
the published literature: Broder, "On the resemblance and containment of
documents", SEQUENCES 1997 (minhash); Indyk & Motwani, STOC 1998 (LSH);
Charikar, "Similarity estimation techniques from rounding algorithms",
STOC 2002 (simhash).)

Determinism contract: every hash here is reproducible 1:1 in DuckDB SQL so
the driver's oracle can value-check each dedup op:

  * string → int60:  first 15 hex chars of md5 parsed as int64
    (SQL: ``CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)``).
  * minhash perm j:  ``(a_j * (h % P31) + b_j) % P31`` with P31 = 2^31-1 and
    (a_j, b_j) from a fixed-seed RNG — all products < 2^62, exact in int64
    on both sides.
  * band key:        integer polynomial fold of the band's signature values,
    ``(Σ_j (sig_j · A^(r-1-j) mod P31) mod P31) mod P31`` — every product
    < 2^62 (exact int64 both sides), fully numpy-vectorized (no per-doc
    Python), and exactly one SQL SUM away (the perms VALUES table carries
    the per-position power).  Key collisions only ADD candidate pairs
    (LSH false positives are part of the contract on both sides).
  * simhash:         60-bit; bit b set iff  Σ_tokens tf·(2·((h>>b)&1)−1) > 0
    (integer sums → order-independent, bit-exact).

Everything is numpy-vectorized per Arrow batch; the only per-string Python
work is one md5 per *unique* string (vocabulary-sized, hash_strings).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import flat_tokens

P31 = 2_147_483_647  # 2^31 - 1, Mersenne prime; minhash permutation modulus
N_PERMS = 16
N_BANDS = 4
BAND_ROWS = N_PERMS // N_BANDS
SHINGLE_K = 3
SIMHASH_BITS = 60  # int60 from 15 md5 hex chars → fits non-negative int64

_rng = np.random.RandomState(0xC0FFEE)
PERM_A = _rng.randint(1, P31, size=N_PERMS).astype(np.int64)
PERM_B = _rng.randint(0, P31, size=N_PERMS).astype(np.int64)

# ANN query-set fixture shared by EVERY vector-search op's engine AND oracle
# SQL (ops_dedup + ops_search): the first ANN_NQ vec_ids are the queries,
# each returning ANN_K neighbors.  Lives in this leaf module (ADVICE r3) so
# the op modules can't drift apart — importing between them at decorator
# time is a circular import.
ANN_K = 10
ANN_NQ = 10

# polynomial band-fold hash: key = Σ_j (sig_j · A^(r-1-j) mod P31) mod P31,
# summed then reduced mod P31 once (sum of BAND_ROWS values < 2^33, exact)
BAND_A = 1_000_003
BAND_POWS = np.array(
    [pow(BAND_A, BAND_ROWS - 1 - j, P31) for j in range(BAND_ROWS)], dtype=np.int64
)

# candidate-bucket cap (the df-cap pre-pass): an LSH bucket larger than this
# is a degenerate cluster (stopword-like shingle / hot band collision) whose
# O(|group|²) pair emission would dominate the job; both the engine AND the
# oracle SQL drop such buckets, so parity holds whether or not the cap binds.
LSH_BUCKET_CAP = 256
# shingle df-cap for the exact-Jaccard op: shingles present in more than
# this many documents are excluded from the shingle universe on BOTH sides
# (sizes and intersections) — the standard stopword-shingle guard.
SHINGLE_DF_CAP = 256


def md5_int60(strings: list[str]) -> np.ndarray:
    """Per-string 60-bit md5 prefix as int64 (SQL-reproducible)."""
    return np.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) for s in strings],
        dtype=np.int64,
    )


def hash_strings(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized-ish md5_int60 over an Arrow string array: hash each UNIQUE
    value once, then gather — O(vocab) Python work per batch."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    uniq = pc.unique(arr)
    h_uniq = md5_int60(uniq.to_pylist())
    idx = pc.index_in(arr, value_set=uniq).to_numpy(zero_copy_only=False)
    return h_uniq[idx]


def token_shingles(text_col: pa.Array | pa.ChunkedArray, k: int = SHINGLE_K):
    """text column → (flat shingle strings: pa.Array, parent row: np.ndarray).

    Shingle = k consecutive tokens joined by a single space — identical to
    the SQL ``list_transform(range(1, len(t)-k+2), i -> t[i] || ' ' || ...)``
    construction.  Rows with < k tokens produce no shingles.
    """
    flat, parent = flat_tokens(text_col)
    n = len(flat)
    if n < k:
        return pa.array([], pa.string()), np.empty(0, dtype=np.int64)
    # windows [i, i+k) are valid shingles iff all k tokens share one parent row
    valid = parent[: n - k + 1] == parent[k - 1 :]
    cols = [flat.slice(j, n - k + 1) for j in range(k)]
    joined = cols[0]
    for c in cols[1:]:
        joined = pc.binary_join_element_wise(joined, c, " ")
    shingles = pc.filter(joined, pa.array(valid))
    if isinstance(shingles, pa.ChunkedArray):
        shingles = shingles.combine_chunks()
    return shingles, parent[: n - k + 1][valid]


def minhash_signatures(
    shingle_h60: np.ndarray, parent: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """(shingle hashes, parent row) → (rows_with_shingles, sig[n, N_PERMS]).

    sig_j = min over shingles of (a_j * (h % P31) + b_j) % P31.  Duplicate
    shingles don't affect the min, so no per-doc dedup is needed.
    """
    sigs = np.full((n_rows, N_PERMS), P31, dtype=np.int64)
    if shingle_h60.size:
        h31 = shingle_h60 % P31
        # (n_shingles, N_PERMS): products < 2^31 * 2^31 = 2^62, safe in int64
        perm = (h31[:, None] * PERM_A[None, :] + PERM_B[None, :]) % P31
        np.minimum.at(sigs, parent, perm)
    has = np.flatnonzero((sigs != P31).any(axis=1))
    return has, sigs[has]


def band_keys(doc_ids: np.ndarray, sigs: np.ndarray):
    """signatures → LSH band rows: (doc_id, band, band_key int64).

    Docs sharing a band key in any band are near-dup candidates (r=4 rows,
    b=4 bands over 16 perms → S-curve threshold ≈ (1/4)^(1/4) ≈ 0.71).
    Fully vectorized (numpy polynomial fold, no per-doc Python); the int64
    key also makes the (band, band_key) shuffle ~4× lighter than the md5
    hex string it replaces.
    """
    n = doc_ids.size
    keys = np.empty((n, N_BANDS), dtype=np.int64)
    for band in range(N_BANDS):
        seg = sigs[:, band * BAND_ROWS : (band + 1) * BAND_ROWS]
        # per-term products < 2^62 → exact in int64; mod BEFORE the sum so
        # the sum of BAND_ROWS terms stays < 2^33
        keys[:, band] = ((seg * BAND_POWS[None, :]) % P31).sum(axis=1) % P31
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids.astype(np.int64), N_BANDS), pa.int64()),
            "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int32), n), pa.int32()),
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
        }
    )


_FOLD_MULT = np.uint64(0x9E3779B97F4A7C15)


def fold_bucket(*cols: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic shuffle-bucket fold of one or more int64 key columns.

    LSH pair emission groups by keys of near-CORPUS cardinality (band keys,
    shingle hashes, simhash chunks) — one ``map_groups`` Python call per
    mostly-singleton group is pure scheduling overhead (the round-2
    dedup_simhash driver-bench spread).  Folding the key space into
    ``n_buckets`` coarse buckets keeps the all-to-all exchange identical in
    bytes but caps the group COUNT; the emitter then finds the true key runs
    vectorized inside each bucket.  Wrapping uint64 mix → uniform buckets.
    """
    acc = np.zeros(cols[0].shape[0], dtype=np.uint64)
    for c in cols:
        acc = (acc ^ c.astype(np.uint64)) * _FOLD_MULT
    return (acc % np.uint64(n_buckets)).astype(np.int64)


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) → int64 array."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def simhash60(text_col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """60-bit SimHash per row over tf-weighted tokens (integer-exact)."""
    n_rows = len(text_col)
    flat, parent = flat_tokens(text_col)
    acc = np.zeros((n_rows, SIMHASH_BITS), dtype=np.int64)
    if len(flat):
        h = hash_strings(flat)  # one md5 per unique token
        bits = (h[:, None] >> np.arange(SIMHASH_BITS)[None, :]) & 1  # (n_tok, 60)
        signs = 2 * bits - 1
        np.add.at(acc, parent, signs)
    out = np.zeros(n_rows, dtype=np.int64)
    set_bits = acc > 0
    for b in range(SIMHASH_BITS):
        out |= set_bits[:, b].astype(np.int64) << b
    return out


def simhash_chunks(sim: np.ndarray, n_chunks: int = 4) -> np.ndarray:
    """Split each 60-bit simhash into n_chunks 15-bit chunk values.

    Pigeonhole: two hashes with Hamming distance ≤ n_chunks-1 share at least
    one identical chunk → chunk-equality groups are a complete candidate set
    for Hamming ≤ 3 when n_chunks = 4.
    """
    width = SIMHASH_BITS // n_chunks
    mask = (1 << width) - 1
    return np.stack(
        [(sim >> (c * width)) & mask for c in range(n_chunks)], axis=1
    )


def hamming60(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between int64 simhash arrays."""
    x = (a ^ b).astype(np.uint64)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


# ---------------------------------------------------------------------------
# SQL fragment generators (oracle parity — ops_dedup.py embeds these)
# ---------------------------------------------------------------------------

SQL_H60 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def sql_shingles(toks_col: str, k: int = SHINGLE_K) -> str:
    """SQL: token-list COLUMN NAME → list of k-token shingle strings."""
    parts = [f"{toks_col}[i]" if j == 0 else f"{toks_col}[i+{j}]" for j in range(k)]
    join = " || ' ' || ".join(parts)
    return f"list_transform(range(1, len({toks_col}) - {k - 2}), i -> {join})"


def sql_perm_values() -> str:
    """SQL VALUES list of the (perm, a, b, powv) permutation constants;
    powv = BAND_A^(BAND_ROWS-1-(perm mod BAND_ROWS)) mod P31 is the
    per-position power of the integer band-fold key (see band_keys)."""
    return ", ".join(
        f"({j}, {int(PERM_A[j])}, {int(PERM_B[j])}, {int(BAND_POWS[j % BAND_ROWS])})"
        for j in range(N_PERMS)
    )
