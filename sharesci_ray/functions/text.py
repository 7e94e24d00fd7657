"""Code-aware tokenization + text-analysis kernels (SURVEY.md §2 M2/M3/M8).

ONE source of truth shared by the Ray engine, the single-process oracle
(tests/oracle.py) and — step for step — the DuckDB oracle SQL in
``__ray_entry__.py`` (ref: n/a, SURVEY.md §0: the reference checkout is empty;
behavior specified by BASELINE.json:6,15).

The tokenizer is deliberately ASCII-regex-only (RE2-compatible classes) so the
exact same pipeline is expressible in pyarrow.compute (RE2), Python ``re`` and
DuckDB ``regexp_*`` (RE2):

  1. split ALLCAPS runs before CamelCase:  ``([A-Z]+)([A-Z][a-z])`` → ``\\1 \\2``
  2. split camelCase boundaries:           ``([a-z0-9])([A-Z])``    → ``\\1 \\2``
  3. lowercase (ASCII-ONLY casefold — Python str.lower() does full Unicode
     case mapping while Arrow's utf8_lower does simple mapping; they diverge
     on e.g. U+0130, so both paths casefold ASCII letters only and any
     non-[a-z0-9] codepoint is a separator)
  4. every non-``[a-z0-9]`` run (incl. ``_`` → splits snake_case) → single space
  5. whitespace-split; keep tokens with len >= 2 that are not pure digits
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

RE_CAPS_RUN = r"([A-Z]+)([A-Z][a-z])"
RE_CAMEL = r"([a-z0-9])([A-Z])"
RE_NONWORD = r"[^a-z0-9]+"
RE_PURE_INT = r"^[0-9]+$"
MIN_TOKEN_LEN = 2

# SQL fragment computing the identical token list from a column expression.
# Used by __ray_entry__.oracle_sql so DuckDB (RE2) parity is exact.
SQL_TOKENIZE = (
    "list_filter(string_split(regexp_replace(lower(regexp_replace(regexp_replace({col}, "
    "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
    "'([a-z0-9])([A-Z])', '\\1 \\2', 'g')), "
    "'[^a-z0-9]+', ' ', 'g'), ' '), "
    "t -> length(t) >= 2 AND NOT regexp_matches(t, '^[0-9]+$'))"
)

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

_py_caps = re.compile(RE_CAPS_RUN)
_py_camel = re.compile(RE_CAMEL)
_py_nonword = re.compile(RE_NONWORD)
_py_pure_int = re.compile(RE_PURE_INT)


def tokenize(text: str) -> list[str]:
    """Single-string tokenizer (oracle path). Must match tokenize_column."""
    s = _py_caps.sub(r"\1 \2", text)
    s = _py_camel.sub(r"\1 \2", s)
    s = _py_nonword.sub(" ", s.translate(_ASCII_LOWER))
    return [
        t
        for t in s.split(" ")
        if len(t) >= MIN_TOKEN_LEN and not _py_pure_int.match(t)
    ]


def tokenize_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized batch tokenizer: string column → list<string> column.

    Pure pyarrow.compute (RE2) kernels — zero Python per-row work.
    """
    s = pc.replace_substring_regex(col, RE_CAPS_RUN, r"\1 \2")
    s = pc.replace_substring_regex(s, RE_CAMEL, r"\1 \2")
    s = pc.ascii_lower(s)
    s = pc.replace_substring_regex(s, RE_NONWORD, " ")
    toks = pc.split_pattern(s, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.and_(
        pc.greater_equal(pc.utf8_length(flat), MIN_TOKEN_LEN),
        pc.invert(pc.match_substring_regex(flat, RE_PURE_INT)),
    )
    flat_kept = pc.filter(flat, keep)
    parent_kept = pc.filter(parent, keep)
    # rebuild a list array with the original row count
    n_rows = len(s)
    counts = np.zeros(n_rows + 1, dtype=np.int64)
    pk = parent_kept.to_numpy(zero_copy_only=False)
    np.add.at(counts, pk + 1, 1)
    offsets = np.cumsum(counts)
    if isinstance(flat_kept, pa.ChunkedArray):
        flat_kept = flat_kept.combine_chunks()
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()) if offsets[-1] < 2**31 else pa.array(offsets, type=pa.int64()), flat_kept)


def flat_tokens(col: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """string column → (flat token array, row index per token).

    Same tokenization as :func:`tokenize_column` but skips list reassembly —
    this is the hot path feeding the postings explode (M4).
    """
    s = pc.replace_substring_regex(col, RE_CAPS_RUN, r"\1 \2")
    s = pc.replace_substring_regex(s, RE_CAMEL, r"\1 \2")
    s = pc.ascii_lower(s)
    s = pc.replace_substring_regex(s, RE_NONWORD, " ")
    toks = pc.split_pattern(s, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.and_(
        pc.greater_equal(pc.utf8_length(flat), MIN_TOKEN_LEN),
        pc.invert(pc.match_substring_regex(flat, RE_PURE_INT)),
    )
    flat_kept = pc.filter(flat, keep)
    parent_kept = pc.filter(parent, keep).to_numpy(zero_copy_only=False)
    if isinstance(flat_kept, pa.ChunkedArray):
        flat_kept = flat_kept.combine_chunks()
    return flat_kept, parent_kept


# -- alternative tokenizer (§2.11 hook example): whitespace-only ------------

# ONE whitespace class shared verbatim by both twins.  An explicit ASCII set
# (not \s): Python str.split()/re-\s split on Unicode whitespace (\xa0,
#  , ...) while RE2's \s is ASCII-only — a document containing \xa0
# would otherwise be indexed under terms the query-side twin can never
# produce (silent missed matches).
_WS_CLASS = r"[\t\n\x0b\x0c\r ]+"
_py_ws = re.compile(_WS_CLASS)


def whitespace_tokenize(text: str) -> list[str]:
    """Scalar twin of :func:`whitespace_flat_tokens` (query side) — same
    ASCII whitespace class as the build side, by construction."""
    return [t for t in _py_ws.split(text.translate(_ASCII_LOWER)) if t]


def whitespace_flat_tokens(col: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Vectorized whitespace-only tokenizer: lowercase + split on ASCII
    whitespace (shared ``_WS_CLASS``), no camelCase/snake splitting, no
    length/digit filter.  Plug into
    ``build_index(..., tokenizer=whitespace_flat_tokens)`` with
    ``ScorerActor(..., tokenize_fn=whitespace_tokenize)`` at query time."""
    toks = pc.split_pattern_regex(pc.ascii_lower(col), _WS_CLASS)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    flat = pc.filter(flat, pa.array(keep))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, parent[keep]


# ---------------------------------------------------------------------------
# Text-analysis kernels for training-data pipelines (task brief: language-ID,
# quality scoring, token counting, document fingerprinting).
# ---------------------------------------------------------------------------

# Tiny deterministic stopword lists for an n-gram-free language heuristic.
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as are was".split()),
    "de": frozenset("der die und das ist nicht ein eine mit von auf für".split()),
    "fr": frozenset("le la les et des une est dans pour que qui pas".split()),
    "es": frozenset("el la los las de que en una es por con para".split()),
}


def lang_id_tokens(tokens: list[str]) -> str:
    """Stopword-vote language heuristic; 'und' (unknown) when no vote."""
    best_lang, best = "und", 0
    for lang in sorted(LANG_STOPWORDS):
        hits = sum(1 for t in tokens if t in LANG_STOPWORDS[lang])
        if hits > best:
            best_lang, best = lang, hits
    return best_lang


def quality_stats(table_text: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized per-doc quality signals over a string column.

    Returns n_chars, n_tokens, mean_token_len, punct_ratio, digit_ratio,
    upper_ratio — the length/punct ratio scores of the task brief, each
    expressible 1:1 in DuckDB SQL for oracle parity.
    """
    n_chars = pc.utf8_length(table_text).to_numpy(zero_copy_only=False).astype(np.float64)
    flat, parent = flat_tokens(table_text)
    n_rows = len(table_text)
    n_tokens = np.zeros(n_rows, dtype=np.int64)
    np.add.at(n_tokens, parent, 1)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    tok_len_sum = np.zeros(n_rows, dtype=np.int64)
    np.add.at(tok_len_sum, parent, tok_lens)

    def _matched_count(pattern: str) -> np.ndarray:
        """Per-row count of chars matching ``pattern`` (len minus stripped len)."""
        stripped = pc.replace_substring_regex(table_text, pattern, "")
        return n_chars - pc.utf8_length(stripped).to_numpy(zero_copy_only=False)

    denom = np.maximum(n_chars, 1.0)
    return {
        "n_chars": n_chars.astype(np.int64),
        "n_tokens": n_tokens,
        "mean_token_len": tok_len_sum / np.maximum(n_tokens, 1),
        "punct_ratio": _matched_count(r"[\.,;:!\?]") / denom,
        "digit_ratio": _matched_count(r"[0-9]") / denom,
        "upper_ratio": _matched_count(r"[A-Z]") / denom,
    }


def rolling_fingerprint(text: str, window: int = 16, base: int = 257) -> int:
    """Deterministic rolling-hash document fingerprint: min of window hashes.

    Polynomial Rabin-Karp hash mod 2^32 over utf-8 bytes; the *minimum*
    window hash is a shift-robust fingerprint (winnowing-style, Schleimer et
    al. SIGMOD 2003).  Vectorized: sliding-window dot product with the power
    vector — per-term products < 2^40, window sums < 2^45, safe in uint64.
    """
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    mask = np.uint64(0xFFFFFFFF)
    powers = np.array(
        [pow(base, k, 1 << 32) for k in range(window - 1, -1, -1)], dtype=np.uint64
    )
    if data.size == 0:
        return 0
    if data.size < window:
        h = np.uint64(0)
        for ch in data:  # < window iterations
            h = (h * np.uint64(base) + np.uint64(ch)) & mask
        return int(h)
    win = np.lib.stride_tricks.sliding_window_view(data, window).astype(np.uint64)
    hashes = (win * powers).sum(axis=1) & mask
    return int(hashes.min())


def fingerprint_column(
    col: pa.Array | pa.ChunkedArray, window: int = 16, base: int = 257
) -> np.ndarray:
    """rolling_fingerprint per row → int64, fully batch-vectorized
    (VERDICT r3 #8: no per-row Python).

    One pass over the column's concatenated utf-8 buffer: window hashes
    are computed for EVERY byte position with ``window`` shifted
    multiply-adds (O(window) vectorized passes, O(N) memory — no
    (N, window) materialization), windows crossing a row boundary are
    masked out, and per-row minima come from one ``np.minimum.reduceat``.
    Rows shorter than the window get the same prefix polynomial hash the
    scalar kernel computes; empty/null rows fingerprint to 0.  Value-
    identical to :func:`rolling_fingerprint` on every row (pytest pins
    this): uint64 addition wraps mod 2^64 and the 2^32 mask commutes with
    it exactly as in the scalar path.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    col = pc.fill_null(col, "")
    arr = col if pa.types.is_large_string(col.type) else pc.cast(col, pa.large_string())
    buf_off = np.frombuffer(
        arr.buffers()[1], dtype=np.int64, count=n + 1, offset=8 * arr.offset
    )
    start, end = int(buf_off[0]), int(buf_off[-1])
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=end)[start:end]
        .astype(np.uint64)
    )
    offs = (buf_off - buf_off[0]).astype(np.int64)
    lens = np.diff(offs)
    mask = np.uint64(0xFFFFFFFF)
    out = np.zeros(n, dtype=np.int64)

    # ---- short rows (0 < len < window): prefix polynomial hash ------------
    short = (lens > 0) & (lens < window)
    if short.any():
        pows = np.array(
            [pow(base, k, 1 << 32) for k in range(window)], dtype=np.uint64
        )
        char_row = np.repeat(np.arange(n, dtype=np.int64), lens)
        sel = short[char_row]
        sdata = data[sel]
        dist = (
            np.repeat(offs[1:], lens) - 1 - np.arange(data.size, dtype=np.int64)
        )[sel]
        with np.errstate(over="ignore"):  # uint64 wrap == mod 2^64, intended
            contrib = sdata * pows[dist]
        scounts = lens[short]
        sstarts = np.cumsum(scounts) - scounts
        out[short] = (np.add.reduceat(contrib, sstarts) & mask).astype(np.int64)

    # ---- long rows (len >= window): min over in-row window hashes ---------
    long_ = lens >= window
    if long_.any() and data.size >= window:
        wpows = np.array(
            [pow(base, window - 1 - j, 1 << 32) for j in range(window)],
            dtype=np.uint64,
        )
        n_win = data.size - window + 1
        h = np.zeros(n_win, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(window):
                h += data[j : j + n_win] * wpows[j]
        h &= mask
        char_row = np.repeat(np.arange(n, dtype=np.int64), lens)
        valid = char_row[:n_win] == char_row[window - 1 :]
        hv = h[valid]
        counts = np.where(long_, lens - window + 1, 0)
        starts = (np.cumsum(counts) - counts)[long_]
        out[long_] = np.minimum.reduceat(hv, starts).astype(np.int64)
    return out
