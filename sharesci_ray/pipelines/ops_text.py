"""Text-analysis operators for training-data pipelines (task brief:
language-ID, quality scoring, token counting, document fingerprinting;
ref: n/a — SURVEY.md §0).

Kernels live in functions/text.py (shared with tests); every op except the
rolling-hash fingerprint has a bit-exact DuckDB oracle (integer counts and
single int/int → double divisions only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as dd
from ..functions.text import (
    LANG_STOPWORDS,
    SQL_TOKENIZE,
    fingerprint_column,
    flat_tokens,
    quality_stats,
)
from ..sources.corpus import read_table
from .ops import op

_TOKS = SQL_TOKENIZE.format(col="text")


# ===========================================================================
# Language ID (stopword vote)
# ===========================================================================

def _lang_sql() -> str:
    rows = ", ".join(
        f"('{lang}', '{t}')"
        for lang in sorted(LANG_STOPWORDS)
        for t in sorted(LANG_STOPWORDS[lang])
    )
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    sw(lang, term) AS (VALUES {rows}),
    votes AS (
      SELECT t.doc_id, sw.lang, count(*) AS hits
      FROM toks t JOIN sw ON sw.term = t.term GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
      FROM votes
    )
    SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
    FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """


@op("lang_id", _lang_sql())
def lang_id(sf_dir: str):
    """Stopword-vote language heuristic, fully vectorized: one is_in mask
    per language over the flat token stream, per-doc vote counts via
    np.add.at, argmax with (hits desc, lang asc) tie-break, 'und' on zero."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    langs = sorted(LANG_STOPWORDS)
    sets = [pa.array(sorted(LANG_STOPWORDS[l])) for l in langs]

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent = flat_tokens(batch["text"])
        n = batch.num_rows
        hits = np.zeros((n, len(langs)), dtype=np.int64)
        for j, vs in enumerate(sets):
            mask = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            np.add.at(hits[:, j], parent, mask)
        best = np.argmax(hits, axis=1)  # first max → alphabetical tie-break
        pred = np.array(langs, dtype=object)[best]
        pred[hits.max(axis=1) == 0] = "und"
        return pa.table(
            {"doc_id": batch["doc_id"], "lang_pred": pa.array(pred, pa.string())}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Quality scoring (length / punct / digit / upper ratios)
# ===========================================================================

@op(
    "quality_score",
    f"""
    SELECT doc_id,
           length(text)::BIGINT AS n_chars,
           len({_TOKS})::BIGINT AS n_tokens,
           COALESCE(list_sum(list_transform({_TOKS}, t -> length(t))), 0)::DOUBLE
             / greatest(len({_TOKS}), 1) AS mean_token_len,
           (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE
             / greatest(length(text), 1) AS punct_ratio,
           (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
             / greatest(length(text), 1) AS digit_ratio,
           (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE
             / greatest(length(text), 1) AS upper_ratio
    FROM documents
    """,
)
def quality_score(sf_dir: str):
    """Per-doc quality signals (task brief).  All ratios are one int/int →
    float64 division — bit-identical to the SQL twin in any order."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_stats(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array(q["n_chars"], pa.int64()),
                "n_tokens": pa.array(q["n_tokens"], pa.int64()),
                "mean_token_len": pa.array(q["mean_token_len"], pa.float64()),
                "punct_ratio": pa.array(q["punct_ratio"], pa.float64()),
                "digit_ratio": pa.array(q["digit_ratio"], pa.float64()),
                "upper_ratio": pa.array(q["upper_ratio"], pa.float64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Token counting (BPE-ish regex segmentation)
# ===========================================================================

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@op(
    "token_count_regex",
    f"SELECT doc_id, len(regexp_extract_all(text, '{_BPE_RE}'))::BIGINT AS n_bpe_tokens"
    " FROM documents",
)
def token_count_regex(sf_dir: str):
    """BPE-ish token counting: word / number / single-symbol segmentation,
    one RE2 kernel per batch (pc.count_substring_regex)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], _BPE_RE)
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())}
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Document fingerprinting
# ===========================================================================

def _fp_sql() -> str:
    h60 = dd.SQL_H60.format(s="s")
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest({dd.sql_shingles('t')}) AS s
      FROM toks WHERE len(t) >= {dd.SHINGLE_K}
    ),
    m AS (SELECT doc_id, min({h60}) AS fp FROM sh GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(m.fp, -1) AS fingerprint
    FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
    """


@op("doc_fingerprint", _fp_sql())
def doc_fingerprint(sf_dir: str):
    """Shift-robust document fingerprint: minimum md5-int60 over 3-token
    shingles (winnowing-style min-sampling; Schleimer et al. SIGMOD 2003).
    Docs with < 3 tokens → -1."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        sh, parent = dd.token_shingles(batch["text"])
        fp = np.full(batch.num_rows, np.iinfo(np.int64).max, dtype=np.int64)
        if len(sh):
            np.minimum.at(fp, parent, dd.hash_strings(sh))
        fp[fp == np.iinfo(np.int64).max] = -1
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fp)})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@op("doc_fingerprint_rolling")  # char-level rolling hash — no SQL twin (rows-only check)
def doc_fingerprint_rolling(sf_dir: str):
    """Char-level Rabin-Karp rolling-hash fingerprint (min window hash),
    numpy sliding-window vectorized (functions/text.py).  Not expressible in
    portable SQL → driver records the weaker rows-only check; value
    correctness is unit-tested in tests/test_text_ops.py."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fingerprint_column(batch["text"]), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
