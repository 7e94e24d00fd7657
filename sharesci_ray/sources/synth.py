"""Deterministic synthetic source-code corpus + query generators (FIXTURES.md A1/A2).

The corpus has the exact shape mandated by BASELINE.json:15:
(repo, path, commit, lang, content) — all strings.  Vocabulary is Zipf(1.2)
so stopword-like hot identifiers exist (exercises salting); content mixes
snake_case / camelCase compounds, digits and punctuation (exercises the
tokenizer); a fixed fraction of rows are exact duplicates (exercises U2).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LANGS = ["py", "js", "java", "go", "rs", "md"]
_LANG_W = np.array([0.3, 0.2, 0.15, 0.15, 0.1, 0.1])
_EXT = dict(zip(_LANGS, ["py", "js", "java", "go", "rs", "md"]))

_PUNCT = ["(", ")", "{", "}", ";", ":", "=", ".", ",", "->", "==", "+"]


def _vocab(n_terms: int, rng: np.random.Generator) -> list[str]:
    base = [
        "get", "set", "index", "value", "node", "parse", "token", "query",
        "result", "data", "file", "read", "write", "config", "handler",
        "buffer", "count", "total", "init", "run", "main", "test", "item",
        "list", "map", "key", "hash", "score", "doc", "term",
    ]
    out = []
    for i in range(n_terms):
        a = base[i % len(base)]
        b = base[(i * 7 + 3) % len(base)]
        style = i % 3
        if style == 0:
            out.append(f"{a}_{b}{i % 100}")
        elif style == 1:
            out.append(f"{a}{b.capitalize()}{i % 50}")
        else:
            out.append(f"{a}{i}")
    return out


def make_corpus(
    n_docs: int,
    seed: int = 42,
    n_terms: int = 2000,
    dup_frac: float = 0.05,
    min_tokens: int = 50,
    max_tokens: int = 2000,
) -> pa.Table:
    """Deterministic corpus table (repo, path, commit, lang, content)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(n_terms, rng))
    # Zipf(1.2) over vocab ranks
    ranks = np.arange(1, n_terms + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()

    repos, paths, commits, langs, contents = [], [], [], [], []
    lang_idx = rng.choice(len(_LANGS), size=n_docs, p=_LANG_W)
    doc_lens = rng.integers(min_tokens, max_tokens + 1, size=n_docs)
    for i in range(n_docs):
        lang = _LANGS[lang_idx[i]]
        repos.append(f"org{i % 7}/repo{i % 23}")
        paths.append(f"src/m{i % 13}/f{i}.{_EXT[lang]}")
        commits.append(hashlib.sha256(f"c{i}".encode()).hexdigest()[:12])
        langs.append(lang)
        toks = rng.choice(vocab, size=int(doc_lens[i]), p=probs)
        # sprinkle punctuation + digits to exercise tokenizer
        parts = []
        for j, t in enumerate(toks):
            parts.append(t)
            if j % 7 == 3:
                parts.append(_PUNCT[j % len(_PUNCT)])
            if j % 17 == 5:
                parts.append(str(int(rng.integers(0, 10000))))
            if j % 12 == 11:
                parts.append("\n")
        contents.append(" ".join(parts))
    # exact duplicates: overwrite a deterministic slice with copies
    n_dup = int(n_docs * dup_frac)
    if n_dup:
        src = rng.integers(0, n_docs - n_dup, size=n_dup)
        for k in range(n_dup):
            contents[n_docs - n_dup + k] = contents[int(src[k])]
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


SCALE_VOCAB = 50_000  # realistic identifier-vocabulary size for scale runs


def ensure_scale_corpus(
    n_docs: int,
    out_dir: str,
    seed: int = 42,
    shard_docs: int = 2_000,
    n_terms: int = SCALE_VOCAB,
) -> str:
    """Materialize a deterministic n_docs synthetic corpus as multi-file
    parquet (one file per shard, generated IN PARALLEL by Ray tasks — the
    corpus is born distributed, never assembled on the driver).

    Idempotent: if the directory already holds exactly n_docs rows (parquet
    footers only), it is reused — scaling runs at different num_cpus read
    the *same* bytes.  Used by ``bench.py --scaling``.
    """
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    done = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(done):
        total = 0
        for fn in os.listdir(out_dir):
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(out_dir, fn)).metadata.num_rows
        if total == n_docs:
            return out_dir
    # regenerating: wipe stale shards first — a smaller n_docs over a larger
    # old corpus would otherwise leave mixed-generation files behind
    if os.path.isdir(out_dir):
        for fn in os.listdir(out_dir):
            if fn.endswith(".parquet") or fn == "_COMPLETE":
                os.remove(os.path.join(out_dir, fn))
    os.makedirs(out_dir, exist_ok=True)

    shards = [
        (i, min(shard_docs, n_docs - i * shard_docs))
        for i in range((n_docs + shard_docs - 1) // shard_docs)
    ]

    @ray.remote
    def _write_shard(shard_idx: int, n: int) -> int:
        t = make_corpus(n, seed=seed + 1000 * shard_idx, n_terms=n_terms)
        # shard-unique repo/path so doc identity stays globally unique
        import pyarrow.compute as _pc

        t = t.set_column(
            t.column_names.index("repo"),
            "repo",
            _pc.binary_join_element_wise(
                pa.array([f"s{shard_idx}"] * n), t["repo"], "/"
            ),
        )
        # small row groups: a production corpus has far more files than any
        # node has cores; a 10-file sandbox corpus must not cap read-task
        # parallelism at 10, so let Ray split each file at row-group
        # boundaries (~625 docs ≈ 6 MB per group)
        pq.write_table(
            t,
            os.path.join(out_dir, f"shard_{shard_idx:05d}.parquet"),
            row_group_size=625,
        )
        return n

    ray.get([_write_shard.remote(i, n) for i, n in shards])
    with open(done, "w") as f:
        f.write(str(n_docs))
    return out_dir


def make_queries(n: int = 100, seed: int = 43, n_terms: int = 2000) -> pa.Table:
    """Fixture query set: 1-5 terms, 80% in-vocab across deciles, 20% OOV."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(n_terms, rng)
    qids, texts = [], []
    for q in range(n):
        n_t = int(rng.integers(1, 6))
        terms = []
        for _ in range(n_t):
            if rng.random() < 0.8:
                decile = int(rng.integers(0, 10))
                lo = decile * n_terms // 10
                hi = (decile + 1) * n_terms // 10
                terms.append(vocab[int(rng.integers(lo, hi))])
            else:
                terms.append(f"zzqx{int(rng.integers(0, 1000))}nope")
        qids.append(q)
        texts.append(" ".join(terms))
    return pa.table({"query_id": pa.array(qids, pa.int64()), "text": pa.array(texts, pa.string())})
