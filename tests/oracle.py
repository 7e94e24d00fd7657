"""Single-process oracle: trivially-correct index + BM25 scorer (no Ray).

Shares ``sharesci_ray.functions.text.tokenize`` and ``functions.bm25`` with
the engine — single source of truth for tokenization and the score formula
(SURVEY.md §5.3).  Doc ids are assigned exactly like the engine: dense ints
in (repo, path, commit, content_sha256) sort order.  Scores are float64 with
per-doc term contributions added in sorted-term order; top-k ties break
(score desc, doc_id asc).  The engine must match this bit-for-bit.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from sharesci_ray.functions.bm25 import B, K1, idf as bm25_idf
from sharesci_ray.functions.text import tokenize


class OracleIndex:
    def __init__(self, corpus: pa.Table, k1: float = K1, b: float = B):
        rows = corpus.to_pylist()
        for r in rows:
            r["content_sha256"] = hashlib.sha256(
                (r["content"] or "").encode("utf-8")
            ).hexdigest()
        rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"], r["content_sha256"]))
        self.k1, self.b = k1, b
        self.doc_meta = []
        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.doc_len: list[int] = []
        for doc_id, r in enumerate(rows):
            toks = tokenize(r["content"] or "")
            tf = Counter(toks)
            self.doc_len.append(len(toks))
            self.doc_meta.append(
                {
                    "doc_id": doc_id,
                    "repo": r["repo"],
                    "path": r["path"],
                    "commit": r["commit"],
                    "lang": r["lang"],
                    "content_sha256": r["content_sha256"],
                    "doc_len": len(toks),
                }
            )
            for term, f in tf.items():
                self.postings[term].append((doc_id, f))
        self.n_docs = len(rows)
        # exact int sum / count — bit-identical to the engine's stats stage
        self.avgdl = float(sum(self.doc_len)) / self.n_docs if self.doc_len else 0.0

    def score(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize(text)))
        scores: dict[int, float] = defaultdict(float)
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = float(bm25_idf(len(plist), self.n_docs))
            for doc_id, tf in plist:
                dl = self.doc_len[doc_id]
                denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                scores[doc_id] += w * (tf / denom)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return ranked
