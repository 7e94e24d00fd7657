"""Pluggable scoring protocol (SURVEY.md §2.11; ref: n/a — §0).

A ``ScoringModel`` supplies the three quantities the query engine needs:

  idf(df, n_docs)            → per-term weight (float)
  tf_norm(tf, dl, avgdl)     → vectorized per-posting normalized frequency
  upper_bound_valid          → whether the index's stored per-block maxes
                               (which are BM25 tf_norm maxes, baked at build
                               time — stages/encode.py) are valid bounds for
                               this model.  If False, the engine silently
                               falls back to exhaustive vectorized DAAT,
                               which needs no bounds.

BM25 (Robertson et al., TREC-3 1994) is the default and the only model whose
scores are rank-identity-checked against the oracle; custom models are an
extension point, not part of the parity contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol, runtime_checkable

import numpy as np

from .bm25 import B, K1
from .bm25 import idf as bm25_idf
from .bm25 import tf_norm as bm25_tf_norm


@runtime_checkable
class ScoringModel(Protocol):
    upper_bound_valid: bool

    def idf(self, df: int, n_docs: int) -> float: ...

    def tf_norm(self, tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray: ...


@dataclass(frozen=True)
class Bm25Scoring:
    """Default model; k1/b must match the build (stats.json carries them)."""

    k1: float = K1
    b: float = B
    upper_bound_valid: bool = True  # block maxes ARE BM25 tf_norm maxes

    def idf(self, df: int, n_docs: int) -> float:
        return float(bm25_idf(df, n_docs))

    def tf_norm(self, tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
        return bm25_tf_norm(tf, dl, avgdl, self.k1, self.b)


@dataclass(frozen=True)
class TfScoring:
    """Example custom model: raw tf, no idf, no length normalization.
    Exercises the protocol + the bounds-invalid DAAT fallback in tests."""

    upper_bound_valid: bool = False

    def idf(self, df: int, n_docs: int) -> float:
        return 1.0

    def tf_norm(self, tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
        return np.asarray(tf, dtype=np.float64)
