"""Q1 closed-form hand-checks + top-k tie-break (SURVEY.md §5.1)."""

import math

import numpy as np

from sharesci_ray.functions.bm25 import idf, term_scores, tf_norm, top_k_with_ties


def test_idf_closed_form():
    # N=100, df=10 → ln(1 + 90.5/10.5)
    assert math.isclose(idf(10, 100), math.log(1 + 90.5 / 10.5), rel_tol=0, abs_tol=0)
    assert idf(100, 100) > 0  # Lucene-style idf never negative


def test_tf_norm_hand_check():
    # tf=2, dl=avgdl → tf / (tf + k1) with b cancelling
    v = tf_norm(np.array([2.0]), np.array([100.0]), 100.0, k1=1.2, b=0.75)
    assert math.isclose(v[0], 2.0 / (2.0 + 1.2), rel_tol=0, abs_tol=0)


def test_term_scores_vector():
    s = term_scores(
        np.array([1, 2]), np.array([50, 200]), df=5, n_docs=100, avgdl=100.0
    )
    w = idf(5, 100)
    exp0 = w * (1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 50 / 100.0)))
    assert math.isclose(s[0], exp0, rel_tol=0, abs_tol=0)
    assert s.dtype == np.float64


def test_top_k_tie_break():
    docs = np.array([9, 3, 5, 1, 7])
    scores = np.array([1.0, 2.0, 2.0, 2.0, 0.5])
    d, s = top_k_with_ties(docs, scores, 3)
    assert list(d) == [1, 3, 5]  # score desc, doc_id asc among ties
    assert list(s) == [2.0, 2.0, 2.0]


def test_top_k_prune_keeps_boundary_ties():
    # many docs tied at the k-th score: prune must not drop the tie winners
    docs = np.arange(100, dtype=np.int64)
    scores = np.concatenate([np.full(3, 5.0), np.full(97, 1.0)])
    d, s = top_k_with_ties(docs, scores, 5)
    assert list(d) == [0, 1, 2, 3, 4]
    assert list(s) == [5.0, 5.0, 5.0, 1.0, 1.0]
