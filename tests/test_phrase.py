"""Positional index (BuildConfig.positions): positions survive the full
pack→shuffle→encode→merge path, and phrase queries via the index agree
with the exhaustive scan-path verify."""

from __future__ import annotations

import numpy as np
import pytest

from sharesci_ray.functions.text import tokenize
from sharesci_ray.pipelines.build import BuildConfig, build_index
from sharesci_ray.pipelines.query import PhraseCounter, ScorerActor
from sharesci_ray.sources.corpus import corpus_from_table
from sharesci_ray.sources.synth import make_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    corpus = make_corpus(80, seed=4242)
    d = str(tmp_path_factory.mktemp("posidx"))
    build_index(corpus_from_table(corpus), d, BuildConfig(n_buckets=8, positions=True), resume=False)
    return d, corpus


def test_positions_roundtrip_vs_tokenize(pos_index):
    """Decoded per-doc positions of a term must equal the indices where the
    term occurs in the doc's filtered token stream."""
    d, corpus = pos_index
    s = ScorerActor(d, k=5, scorer="daat")
    # map doc_id -> content through the docvec checkpoint (repo/path keyed)
    import glob

    import pyarrow.parquet as pq

    t = None
    for f in glob.glob(f"{d}/stage=docvec/**/*.parquet", recursive=True):
        part = pq.read_table(f, columns=["doc_id", "repo", "path"])
        t = part if t is None else __import__("pyarrow").concat_tables([t, part])
    key_to_id = {
        (r, p): i
        for i, r, p in zip(t["doc_id"].to_pylist(), t["repo"].to_pylist(), t["path"].to_pylist())
    }
    checked = 0
    for row in range(0, 80, 13):
        content = corpus["content"][row].as_py()
        doc_id = key_to_id[(corpus["repo"][row].as_py(), corpus["path"][row].as_py())]
        toks = tokenize(content)
        for term in sorted(set(toks))[:5]:
            got = s._postings_pos(term)
            assert got is not None, term
            docids, off, flat = got
            j = int(np.searchsorted(docids, doc_id))
            assert docids[j] == doc_id
            expect = [i for i, tk in enumerate(toks) if tk == term]
            assert flat[off[j] : off[j + 1]].tolist() == expect, term
            checked += 1
    assert checked >= 20


def test_phrase_index_matches_scan_path(ray_session):
    """Index-backed phrase counts == full-scan bigram verify on testdata."""
    from sharesci_ray.pipelines.ops_text import (
        phrase_match_counts,
        phrase_match_counts_scan,
    )

    idx = phrase_match_counts(SF).to_pandas().sort_values("phrase").reset_index(drop=True)
    scan = phrase_match_counts_scan(SF).to_pandas().sort_values("phrase").reset_index(drop=True)
    assert idx.equals(scan)


def test_phrase_counter_on_synth(pos_index):
    """3+-token phrases and no-match phrases behave; occurrences equal a
    direct string-level recount over the tokenized docs."""
    d, corpus = pos_index
    s = ScorerActor(d, k=5, scorer="daat")
    # build a known 3-token phrase from some doc's token stream
    toks = tokenize(corpus["content"][7].as_py())
    phrase = " ".join(toks[10:13])
    docs, occ = s.phrase_occurrences(phrase)
    # recount via pure python over the whole corpus
    expect_docs = 0
    expect_occ = 0
    ptoks = tokenize(phrase)
    for row in range(80):
        dt = tokenize(corpus["content"][row].as_py())
        n = sum(
            1
            for i in range(len(dt) - len(ptoks) + 1)
            if dt[i : i + len(ptoks)] == ptoks
        )
        if n:
            expect_docs += 1
            expect_occ += n
    assert docs.size == expect_docs
    assert int(occ.sum()) == expect_occ
    # out-of-vocabulary phrase → empty
    d0, o0 = s.phrase_occurrences("zzzznope qqqqnada")
    assert d0.size == 0 and o0.size == 0


def test_phrase_counter_rejects_nonpositional(ray_session, tmp_path_factory):
    corpus = make_corpus(30, seed=5)
    d = str(tmp_path_factory.mktemp("nopos"))
    build_index(corpus_from_table(corpus), d, BuildConfig(n_buckets=4), resume=False)
    with pytest.raises(ValueError, match="positional"):
        PhraseCounter(d)


def test_merge_preserves_positions(ray_session, tmp_path_factory):
    """Merging two positions-enabled indexes preserves the positional
    payload: phrase occurrences on the merged index equal those on a
    fresh positions build over the union corpus."""
    from sharesci_ray.pipelines.build import merge_indexes

    full = make_corpus(60, seed=808)
    cfg = BuildConfig(n_buckets=4, positions=True)
    d1 = str(tmp_path_factory.mktemp("pm_a"))
    d2 = str(tmp_path_factory.mktemp("pm_b"))
    d_ref = str(tmp_path_factory.mktemp("pm_ref"))
    build_index(corpus_from_table(full.slice(0, 30)), d1, cfg, resume=False)
    build_index(corpus_from_table(full.slice(30)), d2, cfg, resume=False)
    build_index(corpus_from_table(full), d_ref, cfg, resume=False)

    out = str(tmp_path_factory.mktemp("pm_out")) + "/idx"
    merge_indexes([d1, d2], out)

    toks = tokenize(full["content"][3].as_py())
    phrase = " ".join(toks[5:8])
    sm = ScorerActor(out, k=5, scorer="daat")
    sr = ScorerActor(d_ref, k=5, scorer="daat")
    dm, om = sm.phrase_occurrences(phrase)
    dr, or_ = sr.phrase_occurrences(phrase)
    # identical dense ids (same sort keys) → bit-equal phrase results
    assert (dm == dr).all() and (om == or_).all()
    assert dm.size > 0


# ---------------------------------------------------------------------------
# Unordered proximity (within-window) search
# ---------------------------------------------------------------------------


def _brute_proximity(corpus, text, window):
    """Pure-python recount: docs where all distinct query terms occur with
    min cover span <= window in the filtered token stream."""
    from itertools import product

    terms = list(dict.fromkeys(tokenize(text)))
    n = 0
    for row in range(corpus.num_rows):
        dt = tokenize(corpus["content"][row].as_py())
        pos = {t: [i for i, tk in enumerate(dt) if tk == t] for t in terms}
        if any(not p for p in pos.values()):
            continue
        best = min(
            max(combo) - min(combo)
            for combo in product(*(pos[t] for t in terms))
        )
        if best <= window:
            n += 1
    return n


def test_proximity_count_vs_brute(pos_index):
    d, corpus = pos_index
    s = ScorerActor(d, k=5, scorer="daat")
    toks = tokenize(corpus["content"][11].as_py())
    # queries drawn from a real token stream: near pair, far pair, triple
    cases = [
        (f"{toks[4]} {toks[6]}", 2),
        (f"{toks[4]} {toks[6]}", 50),
        (f"{toks[0]} {toks[9]} {toks[17]}", 8),
        (f"{toks[0]} {toks[9]} {toks[17]}", 3),
    ]
    for text, w in cases:
        assert s.proximity_count(text, w) == _brute_proximity(corpus, text, w), (
            text,
            w,
        )


def test_proximity_edges(pos_index):
    d, corpus = pos_index
    s = ScorerActor(d, k=5, scorer="daat")
    # single-term query: every doc containing the term matches (span 0)
    toks = tokenize(corpus["content"][2].as_py())
    term = toks[0]
    got = s._postings_pos(term)
    assert s.proximity_count(term, 0) == got[0].size
    # duplicate terms in the query collapse to the distinct set
    assert s.proximity_count(f"{term} {term}", 0) == got[0].size
    # OOV term and empty query → 0
    assert s.proximity_count("zzzznope " + term, 99) == 0
    assert s.proximity_count("", 5) == 0


def test_proximity_counter_rejects_nonpositional(ray_session, tmp_path_factory):
    from sharesci_ray.pipelines.query import ProximityCounter

    corpus = make_corpus(20, seed=6)
    d = str(tmp_path_factory.mktemp("noposprox"))
    build_index(corpus_from_table(corpus), d, BuildConfig(n_buckets=4), resume=False)
    with pytest.raises(ValueError, match="positional"):
        ProximityCounter(d)
