"""§2.11 extension surface: pluggable tokenizer, scoring protocol, extra
pipeline stages — each hook exercised end-to-end against a hand-check."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sharesci_ray.functions.scoring import Bm25Scoring, ScoringModel, TfScoring
from sharesci_ray.pipelines.build import BuildConfig, build_index
from sharesci_ray.pipelines.query import ScorerActor
from sharesci_ray.sources.corpus import corpus_from_table


def _tiny_corpus() -> pa.Table:
    docs = [
        ("r", "a.py", "c", "py", "FooBar foo_bar alpha alpha beta"),
        ("r", "b.py", "c", "py", "alpha gamma gamma gamma"),
        ("r", "c.py", "c", "py", "beta delta"),
    ]
    cols = list(zip(*docs))
    return pa.table(
        {
            "repo": pa.array(cols[0]),
            "path": pa.array(cols[1]),
            "commit": pa.array(cols[2]),
            "lang": pa.array(cols[3]),
            "content": pa.array(cols[4]),
        }
    )


from sharesci_ray.functions.text import (  # noqa: E402  (library-hosted hook:
    whitespace_flat_tokens as whitespace_tokenizer,  # Ray workers must be able
    whitespace_tokenize as scalar_whitespace_tokenize,  # to unpickle it)
)


def test_custom_tokenizer_end_to_end(ray_session, tmp_path):
    """Build with a whitespace tokenizer: camelCase/snake terms survive
    unsplit, and querying with the matching scalar tokenizer finds them."""
    d = str(tmp_path / "idx")
    build_index(
        corpus_from_table(_tiny_corpus()),
        d,
        BuildConfig(n_buckets=4),
        resume=False,
        tokenizer=whitespace_tokenizer,
    )
    s = ScorerActor(d, k=5, scorer="daat", tokenize_fn=scalar_whitespace_tokenize)
    docs, scores = s.score_query("foobar")
    assert docs.size == 1  # 'FooBar' stayed one token (default would split it)
    # default tokenizer would have produced 'foo'+'bar'; whitespace kept foo_bar
    docs2, _ = s.score_query("foo_bar")
    assert docs2.size == 1


def test_custom_scoring_protocol(ray_session, tmp_path):
    """TfScoring (idf=1, no normalization): score == raw tf summed over
    query terms; bounds-invalid models are forced onto the DAAT path."""
    d = str(tmp_path / "idx2")
    build_index(corpus_from_table(_tiny_corpus()), d, BuildConfig(n_buckets=4), resume=False)
    assert isinstance(TfScoring(), ScoringModel)
    s = ScorerActor(d, k=5, scorer="bmw", scoring=TfScoring())
    docs, scores = s.score_query("gamma")
    assert docs.size == 1 and scores[0] == 3.0  # tf of gamma in doc b.py
    docs, scores = s.score_query("alpha beta")
    # alpha: 2 in a.py, 1 in b.py; beta: 1 in a.py, 1 in c.py
    assert scores.max() == 3.0  # a.py: tf(alpha)=2 + tf(beta)=1


def test_default_scoring_matches_stats_params(ray_session, tmp_path):
    d = str(tmp_path / "idx3")
    build_index(
        corpus_from_table(_tiny_corpus()),
        d,
        BuildConfig(n_buckets=4, k1=1.6, b=0.6),
        resume=False,
    )
    s = ScorerActor(d, k=5)
    assert isinstance(s.scoring, Bm25Scoring)
    assert s.scoring.k1 == 1.6 and s.scoring.b == 0.6


def test_extra_stages_hook(ray_session, tmp_path):
    """A custom ingest stage (drop docs containing 'delta') runs inside the
    build and is recorded in the docvec manifest lineage."""
    d = str(tmp_path / "idx4")

    def drop_delta(ds):
        return ds.map_batches(
            lambda t: t.filter(
                pc.invert(pc.match_substring(t["content"], "delta"))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    state = build_index(
        corpus_from_table(_tiny_corpus()),
        d,
        BuildConfig(n_buckets=4),
        resume=False,
        extra_stages=[("drop_delta", drop_delta)],
    )
    man = state.read_manifest("docvec")
    assert man["metrics"]["extra_stages"] == ["drop_delta"]
    assert man["rows_out"] == 2  # c.py dropped
    s = ScorerActor(d, k=5)
    docs, _ = s.score_query("delta")
    assert docs.size == 0
