"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Registry layout: one entry per implemented operator/pipeline of
SURVEY.md §2 (+ the training-data ops of the task brief); thin wrappers
live in ``sharesci_ray.pipelines.ops``.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (adapted to
    the corpus shape), then answer the fixture query set with BM25 top-10.

    Returns the results table (query_id, rank, doc_id, score).
    """
    import ray.data

    from sharesci_ray.pipelines.build import BuildConfig, build_index
    from sharesci_ray.pipelines.query import run_queries
    from sharesci_ray.sources.corpus import documents_as_corpus
    from sharesci_ray.sources.synth import make_queries

    sf_dir = "/root/testdata/sf0.001"
    build_dir = os.path.join(tempfile.gettempdir(), "sharesci_ray_entry_build")
    corpus = documents_as_corpus(sf_dir)
    build_index(corpus, build_dir, BuildConfig(n_buckets=8), resume=False)
    queries_ds = ray.data.from_arrow(make_queries(50, seed=43))
    return run_queries(build_dir, queries_ds, k=10, scorer="bmw")


def queries() -> dict[str, Callable[[str], Any]]:
    from sharesci_ray.pipelines import ops

    return ops.REGISTRY


def oracle_sql() -> dict[str, str]:
    from sharesci_ray.pipelines import ops

    return ops.resolve_oracle_sql()
