"""Flagship pipeline 1: checkpoint-resumable inverted-index build.

SURVEY.md §3.1 (ref: n/a, §0 — reference checkout empty; contract
BASELINE.json:6,14,15).  Stages, each gated by a manifest (resume skips
complete stages):

  docvec   : read corpus → sha256 fingerprint → deterministic dense doc ids
             (sort + distributed prefix-sum) → per-doc sorted term vectors
             (content dropped) → parquet checkpoint.  The ONLY stage that
             touches raw content; resume never re-tokenizes.
  stats    : N, avgdl, total_tokens → stats.json sidecar.
  segments : explode postings → hot-term pre-pass → salted bucket keys →
             groupby(bucket) encode (delta+varbyte+block-max) → optional
             merge of salted partials → parquet partitioned by term_bucket.

All heavy transforms are stateless ``map_batches`` over zero-copy Arrow; the
single all-to-all exchange is the bucketed groupby (see stages/encode.py).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..functions.bm25 import B, K1
from ..stages.docvec import (
    add_fingerprint,
    assign_doc_ids,
    explode_postings,
    to_term_vectors,
)
from ..stages.encode import (
    SaltPlan,
    detect_hot_terms,
    make_bucket_packer,
    make_packed_encoder,
    make_salted_merger,
)
from ..state.manifest import BuildState


@dataclass(frozen=True)
class BuildConfig:
    n_buckets: int = 64
    block_size: int = 128
    k1: float = K1
    b: float = B
    hot_top_m: int = 128
    hot_sample: float = 0.1           # row-sample fraction for the hot-term pre-pass
    salt_threshold: int = 100_000     # min est. postings before a term is "hot"
    salt_target_group: int = 100_000  # postings per salted partial
    merge_salted: bool = True         # False = leave multi-row terms (extreme scale)
    langs: tuple[str, ...] | None = None


def _clean_dir(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)


def _parquet_rows(directory: str) -> int:
    """Row count from parquet footers only (no data pages touched)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(directory):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return total


def build_index(
    corpus: ray.data.Dataset,
    build_dir: str,
    cfg: BuildConfig | None = None,
    resume: bool = True,
    tokenizer=None,
    extra_stages=None,
) -> BuildState:
    """Run (or resume) the index build; returns the BuildState handle.

    §2.11 extension hooks: ``tokenizer`` is a vectorized
    ``(string column) -> (flat tokens, parent rows)`` callable (default: the
    shared code-aware tokenizer — queries must use the scalar twin);
    ``extra_stages`` is a list of ``(name, Dataset -> Dataset)`` transforms
    applied to the corpus at ingest (before fingerprinting), recorded in the
    docvec manifest for lineage.
    """
    cfg = cfg or BuildConfig()
    state = BuildState(build_dir, asdict(cfg))
    state.write_sidecar("config.json", asdict(cfg))  # update_index reloads it

    # ---- stage: docvec -----------------------------------------------------
    docvec_dir = state.stage_dir("docvec")
    if not (resume and state.is_complete("docvec")):
        m = state.begin("docvec", inputs=["corpus"], upstream=[])
        ds = corpus
        for stage_name, stage_fn in extra_stages or []:
            ds = stage_fn(ds)
            m.metrics.setdefault("extra_stages", []).append(stage_name)
        if cfg.langs:
            allowed = pa.array(list(cfg.langs))
            ds = ds.map_batches(
                lambda t, _a=allowed: t.filter(pc.is_in(t["lang"], value_set=_a)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        import time as _time

        _t0 = _time.perf_counter()
        ds = ds.map_batches(add_fingerprint, batch_format="pyarrow", zero_copy_batch=True)
        ds = assign_doc_ids(ds)
        m.metrics["sha_sort_docid_s"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()
        if tokenizer is not None:
            ds = ds.map_batches(
                lambda t, _tok=tokenizer: to_term_vectors(t, tokenizer=_tok),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            ds = ds.map_batches(
                to_term_vectors, batch_format="pyarrow", zero_copy_batch=True
            )
        _clean_dir(docvec_dir)
        ds.write_parquet(docvec_dir)
        m.metrics["termvec_write_s"] = round(_time.perf_counter() - _t0, 3)
        m.rows_out = _parquet_rows(docvec_dir)  # metadata-only, no re-read
        m.metrics["stage"] = "ingest+fingerprint+docid+termvec"
        state.commit(m)

    # downstream stages re-read the checkpoint with COLUMN PRUNING (stats
    # touches only doc_len; segments only doc_id/doc_len/terms/tfs) — cheaper
    # than holding full-width materialized blocks in the object store, and
    # identical between fresh and resumed builds
    def docvec_cols(columns: list[str]) -> ray.data.Dataset:
        return ray.data.read_parquet(docvec_dir, columns=columns)

    # ---- stage: stats ------------------------------------------------------
    if not (resume and state.is_complete("stats")):
        m = state.begin("stats", inputs=[docvec_dir], upstream=["docvec"])
        agg = docvec_cols(["doc_len"]).aggregate(Count(), Sum("doc_len"))
        n_docs = int(agg["count()"])
        total = int(agg["sum(doc_len)"] or 0)
        # exact int sum / count (not a float Mean): bit-identical to the oracle
        avgdl = float(total) / n_docs if n_docs else 0.0
        state.write_sidecar(
            "stats.json",
            {
                "n_docs": n_docs,
                "total_tokens": total,
                "avgdl": avgdl,
                "k1": cfg.k1,
                "b": cfg.b,
                "block_size": cfg.block_size,
                "n_buckets": cfg.n_buckets,
            },
        )
        m.rows_out = 1
        m.metrics = {"n_docs": n_docs, "avgdl": avgdl, "total_tokens": total}
        state.commit(m)
    stats = state.read_sidecar("stats.json")

    # ---- stage: segments ---------------------------------------------------
    seg_dir = state.stage_dir("segments")
    if not (resume and state.is_complete("segments")):
        m = state.begin("segments", inputs=[docvec_dir], upstream=["docvec", "stats"])

        def _postings(source: ray.data.Dataset) -> ray.data.Dataset:
            return source.map_batches(
                explode_postings, batch_format="pyarrow", zero_copy_batch=True
            )

        import time as _time

        # hot-term pre-pass on a seeded row sample: only the salting PLAN
        # depends on it, and salted builds merge to byte-identical segments
        # (tested), so sampling noise can't change the output — it only
        # trades a little salting precision for skipping 90% of the pass.
        _t0 = _time.perf_counter()
        frac = 1.0 if stats["n_docs"] < 20_000 else cfg.hot_sample
        # one slim (id/len/terms/tfs) object-store copy feeds BOTH the
        # hot-term pass and the encode pass — parquet list-column decode is
        # the expensive part of re-reading the checkpoint, so pay it once
        slim = docvec_cols(["doc_id", "doc_len", "terms", "tfs"]).materialize()
        m.metrics["slim_mat_s"] = round(_time.perf_counter() - _t0, 3)
        _t0 = _time.perf_counter()
        src = slim
        if frac < 1.0:
            src = src.random_sample(frac, seed=7)
        hot = detect_hot_terms(_postings(src), top_m=cfg.hot_top_m)
        hot = {t: int(c / frac) for t, c in hot.items()}
        hot = {t: c for t, c in hot.items() if c >= cfg.salt_threshold}
        m.metrics["hot_pass_s"] = round(_time.perf_counter() - _t0, 3)
        plan = SaltPlan.plan(hot, cfg.n_buckets, stats["n_docs"], cfg.salt_target_group)
        m.metrics["hot_terms"] = {t: list(plan.salts[t]) for t in plan.salts}

        packed = _postings(slim).map_batches(
            make_bucket_packer(plan), batch_format="pyarrow", zero_copy_batch=True
        )
        encoder = make_packed_encoder(
            stats["avgdl"], cfg.k1, cfg.b, cfg.block_size, cfg.n_buckets
        )
        seg = packed.groupby("bucket").map_groups(encoder, batch_format="pyarrow")
        if cfg.merge_salted and plan.salts:
            # the finals/partials branches below both consume `seg`; Ray Data
            # re-executes shared subplans per consumer, so pin the encoded
            # segments in the object store once before branching
            seg = seg.materialize()
            finals = seg.map_batches(
                lambda t: t.filter(pc.equal(t["salt_idx"], pa.scalar(-1, pa.int32()))),
                batch_format="pyarrow",
            )
            partials = seg.map_batches(
                lambda t: t.filter(pc.not_equal(t["salt_idx"], pa.scalar(-1, pa.int32()))),
                batch_format="pyarrow",
            )
            merger = make_salted_merger(
                stats["avgdl"], cfg.k1, cfg.b, cfg.block_size, cfg.n_buckets
            )
            merged = partials.groupby("term").map_groups(merger, batch_format="pyarrow")
            seg = finals.union(merged)
        _t0 = _time.perf_counter()
        _clean_dir(seg_dir)
        seg.write_parquet(seg_dir, partition_cols=["term_bucket"])
        m.metrics["encode_write_s"] = round(_time.perf_counter() - _t0, 3)
        m.rows_out = _parquet_rows(seg_dir)  # metadata-only, no re-read
        state.commit(m)

    return state


def update_index(
    build_dir: str,
    new_corpus: ray.data.Dataset,
    tokenizer=None,
) -> BuildState:
    """Incremental build (SURVEY.md U1): append a delta corpus to an
    existing index WITHOUT re-tokenizing the existing documents.

    Semantics: delta docs get fresh ids appended after the existing id
    space (old ids are stable — resume/rank determinism preserved);
    collection stats are updated exactly (integer count/sum addition); the
    segments stage is re-run over the full docvec CHECKPOINT (term vectors,
    not raw content — the expensive tokenize/fingerprint work happens only
    for the delta).  Posting lists and block-max bounds are re-encoded
    under the new avgdl, so WAND/BMW upper bounds stay tight and query
    results are exactly what a from-scratch build over old∪new would score
    (doc ids aside).  The update is recorded as an ``update-<k>`` manifest
    with the delta's lineage.

    ``tokenizer`` must match the original build's (§2.11 hook, default
    code-aware tokenizer).
    """
    import json
    import time as _time

    state0 = BuildState(build_dir, {})
    cfg = BuildConfig(**{k: tuple(v) if isinstance(v, list) else v
                         for k, v in state0.read_sidecar("config.json").items()})
    state = BuildState(build_dir, asdict(cfg))
    if not (state.is_complete("docvec") and state.is_complete("segments")):
        raise ValueError(f"{build_dir} is not a complete index; run build_index first")
    stats = state.read_sidecar("stats.json")

    k = 0
    while state.read_manifest(f"update-{k}") is not None:
        k += 1
    m = state.begin(f"update-{k}", inputs=["delta-corpus"], upstream=["docvec", "stats", "segments"])

    # ---- delta docvec (appended id space), written into the checkpoint ----
    docvec_dir = state.stage_dir("docvec")
    ds = new_corpus
    if cfg.langs:
        allowed = pa.array(list(cfg.langs))
        ds = ds.map_batches(
            lambda t, _a=allowed: t.filter(pc.is_in(t["lang"], value_set=_a)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = ds.map_batches(add_fingerprint, batch_format="pyarrow", zero_copy_batch=True)
    ds = assign_doc_ids(ds, base=int(stats["n_docs"]))
    if tokenizer is not None:
        ds = ds.map_batches(
            lambda t, _tok=tokenizer: to_term_vectors(t, tokenizer=_tok),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        ds = ds.map_batches(to_term_vectors, batch_format="pyarrow", zero_copy_batch=True)
    before_rows = _parquet_rows(docvec_dir)
    ds.write_parquet(docvec_dir)  # adds uniquely-named files next to the old ones
    delta_rows = _parquet_rows(docvec_dir) - before_rows

    # ---- exact stats update (integer count/sum addition) ------------------
    delta = ray.data.read_parquet(docvec_dir, columns=["doc_id", "doc_len"])
    delta = delta.map_batches(
        lambda t, _n=int(stats["n_docs"]): t.filter(pc.greater_equal(t["doc_id"], _n)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = delta.aggregate(Count(), Sum("doc_len"))
    d_n, d_tok = int(agg["count()"]), int(agg["sum(doc_len)"] or 0)
    stats["n_docs"] = int(stats["n_docs"]) + d_n
    stats["total_tokens"] = int(stats["total_tokens"]) + d_tok
    stats["avgdl"] = float(stats["total_tokens"]) / stats["n_docs"] if stats["n_docs"] else 0.0
    state.write_sidecar("stats.json", stats)

    # ---- re-run segments over the updated checkpoint ----------------------
    seg_manifest = os.path.join(build_dir, "manifests", "segments.json")
    os.remove(seg_manifest)
    build_index(
        ray.data.from_items([]),  # docvec complete → corpus is never touched
        build_dir,
        cfg,
        resume=True,
        tokenizer=tokenizer,
    )

    m.rows_out = delta_rows
    m.metrics = {"delta_docs": d_n, "delta_tokens": d_tok, "new_n_docs": stats["n_docs"]}
    state.commit(m)
    return state
