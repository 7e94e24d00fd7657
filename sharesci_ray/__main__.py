"""CLI: ``python -m sharesci_ray {build,update,query} ...``.

The operational surface a user of the reference engine would expect:

  build  --input GLOB --build-dir DIR [--n-buckets N] [--langs py,js]
         [--positions] [--no-resume]
  update --input GLOB --build-dir DIR
  delete --build-dir DIR --keys FILE   (one "repo<TAB>path" per line)
  compact --build-dir DIR              (reclaim tombstones, re-densify ids)
  merge  --build-dir A --build-dir B [--build-dir ...] --out-dir OUT
         (segment merge: combine built shards, no re-tokenize)
  query  --build-dir DIR (--text "..." | --queries FILE.{jsonl,parquet})
         [--k 10] [--scorer auto] [--phrase] [--output out.parquet]
  suggest --build-dir DIR --term WORD [--term WORD ...] [--k 5]
         (did-you-mean corrections from the index dictionary)

Owns its Ray session (guarded — a driver that already called ray.init can
import and call :func:`main` directly).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _status(build_dir: str) -> dict:
    """Index health report from sidecars/manifests only (no Ray session,
    no data pages read): the operational "is this index consistent and
    servable" check.

    ``reencode_debt`` semantics mirror _read_reencode_debt: ``null`` = no
    debt, ``"all"`` = every bucket owes a re-encode (explicit record or a
    crash predating the debt file — a missing segments manifest with no
    record), else the owing bucket list."""
    import glob

    import pyarrow.parquet as pq

    from .state.manifest import BuildState

    if not os.path.exists(os.path.join(build_dir, "config.json")):
        return {"build_dir": build_dir, "servable": False,
                "reason": "not an index (missing config.json)"}
    state = BuildState(build_dir, {})
    stats = (
        state.read_sidecar("stats.json")
        if os.path.exists(os.path.join(build_dir, "stats.json"))
        else None
    )
    manifests = sorted(
        os.path.basename(p)[:-5]
        for p in glob.glob(os.path.join(build_dir, "manifests", "*.json"))
    )
    debt_path = os.path.join(build_dir, "pending_reencode.json")
    window_dead: list[int] = []
    if os.path.exists(debt_path):
        with open(debt_path) as f:
            rec = json.load(f)
        debt = "all" if rec["buckets"] is None else sorted(rec["buckets"])
        window_dead = rec.get("window_dead", [])
    elif "segments" not in manifests:
        debt = "all"  # crash predating the debt record / crashed build
    else:
        debt = None
    maintenance = sorted(
        m for m in manifests
        if m.startswith(("update-", "delete-", "compact-", "merge-"))
    )
    docvec_dir = os.path.join(build_dir, "stage=docvec")
    orphans = sorted(
        d for d in (os.listdir(docvec_dir) if os.path.isdir(docvec_dir) else [])
        if d.startswith("update-")
        and os.path.isdir(os.path.join(docvec_dir, d))  # same rule as absorb
        and d not in manifests
    )
    tomb_path = os.path.join(build_dir, "tombstones.parquet")
    n_tomb = (
        pq.ParquetFile(tomb_path).metadata.num_rows
        if os.path.exists(tomb_path)
        else 0
    )  # footer-only count
    bucket_dirs = [
        b for b in glob.glob(os.path.join(build_dir, "stage=segments", "term_bucket=*"))
        if not b.endswith(".old")  # parked crash-recovery twins aren't buckets
    ]
    return {
        "build_dir": build_dir,
        "servable": "segments" in manifests and debt is None,
        "stats": stats,
        "stages_complete": [
            m for m in ("docvec", "stats", "segments") if m in manifests
        ],
        "maintenance_history": maintenance,
        "n_tombstones": int(n_tomb),
        "n_segment_buckets": len(bucket_dirs),
        "reencode_debt": debt,
        "window_dead": window_dead,
        "orphan_deltas": orphans,
        # a crashed merge's output: complete or not, the next merge_indexes
        # call with this out_dir wipes and rebuilds it
        "merge_in_progress": os.path.exists(
            os.path.join(build_dir, "merge_in_progress.json")
        ),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="sharesci_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from corpus parquet")
    b.add_argument("--input", required=True, help="parquet path/glob (repo,path,commit,lang,content)")
    b.add_argument("--build-dir", required=True)
    b.add_argument("--n-buckets", type=int, default=64)
    b.add_argument("--langs", default=None, help="comma-separated lang allowlist")
    b.add_argument("--positions", action="store_true",
                   help="store token positions (enables exact-phrase queries)")
    b.add_argument("--no-resume", action="store_true")

    u = sub.add_parser("update", help="append a delta corpus to an existing index")
    u.add_argument("--input", required=True)
    u.add_argument("--build-dir", required=True)

    d = sub.add_parser("delete", help="tombstone documents by (repo, path)")
    d.add_argument("--build-dir", required=True)
    d.add_argument("--keys", required=True, help='file with one "repo<TAB>path" per line')

    c = sub.add_parser(
        "compact",
        help="drop tombstoned docs, re-densify ids, rebuild stats+segments "
             "from the checkpoint (no re-tokenize)",
    )
    c.add_argument("--build-dir", required=True)

    mg = sub.add_parser(
        "merge",
        help="merge >=2 built indexes into a fresh one (segment merge: "
             "no re-tokenize; inputs must share one config)",
    )
    mg.add_argument("--build-dir", required=True, action="append",
                    dest="build_dirs", help="input index (repeat >=2 times)")
    mg.add_argument("--out-dir", required=True)

    st = sub.add_parser(
        "status",
        help="index health: stats, manifests, tombstones, maintenance "
             "history, unpaid re-encode debt — no Ray work",
    )
    st.add_argument("--build-dir", required=True)

    sg = sub.add_parser(
        "suggest",
        help="did-you-mean dictionary suggestions (SymSpell deletion "
             "neighborhood + exact Damerau-Levenshtein <=1)",
    )
    sg.add_argument("--build-dir", required=True)
    sg.add_argument("--term", required=True, action="append",
                    help="word to correct (repeatable)")
    sg.add_argument("--k", type=int, default=5)

    vb = sub.add_parser(
        "vindex-build",
        help="build a persisted IVF vector index from (vec_id, embedding) "
             "parquet (centroid/query sidecars + cid=-partitioned lists)",
    )
    vb.add_argument("--embeddings", required=True, help="parquet path/glob")
    vb.add_argument("--out-dir", required=True)

    vu = sub.add_parser(
        "vindex-update",
        help="append new (vec_id, embedding) rows to a persisted IVF index "
             "(frozen centroids, O(delta) — existing lists untouched)",
    )
    vu.add_argument("--embeddings", required=True)
    vu.add_argument("--index-dir", required=True)

    vq = sub.add_parser(
        "vindex-query",
        help="top-k cosine neighbors for the index's fixture query set, "
             "served from the artifact alone (probed cid= partitions only)",
    )
    vq.add_argument("--index-dir", required=True)
    vq.add_argument("--k", type=int, default=10)
    vq.add_argument("--probe", type=int, default=8)
    vq.add_argument(
        "--queries", default=None,
        help="(query_id, embedding) parquet to search with (served through "
             "the VectorScorerActor pool); default = the artifact's stored "
             "fixture query set",
    )

    se = sub.add_parser(
        "shards-export",
        help="clean + dedup + chunk the documents table and write "
             "size-targeted training shards + manifest",
    )
    se.add_argument("--sf-dir", required=True,
                    help="directory containing documents.parquet")
    se.add_argument("--out-dir", required=True)
    se.add_argument("--target-chars", type=int, default=None)

    sx = sub.add_parser(
        "split-export",
        help="write the corpus hive-partitioned by the leakage-safe "
             "train/valid/test split (split key = near-dup cluster label)",
    )
    sx.add_argument("--sf-dir", required=True,
                    help="directory containing documents.parquet")
    sx.add_argument("--out-dir", required=True)

    sk = sub.add_parser(
        "profile",
        help="one-pass corpus profile: HLL shingle cardinality, "
             "count-min term frequencies, value-quantile sketch, "
             "per-source overlap estimates",
    )
    sk.add_argument("--sf-dir", required=True,
                    help="directory containing documents.parquet (+ events.parquet "
                         "for the quantile sketch)")
    sk.add_argument("--skip-overlap", action="store_true",
                    help="skip the 190-pair source-overlap section")

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--build-dir", required=True)
    q.add_argument("--text", default=None, help="single query string")
    q.add_argument("--queries", default=None, help="query-set file (.jsonl/.parquet)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--scorer", default="auto", choices=["daat", "wand", "bmw", "auto"])
    q.add_argument("--phrase", action="store_true",
                   help="exact-phrase mode (index must be built with --positions); "
                        "ranks matching docs by occurrence count")
    q.add_argument("--output", default=None, help="write results parquet here (else print)")

    args = ap.parse_args(argv)

    if args.cmd == "status":
        print(json.dumps(_status(args.build_dir)))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    from .pipelines.build import (
        BuildConfig,
        build_index,
        compact_index,
        delete_docs,
        merge_indexes,
        update_index,
    )
    from .pipelines.query import run_queries
    from .sources.corpus import read_corpus, read_queries

    if args.cmd == "build":
        cfg = BuildConfig(
            n_buckets=args.n_buckets,
            langs=tuple(args.langs.split(",")) if args.langs else None,
            positions=args.positions,
        )
        state = build_index(
            read_corpus(args.input), args.build_dir, cfg, resume=not args.no_resume
        )
        print(json.dumps({"build_dir": args.build_dir,
                          "stats": state.read_sidecar("stats.json")}))
    elif args.cmd == "update":
        state = update_index(args.build_dir, read_corpus(args.input))
        print(json.dumps({"build_dir": args.build_dir,
                          "stats": state.read_sidecar("stats.json")}))
    elif args.cmd == "delete":
        with open(args.keys) as f:
            keys = [
                tuple(line.rstrip("\n").split("\t", 1))
                for line in f
                if line.strip()
            ]
        state = delete_docs(args.build_dir, keys)
        print(json.dumps({"build_dir": args.build_dir,
                          "stats": state.read_sidecar("stats.json")}))
    elif args.cmd == "compact":
        state = compact_index(args.build_dir)
        print(json.dumps({"build_dir": args.build_dir,
                          "stats": state.read_sidecar("stats.json")}))
    elif args.cmd == "merge":
        state = merge_indexes(args.build_dirs, args.out_dir)
        print(json.dumps({"out_dir": args.out_dir,
                          "stats": state.read_sidecar("stats.json")}))
    elif args.cmd == "vindex-build":
        from .pipelines.ops_embed import build_vector_index

        meta = build_vector_index(
            ray.data.read_parquet(args.embeddings), args.out_dir
        )
        print(json.dumps({"out_dir": args.out_dir,
                          **{k: v for k, v in meta.items() if k != "files"}}))
    elif args.cmd == "vindex-update":
        from .pipelines.ops_embed import update_vector_index

        meta = update_vector_index(
            args.index_dir, ray.data.read_parquet(args.embeddings)
        )
        print(json.dumps({"index_dir": args.index_dir,
                          **{k: v for k, v in meta.items() if k != "files"}}))
    elif args.cmd == "vindex-query":
        from .pipelines.ops_embed import query_vector_index, query_vectors

        if args.queries:
            res = query_vectors(
                args.index_dir,
                ray.data.read_parquet(args.queries),
                k=args.k,
                n_probe=args.probe,
            )
        else:
            res = query_vector_index(args.index_dir, k=args.k, n_probe=args.probe)
        for row in res.sort(["query_id", "rank"]).iter_rows():
            print(json.dumps(row))
    elif args.cmd == "shards-export":
        from .pipelines.export import TARGET_SHARD_CHARS, write_training_shards

        manifest = write_training_shards(
            args.sf_dir, args.out_dir,
            target_chars=args.target_chars or TARGET_SHARD_CHARS,
        )
        print(json.dumps(manifest))
    elif args.cmd == "split-export":
        from .pipelines.ops_ml import export_split_corpus

        print(json.dumps(export_split_corpus(args.sf_dir, args.out_dir)))
    elif args.cmd == "profile":
        from .pipelines.ops_dedup import distinct_shingles_hll, term_counts_cms
        from .pipelines.ops_relational import value_quantiles_sketch

        out = {
            "distinct_shingles_hll": distinct_shingles_hll(
                args.sf_dir
            ).to_pylist(),
            "term_counts_cms": term_counts_cms(args.sf_dir).to_pylist(),
        }
        if os.path.exists(os.path.join(args.sf_dir, "events.parquet")):
            out["value_quantiles_sketch"] = (
                value_quantiles_sketch(args.sf_dir).to_pandas().to_dict("records")
            )
        if not args.skip_overlap:
            from .pipelines.ops_dedup import source_overlap_hll

            df = source_overlap_hll(args.sf_dir).to_pandas()
            out["source_overlap_top5"] = (
                df.sort_values("est_inter", ascending=False)
                .head(5)
                .to_dict("records")
            )
        print(json.dumps(out))
    elif args.cmd == "suggest":
        from .pipelines.ops_search import suggest_terms

        res = suggest_terms(args.build_dir, sorted(set(args.term)), k=args.k)
        for row in res.sort(["input_term", "df", "term"],
                            descending=[False, True, False]).iter_rows():
            print(json.dumps(row))
    else:  # query
        def _write_and_count(res, out_dir: str) -> int:
            """write_parquet + row count of ONLY the files this write
            produced (footer metadata): res.count() would re-execute the
            whole pipeline, and counting every file under out_dir would
            include earlier runs' output.  Non-local URIs (s3:// etc.)
            can't be walked — there, pay the re-execution for a true
            count rather than report 0."""
            import pyarrow.parquet as _pq

            if "://" in out_dir:
                res = res.materialize()
                res.write_parquet(out_dir)
                return res.count()
            before = set()
            if os.path.isdir(out_dir):
                for root, _d, files in os.walk(out_dir):
                    before |= {os.path.join(root, f) for f in files}
            res.write_parquet(out_dir)
            n = 0
            for root, _d, files in os.walk(out_dir):
                for f in files:
                    full = os.path.join(root, f)
                    if full not in before and f.endswith(".parquet"):
                        n += _pq.ParquetFile(full).metadata.num_rows
            return n

        if (args.text is None) == (args.queries is None):
            ap.error("query: provide exactly one of --text / --queries")
        if args.text is not None:
            import pyarrow as pa

            qds = ray.data.from_arrow(
                pa.table({"query_id": pa.array([0], pa.int64()),
                          "text": pa.array([args.text], pa.string())})
            )
        else:
            qds = read_queries(args.queries)
        if args.phrase:
            import pyarrow as pa

            from .pipelines.query import PhraseCounter

            pds = qds.map_batches(
                lambda t: t.rename_columns(
                    ["phrase" if c == "text" else c for c in t.column_names]
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            res = pds.map_batches(
                PhraseCounter,
                fn_constructor_kwargs={"build_dir": args.build_dir, "topk": args.k},
                concurrency=(1, 8),
                batch_size=32,
                batch_format="pyarrow",
            )
            if args.output:
                print(json.dumps(
                    {"output": args.output, "rows": _write_and_count(res, args.output)}
                ))
            else:
                for row in res.sort(["phrase", "rank"]).iter_rows():
                    print(json.dumps(row))
            return 0
        res = run_queries(args.build_dir, qds, k=args.k, scorer=args.scorer)
        if args.output:
            print(json.dumps(
                {"output": args.output, "rows": _write_and_count(res, args.output)}
            ))
        else:
            for row in res.sort(["query_id", "rank"]).iter_rows():
                print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
