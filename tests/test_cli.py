"""CLI surface: build → query → update round-trip via sharesci_ray.__main__."""

from __future__ import annotations

import json

import pyarrow.parquet as pq

from sharesci_ray.__main__ import main
from sharesci_ray.sources.synth import make_corpus


def test_cli_build_query_update(ray_session, tmp_path, capsys):
    full = make_corpus(120, seed=5)
    corpus_a = str(tmp_path / "a.parquet")
    corpus_b = str(tmp_path / "b.parquet")
    pq.write_table(full.slice(0, 80), corpus_a)
    pq.write_table(full.slice(80), corpus_b)
    bd = str(tmp_path / "idx")

    assert main(["build", "--input", corpus_a, "--build-dir", bd, "--n-buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats"]["n_docs"] == 80

    assert main(["query", "--build-dir", bd, "--text", "get_value index"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert lines and all("doc_id" in json.loads(l) for l in lines)

    assert main(["update", "--input", corpus_b, "--build-dir", bd]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stats"]["n_docs"] == 120

    res_path = str(tmp_path / "res")
    assert main(
        ["query", "--build-dir", bd, "--text", "get_value index", "--output", res_path]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] >= 1


def test_cli_positional_phrase(ray_session, tmp_path, capsys):
    """--positions build → --phrase query ranks docs by occurrence count
    and agrees with the scan-path truth on a planted phrase."""
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(make_corpus(60, seed=9), corpus)
    bd = str(tmp_path / "pidx")

    assert main(
        ["build", "--input", corpus, "--build-dir", bd, "--n-buckets", "4",
         "--positions"]
    ) == 0
    capsys.readouterr()

    # pick a bigram that actually occurs: read one doc's first two tokens
    import pyarrow.parquet as _pq

    from sharesci_ray.functions.text import tokenize

    toks = tokenize(_pq.read_table(corpus)["content"][0].as_py())
    phrase = f"{toks[0]} {toks[1]}"
    assert main(["query", "--build-dir", bd, "--phrase", "--text", phrase]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert lines, "phrase query returned no rows"
    rows = [json.loads(l) for l in lines]
    assert rows[0]["rank"] == 1 and rows[0]["n_occurrences"] >= 1
    # ranks are dense from 1, occurrences non-increasing
    occ = [r["n_occurrences"] for r in rows]
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(a >= b for a, b in zip(occ, occ[1:]))

    # non-positional index must refuse --phrase
    bd2 = str(tmp_path / "npidx")
    assert main(["build", "--input", corpus, "--build-dir", bd2, "--n-buckets", "4"]) == 0
    capsys.readouterr()
    try:
        main(["query", "--build-dir", bd2, "--phrase", "--text", phrase])
        raised = False
    except Exception:
        raised = True
    assert raised


def test_cli_status(ray_session, tmp_path_factory, capsys):
    """status reports a healthy index as servable and a mid-maintenance one
    (segments manifest missing / debt unpaid) as not servable."""
    import json
    import os

    from sharesci_ray.__main__ import _status
    from sharesci_ray.pipelines.build import BuildConfig, build_index
    from sharesci_ray.sources.corpus import corpus_from_table
    from sharesci_ray.sources.synth import make_corpus

    d = str(tmp_path_factory.mktemp("status_idx"))
    build_index(corpus_from_table(make_corpus(30, seed=5)), d,
                BuildConfig(n_buckets=8), resume=False)
    rep = _status(d)
    assert rep["servable"] is True
    assert rep["stages_complete"] == ["docvec", "stats", "segments"]
    assert rep["n_tombstones"] == 0 and rep["orphan_deltas"] == []
    assert rep["n_segment_buckets"] > 0

    # simulate a crashed window
    os.remove(os.path.join(d, "manifests", "segments.json"))
    with open(os.path.join(d, "pending_reencode.json"), "w") as f:
        json.dump({"buckets": [1, 2], "window_dead": []}, f)
    rep2 = _status(d)
    assert rep2["servable"] is False
    assert rep2["reencode_debt"] == [1, 2]

    # crash predating the debt record: missing manifest + no debt file
    os.remove(os.path.join(d, "pending_reencode.json"))
    rep3 = _status(d)
    assert rep3["servable"] is False and rep3["reencode_debt"] == "all"

    assert _status(str(tmp_path_factory.mktemp("empty")))["servable"] is False


def test_cli_suggest(ray_session, tmp_path, capsys):
    """suggest returns dictionary corrections within Damerau-Levenshtein 1
    of the input, ranked by df, straight off a CLI-built index."""
    corpus = str(tmp_path / "s.parquet")
    pq.write_table(make_corpus(80, seed=13), corpus)
    bd = str(tmp_path / "idx_sg")
    assert main(["build", "--input", corpus, "--build-dir", bd,
                 "--n-buckets", "4"]) == 0
    capsys.readouterr()

    # pick a real dictionary term and misspell it by dropping a char
    import ray.data

    seg = ray.data.read_parquet(f"{bd}/stage=segments", columns=["term", "df"])
    term, df = max(
        ((r["term"], r["df"]) for r in seg.iter_rows() if len(r["term"]) >= 4),
        key=lambda x: (x[1], x[0]),
    )
    typo = term[:2] + term[3:]  # one deletion -> distance 1 from `term`

    assert main(["suggest", "--build-dir", bd, "--term", typo]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows, "no suggestions returned"
    assert all(r["input_term"] == typo and r["dist"] <= 1 for r in rows)
    assert any(r["term"] == term for r in rows)
    # df-descending ranking
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)


def test_cli_merge(ray_session, tmp_path, capsys):
    full = make_corpus(90, seed=21)
    corpus_a = str(tmp_path / "ma.parquet")
    corpus_b = str(tmp_path / "mb.parquet")
    pq.write_table(full.slice(0, 50), corpus_a)
    pq.write_table(full.slice(50), corpus_b)
    da, db = str(tmp_path / "ia"), str(tmp_path / "ib")
    out = str(tmp_path / "merged")

    assert main(["build", "--input", corpus_a, "--build-dir", da, "--n-buckets", "4"]) == 0
    assert main(["build", "--input", corpus_b, "--build-dir", db, "--n-buckets", "4"]) == 0
    capsys.readouterr()
    assert main(["merge", "--build-dir", da, "--build-dir", db,
                 "--out-dir", out]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["stats"]["n_docs"] == 90

    # the merged index serves queries
    assert main(["query", "--build-dir", out, "--text", "get_value index"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    assert lines and all("doc_id" in json.loads(l) for l in lines)


def test_cli_vindex_and_shards(ray_session, tmp_path, capsys):
    """vindex-build → vindex-query → vindex-update round-trip, plus the
    shards-export surface, all through the CLI."""
    SF = "/root/testdata/sf0.001"

    # vector index over the testdata embeddings (copied so ids are ours)
    import pyarrow.parquet as _pq

    emb = _pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    src = str(tmp_path / "emb.parquet")
    n = emb.num_rows
    _pq.write_table(emb.slice(0, n - 30), src)
    idx = str(tmp_path / "vidx")

    assert main(["vindex-build", "--embeddings", src, "--out-dir", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_vectors"] == n - 30

    assert main(["vindex-query", "--index-dir", idx, "--k", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    rows = [json.loads(l) for l in lines]
    assert rows and all(r["rank"] <= 5 for r in rows)

    delta = str(tmp_path / "delta.parquet")
    _pq.write_table(emb.slice(n - 30), delta)
    assert main(["vindex-update", "--embeddings", delta, "--index-dir", idx]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_vectors"] == n and out["updates"] == 1

    # shard export
    shards = str(tmp_path / "shards")
    assert main(
        ["shards-export", "--sf-dir", SF, "--out-dir", shards,
         "--target-chars", "40000"]
    ) == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["n_shards"] >= 2
    import os as _os

    assert _os.path.exists(_os.path.join(shards, "manifest.json"))


def test_cli_vindex_query_with_queries_file(ray_session, tmp_path, capsys):
    """vindex-query --queries serves an arbitrary query-vector parquet
    through the VectorScorerActor pool."""
    import os as _os

    import pyarrow.parquet as _pq

    SF = "/root/testdata/sf0.001"
    emb = _pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    src = str(tmp_path / "emb.parquet")
    _pq.write_table(emb, src)
    idx = str(tmp_path / "vidx")
    assert main(["vindex-build", "--embeddings", src, "--out-dir", idx]) == 0
    capsys.readouterr()

    qfile = str(tmp_path / "q.parquet")
    _pq.write_table(
        emb.slice(0, 4).rename_columns(["query_id", "embedding"]), qfile
    )
    assert main(
        ["vindex-query", "--index-dir", idx, "--queries", qfile, "--k", "3"]
    ) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3}
    assert all(r["rank"] <= 3 for r in rows)


def test_cli_split_export(ray_session, tmp_path, capsys):
    """split-export writes hive split= partitions whose doc sets (a) cover
    the corpus exactly once and (b) respect the per-cluster split rule."""
    import os

    import pyarrow.dataset as pds

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "splits")
    assert main(["split-export", "--sf-dir", SF, "--out-dir", out]) == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(counts) <= {"train", "valid", "test"}
    n_docs = pq.read_metadata(os.path.join(SF, "documents.parquet")).num_rows
    assert sum(counts.values()) == n_docs
    t = pds.dataset(out, partitioning="hive").to_table(
        columns=["doc_id", "cluster_id", "split"]
    )
    df = t.to_pandas()
    assert df["doc_id"].is_unique and len(df) == n_docs
    assert (df.groupby("cluster_id")["split"].nunique() == 1).all()


def test_cli_profile(tmp_path):
    """`profile` prints one JSON object with the sketch sections; the
    quantile section appears only when events.parquet exists."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "sharesci_ray", "profile",
         "--sf-dir", "/root/testdata/sf0.001", "--skip-overlap"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["distinct_shingles_hll"][0]["estimate"] > 0
    assert len(out["term_counts_cms"]) == 24
    assert len(out["value_quantiles_sketch"]) == 5
    assert "source_overlap_top5" not in out
