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
