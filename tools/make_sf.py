#!/usr/bin/env python
"""Deterministic sf-scaled testdata generator (VERDICT r4 #4: the sf1
stress point).

The driver's own generator isn't on disk, so this synthesizes a dataset of
EXACTLY the same shape (schemas, key relationships, value domains and
distributions mirrored from /root/testdata/sf0.1) at any scale factor —
seeded, so every run reproduces bit-identical tables.  Parity remains
meaningful because the sweep compares the Ray engine against the DuckDB
oracle ON THE SAME PARQUET; nothing depends on matching the driver's RNG.

Usage:
    python tools/make_sf.py --sf 1.0 --out /tmp/sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEG = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
US = pa.timestamp("us")
DAY_US = 86_400_000_000


def _ts(base_iso: str, offsets_us: np.ndarray) -> pa.Array:
    base = np.datetime64(base_iso, "us").astype(np.int64)
    return pa.array(base + offsets_us.astype(np.int64), US)


def _round2(x: np.ndarray) -> np.ndarray:
    return np.round(x, 2)


def generate(sf: float, out_dir: str, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    counts = {}

    def w(name: str, tbl: pa.Table):
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = tbl.num_rows

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(
            _round2(rng.uniform(-1000, 10000, n_cust)), pa.float64()),
        "c_mktsegment": pa.array(np.array(MKTSEG)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(
            _round2(rng.uniform(-1000, 10000, n_supp)), pa.float64()),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([
            f"Brand#{i}" for i in rng.integers(1, 26, n_part)
        ]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            _round2(rng.uniform(900, 1000, n_part)), pa.float64()),
    }))
    odate_span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    w("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(
            _round2(rng.uniform(1000, 500000, n_ord)), pa.float64()),
        "o_orderdate": _ts(
            "1995-01-01T00:00:00",
            rng.integers(0, odate_span_days + 1, n_ord) * DAY_US),
        "o_orderpriority": pa.array(np.array(PRIO)[rng.integers(0, 5, n_ord)]),
    }))
    # lineitem: 1-7 lines per order (avg ~4)
    n_lines = rng.integers(1, 8, n_ord)
    okeys = np.repeat(np.arange(n_ord, dtype=np.int64), n_lines)
    n_li = okeys.size
    linenum = (np.arange(n_li) -
               np.repeat(np.cumsum(n_lines) - n_lines, n_lines) + 1)
    sdate_span_days = (np.datetime64("2001-11-04") - np.datetime64("1995-01-02")).astype(int)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(
            _round2(rng.uniform(900, 105000, n_li)), pa.float64()),
        "l_discount": pa.array(
            rng.integers(0, 11, n_li) / 100.0, pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, n_li) / 100.0, pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts(
            "1995-01-02T00:00:00",
            rng.integers(0, sdate_span_days + 1, n_li) * DAY_US),
    }))
    # events: a 30-day stream, strictly sorted by ts within event_id order
    evt_span_us = 30 * DAY_US
    ts_off = np.sort(rng.integers(0, evt_span_us, n_evt))
    w("events", pa.table({
        "event_id": pa.array(range(n_evt), pa.int64()),
        "ts": _ts("2024-01-01T00:00:00", ts_off),
        "user_id": pa.array(rng.integers(0, 1500, n_evt), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_evt)]),
        "value": pa.array(_round2(rng.exponential(50.0, n_evt)), pa.float64()),
        "props": pa.array([
            '{"k": %d}' % k for k in rng.integers(0, 100, n_evt)
        ]),
    }))
    # documents: vocab sentences, ~0.16% exact duplicates, en-heavy langs
    n_toks = rng.integers(8, 106, n_doc)
    vocab = np.array(DOC_VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_toks
    ]
    for i in range(625, n_doc, 625):  # planted exact dups (8 per 5k docs)
        texts[i] = texts[i - 1]
    lang_pick = rng.random(n_doc)
    langs = np.where(
        lang_pick < 0.40, "en",
        np.array(LANGS)[1:][(lang_pick * 1e6).astype(np.int64) % 4],
    )
    w("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: unit-norm float32 64-dim + a random 0-9 label
    mat = rng.standard_normal((n_emb, 64))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat.astype(np.float32)
    w("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, "rows": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
