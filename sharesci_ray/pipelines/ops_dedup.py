"""Dedup + similarity-search operators (task brief: training-data pipeline
ops as first-class components; ref: n/a — SURVEY.md §0).

Every op here has a value-checkable DuckDB oracle built from the SAME hash
constants as the Python kernels (functions/dedup.py): md5-int60 string
hashes, (a·h+b) mod 2^31−1 minhash permutations, md5 band keys, integer
simhash sums — bit-exact on both sides, so the driver's order-insensitive
value hash matches exactly.

Scale notes (100 TB): the pair-emitting group stages (shared shingle /
band bucket / simhash chunk) are the classic LSH shapes — group sizes are
bounded by band selectivity, not corpus size; a stopword-like shingle with
df=millions would be dropped by a df-cap pre-pass (same pre-pass as the
hot-term salting in stages/encode.py) before pair emission.  The
embedding ops broadcast the small side (query matrix / ≤10^6-row
candidate side) via ray.put; past that, the scale path is the LSH variant
(ann_lsh_topk) whose buckets shard the cross-join.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import dedup as dd
from ..functions.text import SQL_TOKENIZE
from ..sources.corpus import read_table
from .ops import op

_TOKS = SQL_TOKENIZE.format(col="text")
_H60_S = dd.SQL_H60.format(s="s")

# shared SQL CTE prefix: documents → tokens → distinct shingle hashes (h31).
# hs dedups per (doc, h31) — the HASH, not the string — because the engine's
# per-doc shingle sets are hash-keyed; two distinct shingles colliding in
# 31 bits must count once on BOTH sides or sizes/intersections diverge.
_SQL_SHINGLE_CTES = f"""
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest({dd.sql_shingles('t')}) AS s
      FROM toks WHERE len(t) >= {dd.SHINGLE_K}
    ),
    hs AS (SELECT DISTINCT doc_id, {_H60_S} % {dd.P31} AS h31 FROM sh)
"""


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy flatten."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def _emit_pairs(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Group of co-bucketed rows → all (doc_a < doc_b) candidate pairs."""
    ids = sorted(set(group[id_col].to_pylist()))
    pairs = list(itertools.combinations(ids, 2))
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    """Per-query merge of partial candidates → ranked top-k
    (score desc, neighbor_id asc)."""
    s = group["score"].to_numpy(zero_copy_only=False)
    n = group["neighbor_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((n, -s))[:k]
    return pa.table(
        {
            "query_id": group["query_id"].take(pa.array(order)),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "neighbor_id": pa.array(n[order], pa.int64()),
        }
    )


def _query_matrix(emb, n_queries: int):
    """First-n query rows → (ids, normalized float64 matrix)."""
    q_rows = emb.filter(lambda r: r["vec_id"] < n_queries).take_all()
    q_ids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    q_mat = _normalize(np.array([r["embedding"] for r in q_rows], dtype=np.float64))
    return q_ids, q_mat


# ===========================================================================
# MinHash + LSH candidate pairs
# ===========================================================================

def _minhash_sql() -> str:
    return f"""
    WITH {_SQL_SHINGLE_CTES},
    perms(perm, a, b) AS (VALUES {dd.sql_perm_values()}),
    sig AS (
      SELECT doc_id, perm, min((a * h31 + b) % {dd.P31}) AS mh
      FROM hs CROSS JOIN perms GROUP BY doc_id, perm
    ),
    band AS (
      SELECT doc_id, perm // {dd.BAND_ROWS} AS band,
             md5(CAST(perm // {dd.BAND_ROWS} AS VARCHAR) || ':' ||
                 string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS band_key
      FROM sig GROUP BY doc_id, band
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM band a JOIN band b
      ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    """


@op("dedup_minhash_lsh", _minhash_sql())
def dedup_minhash_lsh(sf_dir: str):
    """MinHash(16 perms) + LSH(4 bands × 4 rows) near-dup candidate pairs.

    shingle → minhash → band → bucket-groupby → pair emission; the all-to-all
    exchange keys on band_key (bounded buckets), never on raw text.
    """
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def bands(batch: pa.Table) -> pa.Table:
        sh, parent = dd.token_shingles(batch["text"])
        h60 = dd.hash_strings(sh) if len(sh) else np.empty(0, dtype=np.int64)
        rows, sigs = dd.minhash_signatures(h60, parent, batch.num_rows)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[rows]
        return dd.band_keys(ids, sigs)

    band_ds = docs.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True)

    pairs = band_ds.groupby(["band", "band_key"]).map_groups(
        _emit_pairs, batch_format="pyarrow"
    )
    distinct = pairs.groupby(["doc_a", "doc_b"]).count()
    return distinct.select_columns(["doc_a", "doc_b"])


# ===========================================================================
# Exact n-gram Jaccard near-dup (verification-grade, SQL-exact)
# ===========================================================================

_JACCARD_MIN = 0.8


def _jaccard_sql() -> str:
    return f"""
    WITH {_SQL_SHINGLE_CTES},
    sz AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
    pair AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM hs a JOIN hs b ON a.h31 = b.h31 AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, inter,
           (sa.n + sb.n - inter) AS union_sz,
           inter * 1.0 / (sa.n + sb.n - inter) AS jaccard
    FROM pair
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= {_JACCARD_MIN}
    """


@op("near_dup_jaccard", _jaccard_sql())
def near_dup_jaccard(sf_dir: str):
    """Exact 3-token-shingle Jaccard ≥ 0.8 pairs (inter/union exact ints).

    Inverted-index pair generation: distinct (doc, shingle-hash) rows group
    by hash; each group emits its doc pairs; pair counts = intersection
    sizes; per-doc set sizes attach via distributed hash join (J2).
    """
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def distinct_shingles(batch: pa.Table) -> pa.Table:
        sh, parent = dd.token_shingles(batch["text"])
        if not len(sh):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "h31": pa.array([], pa.int64())}
            )
        h31 = dd.hash_strings(sh) % dd.P31
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[parent]
        return (
            pa.table({"doc_id": pa.array(ids), "h31": pa.array(h31)})
            .group_by(["doc_id", "h31"])
            .aggregate([])
        )

    hs = docs.map_batches(distinct_shingles, batch_format="pyarrow", zero_copy_batch=True)

    sizes = hs.groupby("doc_id").count()  # (doc_id, count())

    pair_counts = (
        hs.groupby("h31")
        .map_groups(_emit_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .count()
    )  # (doc_a, doc_b, count() = intersection)

    sz_a = sizes.map_batches(
        lambda t: t.rename_columns(["doc_a", "n_a"]), batch_format="pyarrow"
    )
    sz_b = sizes.map_batches(
        lambda t: t.rename_columns(["doc_b", "n_b"]), batch_format="pyarrow"
    )
    j = pair_counts.join(sz_a, join_type="inner", num_partitions=4, on=("doc_a",))
    j = j.join(sz_b, join_type="inner", num_partitions=4, on=("doc_b",))

    def finalize(t: pa.Table) -> pa.Table:
        inter = pc.cast(t["count()"], pa.int64())
        union = pc.cast(
            pc.subtract(pc.add(t["n_a"], t["n_b"]), inter), pa.int64()
        )
        jac = pc.divide(
            pc.cast(inter, pa.float64()), pc.cast(union, pa.float64())
        )
        out = pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "inter": inter,
                "union_sz": union,
                "jaccard": jac,
            }
        )
        return out.filter(pc.greater_equal(jac, _JACCARD_MIN))

    return j.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# SimHash
# ===========================================================================

def _simhash_sql() -> str:
    h60_term = dd.SQL_H60.format(s="term")
    return f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    th AS (SELECT doc_id, tf, {h60_term} AS h FROM tf),
    bits AS (
      SELECT doc_id, b, sum(tf * (2 * ((h >> CAST(b AS INT)) & 1) - 1)) AS s
      FROM th, range({dd.SIMHASH_BITS}) r(b) GROUP BY 1, 2
    ),
    sh AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id
    )
    SELECT d.doc_id, COALESCE(sh.simhash, 0) AS simhash
    FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
    """


@op("doc_simhash", _simhash_sql())
def doc_simhash(sf_dir: str):
    """60-bit tf-weighted SimHash per document (integer-exact)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(dd.simhash60(batch["text"]), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_HAMMING_MAX = 3


def _simhash_pairs_sql() -> str:
    return f"""
    WITH sh AS ({_simhash_sql()})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
    """


@op("dedup_simhash", _simhash_pairs_sql())
def dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs: Hamming ≤ 3 over 60 bits.

    Candidate generation by 15-bit chunk banding (pigeonhole: Hamming ≤ 3
    ⇒ at least one of 4 chunks identical), then exact Hamming verify —
    identical output to the oracle's O(n²) scan without the O(n²) shuffle.
    """
    sims = doc_simhash(sf_dir)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        sim = batch["simhash"].to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ch = dd.simhash_chunks(sim)  # (n, 4)
        n = sim.size
        return pa.table(
            {
                "chunk_idx": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
                "chunk_val": pa.array(ch.T.reshape(-1)),
                "doc_id": pa.array(np.tile(ids, 4)),
                "simhash": pa.array(np.tile(sim, 4)),
            }
        )

    chunks = sims.map_batches(explode_chunks, batch_format="pyarrow", zero_copy_batch=True)

    def emit(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_pylist()
        sh = group["simhash"].to_pylist()
        order = np.argsort(ids)
        out_a, out_b, out_h = [], [], []
        for i, j in itertools.combinations(order, 2):
            h = bin(sh[i] ^ sh[j]).count("1")
            if h <= _HAMMING_MAX:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_h.append(h)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    pairs = chunks.groupby(["chunk_idx", "chunk_val"]).map_groups(
        emit, batch_format="pyarrow"
    )
    from ray.data.aggregate import Min

    distinct = pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming"))

    def rn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "hamming": pc.cast(t["min(hamming)"], pa.int64()),
            }
        )

    return distinct.map_batches(rn, batch_format="pyarrow", zero_copy_batch=True)


# ===========================================================================
# Embedding near-dup + ANN similarity search
# ===========================================================================

_COS_MIN = 0.4
_ANN_K = 10
_ANN_NQ = 10


@op(
    "near_dup_embedding",
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {_COS_MIN}
    """,
)
def near_dup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos ≥ 0.4), float64 everywhere.

    Small-side (the full normalized matrix at sandbox scale) broadcast once
    via ray.put; each batch does one float64 matmul against it.  Scale path:
    LSH-bucket both sides (ann_lsh_topk's hyperplane buckets) so only
    same-bucket blocks cross-join.

    Parity caveat: the engine computes normalize-then-dot, the oracle
    dot/(|a||b|) — algebraically equal, last-ulp different, so a pair whose
    cosine sits within ~1e-15 of the threshold could split the sets.  The
    testdata margin is ≥1e-5; a construction-exact variant would compare
    integer-quantized scores.
    """
    import ray

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = emb.take_all()
    ids_full = np.array([r["vec_id"] for r in full], dtype=np.int64)
    mat_full = _normalize(
        np.array([r["embedding"] for r in full], dtype=np.float64)
    )
    ref = ray.put((ids_full, mat_full))

    def pairs(batch: pa.Table) -> pa.Table:
        f_ids, f_mat = ray.get(ref)
        b_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        b_mat = _normalize(_embedding_matrix(batch))
        sims = b_mat @ f_mat.T  # (batch, full)
        bi, fi = np.nonzero((sims >= _COS_MIN) & (b_ids[:, None] < f_ids[None, :]))
        return pa.table(
            {
                "vec_a": pa.array(b_ids[bi], pa.int64()),
                "vec_b": pa.array(f_ids[fi], pa.int64()),
            }
        )

    return emb.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


@op(
    "ann_topk_cosine",
    f"""
    SELECT query_id, rank, neighbor_id FROM (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])) DESC,
                        b.vec_id
             ) AS rank
      FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
      WHERE a.vec_id < {_ANN_NQ}
    ) WHERE rank <= {_ANN_K}
    """,
)
def ann_topk_cosine(sf_dir: str):
    """Brute-force cosine top-k ANN baseline: queries = vec_id < 10, k=10.

    Query matrix broadcast via ray.put; per-batch float64 matmul + partial
    top-k (only k rows per query leave each batch); tiny final per-query
    merge.  Tie-break (score desc, vec_id asc); ranks only in the output —
    rank identity is the contract, scores differ in the last ulp across
    engines (same policy as bm25_topk).
    """
    import ray

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _query_matrix(emb, _ANN_NQ)
    ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        b_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        b_mat = _normalize(_embedding_matrix(batch))
        sims = qm @ b_mat.T  # (nq, batch)
        out_q, out_n, out_s = [], [], []
        for r in range(qi.size):
            s = sims[r]
            mask = b_ids != qi[r]
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            # partial top-k inside the batch: score desc, vec_id asc
            order = idx[np.lexsort((b_ids[idx], -s[idx]))][:_ANN_K]
            out_q.extend([qi[r]] * order.size)
            out_n.extend(b_ids[order])
            out_s.extend(s[order])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = emb.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)

    return partials.groupby("query_id").map_groups(
        lambda g: _final_topk(g, _ANN_K), batch_format="pyarrow"
    )


# ---- LSH-bucketed ANN: the scale path (approximate → no SQL oracle) -------

_LSH_PLANES = 4  # 16 buckets; tuned vs recall on the testdata distribution
_LSH_MULTIPROBE = 2  # probe all buckets within Hamming 2 of the query bucket

_PLANES: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    if dim not in _PLANES:
        _PLANES[dim] = np.random.RandomState(0xBEEF).standard_normal((_LSH_PLANES, dim))
    return _PLANES[dim]


def _bucket_of(mat: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket id per row (int in [0, 2^planes))."""
    proj = mat @ _planes(mat.shape[1]).T > 0  # (n, planes)
    return (proj.astype(np.int64) * (1 << np.arange(_LSH_PLANES))).sum(axis=1)


@op("ann_lsh_topk")  # approximate — rows-only driver check; recall tested in pytest
def ann_lsh_topk(sf_dir: str):
    """LSH-bucketed ANN (scale path): hyperplane-bucket the corpus with a
    groupby, brute-force only inside each query's probe buckets (all buckets
    within Hamming _LSH_MULTIPROBE of the query's bucket).  Recall vs ann_topk_cosine is asserted in
    tests/test_dedup_ops.py; output shape matches the brute-force op.
    """
    import ray

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q_ids, q_mat = _query_matrix(emb, _ANN_NQ)
    q_buckets = _bucket_of(q_mat)
    # multiprobe set: every bucket within Hamming _LSH_MULTIPROBE of the
    # query's bucket (Lv et al., "Multi-probe LSH", VLDB 2007) — recall/cost
    # knob; at scale add independent hash tables instead of wider probes
    probe: dict[int, list[int]] = {}
    for qi, b in zip(q_ids, q_buckets):
        for nb in range(1 << _LSH_PLANES):
            if bin(int(b) ^ nb).count("1") <= _LSH_MULTIPROBE:
                probe.setdefault(nb, []).append(int(qi))
    ref = ray.put((q_ids, q_mat, probe))

    def add_bucket(batch: pa.Table) -> pa.Table:
        m = _normalize(_embedding_matrix(batch))
        return batch.append_column("bucket", pa.array(_bucket_of(m), pa.int64()))

    bucketed = emb.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)

    def score_bucket(group: pa.Table) -> pa.Table:
        qi, qm, pr = ray.get(ref)
        bucket = int(group["bucket"][0].as_py())
        want = pr.get(bucket)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
        if not want:
            return empty
        b_ids = group["vec_id"].to_numpy(zero_copy_only=False)
        b_mat = _normalize(_embedding_matrix(group))
        rows = {int(q): i for i, q in enumerate(qi)}
        out_q, out_n, out_s = [], [], []
        for q in want:
            s = qm[rows[q]] @ b_mat.T
            mask = b_ids != q
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                continue
            order = idx[np.lexsort((b_ids[idx], -s[idx]))][:_ANN_K]
            out_q.extend([q] * order.size)
            out_n.extend(b_ids[order])
            out_s.extend(s[order])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    partials = bucketed.groupby("bucket").map_groups(score_bucket, batch_format="pyarrow")

    return partials.groupby("query_id").map_groups(
        lambda g: _final_topk(g, _ANN_K), batch_format="pyarrow"
    )
