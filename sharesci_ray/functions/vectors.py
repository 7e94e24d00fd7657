"""Shared vector-search kernels + the IVF SQL twin.

Leaf module (no imports from the pipelines package): both ops_dedup and
ops_embed need these, and importing between op modules at decorator time
is a circular import — the same containment as the ANN fixture constants
(ANN_K / ANN_NQ) living in functions/dedup.py.

Everything here is integer-exact or float-closed-form so the DuckDB
oracles replay it bit-for-bit: quantization is a lossless power-of-two
floor, centroid assignment an int64 argmax, and the only floats are the
final cosine scores (one dot product of normalized float64 rows).
(ref: n/a — SURVEY.md §0: the reference checkout is empty; IVF per Sivic
& Zisserman ICCV 2003 / Jégou et al. TPAMI 2011.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import ANN_K, ANN_NQ

VEC_DIM = 64        # embeddings table dim (asserted at runtime by the ops)
QSCALE = 1 << 20    # embedding quantization: q = floor(x · 2^20)
IVF_C = 16          # number of inverted lists (centroids)
IVF_PROBE = 8       # lists probed per query

PARTIAL_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("neighbor_id", pa.int64()), ("score", pa.float64())]
)

TOPK_SCHEMA = pa.schema(
    [("query_id", pa.int64()), ("rank", pa.int64()), ("neighbor_id", pa.int64())]
)


def embedding_matrix(batch: pa.Table) -> np.ndarray:
    """list<float> column → (n, dim) float64 matrix, zero-copy flatten."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, -1).astype(np.float64)


def normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def quantize(mat: np.ndarray) -> np.ndarray:
    """float64 embedding rows → exact int64 lattice (SQL twin:
    CAST(floor(x * 2^20) AS BIGINT) over CAST(embedding AS DOUBLE[]))."""
    return np.floor(mat * QSCALE).astype(np.int64)


def ivf_assign(quant: np.ndarray, cent_q: np.ndarray) -> np.ndarray:
    """Nearest centroid per QUANTIZED row by int64 inner product; ties →
    smallest centroid id (np.argmax takes the first max; SQL twin orders
    d DESC, cid ASC)."""
    return np.argmax(quant @ cent_q.T, axis=1).astype(np.int64)


def final_topk(group: pa.Table, k: int) -> pa.Table:
    """Per-query merge of partial candidates → ranked top-k
    (score desc, neighbor_id asc)."""
    if group.num_rows == 0:
        return TOPK_SCHEMA.empty_table()
    s = group["score"].to_numpy(zero_copy_only=False)
    n = group["neighbor_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((n, -s))[:k]
    return pa.table(
        {
            "query_id": pc.cast(group["query_id"].take(pa.array(order)), pa.int64()),
            "rank": pa.array(np.arange(1, order.size + 1), pa.int64()),
            "neighbor_id": pa.array(n[order], pa.int64()),
        },
        schema=TOPK_SCHEMA,
    )


def ivf_sql() -> str:
    """Replay quantization, all n×C integer centroid dots, argmax list
    assignment, top-P probe and exact cosine re-ranking in SQL — the
    shared oracle of ann_ivf_topk AND ann_ivf_persisted (identical
    assignment/probe math by construction)."""
    dot = " + ".join(f"e.q[{d + 1}]*c.cq[{d + 1}]" for d in range(VEC_DIM))
    return f"""
    WITH emb AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {QSCALE}) AS BIGINT)) AS q,
             CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    cent AS (
      SELECT vec_id - {ANN_NQ} AS cid, q AS cq FROM emb
      WHERE vec_id >= {ANN_NQ} AND vec_id < {ANN_NQ + IVF_C}
    ),
    dots AS (
      SELECT e.vec_id, c.cid, {dot} AS d FROM emb e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT vec_id AS qid, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM dots WHERE vec_id < {ANN_NQ}
      ) WHERE rn <= {IVF_PROBE}
    ),
    cand AS (
      SELECT p.qid, a.vec_id
      FROM probe p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id != p.qid
    ),
    scored AS (
      SELECT c.qid AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(qe.e, be.e) AS score
      FROM cand c
      JOIN emb qe ON qe.vec_id = c.qid
      JOIN emb be ON be.vec_id = c.vec_id
    )
    SELECT query_id, rank, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, neighbor_id
             ) AS rank
      FROM scored
    ) WHERE rank <= {ANN_K}
    """
