"""Stages 02b-04: hot-term detection, salted bucket keys, posting-list encoding.

SURVEY.md §3.1 stages 02b/03/04; A1/A3/C1-C3 (ref: n/a, §0 — reference
checkout empty; contract BASELINE.json:6,14: "term-partitioned posting-list
construction via groupby-aggregate shuffle with explicit salting for hot
terms", "delta + varbyte-compressed posting lists", "partitioning / shuffle /
skew handled explicitly").

Shuffle design
--------------
The wide step is ONE ``groupby("bucket")`` over the postings.  The key is
``hash(term) % P`` — P buckets, not |vocab| keys, which caps the sort-shuffle
key cardinality and lets the reducer encode thousands of terms per group in
one vectorized pass.  Hot terms (detected by a cheap partial-count pre-pass)
get *dedicated salted buckets*: term t with salt factor S occupies S buckets,
``salt = doc_id * S // n_docs`` — doc-RANGE salting, so the S partial posting
lists cover disjoint ascending doc-id ranges and merge by concatenation.
A hot term therefore never funnels 1-10%% of all postings through a single
reducer (the skew hazard called out in SURVEY.md §7).

Segment schema (T3): term, df, salt_idx(-1=final), n_postings, docids(binary,
delta+varbyte), tfs(binary, varbyte), dls(binary, varbyte), block_first_docid
(list<int64>), block_max_tfnorm(list<float64>), term_bucket(int32).
Block maxes exclude idf — the scorer multiplies by idf(global df), which
keeps salted partials mergeable AND usable unmerged (multi-row terms) at
extreme scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.bm25 import tf_norm
from ..functions.codecs import (
    decode_docids,
    decode_values,
    delta_decode,
    varbyte_decode,
    varbyte_encode_with_lengths,
)
from ..functions.hashing import polyhash_column

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("salt_idx", pa.int32()),
        ("n_postings", pa.int64()),
        ("docids", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
        ("block_first_docid", pa.list_(pa.int64())),
        ("block_max_tfnorm", pa.list_(pa.float64())),
        ("term_bucket", pa.int32()),
    ]
)


@dataclass(frozen=True)
class SaltPlan:
    """Hot-term salting: term → (first dedicated bucket id, salt factor).

    ``doc_shards`` generalizes the doc-range split to EVERY term: with S
    shards, every posting gets ``salt_idx = doc_id·S // n_docs`` and routes
    to bucket ``hash(term) % n_buckets + n_buckets·salt_idx`` — the layout
    behind doc-sharded query serving (each query actor owns one complete
    per-doc-range slice of the index; see query.run_queries_sharded).
    """

    n_buckets: int
    n_docs: int
    salts: dict[str, tuple[int, int]] = field(default_factory=dict)  # term -> (base, S)
    doc_shards: int | None = None

    @staticmethod
    def plan(
        hot_counts: dict[str, int], n_buckets: int, n_docs: int, target_group: int
    ) -> "SaltPlan":
        salts: dict[str, tuple[int, int]] = {}
        base = n_buckets
        for term in sorted(hot_counts):
            s = max(1, min(64, -(-hot_counts[term] // target_group)))
            if s > 1:
                salts[term] = (base, s)
                base += s
        return SaltPlan(n_buckets=n_buckets, n_docs=n_docs, salts=salts)


def detect_hot_terms(
    postings: ray.data.Dataset, top_m: int = 256
) -> dict[str, int]:
    """A3: estimated posting counts of the globally hottest terms.

    Per-batch exact partial counts, truncated to the per-batch top 4M (heavy
    hitters survive truncation under uniform partitioning), then a tiny
    groupby over the partials.  Never shuffles the postings themselves.
    """

    def partial(batch: pa.Table) -> pa.Table:
        gb = (
            pa.table({"term": batch["term"]})
            .group_by("term")
            .aggregate([([], "count_all")])
        )
        gb = gb.sort_by([("count_all", "descending")]).slice(0, 4 * top_m)
        return pa.table({"term": gb["term"], "cnt": pc.cast(gb["count_all"], pa.int64())})

    parts = postings.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # Partials are bounded (≤ 4·top_m rows per block), so merge them on the
    # driver — a groupby+sort shuffle for a few hundred KB costs more in
    # scheduling than it saves.  At extreme block counts (10^12-doc scale)
    # insert a repartition(√n_blocks) partial-merge round before this.
    from collections import Counter

    acc: Counter = Counter()
    for row_batch in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        # per-pair += (NOT Counter.update(dict(...)): the dict() would dedupe
        # a term repeated within one coalesced batch, dropping counts)
        for t, c in zip(row_batch["term"].to_pylist(), row_batch["cnt"].to_pylist()):
            acc[t] += c
    return dict(acc.most_common(top_m))


def make_bucket_assigner(plan: SaltPlan):
    """Stage 03 key assignment: adds bucket(int32) + salt_idx(int32) columns."""
    salts = plan.salts
    n_buckets = np.uint64(plan.n_buckets)
    n_docs = max(1, plan.n_docs)

    def assign(batch: pa.Table) -> pa.Table:
        h = polyhash_column(batch["term"])
        bucket = (h % n_buckets).astype(np.int32)
        if plan.doc_shards:
            # doc-sharded layout: every posting carries its doc-range shard
            s = np.int64(plan.doc_shards)
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            shard = np.minimum(doc_ids * s // n_docs, s - 1).astype(np.int32)
            bucket = (bucket + np.int32(plan.n_buckets) * shard).astype(np.int32)
            return batch.append_column("bucket", pa.array(bucket)).append_column(
                "salt_idx", pa.array(shard)
            )
        salt_idx = np.full(batch.num_rows, -1, dtype=np.int32)
        if salts:
            terms = batch["term"]
            mask = pc.is_in(terms, value_set=pa.array(list(salts.keys()))).to_numpy(
                zero_copy_only=False
            )
            if mask.any():
                idx = np.flatnonzero(mask)
                hot_terms = terms.take(pa.array(idx)).to_pylist()
                doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[idx]
                bases = np.array([salts[t][0] for t in hot_terms], dtype=np.int64)
                ss = np.array([salts[t][1] for t in hot_terms], dtype=np.int64)
                s_idx = (doc_ids.astype(np.int64) * ss) // n_docs
                s_idx = np.minimum(s_idx, ss - 1)
                bucket[idx] = (bases + s_idx).astype(np.int32)
                salt_idx[idx] = s_idx.astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket)).append_column(
            "salt_idx", pa.array(salt_idx)
        )

    return assign


def make_bucket_packer(plan: SaltPlan):
    """Stage 03 (packed + compressed shuffle): one OUTPUT ROW PER
    (input batch, bucket), with the posting payload varbyte-compressed
    BEFORE the all-to-all.

    Raw postings cost ~20 B/posting plus a term string each; at 10^12-file
    scale the exchange is memory/network-bandwidth-bound, so the shuffle
    unit here is a mini-segment: doc ids delta+varbyte (doc-major explode
    order keeps them non-decreasing inside a bucket run), tf/dl varbyte,
    terms as a per-pack dictionary ('\\n'-joined uniques — tokens are
    [a-z0-9]+ so '\\n' never collides) + varbyte dictionary indices.
    ~5 B/posting on the wire, ~n_batches × n_buckets rows through the
    groupby instead of one row per posting.  salt_idx is constant within a
    pack (a salted bucket IS one (term, salt) slice), so it ships once.
    """
    assigner = make_bucket_assigner(plan)

    def pack(batch: pa.Table) -> pa.Table:
        keyed = assigner(batch)
        bucket = keyed["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        b_sorted = bucket[order]
        if order.size:
            run_start = np.concatenate(
                [[0], np.flatnonzero(b_sorted[1:] != b_sorted[:-1]) + 1]
            )
            run_end = np.concatenate([run_start[1:], [order.size]])
        else:
            run_start = run_end = np.empty(0, dtype=np.int64)

        terms = keyed["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        terms_sorted = terms.take(pa.array(order))
        doc_ids = keyed["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
        tfs = keyed["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        dls = keyed["dl"].to_numpy(zero_copy_only=False).astype(np.uint64)[order]
        salt = keyed["salt_idx"].to_numpy(zero_copy_only=False).astype(np.int32)[order]

        # ---- fully vectorized encode: ONE varbyte call per column over the
        # whole batch, then byte-sliced per run via the returned lengths ----
        n_rows = order.size

        # doc gaps: global diff, reset to the absolute id at each run start
        gaps = doc_ids.copy()
        if n_rows:
            gaps[1:] -= doc_ids[:-1]
            gaps[run_start] = doc_ids[run_start]

        def _enc_offsets(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            enc, lens = varbyte_encode_with_lengths(vals.astype(np.uint64))
            off = np.concatenate([[0], np.cumsum(lens)])
            return enc, off

        enc_d, off_d = _enc_offsets(gaps)
        enc_tf, off_tf = _enc_offsets(tfs)
        enc_dl, off_dl = _enc_offsets(dls)

        # per-run term dictionary: one GLOBAL dictionary_encode, then per run
        # remap global codes → dense run-local codes (np.unique per run is
        # the only loop — O(run vocab), not O(postings))
        dic = pc.dictionary_encode(terms_sorted)
        g_idx = np.asarray(dic.indices, dtype=np.int64)
        g_dict = dic.dictionary
        # the pack wire format joins dictionary terms with '\n'; the default
        # tokenizer can't emit one, but a custom §2.11 tokenizer could — and
        # a '\n' inside a term would silently shift every dictionary index
        # in the pack.  Fail loudly instead.
        if len(g_dict) and pc.any(pc.match_substring(g_dict, "\n")).as_py():
            raise ValueError(
                "tokenizer produced a term containing '\\n' — incompatible "
                "with the packed-shuffle dictionary format"
            )
        local_idx = np.empty(n_rows, dtype=np.int64)
        uniq_concat: list[np.ndarray] = []
        uniq_counts = np.empty(run_start.size, dtype=np.int64)
        for r, (s, e) in enumerate(zip(run_start, run_end)):
            uniq, inv = np.unique(g_idx[s:e], return_inverse=True)
            local_idx[s:e] = inv
            uniq_concat.append(uniq)
            uniq_counts[r] = uniq.size
        enc_ti, off_ti = _enc_offsets(local_idx)
        all_uniq = (
            np.concatenate(uniq_concat) if uniq_concat else np.empty(0, dtype=np.int64)
        )
        dict_offsets = pa.array(
            np.concatenate([[0], np.cumsum(uniq_counts)]), type=pa.int64()
        )
        dict_lists = pa.LargeListArray.from_arrays(
            dict_offsets, g_dict.take(pa.array(all_uniq))
        )
        term_dicts = pc.binary_join(dict_lists, "\n")

        def _slices(enc: np.ndarray, off: np.ndarray) -> list[bytes]:
            return [
                enc[off[s] : off[e]].tobytes() for s, e in zip(run_start, run_end)
            ]

        return pa.table(
            {
                "bucket": pa.array(b_sorted[run_start].astype(np.int32)),
                "salt": pa.array(salt[run_start] if n_rows else salt),
                "n": pa.array((run_end - run_start).astype(np.int64)),
                "term_dict": term_dicts,
                "term_idx": pa.array(_slices(enc_ti, off_ti), pa.large_binary()),
                "docids_vb": pa.array(_slices(enc_d, off_d), pa.large_binary()),
                "tfs_vb": pa.array(_slices(enc_tf, off_tf), pa.large_binary()),
                "dls_vb": pa.array(_slices(enc_dl, off_dl), pa.large_binary()),
            }
        )

    return pack


def make_packed_encoder(
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    n_route_buckets: int,
):
    """A1 (packed shuffle): per-bucket reducer over compressed packs —
    vectorized varbyte decode, dictionary gather, one (term, doc_id) sort,
    then the shared run encoder."""

    def encode(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return SEGMENT_SCHEMA.empty_table()
        term_parts, did_parts, tf_parts, dl_parts, salt_parts = [], [], [], [], []
        salts = group["salt"].to_pylist()
        dicts = group["term_dict"].to_pylist()
        for i in range(group.num_rows):
            idx = varbyte_decode(group["term_idx"][i].as_py()).astype(np.int64)
            dict_arr = pa.array(dicts[i].split("\n"), pa.string())
            term_parts.append(dict_arr.take(pa.array(idx)))
            did_parts.append(delta_decode(varbyte_decode(group["docids_vb"][i].as_py())))
            tf_parts.append(varbyte_decode(group["tfs_vb"][i].as_py()).astype(np.int64))
            dl_parts.append(varbyte_decode(group["dls_vb"][i].as_py()).astype(np.int64))
            salt_parts.append(np.full(idx.size, salts[i], dtype=np.int32))
        t = pa.table(
            {
                "term": pa.concat_arrays(term_parts),
                "doc_id": pa.array(np.concatenate(did_parts)),
                "tf": pa.array(np.concatenate(tf_parts)),
                "dl": pa.array(np.concatenate(dl_parts)),
                "salt_idx": pa.array(np.concatenate(salt_parts)),
            }
        ).sort_by([("term", "ascending"), ("doc_id", "ascending")])
        return _encode_runs(
            t["term"].combine_chunks() if isinstance(t["term"], pa.ChunkedArray) else t["term"],
            t["doc_id"].to_numpy(zero_copy_only=False),
            t["tf"].to_numpy(zero_copy_only=False),
            t["dl"].to_numpy(zero_copy_only=False),
            t["salt_idx"].to_numpy(zero_copy_only=False),
            avgdl,
            k1,
            b,
            block_size,
            n_route_buckets,
        )

    return encode


def _encode_runs(
    terms: pa.Array,
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    salt_idx: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    n_route_buckets: int,
) -> pa.Table:
    """Vectorized core: rows sorted by (term, doc_id) → one segment row per term run."""
    n = docids.size
    if n == 0:
        return SEGMENT_SCHEMA.empty_table()
    codes = pc.dictionary_encode(terms)
    code_np = np.asarray(codes.indices)
    run_start = np.concatenate([[0], np.flatnonzero(code_np[1:] != code_np[:-1]) + 1])
    run_end = np.concatenate([run_start[1:], [n]])
    run_len = run_end - run_start

    gaps = docids.astype(np.int64).copy()
    gaps[1:] -= docids[:-1]
    gaps[run_start] = docids[run_start]
    enc_d, len_d = varbyte_encode_with_lengths(gaps.astype(np.uint64))
    enc_t, len_t = varbyte_encode_with_lengths(tfs.astype(np.uint64))
    enc_l, len_l = varbyte_encode_with_lengths(dls.astype(np.uint64))
    off_d = np.concatenate([[0], np.cumsum(len_d)])
    off_t = np.concatenate([[0], np.cumsum(len_t)])
    off_l = np.concatenate([[0], np.cumsum(len_l)])

    tfn = tf_norm(tfs, dls, avgdl, k1, b)
    # global block starts: for each run, run_start + block_size * j
    n_blocks = -(-run_len // block_size)
    total_blocks = int(n_blocks.sum())
    blk_run = np.repeat(np.arange(run_start.size), n_blocks)
    blk_first_of_run = np.concatenate([[0], np.cumsum(n_blocks)])[:-1]
    intra = np.arange(total_blocks) - blk_first_of_run[blk_run]
    blk_starts = run_start[blk_run] + intra * block_size
    bmax = np.maximum.reduceat(tfn, blk_starts) if total_blocks else np.empty(0)
    bfirst = docids[blk_starts] if total_blocks else np.empty(0, dtype=np.int64)

    uniq_terms = pc.take(codes.dictionary, pa.array(code_np[run_start]))
    route = (polyhash_column(uniq_terms) % np.uint64(n_route_buckets)).astype(np.int32)

    d_bytes = [enc_d[off_d[s] : off_d[e]].tobytes() for s, e in zip(run_start, run_end)]
    t_bytes = [enc_t[off_t[s] : off_t[e]].tobytes() for s, e in zip(run_start, run_end)]
    l_bytes = [enc_l[off_l[s] : off_l[e]].tobytes() for s, e in zip(run_start, run_end)]

    blk_offsets = pa.array(np.concatenate([[0], np.cumsum(n_blocks)]), type=pa.int32())
    return pa.table(
        {
            "term": uniq_terms,
            "df": pa.array(run_len.astype(np.int64)),
            "salt_idx": pa.array(salt_idx[run_start].astype(np.int32)),
            "n_postings": pa.array(run_len.astype(np.int64)),
            "docids": pa.array(d_bytes, type=pa.binary()),
            "tfs": pa.array(t_bytes, type=pa.binary()),
            "dls": pa.array(l_bytes, type=pa.binary()),
            "block_first_docid": pa.ListArray.from_arrays(
                blk_offsets, pa.array(bfirst.astype(np.int64))
            ),
            "block_max_tfnorm": pa.ListArray.from_arrays(
                blk_offsets, pa.array(bmax.astype(np.float64))
            ),
            "term_bucket": pa.array(route),
        }
    )


def make_bucket_encoder(
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
    n_route_buckets: int,
):
    """A1: per-bucket reducer — sort by (term, doc_id), encode every term run."""

    def encode(group: pa.Table) -> pa.Table:
        t = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        return _encode_runs(
            t["term"].combine_chunks() if isinstance(t["term"], pa.ChunkedArray) else t["term"],
            t["doc_id"].to_numpy(zero_copy_only=False),
            t["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dl"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["salt_idx"].to_numpy(zero_copy_only=False),
            avgdl,
            k1,
            b,
            block_size,
            n_route_buckets,
        )

    return encode


def make_salted_merger(avgdl: float, k1: float, b: float, block_size: int, n_route_buckets: int):
    """Stage 04: merge one term's salted partial rows into a final segment row.

    Partials cover disjoint ascending doc-id ranges (doc-range salting), so
    the merge is decode → concatenate in salt order → re-encode.
    """

    def merge(group: pa.Table) -> pa.Table:
        # input is pre-filtered to salted partials (salt_idx != -1) by
        # build.py; every group is decoded, concatenated, re-encoded
        g = group.sort_by([("salt_idx", "ascending")])
        docids = np.concatenate([decode_docids(bs.as_py()) for bs in g["docids"]])
        tfs = np.concatenate([decode_values(bs.as_py()) for bs in g["tfs"]])
        dls = np.concatenate([decode_values(bs.as_py()) for bs in g["dls"]])
        term_arr = pa.array([g["term"][0].as_py()] * docids.size, type=pa.string())
        return _encode_runs(
            term_arr,
            docids.astype(np.int64),
            tfs,
            dls,
            np.full(docids.size, -1, dtype=np.int32),
            avgdl,
            k1,
            b,
            block_size,
            n_route_buckets,
        )

    return merge
