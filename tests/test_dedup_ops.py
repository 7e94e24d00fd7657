"""Dedup + similarity kernels and ops (functions/dedup.py, ops_dedup.py):
hash determinism, minhash invariants, simhash banding completeness, planted
near-dup recovery, and LSH-ANN recall vs the brute-force baseline."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from sharesci_ray.functions import dedup as dd

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def test_md5_int60_matches_reference():
    for s in ["", "hello", "a b c", "ünïcode"]:
        expect = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        assert dd.md5_int60([s])[0] == expect
        assert 0 <= expect < 2**60


def test_hash_strings_gather_equals_per_string():
    arr = pa.array(["x", "y", "x", "z", "y", "x"])
    got = dd.hash_strings(arr)
    exp = dd.md5_int60(arr.to_pylist())
    assert (got == exp).all()


def test_token_shingles_never_cross_rows():
    col = pa.array(["alpha beta gamma delta", "one two three", "tiny"])
    sh, parent = dd.token_shingles(col, k=3)
    assert sh.to_pylist() == [
        "alpha beta gamma",
        "beta gamma delta",
        "one two three",
    ]
    assert parent.tolist() == [0, 0, 1]  # row 2 (<3 tokens) emits nothing


def test_minhash_duplicate_shingles_are_noops():
    h = np.array([123456789, 123456789, 42], dtype=np.int64)
    p = np.array([0, 0, 0], dtype=np.int64)
    rows_a, sig_a = dd.minhash_signatures(h, p, 1)
    rows_b, sig_b = dd.minhash_signatures(h[1:], p[:2], 1)
    assert (sig_a == sig_b).all()


def test_minhash_identical_sets_identical_sigs():
    h = np.array([11, 22, 33, 33, 22, 11], dtype=np.int64)
    p = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    _rows, sigs = dd.minhash_signatures(h, p, 2)
    assert (sigs[0] == sigs[1]).all()


def test_simhash_deterministic_and_tf_weighted():
    a = dd.simhash60(pa.array(["hash join hash join hash join scan"]))
    b = dd.simhash60(pa.array(["hash join hash join hash join scan"]))
    assert a[0] == b[0] != 0
    assert 0 <= a[0] < 2**60


def test_simhash_chunks_pigeonhole():
    sim = np.array([0b111, 0], dtype=np.int64)  # hamming 3
    ch = dd.simhash_chunks(sim)
    assert (ch[0] == ch[1]).sum() >= 1  # at least one shared chunk


def test_hamming60():
    a = np.array([0b1011], dtype=np.int64)
    b = np.array([0b0010], dtype=np.int64)
    assert dd.hamming60(a, b)[0] == 2


# ---------------------------------------------------------------------------
# ops (sf0.001 end-to-end; driver-parity vs SQL runs in test_driver_parity)
# ---------------------------------------------------------------------------

def test_planted_near_dups_recovered(ray_session):
    """The testdata generator plants near-identical documents; exact Jaccard
    must find them and minhash-LSH candidates must cover every Jaccard pair
    (at J≥0.8, 4x4 LSH misses with probability (1-0.8^4)^4 ≈ 4%/pair; the
    planted pairs are J≈0.99 → miss prob < 1e-5)."""
    from sharesci_ray.pipelines.ops_dedup import dedup_minhash_lsh, near_dup_jaccard

    jac = near_dup_jaccard(SF).to_pandas()
    assert len(jac) > 0, "no planted near-dups found at sf0.001"
    assert (jac["jaccard"] >= 0.8).all()
    assert (jac["inter"] <= jac["union_sz"]).all()

    cand = dedup_minhash_lsh(SF).to_pandas()
    cand_set = set(zip(cand["doc_a"], cand["doc_b"]))
    jac_pairs = set(zip(jac["doc_a"], jac["doc_b"]))
    missed = jac_pairs - cand_set
    assert not missed, f"LSH candidates missed high-jaccard pairs: {missed}"


def test_simhash_pairs_subset_of_low_hamming(ray_session):
    from sharesci_ray.pipelines.ops_dedup import dedup_simhash, doc_simhash

    sims = doc_simhash(SF).to_pandas().set_index("doc_id")["simhash"]
    pairs = dedup_simhash(SF).to_pandas()
    for _, r in pairs.iterrows():
        h = bin(int(sims[r["doc_a"]]) ^ int(sims[r["doc_b"]])).count("1")
        assert h == r["hamming"] <= 3
    # completeness vs brute force over all pairs
    ids = sims.index.to_numpy()
    vals = sims.to_numpy()
    brute = set()
    for i in range(len(ids)):
        x = vals[i] ^ vals[i + 1 :]
        for j in np.flatnonzero(np.array([bin(int(v)).count("1") for v in x]) <= 3):
            brute.add((ids[i], ids[i + 1 + j]))
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert got == brute


def test_ann_lsh_recall_vs_brute_force(ray_session):
    from sharesci_ray.pipelines.ops_dedup import ann_lsh_topk, ann_topk_cosine

    brute = ann_topk_cosine(SF).to_pandas()
    approx = ann_lsh_topk(SF).to_pandas()
    recalls = []
    for q in brute["query_id"].unique():
        b = set(brute[brute["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.5, f"LSH recall too low: {np.mean(recalls):.2f}"
    # approx output is well-formed top-k
    assert (approx.groupby("query_id")["rank"].min() == 1).all()


def test_near_dup_embedding_threshold(ray_session):
    from sharesci_ray.pipelines.ops_dedup import near_dup_embedding

    pairs = near_dup_embedding(SF).to_pandas()
    assert (pairs["vec_a"] < pairs["vec_b"]).all()
