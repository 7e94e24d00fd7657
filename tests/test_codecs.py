"""C1/C2/C3 kernel unit + property tests (SURVEY.md §5.1, §5.2a)."""

import numpy as np
import pytest

from sharesci_ray.functions.codecs import (
    block_layout,
    decode_docids,
    decode_values,
    delta_decode,
    delta_encode,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
    varbyte_encode_with_lengths,
)

ADVERSARIAL = [
    np.array([], dtype=np.uint64),
    np.array([0], dtype=np.uint64),
    np.array([1], dtype=np.uint64),
    np.array([127, 128, 129], dtype=np.uint64),
    np.array([2**63 - 2], dtype=np.uint64),
    np.array([2**64 - 1], dtype=np.uint64),
    np.arange(1000, dtype=np.uint64),
    np.full(500, 300, dtype=np.uint64),
]


@pytest.mark.parametrize("arr", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_varbyte_roundtrip(arr):
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@pytest.mark.parametrize("dist", ["geometric", "uniform", "zipf"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varbyte_roundtrip_random(dist, seed):
    rng = np.random.default_rng(seed)
    if dist == "geometric":
        arr = rng.geometric(1e-4, size=5000).astype(np.uint64)
    elif dist == "uniform":
        arr = rng.integers(0, 2**62, size=5000, dtype=np.int64).astype(np.uint64)
    else:
        arr = rng.zipf(1.3, size=5000).astype(np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_lengths_sum_to_buffer():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 2**40, size=2000, dtype=np.int64).astype(np.uint64)
    buf, lens = varbyte_encode_with_lengths(arr)
    assert lens.sum() == buf.size
    # splitting at the length boundaries decodes each value independently
    offs = np.concatenate([[0], np.cumsum(lens)])
    for i in [0, 17, 1999]:
        assert varbyte_decode(buf[offs[i] : offs[i + 1]].tobytes())[0] == arr[i]


def test_delta_roundtrip():
    for seed in range(3):
        rng = np.random.default_rng(seed)
        d = np.cumsum(rng.integers(1, 10**6, size=4000)).astype(np.int64)
        assert np.array_equal(delta_decode(delta_encode(d)), d)
    assert delta_encode(np.array([], dtype=np.int64)).size == 0


def test_encode_postings_roundtrip():
    rng = np.random.default_rng(7)
    d = np.cumsum(rng.integers(1, 1000, size=3000)).astype(np.int64)
    tf = rng.integers(1, 50, size=3000).astype(np.uint64)
    db, tb = encode_postings(d, tf)
    assert np.array_equal(decode_docids(db), d)
    assert np.array_equal(decode_values(tb), tf.astype(np.int64))


def test_block_layout():
    d = np.arange(0, 1000, 3, dtype=np.int64)  # 334 docids
    bounds = np.linspace(1.0, 0.1, d.size)
    first, bmax = block_layout(d, bounds, block_size=128)
    assert first.size == bmax.size == 3
    assert first[0] == d[0] and first[1] == d[128] and first[2] == d[256]
    assert bmax[0] == bounds[:128].max()
    assert bmax[2] == bounds[256:].max()
    f0, b0 = block_layout(np.array([], dtype=np.int64), np.array([]))
    assert f0.size == 0 and b0.size == 0


# ---------------------------------------------------------------------------
# fast-path coverage for varbyte_decode (1-byte / uniform-2-byte / mixed-1-2
# streams take dedicated branches — exercise byte-length boundaries hard)
# ---------------------------------------------------------------------------

def test_varbyte_fastpath_boundaries():
    from sharesci_ray.functions.codecs import varbyte_decode, varbyte_encode

    cases = [
        np.array([0, 1, 126, 127], dtype=np.uint64),            # all 1-byte
        np.array([128, 300, 16383, 200], dtype=np.uint64),      # mixed 1/2
        np.array([128, 129, 16383, 16383], dtype=np.uint64),    # uniform 2-byte
        np.array([127, 128, 16383, 16384, 2097151], dtype=np.uint64),  # 1/2/3
        np.array([16384], dtype=np.uint64),                      # single 3-byte
        np.array([2**63 - 1, 0, 127, 128], dtype=np.uint64),     # huge + small
    ]
    for vals in cases:
        out = varbyte_decode(varbyte_encode(vals))
        assert (out == vals).all(), vals


def test_varbyte_fastpath_randomized():
    from sharesci_ray.functions.codecs import varbyte_decode, varbyte_encode

    rng = np.random.default_rng(1234)
    for width_max in (127, 16383, 2097151, 2**40):
        for _ in range(20):
            n = int(rng.integers(1, 500))
            vals = rng.integers(0, width_max, size=n).astype(np.uint64)
            out = varbyte_decode(varbyte_encode(vals))
            assert (out == vals).all()
