"""Multimodal plumbing (functions/media.py, ops_media.py): synth→decode
roundtrip, nearest-neighbor resize, frame sampling, actor-pool stage output
— all deterministic, value-checked against direct computation."""

from __future__ import annotations

import numpy as np
import pytest

from sharesci_ray.functions import media as md

SF = "/root/testdata/sf0.001"


def test_image_roundtrip():
    for mid in [0, 1, 7, 123]:
        blob = md.synth_image_blob(mid)
        w, h, c, px = md.decode_image(blob)
        assert (w, h, c) == md.synth_dims(mid)
        assert px.shape == (h, w, c) and px.dtype == np.uint8
        # decode is pure: same blob → same pixels
        assert (md.decode_image(blob)[3] == px).all()


def test_video_roundtrip_and_sampling():
    mid = 42
    blob = md.synth_video_blob(mid)
    n, w, h, c, frames = md.decode_video(blob)
    assert n == md.synth_n_frames(mid) and (w, h, c) == md.synth_dims(mid)
    idx, sums = md.sample_frames(blob, stride=2)
    assert idx.tolist() == list(range(0, n, 2))
    for i, s in zip(idx, sums):
        assert s == frames[i].sum(dtype=np.int64)


def test_decode_rejects_wrong_magic():
    with pytest.raises(ValueError):
        md.decode_image(b"JUNK" + b"\x00" * 16)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        md.decode_real_image(b"\x89PNG\r\n\x1a\n")


def test_resize_nearest_values():
    px = np.arange(2 * 4 * 1, dtype=np.uint8).reshape(2, 4, 1)
    r = md.resize_nearest(px, 2, 2)
    assert r.shape == (2, 2, 1)
    assert r[0, 0, 0] == px[0, 0, 0] and r[1, 1, 0] == px[1, 2, 0]


def test_audio_roundtrip_and_features():
    for mid in [0, 3, 42]:
        blob = md.synth_audio_blob(mid)
        n, rate, samples = md.decode_audio(blob)
        assert n == 1000 + (mid % 7) * 500 and rate == 8000
        e, p = md.audio_features(samples)
        assert e == np.abs(samples.astype(np.int64)).sum()
        assert p == np.abs(samples.astype(np.int64)).max()
    with pytest.raises(ValueError):
        md.decode_audio(b"WAVE" + b"\x00" * 16)


def test_audio_op_values(ray_session):
    from sharesci_ray.pipelines.ops_media import media_audio_energy

    feats = media_audio_energy(SF).to_pandas().set_index("media_id")
    for mid in feats.index[:10]:
        _n, _r, samples = md.decode_audio(md.synth_audio_blob(int(mid)))
        e, p = md.audio_features(samples)
        assert feats.loc[mid, "abs_energy"] == e and feats.loc[mid, "peak"] == p


def test_media_ops_values(ray_session):
    from sharesci_ray.pipelines.ops_media import (
        media_image_features,
        media_resize,
    )

    feats = media_image_features(SF).to_pandas().set_index("media_id")
    for mid in feats.index[:10]:
        _w, _h, _c, px = md.decode_image(md.synth_image_blob(int(mid)))
        assert feats.loc[mid, "px_sum"] == px.sum(dtype=np.int64)
        assert feats.loc[mid, "n_px"] == px.size
        assert np.isclose(feats.loc[mid, "mean_px"], px.sum() / px.size)

    rs = media_resize(SF).to_pandas().set_index("media_id")
    for mid in rs.index[:10]:
        _w, _h, _c, px = md.decode_image(md.synth_image_blob(int(mid)))
        expect = md.resize_nearest(px, 4, 4).sum(dtype=np.int64)
        assert rs.loc[mid, "px_sum"] == expect
