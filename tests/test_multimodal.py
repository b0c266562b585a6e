"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

import hashlib

import numpy as np
import pytest

from char_ner_spark import multimodal as MM


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xxxx")


def test_fake_decode_deterministic():
    a = MM.decode_image(b"payload", fake=True)
    b = MM.decode_image(b"payload", fake=True)
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8
    assert (a == b).all()
    assert not (a == MM.decode_image(b"other", fake=True)).all()


def test_resize_nearest():
    img = MM.decode_image(b"p", fake=True)
    t = MM.resize_image(img, 8, 4)
    assert t.shape == (4, 8, 3)


def test_frame_sampling():
    assert MM.frame_sample_indices(3500, 1000) == [0, 1000, 2000, 3000]
    assert MM.frame_sample_indices(0) == []


def test_media_features_distributed(spark):
    pdf = MM.make_media_fixture(48, seed=42)
    media = spark.createDataFrame(pdf, schema=MM.MEDIA_SCHEMA)
    feats = MM.extract_media_features(media).toPandas()
    assert len(feats) == 48
    assert set(feats.kind) == {"image", "audio", "video"}
    # byte-level invariants hold through the Arrow round trip
    by_id = {r.media_id: r for r in feats.itertuples()}
    for _, row in pdf.iterrows():
        got = by_id[row.media_id]
        assert got.n_bytes == len(row.payload)
        assert got.sha256 == hashlib.sha256(row.payload).hexdigest()
        assert len(got.feature) == MM.FEATURE_DIM
        assert abs(float(np.linalg.norm(got.feature)) - 1.0) < 1e-5
    img = feats[feats.kind == "image"]
    assert (img.thumb_w == 8).all() and (img.thumb_h == 8).all()
    assert feats[feats.kind != "image"].thumb_w.isna().all()


def test_video_frame_decode_stub_and_determinism():
    with pytest.raises(NotImplementedError):
        MM.decode_video_frame(b"abc", 0)
    a = MM.decode_video_frame(b"abc", 1000, fake=True)
    b = MM.decode_video_frame(b"abc", 1000, fake=True)
    c = MM.decode_video_frame(b"abc", 2000, fake=True)
    assert np.array_equal(a, b)           # replay-identical
    assert not np.array_equal(a, c)       # distinct ts -> distinct frame
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8


def test_sample_video_frames_distributed(spark):
    """JVM sequence/explode fan-out must equal frame_sample_indices per
    video, per-frame features must be deterministic across partitionings,
    and non-video rows must not leak in."""
    import pandas as pd

    pdf = MM.make_media_fixture(48, seed=42)
    sdf = spark.createDataFrame(pdf)
    got = MM.sample_video_frames(sdf).toPandas()

    vids = pdf[(pdf["kind"] == "video") & (pdf["duration_ms"] > 0)]
    want = {
        int(r.media_id): MM.frame_sample_indices(int(r.duration_ms))
        for r in vids.itertuples()
    }
    by_vid = {
        int(mid): sorted(g.frame_ts_ms.tolist())
        for mid, g in got.groupby("media_id")
    }
    assert by_vid == want                      # exact fan-out parity
    assert set(got.media_id) == set(want)      # no image/audio leakage
    assert (got.thumb_w == 8).all() and (got.thumb_h == 8).all()
    feats = np.stack(got.feature.to_numpy())
    assert feats.shape[1] == MM.FEATURE_DIM
    norms = np.linalg.norm(feats, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-5)

    # partitioning must not change any frame's feature (stateless decode)
    re = MM.sample_video_frames(sdf.repartition(7)).toPandas()
    key = lambda df: {
        (int(r.media_id), int(r.frame_ts_ms)): tuple(round(float(x), 6) for x in r.feature)
        for r in df.itertuples()
    }
    assert key(re) == key(got)
