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
