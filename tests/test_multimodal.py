"""Multimodal binary-column tests: REAL pure-NumPy BMP/WAV codecs (round 5)
plus the honest decode stubs for codec-library formats (JPEG/PNG/video)."""

import hashlib

import numpy as np
import pytest

from char_ner_spark import multimodal as MM


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xxxx")


def test_bmp_roundtrip_bottom_up_padded():
    """encode_bmp → decode_image is pixel-identical, including rows that
    need 4-byte padding (w=5 → stride 16, not 15)."""
    rng = np.random.RandomState(7)
    for w, h in [(5, 3), (8, 8), (13, 2), (1, 1)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = MM.encode_bmp(img)
        assert b[:2] == b"BM"
        got = MM.decode_image(b)
        assert got.dtype == np.uint8 and got.shape == (h, w, 3)
        assert np.array_equal(got, img)


def test_bmp_decode_top_down_and_32bit():
    """Real decoder handles top-down storage (negative height) and 32-bit
    BGRA pixels, both of which appear in the wild."""
    import struct

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # hand-build a top-down 32-bit BMP (stride = 4*w, no padding needed)
    body = bytearray()
    for r in range(2):  # top-down: row 0 first
        for c in range(3):
            px = img[r, c]
            body += bytes([px[2], px[1], px[0], 0xFF])  # BGRA
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 32, 0, len(body),
                      2835, 2835, 0, 0)
    got = MM.decode_image(bytes(head + dib + body))
    assert np.array_equal(got, img)


def test_bmp_decode_rejects_compressed():
    import struct

    head = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 1, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError):
        MM.decode_image(bytes(head + dib))  # compression=1 (RLE8)


def test_wav_roundtrip_pcm16():
    samples = (np.sin(np.arange(500) * 0.1) * 20000).astype(np.int16)
    b = MM.encode_wav(samples, rate=8000)
    got, rate, ch = MM.decode_audio(b)
    assert rate == 8000 and ch == 1
    assert np.array_equal(got, samples)


def test_wav_decode_8bit_and_chunk_skip():
    """RIFF walk must skip unknown chunks (LIST before fmt) and rescale
    unsigned 8-bit PCM to centered int16."""
    import struct

    raw8 = np.array([0, 128, 255, 64], dtype=np.uint8)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 4000, 4000, 1, 8)
    data = struct.pack("<4sI", b"data", len(raw8)) + raw8.tobytes()
    skip = struct.pack("<4sI", b"LIST", 6) + b"INFOab"  # odd len → pad byte
    body = skip + fmt + data
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    got, rate, ch = MM.decode_audio(payload)
    assert rate == 4000 and ch == 1
    assert np.array_equal(got, (raw8.astype(np.int16) - 128) * 256)


def test_wav_decode_rejects_non_pcm():
    import struct

    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 3, 1, 8000, 32000, 4, 32)
    body = fmt + struct.pack("<4sI", b"data", 0)
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(NotImplementedError):
        MM.decode_audio(payload)  # format=3 (IEEE float)
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"\x00" * 64)  # not RIFF at all


def test_fixture_payloads_really_decode():
    """make_media_fixture emits true BMP/WAV bitstreams: the REAL decoders
    (no fake fallback) recover the metadata dims/durations exactly."""
    pdf = MM.make_media_fixture(24, seed=42)
    for row in pdf.itertuples():
        if row.kind == "image":
            img = MM.decode_image(row.payload)
            assert (img.shape[1], img.shape[0]) == (row.width, row.height)
        elif row.kind == "audio":
            samples, rate, ch = MM.decode_audio(row.payload)
            assert rate == 8000 and ch == 1
            assert samples.size * 1000 // rate == row.duration_ms


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


def test_avi_roundtrip_full_decode():
    """encode_avi → decode_video recovers every frame pixel-identically
    (the encoder writes bottom-up BGR DIBs; the decoder must undo both)."""
    rng = np.random.RandomState(11)
    for nf, h, w in [(1, 3, 4), (4, 5, 8), (7, 2, 4)]:
        frames = rng.randint(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        b = MM.encode_avi(frames, frame_ms=500)
        assert MM.is_avi(b)
        got, frame_ms = MM.decode_video(b)
        assert frame_ms == 500
        assert got.dtype == np.uint8 and got.shape == frames.shape
        assert np.array_equal(got, frames)


def test_avi_frame0_offset_matches_encoder_layout():
    """The canonical-layout constants the driver oracle uses to address
    frame byte ranges must agree with what encode_avi actually emits."""
    import struct

    frames = np.arange(2 * 3 * 4 * 3, dtype=np.uint8).reshape(2, 3, 4, 3)
    b = MM.encode_avi(frames)
    fsize = 3 * 4 * 3
    # chunk header directly before frame 0's pixels
    cid, clen = struct.unpack_from("<4sI", b, MM.AVI_FRAME0_OFFSET - 8)
    assert cid == b"00db" and clen == fsize
    _, _, _, regions = MM.parse_avi(b)
    assert regions == [
        (MM.AVI_FRAME0_OFFSET, fsize),
        (MM.AVI_FRAME0_OFFSET + fsize + MM.AVI_FRAME_GAP, fsize),
    ]
    # decoded pixel bytes are a permutation of the frame byte ranges —
    # the invariant the driver oracle's nibble histogram relies on
    raw = b[MM.AVI_FRAME0_OFFSET : MM.AVI_FRAME0_OFFSET + fsize]
    dec = MM.decode_video(b)[0][0]
    assert sorted(raw) == sorted(dec.tobytes())


def test_avi_frame_selection_and_clamp():
    """decode_video_frame picks the frame covering ts_ms at the stream's
    own frame period and clamps out-of-range timestamps."""
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(3, 4, 4, 3), dtype=np.uint8)
    b = MM.encode_avi(frames, frame_ms=1000)
    assert np.array_equal(MM.decode_video_frame(b, 0), frames[0])
    assert np.array_equal(MM.decode_video_frame(b, 999), frames[0])
    assert np.array_equal(MM.decode_video_frame(b, 1000), frames[1])
    assert np.array_equal(MM.decode_video_frame(b, 2500), frames[2])
    assert np.array_equal(MM.decode_video_frame(b, 99999), frames[2])  # clamp
    assert np.array_equal(MM.decode_video_frame(b, -5), frames[0])     # clamp


def test_avi_rejects_compressed_and_nonavi():
    import struct

    with pytest.raises(NotImplementedError):
        MM.parse_avi(b"RIFF\x00\x00\x00\x00WAVE")  # RIFF but not AVI
    # a '00dc' (compressed) frame chunk must raise, not mis-decode
    frames = np.zeros((1, 2, 4, 3), dtype=np.uint8)
    b = bytearray(MM.encode_avi(frames))
    off = MM.AVI_FRAME0_OFFSET - 8
    b[off : off + 4] = b"00dc"
    with pytest.raises(NotImplementedError):
        MM.parse_avi(bytes(b))
    # width*3 not divisible by 4 → encoder refuses (DIB rows would pad)
    with pytest.raises(ValueError):
        MM.encode_avi(np.zeros((1, 2, 3, 3), dtype=np.uint8))
    # non-AVI payload without fake falls through to NotImplementedError
    with pytest.raises(NotImplementedError):
        MM.decode_video_frame(b"not a video", 0)


def test_fixture_avi_payloads_really_decode():
    """Real-AVI fixture rows decode to the advertised dims/duration; the
    opaque rows stay undecodable (honest fallback path)."""
    pdf = MM.make_media_fixture(48, seed=42)
    vids = pdf[pdf["kind"] == "video"]
    real = vids[vids["width"].notna()]
    opaque = vids[vids["width"].isna()]
    assert len(real) > 0 and len(opaque) > 0
    for row in real.itertuples():
        frames, frame_ms = MM.decode_video(row.payload)
        nf, h, w, _ = frames.shape
        assert (w, h) == (row.width, row.height)
        assert frame_ms == 1000 and nf * 1000 == row.duration_ms
    for row in opaque.itertuples():
        assert not MM.is_avi(row.payload)
        with pytest.raises(NotImplementedError):
            MM.decode_video(row.payload)


def test_sample_video_frames_real_avi_content(spark):
    """For a real-AVI video, sampled frame features must derive from the
    DECODED pixels (nibble histogram of the true frame), not the fake
    pseudo-frame — proving the distributed path routes through parse_avi."""
    import pandas as pd

    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, size=(2, 6, 8, 3), dtype=np.uint8)
    payload = MM.encode_avi(frames, frame_ms=1000)
    pdf = pd.DataFrame(
        [(0, "https://x/v0", "video", payload, 8, 6, 2000)],
        columns=["media_id", "url", "kind", "payload", "width", "height", "duration_ms"],
    )
    got = (
        MM.sample_video_frames(spark.createDataFrame(pdf, schema=MM.MEDIA_SCHEMA))
        .toPandas()
        .sort_values("frame_ts_ms")
    )
    assert got.frame_ts_ms.tolist() == [0, 1000]
    for ts, row in zip([0, 1000], got.itertuples()):
        small = MM.resize_image(frames[ts // 1000], 8, 8)
        hist = np.bincount(small.reshape(-1) >> 4, minlength=MM.FEATURE_DIM)
        want = hist / np.linalg.norm(hist)
        assert np.allclose(np.asarray(row.feature), want, atol=1e-6)


def test_ppm_roundtrip_and_header_quirks():
    """encode_ppm → decode_image is pixel-identical; the header parser
    honors netpbm comments and rejects truncated / 16-bit payloads."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(6, 7, 3), dtype=np.uint8)
    b = MM.encode_ppm(img)
    got = MM.decode_image(b)
    assert np.array_equal(got, img)
    # comments may appear anywhere in the header whitespace
    commented = b"P6\n# a comment\n7 # trailing\n6\n# another\n255\n" + img.tobytes()
    assert np.array_equal(MM.decode_image(commented), img)
    with pytest.raises(ValueError):
        MM.decode_image(b[: len(b) - 4])  # truncated raster
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"P6\n2 2\n65535\n" + bytes(24))  # 16-bit samples
