"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (training-data pipeline ops the engine must carry at 100 TB).

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested. Decoding status by format (round 5 —
the container has no PIL/opencv/ffmpeg, so the real decoders are pure
NumPy over formats whose bitstreams need no codec library):

- **image**: REAL for uncompressed BI_RGB BMP (24/32-bit, bottom-up or
  top-down) and binary PPM/P6 (:func:`decode_image` → HxWx3 uint8 RGB).
  Containers that need zlib/DCT codecs (JPEG/PNG/WebP) raise
  ``NotImplementedError`` unless the deterministic fake decoder is
  requested (``fake=True``).
- **audio**: REAL for RIFF/WAVE PCM, 8/16-bit, any channel count
  (:func:`decode_audio` → interleaved int16 + rate). Compressed audio
  raises ``NotImplementedError``.
- **video**: REAL for uncompressed RIFF/AVI with 24-bit BI_RGB '00db'
  DIB frames (:func:`decode_video_frame` — avih header parse + movi
  chunk walk, pure NumPy). Compressed containers (every codec needs
  ffmpeg-class libraries) keep the deterministic fake path so the
  per-frame distributed plumbing stays exercised for them too.

:func:`make_media_fixture` emits real BMP/WAV/AVI payloads (plus opaque
video rows that exercise the fallback), so the media feature pipeline
and its driver-contract oracle exercise TRUE decoding: features derive
from decoded pixels/samples/frames, not raw payload bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


#: BMP pixel-data offset the fixture encoder writes (14-byte file header +
#: 40-byte BITMAPINFOHEADER) — the driver oracle addresses pixel bytes at
#: this offset, and the decoder VERIFIES the real header against it
BMP_HEADER_SIZE = 54
#: WAV data-chunk offset for the canonical 44-byte PCM header the fixture
#: encoder writes (RIFF 12 + fmt 24 + data header 8)
WAV_HEADER_SIZE = 44


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BI_RGB
    bottom-up BMP (pure NumPy/struct — the fixture generator's real image
    codec). Rows are padded to 4-byte boundaries per the format."""
    import struct

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up, BGR
        body += img[r, :, ::-1].tobytes() + b"\x00" * pad
    size = BMP_HEADER_SIZE + len(body)
    head = struct.pack("<2sIHHI", b"BM", size, 0, 0, BMP_HEADER_SIZE)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return bytes(head + dib + body)


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 RGB array as a binary PPM (P6) file —
    ASCII header + raw top-down RGB rows, no padding."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _ppm_tokens(b: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a PPM header
    (``#`` comments run to end-of-line per the netpbm spec); returns the
    values and the offset just past the single whitespace byte that
    terminates the last one (where raster data begins)."""
    vals: list[int] = []
    i = 2  # past the 'P6' magic
    while len(vals) < n:
        while i < len(b) and (b[i : i + 1].isspace() or b[i] == 0x23):
            if b[i] == 0x23:  # comment → skip to newline
                while i < len(b) and b[i] != 0x0A:
                    i += 1
            i += 1
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("malformed PPM header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 RGB array.

    REAL for uncompressed BI_RGB BMP (24/32-bit, bottom-up or top-down)
    and binary PPM/P6 (maxval ≤ 255) — pure-NumPy header parses +
    strided pixel views, no codec library. Other containers (JPEG/PNG/
    WebP) need zlib/DCT codecs this sandbox lacks: they raise
    ``NotImplementedError`` unless ``fake=True`` asks for the
    deterministic pseudo-image (derived from the payload bytes) that
    keeps the downstream distributed plumbing exercised."""
    b = bytes(payload)
    if b[:2] == b"P6":
        (w, h, maxval), off = _ppm_tokens(b, 3)
        if maxval > 255:
            raise NotImplementedError(
                "16-bit-per-sample PPM (maxval > 255) is not supported"
            )
        if off + 3 * w * h > len(b):
            raise ValueError("truncated PPM payload")
        return (
            np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=off)
            .reshape(h, w, 3)
            .copy()
        )
    if b[:2] == b"BM" and len(b) >= BMP_HEADER_SIZE:
        import struct

        off = struct.unpack_from("<I", b, 10)[0]
        w, h_signed = struct.unpack_from("<ii", b, 18)
        bpp, = struct.unpack_from("<H", b, 28)
        comp, = struct.unpack_from("<I", b, 30)
        if comp != 0 or bpp not in (24, 32) or w <= 0 or h_signed == 0:
            raise NotImplementedError(
                f"only uncompressed BI_RGB 24/32-bit BMP is decodable "
                f"without codec libraries (got bpp={bpp}, compression={comp})"
            )
        h = abs(h_signed)
        nch = bpp // 8
        stride = ((bpp * w + 31) // 32) * 4
        if off + stride * h > len(b):
            raise ValueError("truncated BMP payload")
        rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)
        px = rows[:, : w * nch].reshape(h, w, nch)
        if h_signed > 0:  # bottom-up storage → top-down array
            px = px[::-1]
        return px[:, :, 2::-1].copy()  # BGR(A) → RGB
    if not fake:
        raise NotImplementedError(
            "real image decode covers uncompressed BMP only (JPEG/PNG need "
            "codec libraries absent from this sandbox); pass fake=True for "
            "the deterministic test decoder"
        )
    h = hashlib.blake2b(b, digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode a 1-D int16 sample array as a canonical 44-byte-header
    RIFF/WAVE PCM16 mono file (the fixture generator's real audio codec)."""
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_audio(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a RIFF/WAVE PCM payload → (interleaved int16 samples,
    sample_rate, channels). REAL decode, pure NumPy: a standard RIFF chunk
    walk (fmt then data, skipping unknown chunks), PCM 8-bit (rescaled to
    int16) or 16-bit. Compressed formats raise ``NotImplementedError``."""
    import struct

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "real audio decode covers RIFF/WAVE PCM only (compressed audio "
            "needs codec libraries absent from this sandbox)"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid, clen = struct.unpack_from("<4sI", b, pos)
        body = b[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV is decodable without codec libraries "
            f"(got format={audio_format}, bits={bits})"
        )
    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], dtype="<i2")
    else:  # unsigned 8-bit PCM → centered int16
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.int16)
                   - 128) * 256
    return samples, int(rate), int(channels)


#: canonical offset of frame 0's pixel bytes in an :func:`encode_avi`
#: payload: RIFF hdr 12 + hdrl LIST 200 (avih 64 + strl[strh 64 + strf 48])
#: + movi LIST hdr 12 + first '00db' chunk hdr 8. The DECODER walks the
#: chunk tree and never assumes this; the driver oracle addresses the
#: fixture's frame byte ranges with it.
AVI_FRAME0_OFFSET = 232
#: '00db' chunk header bytes between consecutive frames' pixel regions
AVI_FRAME_GAP = 8


def encode_avi(frames: np.ndarray, frame_ms: int = 1000) -> bytes:
    """Encode an (n_frames, H, W, 3) uint8 RGB array as an uncompressed
    RIFF/AVI file ('DIB ' stream of bottom-up BGR '00db' frames — the
    fixture generator's real video codec, pure NumPy/struct). W must be a
    multiple of 4 so DIB rows are pad-free."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    nf, h, w, _ = frames.shape
    if (3 * w) % 4:
        raise ValueError("encode_avi requires width*3 divisible by 4")
    fsize = 3 * w * h
    avih = struct.pack(
        "<4sI14I", b"avih", 56,
        frame_ms * 1000, fsize, 0, 0x10, nf, 0, 1, fsize, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIII4H", b"strh", 56, b"vids", b"DIB ",
        0, 0, 0, 0, frame_ms, 1000, 0, nf, fsize, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII", b"strf", 40, 40, w, h, 1, 24, 0, fsize,
        2835, 2835, 0, 0,
    )
    strl = struct.pack("<4sI4s", b"LIST", 4 + len(strh) + len(strf), b"strl") + strh + strf
    hdrl = struct.pack("<4sI4s", b"LIST", 4 + len(avih) + len(strl), b"hdrl") + avih + strl
    movi = bytearray(struct.pack("<4sI4s", b"LIST", 4 + nf * (8 + fsize), b"movi"))
    for f in range(nf):
        movi += struct.pack("<4sI", b"00db", fsize)
        movi += frames[f, ::-1, :, ::-1].tobytes()  # bottom-up, BGR
    body = hdrl + bytes(movi)
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"AVI ") + body


def is_avi(payload: bytes) -> bool:
    b = bytes(payload)
    return b[:4] == b"RIFF" and b[8:12] == b"AVI "


def parse_avi(payload: bytes) -> tuple[int, int, int, list[tuple[int, int]]]:
    """Walk a RIFF/AVI chunk tree (pure struct/NumPy — no assumption of
    the canonical encoder layout) → (frame_ms, width, height, [(offset,
    size) of each uncompressed '00db' frame's pixel bytes]). Compressed
    streams ('00dc' frames, or a strf bpp ≠ 24) raise
    ``NotImplementedError`` — every real video codec needs ffmpeg-class
    libraries absent from this sandbox."""
    import struct

    b = bytes(payload)
    if not is_avi(b):
        raise NotImplementedError(
            "real video decode covers uncompressed RIFF/AVI only; pass "
            "fake=True for the deterministic test decoder"
        )
    mspf = w = h = None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal mspf, w, h
        while pos + 8 <= end:
            cid, clen = struct.unpack_from("<4sI", b, pos)
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + clen)
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", b, pos + 8)
                mspf, w, h = vals[0], vals[8], vals[9]
            elif cid == b"00db":
                frames.append((pos + 8, clen))
            elif cid == b"00dc":
                raise NotImplementedError(
                    "compressed AVI frames ('00dc') need codec libraries "
                    "absent from this sandbox"
                )
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned

    walk(12, len(b))
    if mspf is None or not frames:
        raise ValueError("AVI payload missing avih header or frames")
    if any(sz != 3 * w * h for _, sz in frames):
        raise NotImplementedError(
            "only pad-free 24-bit DIB AVI frames are decodable without "
            "codec libraries"
        )
    return mspf // 1000, int(w), int(h), frames


def _avi_frame_px(b: bytes, off: int, w: int, h: int) -> np.ndarray:
    """One bottom-up BGR DIB frame region → top-down RGB array."""
    px = np.frombuffer(b, dtype=np.uint8, count=3 * w * h, offset=off)
    return px.reshape(h, w, 3)[::-1, :, ::-1].copy()


def decode_video(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL full decode of an uncompressed AVI → ((n_frames, H, W, 3)
    uint8 RGB array, frame period in ms)."""
    b = bytes(payload)
    frame_ms, w, h, frames = parse_avi(b)
    return (
        np.stack([_avi_frame_px(b, off, w, h) for off, _ in frames]),
        frame_ms,
    )


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy — deterministic, lib-free)."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def frame_sample_indices(duration_ms: int, fps_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling timestamps for video payloads."""
    if duration_ms <= 0:
        return []
    return list(range(0, duration_ms, fps_ms))


def decode_video_frame(payload: bytes, ts_ms: int, fake: bool = False) -> np.ndarray:
    """Decode one video frame at ``ts_ms`` to an HxWx3 uint8 RGB array.

    REAL for uncompressed RIFF/AVI (:func:`parse_avi` chunk walk; the
    frame covering ``ts_ms`` at the stream's own frame period, clamped to
    the last frame). Compressed containers need ffmpeg-class codecs this
    sandbox lacks: they raise ``NotImplementedError`` unless ``fake=True``
    asks for the deterministic pseudo-frame derived from
    (payload, ts_ms) — distinct timestamps yield distinct frames, replays
    yield identical ones — keeping per-frame distributed plumbing
    exercised for undecodable payloads."""
    b = bytes(payload)
    if is_avi(b):
        frame_ms, w, h, frames = parse_avi(b)
        idx = min(len(frames) - 1, max(0, int(ts_ms) // max(1, frame_ms)))
        return _avi_frame_px(b, frames[idx][0], w, h)
    if not fake:
        raise NotImplementedError(
            "real video decode covers uncompressed RIFF/AVI only "
            "(compressed containers need ffmpeg-class codecs absent from "
            "this sandbox); pass fake=True for the deterministic test "
            "decoder"
        )
    h = hashlib.blake2b(
        b + int(ts_ms).to_bytes(8, "big"), digest_size=8
    ).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 16-dim
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def sample_video_frames(media: DataFrame, fps_ms: int = 1000,
                        thumb: tuple[int, int] = (8, 8)) -> DataFrame:
    """Video rows → one row per sampled frame with a per-frame feature.

    The fan-out happens INSIDE the Arrow crossing, not before it: each
    video's (payload, duration) row crosses to Python exactly once and
    ``gen`` emits its frames (timestamps per :func:`frame_sample_indices`,
    the shared sampling contract). An explode-then-mapInPandas shape would
    read nicer to Catalyst but duplicates the full binary payload once PER
    FRAME through Arrow — a 100 MB 10-minute video at 1 fps would ship
    ~60 GB; payload size × frame count is the dominant term at scale, so
    the crossing count is what must stay linear in videos. Videos spread
    across partitions by the url-hash repartition; output row count is
    still frames, so downstream sizing sees the multiplication. Decode is
    REAL for uncompressed AVI payloads and the deterministic stub for
    containers whose codecs this sandbox lacks
    (:func:`decode_video_frame`)."""
    tw, th = thumb

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload)
                for ts in frame_sample_indices(int(dur), fps_ms):
                    frame = decode_video_frame(b, int(ts), fake=not is_avi(b))
                    small = resize_image(frame, tw, th)
                    hist = np.bincount(
                        (small.reshape(-1) >> 4), minlength=FEATURE_DIM
                    ).astype(np.float32)
                    n = np.linalg.norm(hist)
                    rows["media_id"].append(int(mid))
                    rows["frame_ts_ms"].append(int(ts))
                    rows["feature"].append(
                        [float(x) for x in (hist / n if n > 0 else hist)]
                    )
                    rows["thumb_w"].append(small.shape[1])
                    rows["thumb_h"].append(small.shape[0])
            yield pd.DataFrame(rows)

    n = media.sparkSession.conf.get("spark.sql.shuffle.partitions")
    vids = (
        media.filter("kind = 'video' AND duration_ms > 0")
        .select(
            "media_id",
            "payload",
            F.col("duration_ms").cast("long").alias("duration_ms"),
            "url",
        )
        .repartition(int(n), F.xxhash64("url"))
        .drop("url")
    )
    return vids.mapInPandas(gen, schema=FRAME_SCHEMA)


def _feature_from_bytes(payload: bytes | np.ndarray) -> np.ndarray:
    """16-dim content fingerprint feature (high-nibble histogram of the
    content bytes, L2-normalized) — a real, deterministic feature at the
    Arrow shape a CNN/audio embedding would have. Callers pass DECODED
    content (pixel array / sample array) where a real decoder exists, raw
    payload bytes where decode is stubbed (video)."""
    arr = np.frombuffer(
        payload.tobytes() if isinstance(payload, np.ndarray) else bytes(payload),
        dtype=np.uint8,
    )
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    n = np.linalg.norm(hist)
    return (hist / n if n > 0 else hist).astype(np.float32)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {f.name: [] for f in FEATURE_SCHEMA.fields}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            rows["media_id"].append(int(mid))
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(b))
            rows["sha256"].append(hashlib.sha256(b).hexdigest())
            thumb_w = thumb_h = None
            if kind == "image":
                # real decode for BMP; deterministic fake for codec formats
                img = decode_image(b, fake=True)
                content: bytes | np.ndarray = img
                thumb = resize_image(img, 8, 8)
                thumb_w, thumb_h = int(thumb.shape[1]), int(thumb.shape[0])
            elif kind == "audio" and b[:4] == b"RIFF" and not is_avi(b):
                content = decode_audio(b)[0]  # real PCM decode
            elif kind == "video" and is_avi(b):
                content = decode_video(b)[0]  # real AVI decode, all frames
            else:  # compressed video / unknown audio container
                content = b
            rows["feature"].append([float(x) for x in _feature_from_bytes(content)])
            rows["thumb_w"].append(thumb_w)
            rows["thumb_h"].append(thumb_h)
        yield pd.DataFrame(rows)


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table → per-item features. Column-pruned scan (payload +
    metadata only), url-hash repartition like the page stream — binary
    payloads are the dominant bytes at scale, so partition count follows
    ``spark.sql.files.maxPartitionBytes`` on the scan side."""
    n = media.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        media.select("media_id", "url", "kind", "payload")
        .repartition(int(n), F.xxhash64("url"))
        .mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
    )


def make_media_fixture(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic media table for tests (no external data). Image rows
    carry REAL 24-bit BMP payloads (width/height metadata = the encoded
    dims; widths are multiples of 4 so the pixel region is pad-free and
    the driver oracle can address it as one contiguous byte range at
    offset 54), audio rows carry REAL PCM16 mono WAV payloads at 8 kHz
    (duration metadata derived from the sample count), and video rows
    alternate between REAL uncompressed AVI payloads (1 frame/sec,
    width/height metadata = the encoded dims, duration = n_frames ×
    1000 ms, frame pixels at the canonical :data:`AVI_FRAME0_OFFSET`
    layout) and opaque random bytes that exercise the honest
    compressed-container fallback."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        width = height = duration_ms = None
        if kind == "image":
            width = int(rng.choice([8, 12, 16]))
            height = int(rng.randint(5, 13))
            px = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)
            payload = encode_bmp(px)
        elif kind == "audio":
            n_samples = int(rng.randint(100, 401))
            samples = rng.randint(-32768, 32768, size=n_samples).astype(np.int16)
            payload = encode_wav(samples, rate=8000)
            duration_ms = n_samples * 1000 // 8000
        elif (i // 3) % 2 == 0:  # real uncompressed AVI video
            width = int(rng.choice([4, 8]))
            height = int(rng.randint(3, 9))
            nf = int(rng.randint(2, 6))
            frames = rng.randint(
                0, 256, size=(nf, height, width, 3), dtype=np.uint8
            )
            payload = encode_avi(frames, frame_ms=1000)
            duration_ms = nf * 1000
        else:  # opaque container → deterministic-fake decode path
            payload = rng.bytes(64 + int(rng.randint(0, 192)))
            duration_ms = int(rng.randint(1000, 60000))
        rows.append(
            (
                i,
                f"https://media.example.org/{kind}/{i:05d}",
                kind,
                payload,
                width,
                height,
                duration_ms,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "url", "kind", "payload", "width", "height", "duration_ms"],
    )
