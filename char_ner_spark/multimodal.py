"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (training-data pipeline ops the engine must carry at 100 TB).

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested. Decoding status by format (round 5 —
the container has no PIL/opencv/ffmpeg, so the real decoders are pure
NumPy over formats whose bitstreams need no codec library):

- **image**: REAL for uncompressed BI_RGB BMP, 24/32-bit, bottom-up or
  top-down (:func:`decode_image` → HxWx3 uint8 RGB). Other containers
  (JPEG/PNG/WebP need zlib/DCT codecs) raise ``NotImplementedError``
  unless the deterministic fake decoder is requested (``fake=True``).
- **audio**: REAL for RIFF/WAVE PCM, 8/16-bit, any channel count
  (:func:`decode_audio` → interleaved int16 + rate). Compressed audio
  raises ``NotImplementedError``.
- **video**: STUBBED (every container needs ffmpeg-class codecs);
  ``decode_video_frame`` keeps the deterministic fake path so the
  per-frame distributed plumbing stays fully exercised.

:func:`make_media_fixture` emits real BMP/WAV payloads, so the media
feature pipeline and its driver-contract oracle exercise TRUE decoding:
features derive from decoded pixels/samples, not raw payload bytes.
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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 RGB array.

    REAL for uncompressed BI_RGB BMP (24/32-bit, bottom-up or top-down) —
    a pure-NumPy header parse + strided pixel view, no codec library.
    Other containers (JPEG/PNG/WebP) need zlib/DCT codecs this sandbox
    lacks: they raise ``NotImplementedError`` unless ``fake=True`` asks
    for the deterministic pseudo-image (derived from the payload bytes)
    that keeps the downstream distributed plumbing exercised."""
    b = bytes(payload)
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
    """Decode one video frame at ``ts_ms`` to an HxWx3 uint8 array.

    REAL DECODE IS STUBBED (no ffmpeg/opencv in this container). With
    ``fake=True`` a deterministic pseudo-frame is derived from
    (payload, ts_ms) so per-frame distributed plumbing is exercised —
    distinct timestamps yield distinct frames, replays yield identical
    ones."""
    if not fake:
        raise NotImplementedError(
            "video decoding requires ffmpeg/opencv (not in this sandbox); "
            "pass fake=True for the deterministic test decoder"
        )
    h = hashlib.blake2b(
        bytes(payload) + int(ts_ms).to_bytes(8, "big"), digest_size=8
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
    the honest sandbox stub (:func:`decode_video_frame`, ``fake=True``)."""
    tw, th = thumb

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA.fields}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload)
                for ts in frame_sample_indices(int(dur), fps_ms):
                    frame = decode_video_frame(b, int(ts), fake=True)
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
            elif kind == "audio" and b[:4] == b"RIFF":
                content = decode_audio(b)[0]  # real PCM decode
            else:  # video (decode stubbed) / unknown audio container
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
    (duration metadata derived from the sample count), video rows stay
    opaque random bytes — their decode is the honest stub."""
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
        else:
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
