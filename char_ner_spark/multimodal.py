"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata (training-data pipeline ops the engine must carry at 100 TB).

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning, UDF
signatures — is real and tested. The actual media decoding is STUBBED:
this container has no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is requested
(`fake=True`), which derives pixel statistics from the bytes themselves —
enough to exercise the full distributed path deterministically.
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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    REAL DECODE IS STUBBED (no PIL/opencv in this container). With
    ``fake=True`` a deterministic pseudo-image is derived from the payload
    bytes so the downstream distributed plumbing is fully exercised."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not in this sandbox); "
            "pass fake=True for the deterministic test decoder"
        )
    h = hashlib.blake2b(bytes(payload), digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    return rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)


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


def _feature_from_bytes(payload: bytes) -> np.ndarray:
    """16-dim content fingerprint feature from raw bytes (byte histogram
    folded to 16 bins, L2-normalized) — a real, deterministic feature that
    stands in for a CNN/audio embedding at identical Arrow shape."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
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
            rows["feature"].append([float(x) for x in _feature_from_bytes(b)])
            if kind == "image":
                img = decode_image(b, fake=True)
                thumb = resize_image(img, 8, 8)
                rows["thumb_w"].append(thumb.shape[1])
                rows["thumb_h"].append(thumb.shape[0])
            else:
                rows["thumb_w"].append(None)
                rows["thumb_h"].append(None)
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
    """Deterministic media table for tests (no external data)."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 192)))
        rows.append(
            (
                i,
                f"https://media.example.org/{kind}/{i:05d}",
                kind,
                payload,
                640 if kind == "image" else None,
                480 if kind == "image" else None,
                int(rng.randint(1000, 60000)) if kind == "video" else None,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "url", "kind", "payload", "width", "height", "duration_ms"],
    )
