"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB pipeline needs both:
  - ``cosine_topk``: brute-force exact top-k (the small-query baseline) —
    one broadcast of the query set, one pass over the vectors.
  - ``lsh_topk``: random-hyperplane LSH buckets + multiprobe (the scale
    path) — candidate generation is an equi-join on bucket keys, exact
    cosine only within buckets. At 10^9+ vectors the bucket join shuffles
    a small fraction of the all-pairs work.

Deterministic: hyperplanes are seeded; ties break by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_COS = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = "SQRT(" + _COS.format(a="{c}", b="{c}") + ")"


def _cosine_expr(a: str, b: str) -> str:
    return (
        f"ROUND({_COS.format(a=a, b=b)} / "
        f"({_NORM.format(c=a)} * {_NORM.format(c=b)}), 6)"
    )


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k per query. vectors: (vec_id, embedding);
    queries: (query_id, embedding). Query set is broadcast."""
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("q_embedding")
    )
    scored = vectors.crossJoin(F.broadcast(q)).selectExpr(
        "query_id",
        "vec_id",
        _cosine_expr("embedding", "q_embedding") + " AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def hyperplanes(dim: int, bits: int = 6, seed: int = 20160731) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(0, 1, size=(bits, dim)).astype(np.float32)


def _bucket_col(planes: np.ndarray):
    """Arrow-vectorized hyperplane-sign bucket of `embedding`.

    One matmul per Arrow batch (X @ planes.T, sign-pack to an int). The
    earlier pure-SQL form (bits × dim element_at terms, 384 for 6×64)
    compiled a pathological whole-stage-codegen method — tens of seconds of
    Janino per plan and O(bits·dim) virtual calls per row; the batched GEMM
    is the same math at BLAS speed and constant plan size.
    """
    from pyspark.sql.functions import pandas_udf

    P = planes.astype(np.float64).T.copy()  # (dim, bits)
    pow2 = (1 << np.arange(planes.shape[0])).astype(np.int64)

    @pandas_udf("int")
    def _bucket(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(emb.to_numpy()).astype(np.float64)
        signs = (X @ P) >= 0.0
        return pd.Series((signs @ pow2).astype(np.int32))

    return _bucket(F.col("embedding"))


def with_buckets(df: DataFrame, planes: np.ndarray, multiprobe: int = 0) -> DataFrame:
    """Attach LSH bucket ids; multiprobe=m also emits the m single-bit-flip
    neighbor buckets (recall knob) via explode."""
    d = df.withColumn("bucket", _bucket_col(planes))
    if multiprobe <= 0:
        return d
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i))
            for i in range(min(multiprobe, planes.shape[0]))
        ],
    )
    return d.withColumn("bucket", F.explode(probes))


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    multiprobe: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Bucketed approximate top-k: exact cosine within matching buckets only.

    Vectors get their true bucket; queries probe their bucket plus
    ``multiprobe`` single-bit flips. Returns (query_id, vec_id, cosine, rk).
    """
    planes = hyperplanes(dim, bits)
    v = with_buckets(vectors.select("vec_id", "embedding"), planes)
    q = with_buckets(
        queries.select("query_id", F.col("embedding").alias("q_embedding"))
        .withColumnRenamed("q_embedding", "embedding"),
        planes,
        multiprobe=multiprobe,
    ).withColumnRenamed("embedding", "q_embedding")
    cand = v.join(q, "bucket").dropDuplicates(["query_id", "vec_id"])
    scored = cand.selectExpr(
        "query_id", "vec_id", _cosine_expr("embedding", "q_embedding") + " AS cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


# Integer-exact scoring (cross-engine hashable): components quantized to
# e3 BIGINTs BEFORE the dot products so both Spark and any independent
# engine (DuckDB oracle, numpy) sum exact integers; the final
# divide/sqrt/round is one fixed IEEE-double expression evaluated
# identically everywhere. Same recipe as the driver's
# cosine_topk_embeddings gate (driver_queries._COSINE_TOPK_SPARK).
_QUANT = "transform({c}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
_IDOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def ivf_topk_e6(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF top-k with integer-exact e6 cosine scores — the oracle-checkable
    twin of ``ivf_topk``. Same physical plan (narrow cell-assignment map,
    probe-cell explode, broadcast candidate join, per-query rank window);
    only the scoring arithmetic differs, quantized so an independent engine
    reproduces every bit. ``nprobe`` defaults to ``nlist`` (full probe),
    where the result PROVABLY equals brute-force top-k regardless of the
    centroids — that identity is what lets the driver hash-check this
    distributed plumbing against plain quantized-cosine SQL. Pruned-probe
    (approximate) behavior is pinned in tests/test_similarity.py."""
    if centroids is None:
        centroids = kmeans_centroids(vectors, nlist=nlist)
    if nprobe is None:
        nprobe = nlist
    v = (
        vectors.select("vec_id", "embedding")
        .withColumn("cell", _cell_col(centroids))
        .selectExpr("vec_id", "cell", _QUANT.format(c="embedding") + " AS qe")
        .selectExpr("vec_id", "cell", "qe", _IDOT.format(a="qe", b="qe") + " AS nv")
    )
    q = (
        queries.select("query_id", "embedding")
        .withColumn("cell", F.explode(_probe_cells_col(centroids, nprobe)))
        .selectExpr("query_id", "cell", _QUANT.format(c="embedding") + " AS qq")
        .selectExpr("query_id", "cell", "qq", _IDOT.format(a="qq", b="qq") + " AS nq")
    )
    cand = v.join(F.broadcast(q), "cell")
    scored = cand.selectExpr(
        "query_id",
        "vec_id",
        "CAST(ROUND(CAST(" + _IDOT.format(a="qe", b="qq") + " AS DOUBLE)"
        " * 1000000.0 / (SQRT(CAST(nv AS DOUBLE)) * SQRT(CAST(nq AS DOUBLE))))"
        " AS BIGINT) AS cosine_e6",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_e6"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "vec_id", "cosine_e6", F.col("rk").cast("long").alias("rk")
        )
    )


def kmeans_centroids(
    vectors: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    sample: int = 4096,
    seed: int = 20160731,
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF, trained driver-side on a
    deterministic sample (ordered by vec_id — at 10^9+ vectors swap in
    ``.sample(fraction, seed)``; the trainer only ever sees ``sample`` rows
    either way). Returns L2-normalized centroids (nlist, dim): assignment by
    max dot against normalized centroids == max cosine, no per-row norms."""
    pdf = vectors.select("vec_id", "embedding").orderBy("vec_id").limit(sample).toPandas()
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
    for _ in range(iters):
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        a = np.argmax(X @ Cn.T, axis=1)
        for j in range(C.shape[0]):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return (C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)).astype(
        np.float64
    )


def _cell_col(centroids: np.ndarray):
    """Arrow-vectorized nearest-centroid id: one GEMM per batch."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.T.copy()  # (dim, nlist)

    @pandas_udf("int")
    def _cell(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(emb.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(X @ C, axis=1).astype(np.int32))

    return _cell(F.col("embedding"))


def _probe_cells_col(centroids: np.ndarray, nprobe: int):
    """Top-``nprobe`` nearest cells per query vector (recall knob)."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.T.copy()
    np_ = min(nprobe, centroids.shape[0])

    @pandas_udf("array<int>")
    def _probe(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        X = np.stack(emb.to_numpy()).astype(np.float64)
        order = np.argsort(-(X @ C), axis=1)[:, :np_].astype(np.int32)
        return pd.Series(list(order))

    return _probe(F.col("embedding"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k — the partition-pruned scale path
    complementing ``lsh_topk``: vectors are assigned to their nearest
    coarse-quantizer cell (a narrow map, no shuffle), queries probe their
    ``nprobe`` nearest cells, and exact cosine runs only inside probed
    cells. With ``nprobe == nlist`` the result equals ``cosine_topk``
    exactly. At cluster scale the vector side is written partitioned/
    bucketed by ``cell`` so a probe reads nprobe/nlist of the data
    (partition pruning), and the tiny query side broadcasts."""
    if centroids is None:
        centroids = kmeans_centroids(vectors, nlist=nlist)
    v = vectors.select("vec_id", "embedding").withColumn("cell", _cell_col(centroids))
    q = (
        queries.select("query_id", "embedding")
        .withColumn("cell", F.explode(_probe_cells_col(centroids, nprobe)))
        .withColumnRenamed("embedding", "q_embedding")
    )
    cand = v.join(F.broadcast(q), "cell")
    scored = cand.selectExpr(
        "query_id", "vec_id", _cosine_expr("embedding", "q_embedding") + " AS cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def cosine_near_dups(vectors: DataFrame, threshold: float = 0.95,
                     bits: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine ≥ θ),
    candidate-generated through LSH buckets — the embedding analog of
    MinHash document dedup."""
    planes = hyperplanes(vectors.selectExpr("size(embedding) d").first()["d"], bits)
    b = with_buckets(vectors.select("vec_id", "embedding"), planes)
    left = b.select(
        F.col("bucket"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    right = b.select(
        F.col("bucket"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    pairs = left.join(right, "bucket").filter("vec_a < vec_b")
    return (
        pairs.selectExpr("vec_a", "vec_b", _cosine_expr("ea", "eb") + " AS cosine")
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["vec_a", "vec_b"])
    )
