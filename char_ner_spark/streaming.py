"""Structured Streaming surface (SURVEY.md §2.10 — optional extension;
north_rule's resume requirement is met by batch lineage, but page ingestion
maps naturally onto a stream).

Provides:
  - ``stream_pages``: file-source stream over a pages parquet dir →
    watermarked tumbling-window page counts per lang (late data handled).
  - ``stream_mention_counts``: the same tagger UDF applied to a stream
    (mapInPandas works unchanged on streaming DataFrames) → per-window
    mention counts, exactly-once via checkpoint dir.

Both run with ``trigger(availableNow=True)`` in tests: process everything
currently available, then stop — deterministic, no wall-clock dependence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """readStream over the pages table (schema inferred from the batch
    reader — file streams need an explicit schema)."""
    schema = spark.read.parquet(pages_dir).schema
    return spark.readStream.schema(schema).parquet(pages_dir)


def windowed_page_counts(pages_stream: DataFrame) -> DataFrame:
    """Tumbling 10-minute windows on warc_ts with 1-hour watermark."""
    return (
        pages_stream.withWatermark("warc_ts", "1 hour")
        .groupBy(F.window("warc_ts", "10 minutes").alias("win"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "lang",
            "n_pages",
        )
    )


def streamed_mentions(pages_stream: DataFrame, salt: int = 16) -> DataFrame:
    """The batch tagger stage applied to a stream — mapInPandas is
    streaming-compatible; repartition keeps the same plan shape."""
    from .pipeline import _MENTION_SCHEMA, _tag_pages_batches

    return pages_stream.select("url", "html", "lang").mapInPandas(
        _tag_pages_batches, schema=_MENTION_SCHEMA
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory sink; returns the
    result table. Exactly-once per checkpoint_dir."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
