"""Structured Streaming tests (SURVEY.md §2.10)."""

import os
import shutil
import tempfile

import pytest

from char_ner_spark import streaming as ST
from char_ner_spark.fixtures import make_alias_table, make_pages


@pytest.fixture(scope="module")
def pages_dir(spark):
    d = tempfile.mkdtemp()
    alias = make_alias_table(60, seed=42)
    pdf = make_pages(30, seed=42, alias_df=alias)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(os.path.join(d, "pages"))
    yield os.path.join(d, "pages")
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_page_counts_match_batch(spark, pages_dir):
    ck = tempfile.mkdtemp()
    try:
        stream = ST.stream_pages(spark, pages_dir)
        assert stream.isStreaming
        # complete mode: the fixture spans ~18 min < the 1h watermark, so in
        # append mode no window would close before the stream drains
        res = ST.run_stream_to_memory(
            spark, ST.windowed_page_counts(stream), "win_counts", ck,
            output_mode="complete",
        ).toPandas()
        # batch oracle: same aggregation without streaming
        from pyspark.sql import functions as F

        batch = (
            spark.read.parquet(pages_dir)
            .groupBy(F.window("warc_ts", "10 minutes").alias("win"), "lang")
            .agg(F.count(F.lit(1)).alias("n_pages"))
            .select(F.col("win.start").alias("win_start"), "lang", "n_pages")
            .toPandas()
        )
        got = {(r.win_start, r.lang): r.n_pages for r in res.itertuples()}
        want = {(r.win_start, r.lang): r.n_pages for r in batch.itertuples()}
        assert got == want and sum(got.values()) == 30
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_streamed_mentions_match_batch(spark, pages_dir):
    from char_ner_spark.pipeline import tag_pages

    ck = tempfile.mkdtemp()
    try:
        stream = ST.stream_pages(spark, pages_dir)
        res = ST.run_stream_to_memory(
            spark, ST.streamed_mentions(stream), "stream_mentions", ck
        ).toPandas()
        batch = tag_pages(spark.read.parquet(pages_dir)).toPandas()
        cols = ["url", "sent_idx", "begin", "end", "surface", "ner_type"]
        assert set(map(tuple, res[cols].itertuples(index=False))) == set(
            map(tuple, batch[cols].itertuples(index=False))
        )
        assert len(res) > 0
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def test_stream_exactly_once_on_restart(spark, pages_dir):
    """Re-running with the same checkpoint reprocesses nothing."""
    ck = tempfile.mkdtemp()
    out = tempfile.mkdtemp()
    sink = os.path.join(out, "mentions")

    def drain() -> int:
        q = (
            ST.streamed_mentions(ST.stream_pages(spark, pages_dir))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    try:
        first = drain()
        assert first > 0
        # restart with same checkpoint + no new input files → nothing re-emitted
        assert drain() == first
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
