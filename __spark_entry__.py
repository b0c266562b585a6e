"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship KG pipeline smoke on sf0.001-scaled fixtures.
queries()         — operator registry (char_ner_spark/driver_queries.py).
oracle_sql()      — DuckDB-equivalent SQL for every SQL-expressible entry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full KG-construction pipeline (extract → tag →
    link → canonicalize → triples) on a small deterministic fixture corpus.
    Returns the triples DataFrame (driver checks rows ≥ 0, stable schema:
    subj, pred, obj, url, sent_idx, conf — same as round 1)."""
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.pipeline import run_pipeline

    alias = make_alias_table(120, seed=42)
    pages = spark.createDataFrame(make_pages(60, seed=42, alias_df=alias))
    return run_pipeline(spark, pages, alias)["triples"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from char_ner_spark.driver_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query. The KG
    pipeline/tagger queries are hash-checked against a staged parquet of the
    single-process golden run; MinHash/SimHash run the same SQL template on
    both engines. Every registry entry has an oracle: the ANN scale path
    (ann_ivf_topk) runs IVF at full probe, provably ≡ brute force, so it
    hash-checks against plain quantized-cosine SQL; the approximate
    (pruned/LSH) behavior is pinned in tests/test_similarity.py."""
    from char_ner_spark.driver_queries import build_oracle_sql

    return build_oracle_sql()
