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
    link → canonicalize → triples), sized from /root/testdata/sf0.001.
    Returns the triples DataFrame (driver checks rows ≥ 0, stable schema)."""
    from char_ner_spark.driver_queries import _fn_kg_triples

    return _fn_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from char_ner_spark.driver_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query; non-SQL
    operators (tagger, MinHash dedup, SimHash, cosine ANN, KG pipeline)
    are rows-only by contract."""
    from char_ner_spark.driver_queries import build_oracle_sql

    return build_oracle_sql()
