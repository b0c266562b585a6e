"""spark-submit worker for the scaling bench: runs the KG pipeline on a
fixed corpus at whatever master the submit provided, prints one JSON line.

Usage (via spark-submit --py-files char_ner_spark.zip):
    spark-submit --master local[N] tools/scaling_worker.py <pages_dir> <n_entities>
"""

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")


def main() -> int:
    pages_dir = sys.argv[1]
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from pyspark.sql import SparkSession

    from char_ner_spark.fixtures import make_alias_table
    from char_ner_spark.pipeline import run_pipeline

    spark = SparkSession.builder.appName("scaling_worker").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))

    pages = spark.read.parquet(pages_dir)
    n_pages = pages.count()
    alias = make_alias_table(n_entities, seed=42)

    # warm python workers + JIT before the timed window (steady-state
    # throughput is the metric; worker spawn is a constant, not throughput)
    import pandas as _pd
    from pyspark.sql import functions as _F, types as _T
    _noop = _F.pandas_udf(lambda s: s, _T.LongType())
    spark.range(0, 2 * cores * 10, 1, 2 * cores).select(_noop("id")).count()

    t0 = time.time()
    out = run_pipeline(spark, pages, alias)
    n_triples = out["triples"].count()
    sec = time.time() - t0

    print(
        "SCALING_RESULT "
        + json.dumps(
            {
                "cores": cores,
                "pages": n_pages,
                "triples": n_triples,
                "sec": round(sec, 2),
                "triples_per_sec": round(n_triples / sec, 1),
                "pages_per_sec": round(n_pages / sec, 1),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
