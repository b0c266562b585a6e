"""Stage-isolated profiling of the KG pipeline (guide §1.4) on the bench
corpus. NOT part of the frozen bench contract; numbers cited in
OPTIMIZATION_r06.md.

Usage: python tools/profile_kg.py [n_pages]  (default 1000000 = sf1.0)
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "24"))


def main() -> None:
    from pyspark import StorageLevel

    from char_ner_spark.fixtures import make_alias_table
    from char_ner_spark.pipeline import (
        build_dictionary_state,
        extract_triples,
        link_pairs,
        middles_table,
        tag_pages,
    )
    from char_ner_spark.session import build_session

    spark = build_session(
        "profile_kg", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    sc = spark.sparkContext
    pages = spark.read.parquet(f"/root/repo/.bench_cache/pages_{N_PAGES}")
    alias = make_alias_table(500, seed=42)

    sc.setJobDescription("kg: dict state")
    t0 = time.time()
    dict_state = build_dictionary_state(spark, alias)
    print(f"dict_state_sec={time.time() - t0:.2f}")

    sc.setJobDescription("kg: tag+persist+count")
    t0 = time.time()
    mentions = tag_pages(pages, salt=16).persist(StorageLevel.MEMORY_AND_DISK)
    n_m = mentions.count()
    t_tag = time.time() - t0
    print(f"tag_sec={t_tag:.2f} mentions={n_m}")

    sc.setJobDescription("kg: link_pairs (noop)")
    t0 = time.time()
    linked = link_pairs(mentions, {"bands": dict_state["bands"]}, alias_pdf=alias)
    linked.write.format("noop").mode("overwrite").save()
    print(f"link_noop_sec={time.time() - t0:.2f}")

    sc.setJobDescription("kg: triples count")
    t0 = time.time()
    triples = extract_triples(linked, dict_state["canon"], middles_table(spark))
    n_t = triples.count()
    print(f"triples_sec={time.time() - t0:.2f} triples={n_t}")

    mentions.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
