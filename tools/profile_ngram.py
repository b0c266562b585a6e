"""Stage-isolated profiling of ngram_jaccard_pairs (guide §1.4 noop-sink
methodology). NOT part of the frozen bench contract — numbers are cited in
OPTIMIZATION_r06.md.

Usage: python tools/profile_ngram.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "24"))


def main() -> None:
    from char_ner_spark.driver_queries import (
        _nj_candidates_sql,
        _nj_stage_dd,
        ngram_jaccard_pairs,
        register_views,
    )
    from char_ner_spark.session import build_session

    spark = build_session(
        "profile_ngram", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    register_views(spark, SF_DIR)
    sc = spark.sparkContext

    # end-to-end first (cold), matching the bench's .collect() shape
    sc.setJobDescription("ngram: end-to-end")
    t0 = time.time()
    rows = ngram_jaccard_pairs(spark).collect()
    print(f"end_to_end_sec={time.time() - t0:.2f} pairs={len(rows)}")

    # stage 1: dd staging (localCheckpoint is the action)
    sc.setJobDescription("ngram: stage dd")
    t0 = time.time()
    v = _nj_stage_dd(spark, "documents")
    dd = spark.table(f"{v}_dd")
    n_dd = dd.count()
    print(f"stage_dd_sec={time.time() - t0:.2f} dd_rows={n_dd}")

    # stage 2: candidates
    sc.setJobDescription("ngram: candidates")
    t0 = time.time()
    cand = spark.sql(_nj_candidates_sql(f"{v}_dd", 2000)).localCheckpoint()
    n_cand = cand.count()
    print(f"stage_cand_sec={time.time() - t0:.2f} cand_rows={n_cand}")

    # candidate sub-stage: raw prefix self-join volume (before ub prune)
    sc.setJobDescription("ngram: prefix join volume")
    t0 = time.time()
    npref = spark.sql(
        f"SELECT COUNT(*) FROM (SELECT doc_id, sid, n FROM {v}_dd "
        f"WHERE rn <= n - ((n * 2000 + 9999) DIV 10000) + 1)"
    ).first()[0]
    njoin = spark.sql(
        f"""WITH pref AS (SELECT doc_id, sid, n FROM {v}_dd
              WHERE rn <= n - ((n * 2000 + 9999) DIV 10000) + 1)
            SELECT COUNT(*) FROM pref a JOIN pref b
              ON a.sid = b.sid AND a.doc_id < b.doc_id
            WHERE LEAST(a.n, b.n) * 10000 >= GREATEST(a.n, b.n) * 2000"""
    ).first()[0]
    print(
        f"prefix_probe_sec={time.time() - t0:.2f} pref_rows={npref} "
        f"join_rows={njoin}"
    )

    cand.createOrReplaceTempView(f"{v}_cand")
    # stage 3: arr
    sc.setJobDescription("ngram: arr")
    t0 = time.time()
    arr = spark.sql(
        f"""WITH cd AS (
          SELECT doc_a AS doc_id FROM {v}_cand
          UNION SELECT doc_b FROM {v}_cand)
        SELECT d.doc_id, collect_list(d.sid) AS sids
        FROM {v}_dd d JOIN cd ON d.doc_id = cd.doc_id
        GROUP BY d.doc_id"""
    ).localCheckpoint()
    n_arr = arr.count()
    print(f"stage_arr_sec={time.time() - t0:.2f} arr_rows={n_arr}")

    arr.createOrReplaceTempView(f"{v}_arr")
    # stage 4: verify
    sc.setJobDescription("ngram: verify")
    t0 = time.time()
    n_out = spark.sql(
        f"""WITH inter AS (
          SELECT c.doc_a, c.doc_b, c.na, c.nb,
                 size(array_intersect(a.sids, b.sids)) AS cnt
          FROM {v}_cand c
          JOIN {v}_arr a ON a.doc_id = c.doc_a
          JOIN {v}_arr b ON b.doc_id = c.doc_b)
        SELECT COUNT(*) FROM inter
        WHERE cnt * 10000.0 / (na + nb - cnt) >= 2000"""
    ).first()[0]
    print(f"stage_verify_sec={time.time() - t0:.2f} out_rows={n_out}")

    spark.stop()


if __name__ == "__main__":
    main()
