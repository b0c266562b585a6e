"""Per-partition lineage + checkpoint-resume (north_rule: "Every stage
checkpoints per-partition lineage and counters so the job resumes mid-run").

Design (SURVEY.md §4.2 Resume): the url space is split into K work units
(``part_id = pmod(xxhash64(url), K)``). Each unit runs the full pipeline on
its slice and writes ``triples/part_id=<k>/`` idempotently (overwrite), then
appends a manifest row (rows in/out, checksum, timestamp) to ``_lineage``.
On restart, completed part_ids are skipped — a crashed run resumes exactly
where it stopped, and re-running a completed unit rewrites identical bytes.

At 100 TB scale K is sized so one unit ≈ a few hundred GB (K ~ 10k); units
are embarrassingly parallel across job submissions too.

The counters use ``df.observe`` (SURVEY §2.1 S4) so they ride the action
instead of re-scanning.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pandas as pd

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

LINEAGE_COLS = ["stage", "part_id", "rows_in", "rows_out", "checksum", "completed_at"]


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    path = _manifest_path(out_dir)
    if not os.path.exists(path) or not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return None
    return spark.read.parquet(path)


def completed_parts(spark: SparkSession, out_dir: str, stage: str) -> set[int]:
    m = read_manifest(spark, out_dir)
    if m is None:
        return set()
    return {
        r.part_id
        for r in m.filter(F.col("stage") == stage).select("part_id").distinct().collect()
    }


def append_manifest(spark: SparkSession, out_dir: str, row: dict) -> None:
    pdf = pd.DataFrame([row], columns=LINEAGE_COLS)
    spark.createDataFrame(pdf).write.mode("append").parquet(_manifest_path(out_dir))


def triples_checksum(df: DataFrame) -> tuple[int, str]:
    """(row_count, order-insensitive checksum) of a triples DataFrame —
    xor/sum of per-row hashes, computed distributed (no collect)."""
    h = df.select(
        F.xxhash64("subj", "pred", "obj", "url", "sent_idx").alias("h")
    ).agg(
        F.count("h").alias("n"),
        F.expr("bit_xor(h)").alias("s"),  # order-insensitive, overflow-free
    ).collect()[0]
    return int(h["n"]), format((int(h["s"] or 0)) & 0xFFFFFFFFFFFFFFFF, "016x")


def run_partitioned(
    spark: SparkSession,
    pages: DataFrame,
    alias_pdf: pd.DataFrame,
    out_dir: str,
    n_parts: int = 4,
    fail_after: int | None = None,
) -> list[dict]:
    """Run the pipeline per work unit with resume. ``fail_after`` injects a
    crash after that many units (tests). Returns manifest rows written."""
    from .pipeline import build_dictionary_state, run_pipeline

    os.makedirs(out_dir, exist_ok=True)
    done = completed_parts(spark, out_dir, "triples")
    written: list[dict] = []
    staged = pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )
    dict_state = build_dictionary_state(spark, alias_pdf)  # unit-invariant
    units_run = 0
    for pid in range(n_parts):
        if pid in done:
            continue
        if fail_after is not None and units_run >= fail_after:
            raise RuntimeError(f"injected failure before part {pid}")
        slice_df = staged.filter(F.col("part_id") == pid).drop("part_id")
        obs = Observation(f"pages_in_{pid}")
        slice_df = slice_df.observe(obs, F.count(F.lit(1)).alias("rows_in"))
        out = run_pipeline(spark, slice_df, alias_pdf, dict_state=dict_state)
        triples = out["triples"]
        (
            triples.withColumn("part_id", F.lit(pid))
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "triples", f"part_id={pid}"))
        )
        n, checksum = triples_checksum(
            spark.read.parquet(os.path.join(out_dir, "triples", f"part_id={pid}"))
        )
        row = {
            "stage": "triples",
            "part_id": pid,
            "rows_in": int(obs.get["rows_in"]),
            "rows_out": n,
            "checksum": checksum,
            "completed_at": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        }
        append_manifest(spark, out_dir, row)
        written.append(row)
        units_run += 1
    # snapshot manifest (Iceberg-style metadata summary)
    snap = {
        "table": "triples",
        "n_parts": n_parts,
        "completed": sorted(completed_parts(spark, out_dir, "triples")),
    }
    with open(os.path.join(out_dir, "snapshot.json"), "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    return written


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(out_dir, "triples")).parquet(
        os.path.join(out_dir, "triples", "part_id=*")
    )
