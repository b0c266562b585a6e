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
    xor/sum of per-row hashes, computed distributed (no collect). ``conf``
    enters integer-stabilized (e6 fixed point) so resumed units cannot
    silently drift in confidence (ADVICE r1)."""
    h = df.select(
        F.xxhash64(
            "subj", "pred", "obj", "url", "sent_idx",
            F.expr("CAST(ROUND(conf * 1e6) AS BIGINT)"),
        ).alias("h")
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
    weights_map: dict | None = None,
    max_inflight: int = 1,
) -> list[dict]:
    """Run the pipeline per work unit with resume. ``fail_after`` injects a
    crash after that many units (tests); ``weights_map`` (lang → params)
    runs inference from stored weights. Returns manifest rows written.

    ``max_inflight`` > 1 overlaps work units: up to that many units run as
    concurrent Spark jobs (driver threads; Spark's scheduler interleaves
    their stages), so the cluster never idles between a unit's final write
    and the next unit's first scan — at K ~ 10k units the serial loop's
    per-unit ramp-down/ramp-up gap is the dominant waste. Manifest append
    and snapshot commit stay serialized under a lock (commit protocol is
    still linear history); unit payloads are disjoint by construction
    (pmod(xxhash64(url))), so data writes never race.
    """
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from .pipeline import build_dictionary_state, run_pipeline

    os.makedirs(out_dir, exist_ok=True)
    done = completed_parts(spark, out_dir, "triples")
    staged = pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )
    dict_state = build_dictionary_state(spark, alias_pdf)  # unit-invariant
    commit_lock = threading.Lock()
    written: list[dict] = []

    def run_unit(pid: int) -> dict:
        slice_df = staged.filter(F.col("part_id") == pid).drop("part_id")
        obs = Observation(f"pages_in_{pid}")
        slice_df = slice_df.observe(obs, F.count(F.lit(1)).alias("rows_in"))
        out = run_pipeline(spark, slice_df, alias_pdf, dict_state=dict_state,
                           weights_map=weights_map)
        triples = out["triples"]
        part_path = os.path.join(out_dir, "triples", f"part_id={pid}")
        triples.withColumn("part_id", F.lit(pid)).write.mode("overwrite").parquet(part_path)
        written_df = spark.read.parquet(part_path)
        n, checksum = triples_checksum(written_df)
        # done with this unit — release the cached tagger output before the
        # next unit persists its own (K~10k units would otherwise pile up
        # cached blocks for the whole session; ADVICE r1)
        out["mentions"].unpersist()
        row = {
            "stage": "triples",
            "part_id": pid,
            "rows_in": int(obs.get["rows_in"]),
            "rows_out": n,
            "checksum": checksum,
            "completed_at": dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        }
        with commit_lock:
            append_manifest(spark, out_dir, row)
            write_snapshot(spark, out_dir, n_parts,
                           schema_json=written_df.schema.json(),
                           add_part={"part_id": pid, "rows": n,
                                     "checksum": checksum})
            written.append(row)
        return row

    pending = [pid for pid in range(n_parts) if pid not in done]
    if max_inflight <= 1 or fail_after is not None:
        # serial path (and the only one where fail_after is well-defined)
        for i, pid in enumerate(pending):
            if fail_after is not None and i >= fail_after:
                raise RuntimeError(f"injected failure before part {pid}")
            run_unit(pid)
    else:
        with ThreadPoolExecutor(max_workers=max_inflight) as pool:
            list(pool.map(run_unit, pending))  # re-raises the first failure
    # heal a stale/missing snapshot pointer: a crash in the window between
    # append_manifest and write_snapshot leaves the manifest ahead of the
    # snapshot — readers resolving the pointer would silently drop the
    # committed part. The manifest is the source of truth; converge to it.
    snap = current_snapshot(out_dir)
    manifest_done = completed_parts(spark, out_dir, "triples")
    if snap is None or set(snap["completed"]) != manifest_done:
        write_snapshot(spark, out_dir, n_parts)
    return written


# ---------------------------------------------------------------------------
# Iceberg-style snapshot metadata: every commit appends snapshot-N.json (the
# manifest list at that point: completed parts + checksums + schema
# fingerprint) and flips the `current` pointer atomically (rename). Readers
# resolve the pointer and read exactly the files a committed snapshot covers
# — the shape a real catalog (Iceberg/Delta) would slot into behind the same
# module boundary.
# ---------------------------------------------------------------------------


def _snapshot_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "metadata")


def write_snapshot(spark: SparkSession, out_dir: str, n_parts: int,
                   schema_json: str | None = None,
                   add_part: dict | None = None) -> int:
    """Append snapshot-N.json + point `current` at it; returns N.

    With ``add_part`` the new snapshot is the previous manifest list plus
    that one entry — O(1) per commit, no Spark job under the commit lock
    (at K ~ 10k units, re-aggregating the whole manifest per commit is
    O(K²) total and serializes the overlapped units). Without it, the list
    is rebuilt from the ``_lineage`` manifest — the heal/bootstrap path."""
    import hashlib

    meta = _snapshot_dir(out_dir)
    os.makedirs(meta, exist_ok=True)
    prev = current_snapshot(out_dir)
    # next id = max EXISTING file + 1, not pointer + 1: after a crash between
    # writing snapshot-N.json and flipping `current` (pointer still N-1),
    # pointer+1 would silently REWRITE snapshot-N.json — snapshots are
    # immutable history (time-travel readers may pin N)
    existing = [
        int(f[len("snapshot-"):-len(".json")])
        for f in os.listdir(meta)
        if f.startswith("snapshot-") and f.endswith(".json")
    ]
    n = (max(existing) + 1) if existing else 0
    if add_part is not None:
        base = prev["manifest"] if prev else []
        parts = sorted(
            [p for p in base if p["part_id"] != add_part["part_id"]] + [add_part],
            key=lambda p: p["part_id"],
        )
    else:
        m = read_manifest(spark, out_dir)
        parts = []
        if m is not None:
            rows = (
                m.filter(F.col("stage") == "triples")
                .groupBy("part_id")
                .agg(F.max(F.struct("completed_at", "rows_out", "checksum")).alias("last"))
                .select("part_id", "last.rows_out", "last.checksum")
                .collect()
            )
            parts = sorted(
                ({"part_id": int(r.part_id), "rows": int(r.rows_out), "checksum": r.checksum}
                 for r in rows),
                key=lambda p: p["part_id"],
            )
    if schema_json is None and prev is not None:
        schema_json = prev.get("schema_json")
    snap = {
        "snapshot_id": n,
        "table": "triples",
        "n_parts": n_parts,
        "parent_id": prev["snapshot_id"] if prev else None,
        "completed": [p["part_id"] for p in parts],
        "manifest": parts,
        "schema_json": schema_json,
        "schema_fingerprint": hashlib.sha256(
            (schema_json or "").encode()
        ).hexdigest()[:16],
    }
    with open(os.path.join(meta, f"snapshot-{n}.json"), "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    tmp = os.path.join(meta, "current.tmp")
    with open(tmp, "w") as f:
        f.write(str(n))
    os.replace(tmp, os.path.join(meta, "current"))
    # keep the legacy flat summary too (round-1 surface)
    with open(os.path.join(out_dir, "snapshot.json"), "w") as f:
        json.dump({"table": "triples", "n_parts": n_parts,
                   "completed": snap["completed"]}, f, indent=1, sort_keys=True)
    return n


def current_snapshot(out_dir: str, snapshot_id: int | None = None) -> dict | None:
    """Resolve the `current` pointer (or a pinned id — time travel)."""
    meta = _snapshot_dir(out_dir)
    ptr = os.path.join(meta, "current")
    if snapshot_id is None:
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            snapshot_id = int(f.read().strip())
    path = os.path.join(meta, f"snapshot-{snapshot_id}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def read_triples(spark: SparkSession, out_dir: str,
                 snapshot_id: int | None = None) -> DataFrame:
    """Read triples via the snapshot pointer (pin ``snapshot_id`` for time
    travel); falls back to a directory glob when no snapshot exists."""
    base = os.path.join(out_dir, "triples")
    snap = current_snapshot(out_dir, snapshot_id)
    if snap is not None:
        paths = [os.path.join(base, f"part_id={p}") for p in snap["completed"]]
        if not paths:
            return spark.read.option("basePath", base).parquet(base).limit(0)
        return spark.read.option("basePath", base).parquet(*paths)
    return spark.read.option("basePath", base).parquet(os.path.join(base, "part_id=*"))
