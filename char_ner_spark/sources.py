"""Sources: CoNLL-format reader (the reference's native input) re-expressed
as a Spark dataflow (SURVEY.md §2.1 S1, ref:src/utils.py:~20-90 get_sents —
reconstructed; §0 provenance).

CoNLL files are whitespace-separated columns, one token per line, first
column = token, last column = NER tag, blank line = sentence boundary.
The Spark mapping: read each file whole (one row per file — line order is
then a POSITION from split/posexplode, not an ordering assumption) → mark
blanks → running-count window assigns sentence ids → group + collect_list
reassembles sentences. The window partitions by source FILE (sharded
corpora parallelize across files; sentence ids are per-file, with the file
path carried alongside). A line-oriented read with
monotonically_increasing_id was rejected: for a file larger than one input
split, within-file order across splits rests on an UNSPECIFIED partition-
packing detail — any change silently scrambles sentences. Whole-file rows
bound per-task memory by the largest shard, which matches CoNLL reality
(megabytes) and the reference's own sequential parse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL text file(s) → (file, sent_id, tokens array<string>,
    tags array<string>); ``sent_id`` counts per file.

    Mirrors the reference's get_sents: col0 = token, last col = tag,
    blank line ends a sentence; '-DOCSTART-' lines are dropped
    (CoNLL-2003 convention)."""
    # binaryFile source, NOT the text source: Spark 4.1's GenerateExec
    # computes posexplode positions (and transform lambda indexes) as 0 over
    # the non-batched text scan — a measured codegen defect — while the
    # batched binaryFile scan yields correct positions. One row per file,
    # so line_id is an exact in-file position by construction.
    lines = (
        spark.read.format("binaryFile").load(path)
        .select(
            F.col("path").alias("file"),
            F.posexplode(
                F.split(F.decode("content", "UTF-8"), "\n")
            ).alias("line_id", "raw"),
        )
        .select("file", "line_id", F.trim(F.col("raw")).alias("line"))
    )
    w = Window.partitionBy("file").orderBy("line_id")
    sents = (
        lines.withColumn("is_blank", (F.col("line") == "").cast("int"))
        .withColumn("sent_id", F.sum("is_blank").over(w))
        .filter((F.col("is_blank") == 0) & ~F.col("line").startswith("-DOCSTART-"))
        .withColumn("cols", F.split("line", r"\s+"))
        .groupBy("file", "sent_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("line_id", "cols"))
            ).alias("rows")
        )
        .select(
            "file",
            "sent_id",
            F.expr("transform(rows, r -> r.cols[0])").alias("tokens"),
            F.expr("transform(rows, r -> element_at(r.cols, -1))").alias("tags"),
        )
    )
    return sents


def write_conll_fixture(path: str, n_sents: int = 120, seed: int = 42) -> pd.DataFrame:
    """Deterministic CoNLL-shaped fixture file (FIXTURES.md §4) + the
    expected parse as a pandas frame."""
    from .fixtures import make_alias_table

    rng = np.random.RandomState(seed)
    alias = make_alias_table(60, seed=seed)
    canon = alias[alias.alias == alias.canonical_name].drop_duplicates("entity_id")
    fillers = "the report shows steady growth in revenue and demand".split()
    rows = []
    lines: list[str] = ["-DOCSTART- -X- -X- O", ""]
    for s in range(n_sents):
        tokens: list[str] = []
        tags: list[str] = []
        for _ in range(2 + rng.randint(4)):
            tokens.append(fillers[rng.randint(len(fillers))])
            tags.append("O")
        ent = canon.iloc[rng.randint(len(canon))]
        words = ent.canonical_name.split()
        tokens.extend(words)
        tags.extend(
            [f"B-{ent.ner_type}"] + [f"I-{ent.ner_type}"] * (len(words) - 1)
        )
        tokens.append(".")
        tags.append("O")
        for t, g in zip(tokens, tags):
            lines.append(f"{t} NNP {g}")
        lines.append("")
        rows.append((s, tokens, tags))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return pd.DataFrame(rows, columns=["sent_idx", "tokens", "tags"])
