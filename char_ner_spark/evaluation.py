"""conlleval-equivalent phrase-level P/R/F1 as DataFrame aggregation
(SURVEY.md §2.4 A4 — replaces the reference's perl subprocess,
ref:conlleval.pl / ref:src/score.py:~5-45; reconstructed, §0).

Input: one row per sentence with gold and predicted word-level BIO tag
arrays. Spans are extracted with the same spans.py algebra conlleval's
phrase extraction follows; TP = exact (start, end, type) match. Micro
average via rollup over type.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import spans as S

_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("sent_id", T.LongType()),
        T.StructField("side", T.StringType()),  # gold | pred
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("ner_type", T.StringType()),
    ]
)


def _spanify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: dict[str, list] = {f.name: [] for f in _SPAN_SCHEMA.fields}
        for sid, gold, pred in zip(pdf["sent_id"], pdf["gold"], pdf["pred"]):
            for side, tags in (("gold", gold), ("pred", pred)):
                for s, e, cls in S.bio_spans(list(tags)):
                    rows["sent_id"].append(int(sid))
                    rows["side"].append(side)
                    rows["start"].append(s)
                    rows["end"].append(e)
                    rows["ner_type"].append(cls)
        yield pd.DataFrame(rows)


def span_f1(tagged: DataFrame) -> DataFrame:
    """(sent_id, gold array<string>, pred array<string>) →
    per-type + micro ('ALL') precision/recall/F1 (e4 fixed-point ints for
    cross-engine comparability)."""
    spans = tagged.select("sent_id", "gold", "pred").mapInPandas(
        _spanify, schema=_SPAN_SCHEMA
    )
    keyed = spans.groupBy("sent_id", "start", "end", "ner_type").agg(
        F.max(F.when(F.col("side") == "gold", 1).otherwise(0)).alias("in_gold"),
        F.max(F.when(F.col("side") == "pred", 1).otherwise(0)).alias("in_pred"),
    )
    per_type = (
        keyed.rollup("ner_type")
        .agg(
            F.sum(F.col("in_gold") * F.col("in_pred")).alias("tp"),
            F.sum(F.col("in_pred") * (1 - F.col("in_gold"))).alias("fp"),
            F.sum(F.col("in_gold") * (1 - F.col("in_pred"))).alias("fn"),
        )
        .withColumn("ner_type", F.coalesce("ner_type", F.lit("ALL")))
    )
    p = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    r = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    f1 = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
    return per_type.select(
        "ner_type",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(p * 10000).cast("long").alias("precision_e4"),
        F.round(r * 10000).cast("long").alias("recall_e4"),
        F.round(f1 * 10000).cast("long").alias("f1_e4"),
    )
