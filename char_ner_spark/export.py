"""RDF N-Triples export of the materialized KG (W3C N-Triples 1.1).

The interchange format a knowledge-graph consumer actually loads
(triplestores, SPARQL engines, RDF toolchains). N-Triples is line-oriented
— one independent statement per line — so the export is a plain
distributed text write: no driver-side collect, no cross-partition state,
each executor serializes its own partition. Everything (IRI construction,
literal escaping) is built-in column expressions, JVM-side end to end.

Escaping follows the N-Triples canonical form for literals: ``\\``, ``"``,
newline, carriage return and tab are escaped (in that order — backslash
first, or the escapes themselves would be re-escaped).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: default IRI namespace for entities/predicates; any absolute IRI prefix
#: works — N-Triples requires absolute IRIs, no prefixed names
BASE = "http://kg.local/"


def _escape_literal(c):
    """N-Triples string-literal escaping as a column expression.
    Backslash FIRST: later escapes introduce backslashes that must not be
    doubled."""
    x = F.regexp_replace(c, r"\\", r"\\\\")
    x = F.regexp_replace(x, '"', '\\\\"')
    x = F.regexp_replace(x, "\n", r"\\n")
    x = F.regexp_replace(x, "\r", r"\\r")
    x = F.regexp_replace(x, "\t", r"\\t")
    return x


def triples_to_ntriples(triples: DataFrame, base: str = BASE) -> DataFrame:
    """(subj, pred, obj, ...) → one-column (line: string) N-Triples frame.

    Entities become ``<base>entity/<id>`` IRIs, predicates
    ``<base>pred/<name>`` (predicate names are template keys —
    ``[a-z_]+`` by construction in relations.py, IRI-safe without
    percent-encoding)."""
    e = lambda col: F.concat(F.lit(f"<{base}entity/"),
                             F.col(col).cast("string"), F.lit(">"))
    return triples.select(
        F.concat_ws(
            " ",
            e("subj"),
            F.concat(F.lit(f"<{base}pred/"), F.col("pred"), F.lit(">")),
            e("obj"),
            F.lit("."),
        ).alias("line")
    )


def entities_to_ntriples(entities: DataFrame, base: str = BASE) -> DataFrame:
    """Entity dimension → rdfs:label + owl:sameAs statements.

    Every entity gets a label literal; a non-canonical entity additionally
    gets ``owl:sameAs`` to its canonical id — the RDF rendering of the
    connected-components canonicalization."""
    eid = F.concat(F.lit(f"<{base}entity/"),
                   F.col("entity_id").cast("string"), F.lit(">"))
    canon = F.concat(F.lit(f"<{base}entity/"),
                     F.col("canonical_id").cast("string"), F.lit(">"))
    labels = entities.select(
        F.concat_ws(
            " ",
            eid,
            F.lit("<http://www.w3.org/2000/01/rdf-schema#label>"),
            F.concat(F.lit('"'), _escape_literal(F.col("canonical_name")),
                     F.lit('"@'), F.col("lang")),
            F.lit("."),
        ).alias("line")
    )
    same_as = entities.filter(
        F.col("canonical_id").isNotNull()
        & (F.col("entity_id") != F.col("canonical_id"))
    ).select(
        F.concat_ws(
            " ",
            eid,
            F.lit("<http://www.w3.org/2002/07/owl#sameAs>"),
            canon,
            F.lit("."),
        ).alias("line")
    )
    return labels.unionAll(same_as)


def write_ntriples(lines: DataFrame, path: str) -> None:
    """Distributed text write of an N-Triples frame (one ``.nt`` shard per
    partition — concatenation-safe by format definition)."""
    lines.write.mode("overwrite").text(path)


def read_ntriples(spark, path: str, base: str = BASE) -> DataFrame:
    """Parse an N-Triples export back to (subj, pred, obj) — the ingestion
    side of the round trip, for graphs produced by this engine (entity/pred
    IRIs under ``base``). Pure JVM regexp extraction over a distributed
    text read; label/sameAs statements (non-entity objects) are excluded
    by the match. Lines that don't match the entity-triple shape yield no
    row (regexp_extract returns '' → filtered)."""
    esc = re.escape(base)
    pat = (rf"^<{esc}entity/(\d+)> <{esc}pred/([a-z_]+)> "
           rf"<{esc}entity/(\d+)> \.$")
    lines = spark.read.text(path)
    out = lines.select(
        F.regexp_extract("value", pat, 1).alias("s"),
        F.regexp_extract("value", pat, 2).alias("pred"),
        F.regexp_extract("value", pat, 3).alias("o"),
    ).filter("s != '' AND o != ''")
    return out.select(F.col("s").cast("long").alias("subj"), "pred",
                      F.col("o").cast("long").alias("obj"))
