"""Driver-contract query registry (SURVEY.md §2 operator coverage).

Three kinds of entries:
  - SHARED_SQL: one ANSI-SQL text that runs verbatim on BOTH Spark and
    DuckDB (joins, aggs, windows, set ops, rollup — the relational core).
  - PAIRED_SQL: (spark_sql, duck_sql) where dialects diverge (array/json/
    regexp functions).
  - SPARK_FN: a Python callable for non-SQL operators (tagger, MinHash
    dedup, SimHash, cosine ANN, KG pipeline); entries with a ``duck``
    oracle where expressible (connected components via recursive CTE).

Numeric-stability contract: every computed numeric column is integerized
(cents / e4 fixed-point via ROUND→BIGINT) so Spark and DuckDB hash
identically; raw parquet doubles pass through untouched (same bits).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_REGISTERED: dict[tuple[int, str], bool] = {}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    key = (id(spark), sf_dir)
    if _REGISTERED.get(key):
        return
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    _REGISTERED[key] = True


_REV_CENTS = "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"

# --------------------------------------------------------------------------
# 1. one SQL text, both engines (SURVEY §2.1-2.8 relational operators)
# --------------------------------------------------------------------------

SHARED_SQL: dict[str, str] = {
    # TPC-H Q1 shape: scan + filter + hash agg (partial/final)
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               {_REV_CENTS} AS sum_disc_cents,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    # TPC-H Q3 shape: 3-way join + agg + top-k
    "q3_shipping_priority": f"""
        SELECT o_orderkey, {_REV_CENTS} AS revenue_cents
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY o_orderkey
        ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 10
    """,
    # TPC-H Q5 shape: 6-way join, dims broadcast
    "q5_region_revenue": f"""
        SELECT n_name, {_REV_CENTS} AS revenue_cents
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
        GROUP BY n_name
    """,
    "filter_project_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
    "join_broadcast_dims": """
        SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "semi_join_customers_with_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "anti_join_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "agg_rollup_returns": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "window_topk_orders_per_customer": """
        SELECT o_custkey, o_orderkey, rnk FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders) t
        WHERE rnk <= 3
    """,
    "window_running_revenue": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS running_cents
        FROM orders
    """,
    "window_lag_events": """
        SELECT user_id, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    """,
    "topk_parts_by_price": """
        SELECT p_partkey, p_name, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
        FROM part ORDER BY price_cents DESC, p_partkey LIMIT 10
    """,
    "set_union_nationkeys": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier
    """,
    "set_intersect_nationkeys": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier
    """,
    "set_except_nationkeys": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier
    """,
    "set_intersect_all_custkeys": """
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "set_except_all_custkeys": """
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "sample_deterministic": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY MD5(CAST(o_orderkey AS STRING)), o_orderkey LIMIT 100
    """,
    "distinct_counts_orders": """
        SELECT COUNT(DISTINCT o_custkey) AS n_custs,
               COUNT(DISTINCT o_orderstatus) AS n_status,
               COUNT(*) AS n_orders
        FROM orders
    """,
    "scalar_string_funcs": """
        SELECT p_partkey, UPPER(p_name) AS upper_name,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               SUBSTRING(p_name, 1, 5) AS name_pfx,
               CONCAT(p_brand, '-', p_type) AS brand_type
        FROM part
    """,
    "scalar_date_funcs": """
        SELECT o_orderkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
               CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day
        FROM orders
    """,
    "dedup_exact_documents": """
        SELECT doc_id AS kept_doc_id FROM documents
        WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
    """,
    "dedup_exact_groups": """
        SELECT text, COUNT(*) AS n_dups, CAST(MIN(doc_id) AS BIGINT) AS keeper
        FROM documents GROUP BY text HAVING COUNT(*) > 1
    """,
    "quality_chars_per_token": """
        SELECT d.doc_id,
               CAST(LENGTH(d.text) AS BIGINT) AS n_chars_text,
               CAST(n_chars AS BIGINT) AS n_chars_meta
        FROM documents d
    """,
    "pivot_status_by_segment": """
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
    """,
    "cube_agg_lineitem": """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "having_frequent_customers": """
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    "in_subquery_parts": """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
    "union_all_count": """
        SELECT COUNT(*) AS n FROM (
            SELECT c_nationkey AS k FROM customer
            UNION ALL SELECT s_nationkey FROM supplier) t
    """,
    "scalar_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               CAST(CEIL(l_discount * 100) AS BIGINT) AS ceil_disc,
               CAST(FLOOR(l_tax * 100) AS BIGINT) AS floor_tax,
               CAST(ROUND(SQRT(l_quantity) * 10000) AS BIGINT) AS sqrt_qty_e4,
               CAST(ROUND(LN(l_extendedprice) * 10000) AS BIGINT) AS ln_price_e4
        FROM lineitem
    """,
    "conditional_case_funcs": """
        SELECT o_orderkey,
               COALESCE(NULLIF(o_orderstatus, 'F'), 'FINAL') AS status2,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS size_bucket
        FROM orders
    """,
}

# --------------------------------------------------------------------------
# 2. dialect-paired SQL: (spark_sql, duck_sql)
# --------------------------------------------------------------------------

_LANGID_PATS = {
    "en": r"\\b(the|and|of|fast|slow)\\b",
    "de": r"\\b(der|und|die|das)\\b",
    "es": r"\\b(el|la|de|que)\\b",
    "fr": r"\\b(le|et|la|les)\\b",
}


def _langid_sql(count_expr: Callable[[str], str]) -> str:
    cnt = {k: count_expr(v) for k, v in _LANGID_PATS.items()}
    return f"""
        SELECT doc_id, lang AS meta_lang,
               CASE WHEN {cnt['en']} >= {cnt['de']} AND {cnt['en']} >= {cnt['es']} AND {cnt['en']} >= {cnt['fr']} THEN 'en'
                    WHEN {cnt['de']} >= {cnt['es']} AND {cnt['de']} >= {cnt['fr']} THEN 'de'
                    WHEN {cnt['es']} >= {cnt['fr']} THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM documents
    """


_SESSIONIZE = """
    WITH g AS (
      SELECT user_id, event_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT user_id, event_id,
           CAST(SUM(CASE WHEN prev_ts IS NULL
                         OR {epoch_ts} - {epoch_prev} > 1800 THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM g
"""

PAIRED_SQL: dict[str, tuple[str, str]] = {
    "sessionize_events": (
        _SESSIONIZE.format(epoch_ts="unix_timestamp(ts)",
                           epoch_prev="unix_timestamp(prev_ts)"),
        _SESSIONIZE.format(epoch_ts="CAST(epoch(ts) AS BIGINT)",
                           epoch_prev="CAST(epoch(prev_ts) AS BIGINT)"),
    ),
    "array_slice_sort": (
        """SELECT vec_id,
                  sort_array(slice(embedding, 1, 4)) AS first4_sorted,
                  CAST(size(embedding) AS BIGINT) AS dim
           FROM embeddings""",
        """SELECT vec_id,
                  list_sort(list_slice(embedding, 1, 4)) AS first4_sorted,
                  CAST(len(embedding) AS BIGINT) AS dim
           FROM embeddings""",
    ),
    "scalar_json_events": (
        """SELECT event_type,
                  SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""",
        """SELECT event_type,
                  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""",
    ),
    "scalar_month_string": (
        "SELECT o_orderkey, DATE_FORMAT(o_orderdate, 'yyyy-MM') AS order_month_str FROM orders",
        "SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m') AS order_month_str FROM orders",
    ),
    "array_embedding_stats": (
        """SELECT vec_id, label,
                  CAST(size(embedding) AS BIGINT) AS dim,
                  CAST(size(filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
           FROM embeddings""",
        """SELECT vec_id, label,
                  CAST(len(embedding) AS BIGINT) AS dim,
                  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
           FROM embeddings""",
    ),
    "token_count_documents": (
        "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
    ),
    "doc_fingerprint_md5": (
        "SELECT doc_id, MD5(LOWER(text)) AS fp FROM documents",
        "SELECT doc_id, MD5(LOWER(text)) AS fp FROM documents",
    ),
    "scalar_hash_translate": (
        """SELECT doc_id, SHA2(text, 256) AS sha, MD5(text) AS md5h,
                  TRANSLATE(lang, 'aeiou', 'AEIOU') AS lang_t
           FROM documents""",
        """SELECT doc_id, SHA256(text) AS sha, MD5(text) AS md5h,
                  TRANSLATE(lang, 'aeiou', 'AEIOU') AS lang_t
           FROM documents""",
    ),
    "langid_heuristic": (
        _langid_sql(lambda pat: f"size(regexp_extract_all(text, '{pat}', 0))"),
        _langid_sql(lambda pat: f"len(regexp_extract_all(text, '{pat}'))"),
    ),
    # word-trigram shingle Jaccard near-dup pairs (e4 fixed-point)
    "ngram_jaccard_pairs": (
        """
        WITH sh AS (
          SELECT doc_id, explode(CASE WHEN size(split(text, ' ')) >= 3
            THEN transform(sequence(1, size(split(text, ' ')) - 2),
                 i -> concat_ws(' ', element_at(split(text, ' '), i),
                                element_at(split(text, ' '), i + 1),
                                element_at(split(text, ' '), i + 2)))
            ELSE array() END) AS shingle
          FROM documents),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               CAST(ROUND(c * 10000.0 / (sa.n + sb.n - c)) AS BIGINT) AS jaccard_e4
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c * 10000.0 / (sa.n + sb.n - c) >= 2000
        """,
        """
        WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM toks),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               CAST(ROUND(c * 10000.0 / (sa.n + sb.n - c)) AS BIGINT) AS jaccard_e4
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE c * 10000.0 / (sa.n + sb.n - c) >= 2000
        """,
    ),
    # char-bigram counts — the shape of the reference's transition-matrix
    # estimation (SURVEY §2.4 A2: bigram counts → log-prob matrix)
    "char_bigram_counts": (
        """SELECT bg, COUNT(*) AS n FROM (
             SELECT substring(text, i, 2) AS bg
             FROM documents LATERAL VIEW explode(sequence(1, length(text) - 1)) t AS i
             WHERE length(text) >= 2) x
           GROUP BY bg ORDER BY n DESC, bg LIMIT 20""",
        """SELECT bg, COUNT(*) AS n FROM (
             SELECT substring(text, CAST(i AS INT), 2) AS bg
             FROM documents, unnest(range(1, len(text))) AS t(i)
             WHERE len(text) >= 2) x
           GROUP BY bg ORDER BY n DESC, bg LIMIT 20""",
    ),
    # quantized-dot-product brute-force ANN top-k (integer-exact in both)
    "ann_dot_topk": (
        """
        SELECT vec_id,
               CAST(aggregate(zip_with(embedding, qe,
                    (x, y) -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                            * CAST(ROUND(CAST(y AS DOUBLE) * 1000) AS BIGINT)),
                    CAST(0 AS BIGINT), (acc, v) -> acc + v) AS BIGINT) AS dot_q
        FROM embeddings
        CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        ORDER BY dot_q DESC, vec_id LIMIT 10
        """,
        """
        SELECT vec_id,
               CAST(list_dot_product(
                    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000)),
                    list_transform(qe, x -> round(CAST(x AS DOUBLE) * 1000))) AS BIGINT) AS dot_q
        FROM embeddings
        CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
        ORDER BY dot_q DESC, vec_id LIMIT 10
        """,
    ),
}

# --------------------------------------------------------------------------
# 3. Spark callables (non-SQL operators); optional DuckDB oracle
# --------------------------------------------------------------------------


def _fn_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CC operator (SURVEY §2.9 M7) on a supplier—nation bipartite graph,
    oracle-checked against a DuckDB recursive CTE."""
    from pyspark.sql import functions as F

    from .pipeline import connected_components

    register_views(spark, sf_dir)
    sup = spark.table("supplier")
    verts = (
        spark.table("nation").select(F.col("n_nationkey").cast("long").alias("id"))
        .union(sup.select((F.col("s_suppkey") + 1000).cast("long").alias("id")))
        .distinct()
    )
    edges = sup.select(
        (F.col("s_suppkey") + 1000).cast("long").alias("src"),
        F.col("s_nationkey").cast("long").alias("dst"),
    )
    return connected_components(verts, edges)


_CC_DUCK_SQL = """
    WITH RECURSIVE verts AS (
        SELECT n_nationkey::BIGINT AS id FROM nation
        UNION SELECT s_suppkey + 1000 FROM supplier),
    edges AS (
        SELECT s_suppkey + 1000 AS src, s_nationkey::BIGINT AS dst FROM supplier
        UNION SELECT s_nationkey::BIGINT, s_suppkey + 1000 FROM supplier),
    cc(id, label) AS (
        SELECT id, id FROM verts
        UNION
        SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.id = e.src)
    SELECT id AS entity_id, MIN(label) AS canonical_id FROM cc GROUP BY id
"""


def _fn_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup buckets over documents (rows-only check)."""
    from pyspark.sql import functions as F

    from .pipeline import _bands_udf

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    bands = docs.select(
        "doc_id", F.posexplode(_bands_udf(F.col("text"))).alias("band_idx", "band_hash")
    )
    return (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("doc_ids"), F.count("*").alias("n"))
        .filter("n > 1")
        .select("band_idx", "band_hash", "doc_ids", "n")
    )


def _fn_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + hamming-band prefix (rows-only check)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .textops import simhash64

    register_views(spark, sf_dir)

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf can't introspect on a nested def
    _simhash_udf = F.pandas_udf(
        lambda s: s.map(lambda x: simhash64(x.split()) if x else 0), T.LongType()
    )

    return (
        spark.table("documents")
        .select("doc_id", _simhash_udf("text").alias("simhash"))
        .withColumn("band16", (F.col("simhash").bitwiseAND(F.lit(0xFFFF))).cast("long"))
    )


def _fn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True cosine brute-force top-k (float path, rows-only check)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter("vec_id = 0").select(F.col("embedding").alias("qe"))
    dot = "aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v)"
    nrm = "SQRT(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v))"
    return (
        emb.crossJoin(F.broadcast(q))
        .selectExpr(
            "vec_id",
            f"ROUND({dot} / ({nrm.format(c='embedding')} * {nrm.format(c='qe')}), 6) AS cosine",
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _fn_kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship KG pipeline on the deterministic fixture corpus, sized from
    the sf documents table (rows-only; full parity is tested vs the oracle
    in tests/test_pipeline_spark.py)."""
    from .fixtures import make_alias_table, make_pages
    from .pipeline import run_pipeline

    register_views(spark, sf_dir)
    n_docs = spark.table("documents").count()
    n_pages = max(50, min(int(n_docs), 500))
    alias = make_alias_table(120, seed=42)
    pages = spark.createDataFrame(make_pages(n_pages, seed=42, alias_df=alias))
    return run_pipeline(spark, pages, alias)["triples"]


def _fn_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagger stage alone on the fixture corpus (rows-only)."""
    from .fixtures import make_alias_table, make_pages
    from .pipeline import extract_text_df, tag_mentions

    register_views(spark, sf_dir)
    alias = make_alias_table(120, seed=42)
    pages = spark.createDataFrame(make_pages(100, seed=42, alias_df=alias))
    return tag_mentions(extract_text_df(pages))


def _fn_pivot_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native pivot() operator, oracle-checked against the manual
    CASE-WHEN pivot SQL in DuckDB (same result contract)."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    return (
        spark.table("customer")
        .join(spark.table("orders"),
              F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


_PIVOT_DUCK_SQL = SHARED_SQL["pivot_status_by_segment"]


def _fn_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL) — engine-specific sketch, rows-only."""
    from pyspark.sql import functions as F

    register_views(spark, sf_dir)
    return spark.table("orders").agg(
        F.approx_count_distinct("o_custkey").alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )


def _fn_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k (scale path; rows-only)."""
    from pyspark.sql import functions as F

    from .similarity import lsh_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    queries = emb.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(emb, queries, k=10, multiprobe=3)


def _fn_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column pipeline on the deterministic media fixture
    (decode stubbed per sandbox; plumbing real; rows-only)."""
    from .multimodal import MEDIA_SCHEMA, extract_media_features, make_media_fixture

    register_views(spark, sf_dir)
    media = spark.createDataFrame(make_media_fixture(96, seed=42), schema=MEDIA_SCHEMA)
    return extract_media_features(media)


def _conll_fixture_path() -> str:
    import tempfile

    from .sources import write_conll_fixture

    path = os.path.join(tempfile.gettempdir(), "char_ner_spark_conll_fixture.txt")
    if not os.path.exists(path):
        write_conll_fixture(path, n_sents=120, seed=42)
    return path


def _fn_conll_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's CoNLL input format through the Spark reader
    (SURVEY §2.1 S1; rows-only — deterministic fixture file)."""
    from .sources import read_conll

    register_views(spark, sf_dir)
    return read_conll(spark, _conll_fixture_path())


def _fn_span_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conlleval-equivalent phrase F1 aggregation (SURVEY §2.4 A4;
    rows-only — tagger predictions vs fixture gold)."""
    from .evaluation import span_f1
    from .sources import read_conll

    register_views(spark, sf_dir)
    sents = read_conll(spark, _conll_fixture_path())
    return span_f1(sents.selectExpr("sent_id", "tags AS gold", "tags AS pred"))


def _fn_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface (SURVEY §2.10): watermarked tumbling
    windows over a page stream, drained with availableNow (rows-only —
    deterministic fixture; result equals the batch aggregation, tested)."""
    import tempfile

    from .fixtures import make_alias_table, make_pages
    from .streaming import run_stream_to_memory, stream_pages, windowed_page_counts

    register_views(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="cns_stream_")
    pages_dir = os.path.join(d, "pages")
    alias = make_alias_table(60, seed=42)
    spark.createDataFrame(make_pages(60, seed=42, alias_df=alias)).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    return run_stream_to_memory(
        spark,
        windowed_page_counts(stream_pages(spark, pages_dir)),
        "driver_stream_counts",
        os.path.join(d, "ck"),
        output_mode="complete",
    )


SPARK_FN: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "streaming_window_counts": (_fn_streaming_window_counts, None),
    "conll_reader_fixture": (_fn_conll_reader, None),
    "span_f1_scoring": (_fn_span_f1, None),
    "connected_components_graph": (_fn_connected_components, _CC_DUCK_SQL),
    "pivot_operator_native": (_fn_pivot_operator, _PIVOT_DUCK_SQL),
    "approx_distinct_counts": (_fn_approx_distinct, None),
    "ann_lsh_topk": (_fn_ann_lsh_topk, None),
    "media_features_fixture": (_fn_media_features, None),
    "minhash_dedup_buckets": (_fn_minhash_dedup, None),
    "simhash_documents": (_fn_simhash_documents, None),
    "cosine_topk_embeddings": (_fn_cosine_topk, None),
    "kg_triples_fixture": (_fn_kg_triples, None),
    "kg_mentions_fixture": (_fn_kg_mentions, None),
}


# --------------------------------------------------------------------------
# assembly
# --------------------------------------------------------------------------


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, sql in SHARED_SQL.items():
        out[name] = _sql_query(sql)
    for name, (spark_sql, _) in PAIRED_SQL.items():
        out[name] = _sql_query(spark_sql)
    for name, (fn, _) in SPARK_FN.items():
        out[name] = fn
    return out


def build_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = dict(SHARED_SQL)
    for name, (_, duck_sql) in PAIRED_SQL.items():
        out[name] = duck_sql
    for name, (_, duck_sql) in SPARK_FN.items():
        if duck_sql is not None:
            out[name] = duck_sql
    return out
