"""Cross-engine SQL dedup operators: SimHash and MinHash-LSH.

One template generator emits BOTH the Spark and the DuckDB dialect of each
operator, so the two engines are locked semantically step-for-step and the
driver's value-hash gate verifies the distributed Spark execution against a
genuinely independent engine (not a restaged copy of the same Python code).

The portable primitive is a 60-bit hash: the last 15 hex chars of md5(s),
read big-endian. Both engines agree bit-for-bit (tests/test_dedup_sql.py),
and 60 bits keeps every intermediate inside a signed BIGINT so there is no
unsigned/overflow divergence between the dialects.

Scale note (SURVEY.md §2.9 M6 / builder brief "Deduplication"): these are
pure built-in string/bit SQL — on Spark every stage stays inside JVM
whole-stage codegen with zero Python-worker crossings, which is cheaper per
byte at 100 TB than the Arrow-batched NumPy path in textops.py. The NumPy
path remains the in-pipeline implementation for alias LSH *linking*, where
the signature matrix feeds Python scoring code anyway; for corpus-level
near-dup detection this SQL form is the production path: the band group-by
shuffles only (band_idx, band_hash, doc_id), partial-aggregates map-side,
and never materializes candidate pairs.
"""

from __future__ import annotations

SPARK, DUCK = "spark", "duck"


def hash60(expr: str, dialect: str) -> str:
    """Portable 60-bit hash of a string expression (md5 tail, big-endian)."""
    if dialect == SPARK:
        return f"CAST(conv(substr(md5({expr}), 18, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 18, 15)) AS BIGINT)"


def _bit(h: str, j: int, dialect: str) -> str:
    if dialect == SPARK:
        return f"(shiftright({h}, {j}) & 1)"
    return f"(({h} >> {j}) & 1)"


def _tokens_cte(table: str, dialect: str) -> str:
    if dialect == SPARK:
        return f"SELECT doc_id, explode(split(text, ' ')) AS tok FROM {table}"
    return f"SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM {table}"


def shingles_cte(table: str, dialect: str) -> str:
    """Word-trigram shingles (drops docs with < 3 tokens on both engines)."""
    if dialect == SPARK:
        return f"""
          SELECT doc_id, explode(transform(sequence(1, size(t) - 2),
                 i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                                element_at(t, i + 2)))) AS shingle
          FROM (SELECT doc_id, split(text, ' ') AS t FROM {table})
          WHERE size(t) >= 3"""
    return f"""
          SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 1)),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {table})"""


def shingle_set_sql(table: str) -> str:
    """The df-annotated per-doc shingle set (doc_id, sid, c, rn, n), Spark
    dialect — the staging relation under exact n-gram Jaccard dedup
    (driver_queries.ngram_jaccard_pairs) and :func:`write_shingle_index`.
    ``sid`` dictionary-encodes the shingle string to a BIGINT by equality
    join (collision-free); ``c`` is global document frequency; ``rn``/``n``
    are the per-doc rank in the global (c, sid) order and the set size —
    everything the PPJoin prefix filter needs, computed once.

    CONTRACT — materialize before reuse (ADVICE r4): ``sid`` comes from
    ``monotonically_increasing_id()`` inside an aggregate, which is
    deterministic only WITHIN one physical execution. A caller that
    references this relation more than once (both sides of a self-join,
    candidate + verify branches) MUST materialize it first
    (``localCheckpoint()`` / ``saveAsTable`` — every in-repo consumer
    does), or the references may see different sid assignments. A
    collision-free DETERMINISTIC encoding would need a global total order
    (``ROW_NUMBER() OVER (ORDER BY shingle)`` — a single-partition sort of
    the corpus's distinct shingles), which is exactly the shuffle this
    relation exists to avoid at 10^12 docs; hashing is out because no
    64-bit hash is collision-free at that cardinality. Materialize-once is
    the scale-correct contract."""
    return f"""
        WITH sh AS ({shingles_cte(table, SPARK)}),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh),
        f AS (SELECT shingle, COUNT(*) AS c,
                     monotonically_increasing_id() AS sid
              FROM d GROUP BY shingle)
        SELECT d.doc_id, f.sid, f.c,
               ROW_NUMBER() OVER (PARTITION BY d.doc_id
                                  ORDER BY f.c, f.sid) AS rn,
               COUNT(*) OVER (PARTITION BY d.doc_id) AS n
        FROM d JOIN f ON d.shingle = f.shingle"""


def write_shingle_index(spark, docs_table: str = "documents",
                        table_name: str = "shingle_index",
                        buckets: int = 32,
                        path: str | None = None) -> None:
    """Materialize :func:`shingle_set_sql` as a parquet table BUCKETED and
    sorted by ``sid`` — the co-located-join leg of the scale design (the
    on-disk twin of ngram_jaccard_pairs' per-call localCheckpoint staging,
    the way write_ivf_index is ivf_topk's). Both sides of the candidate
    self-join then read pre-bucketed, pre-sorted files: at 10^12 docs the
    sid equi-join runs with NO shuffle of the shingle set (the only
    remaining exchange is the pair aggregation), which is the difference
    between re-shuffling the corpus per dedup run and reading it in place.
    Pass the index name as ``dd_table`` to ngram_jaccard_pairs /
    ngram_jaccard_candidates. ``path`` makes it an external table there.

    The index is a point-in-time copy of ``docs_table``: a source
    fingerprint (row count + order-independent ``bit_xor(xxhash64(doc_id,
    text))`` checksum) is recorded as table properties at write time
    (ADVICE r4), and ngram_jaccard_pairs / ngram_jaccard_candidates
    re-verify it against the live source before trusting the index —
    dedup results over a silently-stale index are worse than a failed
    job. Callers who must skip the verification scan (the source moved,
    or a 10^12-doc corpus where the rescan is the cost being avoided)
    pass ``verify_index=False`` there and own the invalidation."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = spark.sql(shingle_set_sql(docs_table)).write
    if path is not None:
        w = w.option("path", path)
    (w.bucketBy(buckets, "sid").sortBy("sid")
      .mode("overwrite").saveAsTable(table_name))
    n, fp = _source_fingerprint(spark, docs_table)
    spark.sql(
        f"ALTER TABLE {table_name} SET TBLPROPERTIES ("
        f"'cns.source_table' = '{docs_table}', "
        f"'cns.source_rows' = '{n}', 'cns.source_fp' = '{fp}')"
    )


def _source_fingerprint(spark, docs_table: str) -> tuple[int, int]:
    """(row count, order-independent content checksum) of a documents
    relation — one column-pruned scan of (doc_id, text)."""
    row = spark.sql(
        f"SELECT COUNT(*) AS n, "
        f"COALESCE(bit_xor(xxhash64(CAST(doc_id AS STRING), text)), 0) AS fp "
        f"FROM {docs_table}"
    ).first()
    return int(row["n"]), int(row["fp"])


def index_source_props(spark, table_name: str) -> dict[str, str] | None:
    """The ``cns.*`` source-binding properties of a shingle index, or None
    when ``table_name`` is not a catalog table carrying them (a temp view,
    or an index written before the fingerprint scheme existed)."""
    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {table_name}").collect()
    except Exception:
        return None
    props = {r["key"]: r["value"] for r in rows}
    if "cns.source_rows" not in props:
        return None
    return props


def verify_shingle_index(spark, table_name: str) -> None:
    """Raise ``ValueError`` if ``table_name``'s recorded source fingerprint
    no longer matches the live source relation (the corpus changed after
    :func:`write_shingle_index`), or if the recorded source can't be
    resolved to re-check. No-op for tables without the properties."""
    props = index_source_props(spark, table_name)
    if props is None:
        return
    src = props.get("cns.source_table", "")
    try:
        n, fp = _source_fingerprint(spark, src)
    except Exception as exc:
        raise ValueError(
            f"shingle index {table_name!r} records source {src!r}, which is "
            f"not resolvable in this session — the index cannot be "
            f"validated ({exc}); pass verify_index=False to accept it as-is"
        ) from exc
    want = (int(props["cns.source_rows"]), int(props["cns.source_fp"]))
    if (n, fp) != want:
        raise ValueError(
            f"shingle index {table_name!r} is STALE: source {src!r} is now "
            f"(rows={n}, fp={fp}) but the index was built at (rows={want[0]}, "
            f"fp={want[1]}); rebuild with write_shingle_index or pass "
            f"verify_index=False to use the point-in-time copy knowingly"
        )


#: broadcast budget (distinct (doc, shingle) rows) for the exact-counting
#: fast path of ngram_jaccard_pairs. 40M rows ≈ 320 MB of int32 postings +
#: inverted index per python worker (~14 GB across 32 workers) —
#: comfortably inside the 128 GiB sandbox and sized to keep a 10×-scale
#: documents table (≈27M shingles) on the fast path; on a production
#: cluster size it to executor pyspark memory. Above the budget the SQL
#: prefix-join path runs instead (it never materializes the corpus on one
#: node). Env-tunable so cluster profiles can raise/lower it without code.
def _nj_counting_budget_rows() -> int:
    import os

    return int(os.environ.get("CHAR_NER_NJ_BROADCAST_MAX", str(40_000_000)))


def _nj_build_index(lists):
    """Postings lists (one int64 doc-id array per distinct shingle) → the
    dense counting structure, built ONCE driver-side and broadcast whole
    (no per-worker rebuild): sorted unique doc ids, per-doc
    distinct-shingle counts, shingle→dense-doc postings (offsets/values,
    int32 — doc ids are densified so partner lookups are direct indexing,
    not searchsorted, and the broadcast halves), and the inverted
    doc→shingle-slot view (doc_start/slot_of)."""
    import numpy as np

    lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    offsets = np.zeros(len(lists) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = np.concatenate(lists) if len(lists) else np.empty(0, np.int64)
    uniq_docs, values_d = np.unique(values, return_inverse=True)
    values_d = values_d.astype(np.int32)
    n_doc = np.bincount(values_d, minlength=len(uniq_docs)).astype(np.int64)
    order = np.argsort(values_d, kind="stable")
    slot_of = np.repeat(
        np.arange(len(offsets) - 1, dtype=np.int32), np.diff(offsets)
    )[order]
    doc_start = np.zeros(len(uniq_docs) + 1, dtype=np.int64)
    np.cumsum(n_doc, out=doc_start[1:])
    return offsets, values_d, uniq_docs, doc_start, n_doc, slot_of


def ngram_jaccard_pairs_counting(spark, docs_table: str = "documents",
                                 threshold_e4: int = 2000):
    """Exact word-trigram Jaccard pairs via broadcast postings + vectorized
    multiset counting — the in-budget fast path of
    driver_queries.ngram_jaccard_pairs (returns ``None`` out of budget or
    for non-integral doc ids, and the SQL prefix-join path runs instead).

    Why this path exists (optimization guide §8: decide with small rows):
    the SQL path generates candidate PAIRS from a prefix self-join, and at
    threshold 0.2 the prefix keeps ~80% of every doc, so on a dense corpus
    (every shingle shared by tens-to-hundreds of docs) the pair aggregation
    materializes ~85M candidate rows at sf1.0 for ~2.5k true answers —
    two full shuffles of pair rows that exist only to be discarded. Here
    the per-pair intersection counts are computed WITHOUT any pair-keyed
    shuffle: one JVM aggregation builds shingle→[doc] postings (shuffles
    |distinct (doc,shingle)| rows once, map-side combined), the postings
    (ids only, no strings — ~8 bytes/row) are broadcast, and each task
    counts partner multiplicities for its slice of docs with
    numpy sort/unique — total work Σ_s df(s)², the same asymptotics as the
    SQL join, at vectorized-native speed with zero shuffled pair rows.
    Exactness: identical (doc, shingle) distinct sets (collect_set dedups
    globally), integer-arithmetic threshold test (cnt·1e4 ≥ t·(na+nb−cnt)
    ⟺ the SQL float test — both sides < 2^53, nearest distinct rational
    is ≫ 1 ulp away), and the final jaccard_e4 projection is the same
    Spark ROUND expression the SQL path emits.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    fields = {f.name: f.dataType for f in spark.table(docs_table).schema.fields}
    id_t = fields.get("doc_id")
    if not isinstance(id_t, (T.LongType, T.IntegerType)):
        return None
    # budget probe: one pruned scan, no shuffle — total shingle count is an
    # upper bound on distinct (doc, shingle) rows
    est = spark.sql(
        f"SELECT COALESCE(SUM(GREATEST(size(split(text, ' ')) - 2, 0)), 0) "
        f"FROM {docs_table}"
    ).first()[0]
    if int(est) > _nj_counting_budget_rows():
        return None

    out_id_sql = "INT" if isinstance(id_t, T.IntegerType) else "BIGINT"
    n_parts = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    # REPARTITION before the per-row shingling: the bench corpus is one
    # small parquet file → one scan task, and the split/transform/explode
    # chain would run single-threaded without it (guide §2.5 input skew:
    # repartition immediately after the read; AQE honors the explicit
    # partition count). The shuffle moves only the raw (doc_id, text) rows.
    post = spark.sql(
        f"""
        SELECT collect_set(doc_id) AS docs
        FROM (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 explode(array_distinct(transform(sequence(1, size(t) - 2),
                     i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
                                    element_at(t, i + 2))))) AS shingle
          FROM (SELECT doc_id, split(text, ' ') AS t FROM
                (SELECT /*+ REPARTITION({n_parts}) */ doc_id, text
                 FROM {docs_table}))
          WHERE size(t) >= 3 AND doc_id IS NOT NULL)
        GROUP BY shingle"""
    )
    pdf = post.toPandas()
    empty = spark.createDataFrame(
        [],
        f"doc_a {out_id_sql.lower()}, doc_b {out_id_sql.lower()}, "
        "jaccard_e4 bigint",
    )
    if len(pdf) == 0:
        return empty
    idx = _nj_build_index([np.asarray(x, dtype=np.int64) for x in pdf["docs"]])
    sc = spark.sparkContext
    bc = sc.broadcast(idx)
    thr = int(threshold_e4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        offs, vals_d, uniq_docs, doc_start, n_doc, slot_of = bc.value
        out_a: list = []
        out_b: list = []
        out_c: list = []
        out_na: list = []
        out_nb: list = []
        for pdf_in in batches:
            for tid in pdf_in["id"].to_numpy():
                for j in range(int(tid), len(uniq_docs), n_parts):
                    slots = slot_of[doc_start[j] : doc_start[j + 1]]
                    if not len(slots):
                        continue
                    parts = np.concatenate(
                        [vals_d[offs[s] : offs[s + 1]] for s in slots]
                    )
                    partners, cnts = np.unique(parts, return_counts=True)
                    keep = partners > j
                    if not keep.any():
                        continue
                    partners, cnts = partners[keep], cnts[keep]
                    nb = n_doc[partners]
                    na = int(n_doc[j])
                    ok = cnts * 10000 >= thr * (na + nb - cnts)
                    if not ok.any():
                        continue
                    m = int(ok.sum())
                    out_a.append(np.full(m, uniq_docs[j], dtype=np.int64))
                    out_b.append(uniq_docs[partners[ok]])
                    out_c.append(cnts[ok].astype(np.int64))
                    out_na.append(np.full(m, na, dtype=np.int64))
                    out_nb.append(nb[ok].astype(np.int64))
        yield pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a) if out_a else np.empty(0, np.int64),
                "doc_b": np.concatenate(out_b) if out_b else np.empty(0, np.int64),
                "cnt": np.concatenate(out_c) if out_c else np.empty(0, np.int64),
                "na": np.concatenate(out_na) if out_na else np.empty(0, np.int64),
                "nb": np.concatenate(out_nb) if out_nb else np.empty(0, np.int64),
            }
        )

    carrier = spark.range(0, n_parts, 1, n_parts)
    counted = carrier.mapInPandas(
        gen, schema="doc_a bigint, doc_b bigint, cnt bigint, na bigint, nb bigint"
    )
    return counted.selectExpr(
        f"CAST(doc_a AS {out_id_sql}) AS doc_a",
        f"CAST(doc_b AS {out_id_sql}) AS doc_b",
        "CAST(ROUND(cnt * 10000.0 / (na + nb - cnt)) AS BIGINT) AS jaccard_e4",
    )


def simhash_sql(dialect: str, table: str = "documents", bits: int = 60) -> str:
    """SimHash fingerprint per document over whitespace tokens.

    Bit j of the fingerprint is 1 iff the count of tokens whose 60-bit hash
    has bit j set exceeds the count that do not (ties -> 0, identically on
    both engines). band16 is the low 16 bits — the blocking key for
    hamming-distance candidate generation.
    """
    h = hash60("tok", dialect)
    sums = ",\n               ".join(
        f"SUM(CASE WHEN {_bit('h', j, dialect)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits)
    )
    assemble = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
        WITH toks AS ({_tokens_cte(table, dialect)}),
        hashed AS (SELECT doc_id, {h} AS h FROM toks),
        bitsum AS (
            SELECT doc_id,
               {sums}
            FROM hashed GROUP BY doc_id),
        fp AS (SELECT doc_id, {assemble} AS simhash FROM bitsum)
        SELECT doc_id, simhash, (simhash & 65535) AS band16 FROM fp
    """


def simhash_near_dup_sql(
    dialect: str,
    table: str = "documents",
    n_bands: int = 4,
    max_hamming: int = 6,
    bits: int = 60,
) -> str:
    """SimHash near-duplicate PAIRS (doc_a < doc_b, hamming ≤ max_hamming),
    candidate-generated by banding the fingerprint into ``n_bands``
    equal bit-slices (pigeonhole: a pair within hamming ≤ n_bands-1 is
    GUARANTEED to collide on at least one untouched slice; above that the
    recall is probabilistic — raise ``n_bands`` for a wider guarantee).

    Pure built-in bit SQL in both dialects: band keys are shifts+masks of
    the fingerprint, verification is one bit_count(xor) per candidate —
    on Spark everything stays inside whole-stage codegen, the band
    self-join shuffles (band_idx, band_key, doc_id, simhash) rows only,
    and no pair outside a shared band is ever scored."""
    assert bits % n_bands == 0
    w = bits // n_bands
    mask = (1 << w) - 1

    def shifted(b: int) -> str:
        if dialect == SPARK:
            return f"(shiftright(simhash, {b * w}) & {mask})"
        return f"((simhash >> {b * w}) & {mask})"

    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, {shifted(b)} AS band_key FROM fp"
        for b in range(n_bands)
    )
    ham = "(ha ^ hb)" if dialect == SPARK else "xor(ha, hb)"
    return f"""
        WITH fp0 AS ({simhash_sql(dialect, table, bits)}),
        fp AS (SELECT doc_id, simhash FROM fp0),
        bands AS (
            {band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS ha, b.simhash AS hb
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id),
        scored AS (
            SELECT doc_a, doc_b, CAST(bit_count({ham}) AS BIGINT) AS hamming
            FROM cand)
        SELECT doc_a, doc_b, hamming FROM scored WHERE hamming <= {max_hamming}
    """


def minhash_doc_bands_sql(
    dialect: str,
    table: str = "documents",
    n_hashes: int = 16,
    n_bands: int = 8,
) -> str:
    """Per-document LSH band keys: (doc_id, band_idx, band_hash).

    MinHash signature = ``n_hashes`` independent 60-bit hash functions
    (hash function i is hash60('i:' || shingle)) MIN-aggregated over the
    document's distinct word-trigram shingles; band b's key is the md5 of
    the comma-joined signature slice of ``n_hashes / n_bands`` rows.
    """
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    mins = ",\n               ".join(
        "MIN({h}) AS m{i}".format(
            h=hash60("'{}:' || shingle".format(i), dialect), i=i
        )
        for i in range(n_hashes)
    )
    stype = "STRING" if dialect == SPARK else "VARCHAR"
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, md5("
        + " || ',' || ".join(f"CAST(m{b * r + i} AS {stype})" for i in range(r))
        + ") AS band_hash FROM sig"
        for b in range(n_bands)
    )
    return f"""
        WITH sh AS ({shingles_cte(table, dialect)}),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh),
        sig AS (
            SELECT doc_id,
               {mins}
            FROM d GROUP BY doc_id),
        bands AS (
            {band_selects})
        SELECT doc_id, band_idx, band_hash FROM bands
    """


def minhash_bands_sql(
    dialect: str,
    table: str = "documents",
    n_hashes: int = 16,
    n_bands: int = 8,
) -> str:
    """Near-dup candidate buckets: LSH buckets holding >1 document.

    The group-by shuffles only (band_idx, band_hash, doc_id) rows —
    candidate PAIRS are never materialized, so a bucket of k near-dups
    costs k rows, not k²."""
    if dialect == SPARK:
        ids = ("array_join(transform(array_sort(collect_list(doc_id)),"
               " x -> CAST(x AS STRING)), ',')")
    else:
        ids = "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)"
    return f"""
        WITH doc_bands AS ({minhash_doc_bands_sql(dialect, table, n_hashes, n_bands)})
        SELECT band_idx, band_hash, {ids} AS doc_ids, COUNT(*) AS n
        FROM doc_bands GROUP BY band_idx, band_hash
        HAVING COUNT(*) > 1
    """


def near_dup_groups(spark, table: str = "documents",
                    n_hashes: int = 16, n_bands: int = 8):
    """Corpus-level near-dup GROUPING: (doc_id, keep_doc_id) for every
    document, where keep_doc_id is the min doc_id of the document's near-dup
    cluster (transitive closure over shared LSH buckets).

    Composition, all shuffle-lean at 100 TB:
      per-doc band keys (JVM SQL, no Python)
        → star edges per bucket (min member → others; k rows per k-bucket,
          never k² pairs)
        → connected components (pointer-jumped min-label propagation, the
          same operator that canonicalizes entities)
        → left-join back onto the full doc_id set (singletons keep
          themselves).
    The CC working set is only the documents that share ≥1 bucket — at
    web scale orders of magnitude smaller than the corpus."""
    from pyspark.sql import functions as F

    from .pipeline import connected_components

    # the band plan (shingling + n_hashes MIN-aggs over the corpus) feeds
    # mins, the edge join, and CC — materialize once, don't recompute per
    # consumer
    bands = spark.sql(
        minhash_doc_bands_sql(SPARK, table, n_hashes, n_bands)
    ).localCheckpoint()
    # star edges via MIN-agg + re-join, NOT collect_set: a boilerplate-heavy
    # corpus has degenerate buckets with millions of members, and a
    # collected member array would land on a single reducer; the agg+join
    # form is linear per bucket and AQE skew-splits the hot bucket join
    mins = bands.groupBy("band_idx", "band_hash").agg(
        F.min("doc_id").cast("long").alias("src"), F.count("*").alias("n")
    )
    edges = (
        bands.join(mins.filter("n > 1"), ["band_idx", "band_hash"])
        .filter(F.col("doc_id") != F.col("src"))
        .select("src", F.col("doc_id").cast("long").alias("dst"))
        .distinct()
    ).localCheckpoint()  # feeds verts (two scans) + the CC edge set
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, edges)
    docs = spark.table(table).select(F.col("doc_id").cast("long").alias("doc_id"))
    return docs.join(
        cc.withColumnRenamed("entity_id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("canonical_id", F.col("doc_id")).alias("keep_doc_id"),
    )
