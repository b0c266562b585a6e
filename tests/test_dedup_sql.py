"""Cross-engine equality tests for the SQL dedup operators (dedup.py):
the same template must produce identical rows on Spark and DuckDB, and the
operators must behave like SimHash / MinHash-LSH semantically (near-dups
cluster, unrelated docs don't)."""

import duckdb
import pandas as pd
import pytest

from char_ner_spark.dedup import DUCK, SPARK, hash60, minhash_bands_sql, simhash_sql

DOCS = pd.DataFrame(
    {
        "doc_id": list(range(8)),
        "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",   # near-dup of 0
            "a completely different sentence about markets and growth",
            "a completely different sentence about markets and growth",  # exact dup of 2
            "der bericht zeigt ein stetiges wachstum bei umsatz",
            "el informe muestra un crecimiento estable en ingresos",
            "one two",                                        # < 3 tokens: no shingles
            "",                                               # empty text
        ],
    }
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("dedup_docs", DOCS)
    yield con
    con.close()


@pytest.fixture(scope="module")
def sdocs(spark):
    spark.createDataFrame(DOCS).createOrReplaceTempView("dedup_docs")
    return spark


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_hash60_cross_engine(sdocs, duck):
    probe = ["", "abc", "0:some shingle", "ümlaut tökens", "the quick brown"]
    s = sdocs.sql(
        "SELECT " + hash60("x", SPARK) + " AS h FROM VALUES "
        + ",".join(f"('{v}')" for v in probe) + " AS t(x)"
    ).toPandas()
    d = duck.sql(
        "SELECT " + hash60("x", DUCK) + " AS h FROM (VALUES "
        + ",".join(f"('{v}')" for v in probe) + ") t(x)"
    ).df()
    assert list(s.h) == list(d.h)
    assert all(0 <= v < (1 << 60) for v in s.h)


def test_simhash_cross_engine_and_semantics(sdocs, duck):
    a = _canon(sdocs.sql(simhash_sql(SPARK, table="dedup_docs")).toPandas())
    b = _canon(duck.sql(simhash_sql(DUCK, table="dedup_docs")).df())
    pd.testing.assert_frame_equal(a, b)
    fp = dict(
        zip(
            sdocs.sql(simhash_sql(SPARK, table="dedup_docs")).toPandas().doc_id,
            sdocs.sql(simhash_sql(SPARK, table="dedup_docs")).toPandas().simhash,
        )
    )
    ham = lambda x, y: bin(x ^ y).count("1")
    assert fp[2] == fp[3]  # exact dup -> identical fingerprint
    assert ham(fp[0], fp[1]) < ham(fp[0], fp[4])  # near-dup closer than unrelated


def test_minhash_bands_cross_engine_and_recall(sdocs, duck):
    a = _canon(sdocs.sql(minhash_bands_sql(SPARK, table="dedup_docs")).toPandas())
    b = _canon(duck.sql(minhash_bands_sql(DUCK, table="dedup_docs")).df())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # the exact-dup pair 2,3 must share ALL 8 bands; every bucket holds >1 doc
    raw = sdocs.sql(minhash_bands_sql(SPARK, table="dedup_docs")).toPandas()
    ids = raw.doc_ids.str.split(",").apply(set)
    both = raw[ids.apply(lambda xs: "2" in xs and "3" in xs)]
    assert len(both) >= 8
    assert (raw.n > 1).all()
    # docs without shingles (6: two tokens, 7: empty) never reach a bucket
    assert not raw.doc_ids.str.split(",").apply(lambda xs: "6" in xs or "7" in xs).any()


def test_near_dup_groups_cluster_and_singletons(sdocs):
    from char_ner_spark.dedup import near_dup_groups

    got = {
        int(r.doc_id): int(r.keep_doc_id)
        for r in near_dup_groups(sdocs, table="dedup_docs").collect()
    }
    assert set(got) == set(range(8))          # keep-map covers every doc
    assert got[2] == got[3] == 2              # exact dups cluster to min id
    assert got[0] == got[1] == 0              # near-dups (1 token apart) too
    for d in (4, 5, 6, 7):                    # unrelated / shingle-less docs
        assert got[d] == d                    # keep themselves


def test_near_dup_groups_degenerate_hot_bucket(spark):
    """A boilerplate corpus where MANY docs are identical forms one giant
    LSH bucket; the min-agg star-edge path must cluster all of them to the
    min doc_id without materializing per-bucket member arrays (the 100 TB
    hot-bucket case), while distinct docs stay singletons."""
    import pandas as pd

    from char_ner_spark.dedup import near_dup_groups

    n_hot = 200
    rows = [(i, "exact same boilerplate footer text repeated everywhere") for i in range(n_hot)]
    # truly disjoint token sets per doc (a shared suffix would make these
    # legitimate near-dups — most word-trigram shingles would collide)
    rows += [
        (1000 + i, " ".join(f"w{i}x{j}" for j in range(8))) for i in range(10)
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).createOrReplaceTempView("hot_docs")
    got = {
        int(r.doc_id): int(r.keep_doc_id)
        for r in near_dup_groups(spark, table="hot_docs").collect()
    }
    assert all(got[i] == 0 for i in range(n_hot))          # one cluster, min keeper
    assert all(got[1000 + i] == 1000 + i for i in range(10))  # singletons


def test_simhash_near_dup_pairs_cross_engine(sdocs, duck):
    """Banded SimHash pair generation: identical rows on both engines, the
    exact-dup pair at hamming 0, near-dups within threshold, and no pair
    outside it (every returned hamming <= max)."""
    from char_ner_spark.dedup import simhash_near_dup_sql

    # 12 bands of 5 bits: pigeonhole GUARANTEES recall for hamming <= 11 —
    # which covers the fixture's near-dup pair (0,1) at hamming 11. The
    # production default (4x15) trades that guarantee width for bigger
    # band keys; recall above n_bands-1 is probabilistic there.
    kw = dict(table="dedup_docs", n_bands=12, max_hamming=12)
    sql_s = simhash_near_dup_sql(SPARK, **kw)
    sql_d = simhash_near_dup_sql(DUCK, **kw)
    a = _canon(sdocs.sql(sql_s).toPandas())
    b = _canon(duck.sql(sql_d).df())
    pd.testing.assert_frame_equal(a, b)

    got = {
        (int(r.doc_a), int(r.doc_b)): int(r.hamming)
        for r in sdocs.sql(sql_s).toPandas().itertuples()
    }
    assert got.get((2, 3)) == 0                      # exact dup
    assert (0, 1) in got and got[(0, 1)] == 11       # near-dup guaranteed
    assert (0, 4) not in got                         # unrelated (hamming 31)
    assert all(h <= 12 for h in got.values())
    # verification is exact: recompute hamming from fingerprints directly
    fps = dict(
        zip(*[
            sdocs.sql(simhash_sql(SPARK, table="dedup_docs")).toPandas()[c]
            for c in ("doc_id", "simhash")
        ])
    )
    for (x, y), h in got.items():
        assert bin(int(fps[x]) ^ int(fps[y])).count("1") == h


def test_bucketed_shingle_index_colocated_join(spark, tmp_path):
    """write_shingle_index materializes the df-annotated shingle set
    bucketed+sorted by sid; the candidate self-join over it is co-located —
    identical results to the per-call staging, with the join sides read
    from buckets (no exchange under the join; the only shuffle left is the
    pair aggregation)."""
    import pandas as pd

    from char_ner_spark.dedup import write_shingle_index
    from char_ner_spark.driver_queries import (
        _nj_candidates_sql,
        ngram_jaccard_pairs,
    )

    docs = [
        (0, "x y z a b c d e"),
        (1, "x y z a b c d f"),
        (2, "x y z p q r s t"),
        (3, "x y z p q r s u"),
        (4, "m n o k1 k2 k3 k4 k5"),
    ]
    spark.createDataFrame(
        pd.DataFrame(docs, columns=["doc_id", "text"])
    ).createOrReplaceTempView("bsi_docs")
    name = "bsi_index"
    try:
        write_shingle_index(spark, "bsi_docs", name, buckets=4,
                            path=str(tmp_path / "idx"))
        key = lambda df: sorted(
            (r.doc_a, r.doc_b, r.jaccard_e4)
            for r in df.toPandas().itertuples()
        )
        direct = key(ngram_jaccard_pairs(spark, "bsi_docs"))
        via_idx = key(ngram_jaccard_pairs(spark, "bsi_docs", dd_table=name))
        assert direct == via_idx and len(direct) > 0

        # plan evidence: bucketed scans feed the self-join without exchanges
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            import contextlib
            import io
            import re

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                spark.sql(_nj_candidates_sql(name, 2000)).explain("formatted")
            p = buf.getvalue()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        assert "Bucketed: true" in p, p[:2000]
        n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
        # one exchange for the pair aggregation; none under the join
        assert n_exchange == 1, (n_exchange, p[:3000])

        # staleness gate (ADVICE r4): the index records a source
        # fingerprint; a mutated source must fail loud at use time, and
        # verify_index=False must accept the point-in-time copy knowingly
        spark.createDataFrame(
            pd.DataFrame(docs[:-1], columns=["doc_id", "text"])
        ).createOrReplaceTempView("bsi_docs")
        import pytest

        with pytest.raises(ValueError, match="STALE"):
            ngram_jaccard_pairs(spark, "bsi_docs", dd_table=name)
        stale_ok = key(
            ngram_jaccard_pairs(spark, "bsi_docs", dd_table=name,
                                verify_index=False)
        )
        assert stale_ok == via_idx  # the copy still answers for its epoch
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_ngram_counting_path_equals_sql_path(spark, duck):
    """Round-6 optimization: the broadcast-postings counting fast path of
    ngram_jaccard_pairs (dedup.ngram_jaccard_pairs_counting) must produce
    EXACTLY the SQL prefix-join path's rows — including on an adversarial
    corpus with duplicate doc_id rows (global (doc, shingle) dedup), null
    doc_id / null text rows, sub-3-token docs, and threshold-boundary
    pairs — and must defer (return None) past the broadcast budget or for
    non-integral doc ids."""
    import os

    import pandas as pd

    from char_ner_spark.dedup import ngram_jaccard_pairs_counting
    from char_ner_spark.driver_queries import ngram_jaccard_pairs

    docs = [
        (0, "x y z a b c d e"),
        (1, "x y z a b c d f"),
        (0, "x y z a b c d e"),          # duplicate doc row: must not double-count
        (2, "x y z p q r s t"),
        (3, "x y z p q r s u"),
        (4, "k1 k2 k3 k4 k5 k6 k7 k8"),  # boundary partner below
        (5, "k1 k2 k3 q9 q8 q7 q6 q5"),  # shares exactly 1 of 6 shingles w/ 4
        (6, "one two"),                   # < 3 tokens: no shingles
        (7, ""),                          # empty text
        (None, "x y z a b c d e"),        # null doc_id: no pairs
        (8, None),                        # null text
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["doc_id"] = pdf["doc_id"].astype("Int64")  # keep ids integral w/ null
    spark.createDataFrame(pdf).createOrReplaceTempView("ncp_docs")

    key = lambda df: sorted(
        (r.doc_a, r.doc_b, r.jaccard_e4) for r in df.toPandas().itertuples()
    )
    fast = ngram_jaccard_pairs_counting(spark, "ncp_docs", 2000)
    assert fast is not None
    fast_rows = key(fast)
    os.environ["CHAR_NER_NJ_BROADCAST_MAX"] = "0"  # force the SQL path
    try:
        sql_rows = key(ngram_jaccard_pairs(spark, "ncp_docs"))
        # budget gate: dispatch must defer to the SQL path out of budget
        assert ngram_jaccard_pairs_counting(spark, "ncp_docs", 2000) is None
    finally:
        del os.environ["CHAR_NER_NJ_BROADCAST_MAX"]
    assert fast_rows == sql_rows and len(fast_rows) > 0
    # cross-engine: same rows from the DuckDB oracle SQL over the same docs
    from char_ner_spark.dedup import DUCK, shingles_cte

    duck.register("ncp_docs", pdf)
    oracle = duck.sql(f"""
        WITH sh AS ({shingles_cte('ncp_docs', DUCK)}),
        d AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id IS NOT NULL),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM d GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS cnt
          FROM d a JOIN d b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT doc_a, doc_b,
               CAST(ROUND(cnt * 10000.0 / (sa.n + sb.n - cnt)) AS BIGINT) AS jaccard_e4
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
        WHERE cnt * 10000.0 / (sa.n + sb.n - cnt) >= 2000""").fetchall()
    assert fast_rows == sorted(map(tuple, oracle))
    # non-integral doc ids: counting path must defer
    spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["x y z w", "x y z w"]})
    ).createOrReplaceTempView("ncp_str_docs")
    assert ngram_jaccard_pairs_counting(spark, "ncp_str_docs", 2000) is None
    # ...and the dispatching entry point still answers via the SQL path
    assert len(key(ngram_jaccard_pairs(spark, "ncp_str_docs"))) == 1
