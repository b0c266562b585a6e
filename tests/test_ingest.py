"""Corpus-delta ingestion into an existing batch out_dir: append-only,
idempotent per ingest_id, crash-resumable, and equal to having processed
the union corpus in one run."""

import pandas as pd
import pytest

from char_ner_spark.fixtures import make_alias_table, make_pages


@pytest.fixture(scope="module")
def corpus():
    alias = make_alias_table(60, seed=21)
    pages = make_pages(60, seed=21, alias_df=alias)
    assert pages.url.is_unique
    return alias, pages


def _tkey(pdf):
    return set(map(tuple,
                   pdf[["subj", "pred", "obj", "url", "sent_idx", "conf"]]
                   .round({"conf": 6}).itertuples(index=False)))


def test_ingest_equals_union_run(spark, corpus, tmp_path_factory):
    from char_ner_spark import lineage
    from char_ner_spark.pipeline import edges_from_triples, run_pipeline

    alias, pages = corpus
    out_dir = str(tmp_path_factory.mktemp("ingest"))
    lineage.run_partitioned(spark, spark.createDataFrame(pages.iloc[:30]),
                            alias, out_dir, n_parts=3,
                            sinks=("triples", "edges"))
    rows = lineage.ingest_pages(
        spark, spark.createDataFrame(pages.iloc[30:]), alias, out_dir,
        ingest_id=0, n_units=2)
    assert {r["stage"] for r in rows} == {"triples", "edges"}
    assert all(r["part_id"] >= lineage.INGEST_PID_BASE for r in rows)

    got = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    want = run_pipeline(spark, spark.createDataFrame(pages), alias
                        )["triples"].toPandas()
    assert _tkey(got) == _tkey(want)

    # edges re-aggregate to the union graph
    ekey = lambda pdf: {(r.src, r.dst, r.rel): round(r.weight, 6)
                        for r in pdf.itertuples()}
    got_e = lineage.read_edges(spark, out_dir).toPandas()
    want_e = edges_from_triples(
        spark.createDataFrame(want[["subj", "pred", "obj", "url",
                                    "sent_idx", "conf"]])).toPandas()
    assert ekey(got_e) == ekey(want_e)

    # idempotent: same ingest_id again writes nothing
    assert lineage.ingest_pages(
        spark, spark.createDataFrame(pages.iloc[30:]), alias, out_dir,
        ingest_id=0, n_units=2) == []
    # the original units still resume as a no-op with the original n_parts
    assert lineage.run_partitioned(
        spark, spark.createDataFrame(pages.iloc[:30]), alias, out_dir,
        n_parts=3, sinks=("triples", "edges")) == []


def test_ingest_crash_resume(spark, corpus, tmp_path_factory):
    from char_ner_spark import lineage

    alias, pages = corpus
    out_dir = str(tmp_path_factory.mktemp("ingest_crash"))
    lineage.run_partitioned(spark, spark.createDataFrame(pages.iloc[:30]),
                            alias, out_dir, n_parts=2, sinks=("triples",))
    delta = spark.createDataFrame(pages.iloc[30:])
    with pytest.raises(RuntimeError, match="injected failure"):
        lineage.ingest_pages(spark, delta, alias, out_dir, ingest_id=3,
                             n_units=2, fail_after=1)
    done_mid = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    resumed = lineage.ingest_pages(spark, delta, alias, out_dir,
                                   ingest_id=3, n_units=2)
    assert len(resumed) == 1  # only the crashed unit re-ran
    final = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    assert _tkey(done_mid) < _tkey(final)
    # no duplicates: every (url, sent_idx, subj, pred, obj) appears once
    assert len(final) == len(_tkey(final))


def test_ingest_requires_batch_sinks(spark, corpus, tmp_path_factory):
    from char_ner_spark import lineage

    alias, pages = corpus
    out_dir = str(tmp_path_factory.mktemp("ingest_empty"))
    with pytest.raises(ValueError, match="no batch sinks"):
        lineage.ingest_pages(spark, spark.createDataFrame(pages.iloc[:5]),
                             alias, out_dir, ingest_id=0)


def test_cow_after_ingest_keeps_future_ingest_ranges_clear(
        spark, corpus, tmp_path_factory):
    """A COW rewrite on an ingested out_dir must allocate from the
    reserved rewrite range, never creep into a later ingest_id's
    deterministic pid range (which would make that ingest silently skip
    its unit)."""
    from char_ner_spark import lineage
    from char_ner_spark.incremental import (_BATCH_REWRITE_PID_BASE,
                                            apply_dictionary_update,
                                            update_dictionary_state)
    from char_ner_spark.pipeline import build_dictionary_state

    alias, pages = corpus
    out_dir = str(tmp_path_factory.mktemp("cow_ingest"))
    lineage.run_partitioned(spark, spark.createDataFrame(pages.iloc[:20]),
                            alias, out_dir, n_parts=2, sinks=("triples",))
    lineage.ingest_pages(spark, spark.createDataFrame(pages.iloc[20:40]),
                         alias, out_dir, ingest_id=0, n_units=1)
    before = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    import tests.test_incremental as TI

    delta = TI._linked_bridge_delta(alias, before)
    state = build_dictionary_state(spark, alias)
    _, remap = update_dictionary_state(spark, state, alias, delta)
    stats = apply_dictionary_update(spark, out_dir, remap)
    assert stats["triples"]["rewritten"]
    assert all(new >= _BATCH_REWRITE_PID_BASE
               for _, new in stats["triples"]["rewritten"])
    # a later ingest_id still lands all its units
    rows = lineage.ingest_pages(
        spark, spark.createDataFrame(pages.iloc[40:]), alias, out_dir,
        ingest_id=1, n_units=1)
    assert len(rows) == 1
    with pytest.raises(ValueError, match="collide"):
        lineage.ingest_pages(spark, spark.createDataFrame(pages.iloc[40:]),
                             alias, out_dir, ingest_id=10**9)
