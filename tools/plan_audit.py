"""Physical-plan audit: capture .explain("formatted") for the engine's key
plans and verify the properties SURVEY.md §4.2 promises:

  - parquet scans are column-pruned (ReadSchema excludes unused cols)
  - filters are pushed down (PushedFilters non-empty where expected)
  - dimension joins are broadcast (BroadcastHashJoin), big joins AQE-planned
  - non-UDF stages run inside WholeStageCodegen

Writes docs/PLANS.md with the captured plans + a PASS/FAIL property table.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from pyspark.sql import functions as F

    from char_ner_spark.driver_queries import SHARED_SQL, register_views
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.pipeline import (
        build_dictionary_state, extract_text_df, link_pairs, tag_pages,
    )
    from char_ner_spark.session import build_session

    sf = "/root/testdata/sf0.01"
    spark = build_session("plan_audit", master="local[8]")
    register_views(spark, sf)

    sections: list[tuple[str, str, list[tuple[str, bool]]]] = []

    # 1. pushdown + pruning
    q = spark.sql(SHARED_SQL["filter_project_orders"])
    p = fmt(q)
    sections.append((
        "filter_project_orders (scan pushdown + pruning)", p,
        [
            ("filter pushed to parquet scan", "PushedFilters: [IsNotNull(o_orderstatus)" in p or "PushedFilters: [" in p and "o_orderstatus" in p),
            ("only 3 columns read", "ReadSchema" in p and "o_orderkey" in p and "o_comment" not in p),
            ("whole-stage codegen", "codegen id :" in p),
        ],
    ))

    # 2. broadcast join on dims
    q2 = spark.sql(SHARED_SQL["q5_region_revenue"])
    p2 = fmt(q2)
    sections.append((
        "q5_region_revenue (join strategy)", p2,
        [
            ("dimension joins broadcast", "BroadcastHashJoin" in p2),
            ("AQE enabled", "AdaptiveSparkPlan" in p2),
        ],
    ))

    # 3. KG pipeline: tagger stage plan
    alias = make_alias_table(100, seed=42)
    pages = spark.createDataFrame(make_pages(100, seed=42, alias_df=alias))
    m = tag_pages(pages)
    p3 = fmt(m)
    sections.append((
        "tag_pages (Arrow UDF stage)", p3,
        [
            ("single exchange before UDF",
             len(re.findall(r"\(\d+\) Exchange", p3)) == 1),
            ("Arrow eval (MapInPandas)", "MapInPandas" in p3 or "mapInPandas" in p3.lower()),
        ],
    ))

    # 4. extract_text column pruning: html+url+lang only
    ext = extract_text_df(spark.createDataFrame(make_pages(50, seed=42, alias_df=alias)))
    p4 = fmt(ext)
    sections.append((
        "extract_text_df (column pruning)", p4,
        [("warc_ts/text not in project", "warc_ts" not in p4)],
    ))

    # 5. link_pairs: broadcast winners
    ds = build_dictionary_state(spark, alias)
    lk = link_pairs(m, {"bands": ds["bands"]})
    p5 = fmt(lk)
    sections.append((
        "link_pairs (broadcast pair-link joins)", p5,
        [
            ("both link joins broadcast", p5.count("BroadcastHashJoin") >= 2),
            ("no sort-merge join of mention stream", "SortMergeJoin" not in p5),
        ],
    ))

    # 5b. extract_triples (round-4 bounded-gap keys): template matching must
    # stay a broadcast equi-join with the gap-key expansion fully JVM-side.
    # The pair input is checkpointed so the audited plan shows THIS stage
    # only (the upstream tagger's Arrow stages are audited in §3/§5).
    from char_ner_spark.pipeline import extract_triples, middles_table

    p5b = fmt(extract_triples(lk.localCheckpoint(), ds["canon"],
                              middles_table(spark)))
    sections.append((
        "extract_triples (bounded-gap template join)", p5b,
        [
            ("template + canon joins broadcast",
             p5b.count("BroadcastHashJoin") >= 3),
            # "Python" alone would false-positive on applySchemaToPythonRDD
            # (the driver-local template-table materialization) — only the
            # eval operators mean per-row Python at runtime
            ("gap-key expansion is JVM generate (no Python eval)",
             "Generate" in p5b and "ArrowEvalPython" not in p5b
             and "BatchEvalPython" not in p5b),
            ("no sort-merge join of the pair stream",
             "SortMergeJoin" not in p5b),
        ],
    ))

    # 6. cross-engine SQL dedup: JVM-only (no Python eval), map-side partial
    # aggregation for both the 16-way MIN signature agg and the 60-bit vote.
    # Codegen annotation is captured with AQE off: an AdaptiveSparkPlan's
    # pre-execution formatted explain omits "codegen id" markers even for
    # plans that run fully inside WholeStageCodegen (explain-time artifact).
    from char_ner_spark.dedup import SPARK, minhash_bands_sql, simhash_sql

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        p6 = fmt(spark.sql(minhash_bands_sql(SPARK)))
        p7 = fmt(spark.sql(simhash_sql(SPARK)))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    sections.append((
        "minhash_bands_sql / simhash_sql (JVM-only dedup)", p6 + "\n\n" + p7,
        [
            ("no Python eval in either plan",
             "Python" not in p6 and "Python" not in p7
             and "ArrowEval" not in p6 and "ArrowEval" not in p7),
            ("partial (map-side) aggregation present",
             "partial_" in p6.lower() or "HashAggregate" in p6),
            ("whole-stage codegen spans", "codegen id :" in p6 and "codegen id :" in p7),
        ],
    ))

    # 7. on-disk IVF index: probe reads are partition-pruned, query side
    # broadcast — the "never read the unprobed cells" property at scale
    import tempfile

    from char_ner_spark.similarity import (
        ivf_topk_from_index, kmeans_centroids, write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    ivf_dir = os.path.join(tempfile.mkdtemp(prefix="cns_plan_ivf_"), "index")
    cents = kmeans_centroids(emb, nlist=8)
    write_ivf_index(emb, ivf_dir, nlist=8, centroids=cents)
    queries = emb.filter("vec_id < 3").withColumnRenamed("vec_id", "query_id")
    p8 = fmt(ivf_topk_from_index(spark, ivf_dir, queries, cents, k=5, nprobe=2))
    sections.append((
        "ivf_topk_from_index (partition-pruned index probe)", p8,
        [
            ("probe cells pushed as partition filter",
             "PartitionFilters" in p8 and "cell" in p8),
            ("query side broadcast", "BroadcastHashJoin" in p8
             or "BroadcastNestedLoopJoin" in p8),
        ],
    ))

    # 8. ngram_jaccard prefix-filter candidates (round-4): the self-join
    # runs on dictionary-encoded BIGINT sids with a fused partial agg —
    # no string shingle keys, no separate distinct+recount pass
    from char_ner_spark.driver_queries import _nj_candidates_sql, _nj_stage_dd

    v = _nj_stage_dd(spark, "documents")
    p9 = fmt(spark.sql(_nj_candidates_sql(f"{v}_dd", 2000)))
    spark.catalog.dropTempView(f"{v}_dd")
    sections.append((
        "ngram_jaccard candidates (prefix-filtered self-join)", p9,
        [
            ("self-join keyed on encoded sid, not shingle strings",
             "sid" in p9 and "shingle" not in p9),
            ("fused partial aggregation off the join",
             "partial_" in p9.lower() or "HashAggregate" in p9),
            ("no Python eval", "Python" not in p9 and "ArrowEval" not in p9),
        ],
    ))

    # 9. bucketed shingle index (round-4): the on-disk staging variant's
    # candidate self-join is CO-LOCATED — both sides read pre-bucketed,
    # pre-sorted sid files, so the only exchange left is the pair
    # aggregation (AQE/broadcast off for a clean pre-execution explain)
    from char_ner_spark.dedup import write_shingle_index

    idx_dir = tempfile.mkdtemp(prefix="cns_plan_shidx_")
    write_shingle_index(spark, "documents", "plan_audit_shidx", buckets=8,
                        path=os.path.join(idx_dir, "idx"))
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p10 = fmt(spark.sql(_nj_candidates_sql("plan_audit_shidx", 2000)))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS plan_audit_shidx")
    sections.append((
        "write_shingle_index (bucketed co-located self-join)", p10,
        [
            ("join sides read bucketed files", "Bucketed: true" in p10),
            ("no exchange under the join (only the pair aggregation)",
             len(re.findall(r"\(\d+\) Exchange", p10)) == 1),
        ],
    ))

    # 12. training gradient job (round 5): the epoch/batch filter must
    # prune JVM-side BEFORE the Python crossing, and the job must be
    # shuffle-free (scan → filter → MapInPandas) — at 10^12 docs the
    # mini-batch selectivity is what keeps one SGD step's Python work
    # bounded, so a filter evaluated after the UDF would be a scale bug.
    import tempfile

    from char_ner_spark import training as TR

    with tempfile.TemporaryDirectory(prefix="plan_audit_train_") as td:
        spark.createDataFrame(
            [(f"s{i}", "Alice met Bob", [1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1])
             for i in range(64)],
            "sent_id string, text string, labels array<int>",
        ).write.parquet(td + "/sents")
        sents_t = spark.read.parquet(td + "/sents")
        gj = (
            TR.with_batch_col(sents_t, 0, 4)
            .filter(F.col("batch") == 1)
            .select("text", "labels")
            .mapInPandas(TR._partial_grads_fn(TR.init_weights("en")),
                         schema=TR._PARTIAL_SCHEMA)
        )
        p11 = fmt(gj)
        mip = p11.find("MapInPandas")
        filt = p11.find("Filter")
        sections.append((
            "training batch-gradient job (epoch filter before Python)", p11,
            [
                ("Arrow eval (MapInPandas)", mip >= 0),
                # formatted tree prints output-first: the Filter must be a
                # descendant of (printed after) MapInPandas in the tree
                ("batch filter prunes JVM-side before the UDF",
                 0 <= mip < filt and "xxhash64" in p11),
                ("shuffle-free (no Exchange)", "Exchange" not in p11),
            ],
        ))

    # 12. graph analytics: one distributed PageRank round. The loop-
    # invariant transition table and vertex set are persisted (an
    # InMemoryRelation keeps the repartition's outputPartitioning visible;
    # a localCheckpoint degrades to UnknownPartitioning and silently
    # re-shuffles the edge table EVERY round — the regression this section
    # exists to catch). Only vertex-scale frames may shuffle per round.
    from char_ner_spark.graph import _graph_npart, _pr_step

    def outer_tree(plan: str) -> str:
        """The plan tree with cached-relation BUILD subtrees removed —
        those one-time exchanges are not per-round work."""
        tree = plan.split("\n\n")[0]
        out_lines, skip_indent = [], None
        for line in tree.splitlines():
            indent = len(line) - len(line.lstrip(" :+-*"))
            if skip_indent is not None:
                if indent > skip_indent:
                    continue
                skip_indent = None
            if "InMemoryRelation" in line:
                skip_indent = indent
                continue
            out_lines.append(line)
        return "\n".join(out_lines)

    import pandas as pd

    edges_g = spark.createDataFrame(
        pd.DataFrame({
            "src": list(range(100)) * 2,
            "dst": [(i * 7 + 3) % 100 for i in range(200)],
            "rel": ["r"] * 200,
            "weight": [1.0] * 200,
        })
    )
    npart = _graph_npart(edges_g)
    gg = edges_g.groupBy("src", "dst").agg(F.sum("weight").alias("w")) \
        .localCheckpoint()
    ow = gg.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = gg.join(ow, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    ).repartition(npart, "src").persist()
    verts = (
        gg.select(F.col("src").alias("entity"))
        .union(gg.select(F.col("dst").alias("entity"))).distinct()
        .join(ow.select(F.col("src").alias("entity"),
                        F.lit(False).alias("dang")), "entity", "left")
        .select("entity", F.coalesce("dang", F.lit(True)).alias("dang"))
        .repartition(npart, "entity").persist()
    )
    nv = verts.count()
    trans.count()
    verts_r = verts.withColumn("reset", F.lit(1.0 / nv))
    ranks0 = verts.select("entity", "dang",
                          F.lit(1.0 / nv).alias("rank")).localCheckpoint()
    p12 = fmt(_pr_step(verts_r, ranks0, trans, 0.85, 0.0))
    t12 = outer_tree(p12)
    n_shuffles = len(re.findall(r"\bExchange\b", t12.replace(
        "BroadcastExchange", "BCX")))
    sections.append((
        "pagerank distributed round (loop invariants cached, vertex-scale shuffles only)",
        p12,
        [
            ("both loop-invariant sides read from cache",
             t12.count("InMemoryTableScan") >= 2),
            ("edge table never re-shuffled per round (<=3 vertex-scale shuffles)",
             0 < n_shuffles <= 3),
        ],
    ))
    trans.unpersist()
    verts.unpersist()

    # 13. k-hop: the frontier is broadcast, the adjacency streams in place
    # (k_hop materializes each hop eagerly, so audit the hop join SHAPE it
    # builds: broadcast frontier probing the checkpointed adjacency)
    seed_df = edges_g.select(F.col("src").alias("entity")).limit(1)
    hop_probe = (
        edges_g.select("src", "dst").distinct().localCheckpoint()
        .join(F.broadcast(seed_df.withColumnRenamed("entity", "src")), "src")
    )
    p13 = fmt(hop_probe)
    sections.append((
        "k_hop frontier expansion (broadcast probe over adjacency)", p13,
        [
            ("frontier broadcast-joined", "BroadcastHashJoin" in p13),
            ("adjacency never shuffled",
             "Exchange" not in outer_tree(p13).replace("BroadcastExchange",
                                                       "BCX")),
        ],
    ))

    # 14. recanonicalization: the canonical-id delta joins as broadcast
    # maps over the triples stream — no sort-merge of the corpus-scale side
    from char_ner_spark.incremental import recanonicalize_triples

    trip_demo = spark.createDataFrame(
        pd.DataFrame({
            "subj": [1, 2, 3], "pred": ["p"] * 3, "obj": [4, 5, 6],
            "url": ["u"] * 3, "sent_idx": [0, 1, 2], "conf": [0.9] * 3,
        })
    )
    remap_demo = spark.createDataFrame(
        pd.DataFrame({"old_canonical_id": [2], "new_canonical_id": [1]}))
    p14 = fmt(recanonicalize_triples(trip_demo, remap_demo))
    sections.append((
        "recanonicalize_triples (broadcast remap, no corpus-side sort-merge)",
        p14,
        [
            ("both remap joins broadcast", p14.count("BroadcastHashJoin") >= 2),
            ("no sort-merge join", "SortMergeJoin" not in p14),
        ],
    ))

    # 15. BGP pattern match: constant-pred filters reach the parquet scan,
    # legs equijoin on shared variables (never a cartesian), all JVM
    import tempfile

    from char_ner_spark.graph import match_pattern, triangle_counts

    tri_path = os.path.join(tempfile.mkdtemp(prefix="plan_bgp_"), "tri")
    spark.createDataFrame(pd.DataFrame({
        "subj": [1, 2, 3, 4] * 25, "pred": ["works_for", "located_in"] * 50,
        "obj": [2, 3, 4, 5] * 25,
        "url": ["u"] * 100, "sent_idx": list(range(100)),
        "conf": [0.9] * 100,
    })).write.mode("overwrite").parquet(tri_path)
    tri_pq = spark.read.parquet(tri_path)
    p15 = fmt(match_pattern(tri_pq, [("?person", "works_for", "?org"),
                                     ("?org", "located_in", "?place")]))
    sections.append((
        "match_pattern 2-hop BGP (pred pushdown, var equijoin, no Python)",
        p15,
        [
            ("constant predicates pushed into the scan",
             "EqualTo(pred,works_for)" in p15
             and "EqualTo(pred,located_in)" in p15),
            ("scan pruned to the pattern's columns",
             "url" not in re.findall(r"ReadSchema: \S+", p15)[0]),
            ("legs equijoin — no cartesian product",
             "CartesianProduct" not in p15 and "BroadcastNestedLoop"
             not in p15),
            ("all JVM (no Python eval in the plan)",
             "EvalPython" not in p15),
        ],
    ))

    # 15b. semi-naive inference round: one rule body with one leg
    # restricted to the (small) delta — the join must stay an equijoin
    # with the delta feeding one side only, all JVM
    from char_ner_spark.graph import _compile_bgp

    tri_all = tri_pq.select("subj", "pred", "obj").distinct()
    delta_demo = tri_all.limit(3).localCheckpoint()
    body = [("?p", "works_for", "?o"), ("?o", "located_in", "?c")]
    sols, _vs = _compile_bgp(tri_all, body, allow_product=False,
                             leg_bases=[delta_demo, None])
    p15b = fmt(sols)
    sections.append((
        "infer semi-naive round (delta-restricted leg equijoin)", p15b,
        [
            ("delta joins the full fact set as an equijoin (no cartesian)",
             "CartesianProduct" not in p15b
             and "BroadcastNestedLoop" not in p15b),
            ("all JVM (no Python eval in the plan)", "EvalPython" not in p15b),
            ("non-delta leg still scans with its pred filter pushed",
             "EqualTo(pred,located_in)" in p15b),
        ],
    ))

    # 16. triangle_counts: oriented wedge join is an equijoin (the O(m^1.5)
    # bound rests on never materializing a nested-loop pair expansion)
    p16 = fmt(triangle_counts(edges_g))
    sections.append((
        "triangle_counts (degree-oriented wedge equijoin)", p16,
        [
            ("wedge + closing joins are hash/sort equijoins, not nested loops",
             "CartesianProduct" not in p16
             and "BroadcastNestedLoop" not in p16),
            ("all JVM (no Python eval in the plan)", "EvalPython" not in p16),
            ("map-side partial aggregation for the per-entity counts",
             "partial_count" in p16 or "HashAggregate" in p16),
        ],
    ))

    out = ["# Physical plan audit (generated by tools/plan_audit.py)\n"]
    ok_all = True
    for title, plan, checks in sections:
        out.append(f"\n## {title}\n")
        for desc, ok in checks:
            ok_all &= ok
            out.append(f"- {'PASS' if ok else 'FAIL'}: {desc}")
        out.append("\n```\n" + plan.strip()[:4000] + "\n```\n")
    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote docs/PLANS.md; all checks pass:", ok_all)
    for title, _, checks in sections:
        for desc, ok in checks:
            print(f"{'PASS' if ok else 'FAIL'}: {title}: {desc}")
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
