"""Drive the KG-maintenance flow end-to-end and print one JSON verdict line.

Flow: fixture corpus → partitioned batch run (triples/edges/entities sinks
with snapshots) → a dictionary delta that bridges two entity components
actually present in the stored triples → incremental canonicalization
(O(delta) contracted CC) → copy-on-write apply → verification:

  * latest read == broadcast-remapped pre-update triples (set equality)
  * pinned time travel == pre-update triples, byte-for-byte keys
  * edges re-aggregate to exactly the rewritten triples' edge graph
  * GC refuses while referenced, reclaims after expiry, latest unaffected

Usage: python tools/run_incremental_demo.py  [n_pages] [n_entities]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import pandas as pd

    from char_ner_spark import lineage
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.incremental import (apply_dictionary_update,
                                            recanonicalize_triples,
                                            update_dictionary_state)
    from char_ner_spark.linking import union_find_canonical
    from char_ner_spark.pipeline import build_dictionary_state
    from char_ner_spark.session import build_session

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    spark = build_session("incremental_demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    alias = make_alias_table(n_entities, seed=13)
    pages = make_pages(n_pages, seed=13, alias_df=alias)
    out_dir = tempfile.mkdtemp(prefix="incr_demo_")
    lineage.run_partitioned(spark, spark.createDataFrame(pages), alias,
                            out_dir, n_parts=4,
                            sinks=("triples", "edges", "entities"))
    s0 = lineage.current_snapshot(out_dir)["snapshot_id"]
    before = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()

    # bridge two canonical ids that occur in the materialized triples
    present = sorted(set(before["subj"]) | set(before["obj"]))
    old = union_find_canonical(alias)
    cs = [c for c in present if c in old.values()]
    member = {c: e for e, c in sorted(old.items(), reverse=True)}
    alias_of = dict(zip(alias["entity_id"], alias["alias"]))
    delta = pd.DataFrame(
        [(member[cs[1]], "Bridge Corp", alias_of[member[cs[0]]], "en", 0.5,
          "ORG")],
        columns=["entity_id", "canonical_name", "alias", "lang", "prior",
                 "ner_type"],
    )

    state = build_dictionary_state(spark, alias)
    new_state, remap = update_dictionary_state(spark, state, alias, delta)
    union_pdf = pd.concat([alias, delta], ignore_index=True)
    stats = apply_dictionary_update(spark, out_dir, remap,
                                    alias_pdf=union_pdf,
                                    canon=new_state["canon"])

    key = lambda pdf: set(
        map(tuple, pdf[["subj", "pred", "obj", "url", "sent_idx", "conf"]]
            .round({"conf": 6}).itertuples(index=False)))
    after = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    want = recanonicalize_triples(
        spark.createDataFrame(before), remap).toPandas()
    pinned = lineage.read_triples(spark, out_dir, snapshot_id=s0) \
        .drop("part_id").toPandas()
    edges_now = lineage.read_edges(spark, out_dir).toPandas()
    from char_ner_spark.pipeline import edges_from_triples
    edges_want = edges_from_triples(
        lineage.read_triples(spark, out_dir).drop("part_id")).toPandas()
    ekey = lambda pdf: {(r.src, r.dst, r.rel): round(r.weight, 6)
                        for r in pdf.itertuples()}

    gc_before = lineage.gc_orphan_parts(spark, out_dir, "triples")
    lineage.expire_snapshots(out_dir, table="triples", keep_last=1)
    gc_after = lineage.gc_orphan_parts(spark, out_dir, "triples")
    still = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()

    # corpus delta: ingest a fresh crawl slice into the same out_dir
    extra = make_pages(n_pages + 20, seed=13, alias_df=alias).iloc[n_pages:]
    ingested = lineage.ingest_pages(spark, spark.createDataFrame(extra),
                                    union_pdf, out_dir, ingest_id=0,
                                    n_units=2)
    with_delta = lineage.read_triples(spark, out_dir).drop(
        "part_id").toPandas()

    # dictionary removal: drop the bridge alias again — the component must
    # split back, and the split must be REPORTED, not guessed into triples
    from char_ner_spark.removal import remove_aliases
    _, rm_remap, splits = remove_aliases(
        spark, new_state, union_pdf, delta)

    result = {
        "triples_before": len(before),
        "triples_after": len(after),
        "parts_rewritten": stats.get("triples", {}).get("rewritten", []),
        "remap_rows": remap.count(),
        "latest_matches_remap": key(after) == key(want),
        "update_changed_table": key(after) != key(before),
        "time_travel_intact": key(pinned) == key(before),
        "edges_rederived_consistent": ekey(edges_now) == ekey(edges_want),
        "gc_while_referenced": gc_before,
        "gc_after_expiry": gc_after,
        "latest_survives_gc": key(still) == key(after),
        "ingested_parts": len(ingested),
        "ingest_grew_table": len(with_delta) > len(still),
        "ingest_no_duplicates": len(with_delta) == len(key(with_delta)),
        "removal_splits_reported": bool(splits) and rm_remap.count() >= 1,
    }
    ok = (result["latest_matches_remap"] and result["update_changed_table"]
          and result["time_travel_intact"]
          and result["edges_rederived_consistent"]
          and result["gc_while_referenced"] == []
          and len(result["gc_after_expiry"]) > 0
          and result["latest_survives_gc"]
          and result["ingested_parts"] > 0
          and result["ingest_grew_table"]
          and result["ingest_no_duplicates"]
          and result["removal_splits_reported"])
    result["ok"] = ok
    print(json.dumps(result))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
