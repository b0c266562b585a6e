"""Drive the graph-analytics + export surfaces over a materialized KG and
print one JSON verdict line.

Flow: fixture corpus → partitioned run → read the edge graph back from
the snapshot → degrees / PageRank / weakly-connected components / k-hop /
triple_support — each checked against a driver-side oracle on the SAME
graph — then export the KG as N-Triples and parse it back.

Usage: python tools/run_graph_demo.py [n_pages] [n_entities]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    from pyspark.sql import functions as F

    from char_ner_spark import lineage
    from char_ner_spark.export import read_ntriples, triples_to_ntriples, \
        write_ntriples
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.graph import (degrees, infer, k_hop, match_pattern,
                                      pagerank, triangle_counts,
                                      triple_support,
                                      weakly_connected_components)
    from char_ner_spark.session import build_session

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    spark = build_session("graph_demo", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    alias = make_alias_table(n_entities, seed=31)
    pages = make_pages(n_pages, seed=31, alias_df=alias)
    out_dir = tempfile.mkdtemp(prefix="graph_demo_")
    lineage.run_partitioned(spark, spark.createDataFrame(pages), alias,
                            out_dir, n_parts=3, sinks=("triples", "edges"))
    edges = lineage.read_edges(spark, out_dir).localCheckpoint()
    e_pdf = edges.toPandas()
    n_edges = len(e_pdf)

    deg = degrees(edges).toPandas()
    deg_ok = (
        int(deg["degree"].sum()) == 2 * n_edges
        and set(deg["entity"]) == set(e_pdf.src) | set(e_pdf.dst)
    )

    pr = {r.entity: r.rank for r in pagerank(edges, tol=1e-10,
                                             max_iter=2000).collect()}
    # oracle: dense power iteration on the same collapsed graph
    g = e_pdf.groupby(["src", "dst"])["weight"].sum().reset_index()
    nodes = sorted(set(g.src) | set(g.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    P = np.zeros((len(nodes), len(nodes)))
    for s, d, w in g.itertuples(index=False):
        P[idx[s], idx[d]] = w
    row = P.sum(axis=1)
    dang = row == 0
    P[~dang] /= row[~dang, None]
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(5000):
        r = (1 - 0.85) / len(nodes) + 0.85 * (r @ P + r[dang].sum()
                                              / len(nodes))
    pr_ok = (abs(sum(pr.values()) - 1.0) < 1e-9
             and all(abs(pr[v] - r[idx[v]]) < 1e-7 for v in nodes))

    wcc = weakly_connected_components(edges).toPandas()
    wcc_ok = (wcc.groupby("component")["entity"].min()
              == wcc.groupby("component")["entity"].apply(lambda s: s.min())
              ).all() and set(wcc["entity"]) == set(nodes)

    seed_entity = int(e_pdf.src.iloc[0])
    hop = k_hop(edges, spark.createDataFrame(
        [(seed_entity,)], "entity long"), k=2).toPandas()
    hop_ok = (hop[hop.dist == 0].entity.tolist() == [seed_entity]
              and hop.dist.max() <= 2)

    triples = lineage.read_triples(spark, out_dir).drop("part_id")
    sup = triple_support(triples).toPandas()
    sup_ok = int(sup["n_mentions"].sum()) == triples.count() \
        and (sup["n_urls"] <= sup["n_mentions"]).all()

    # BGP pattern match vs a nested-loop matcher on the same triples
    t_pdf = triples.select("subj", "pred", "obj").toPandas()
    tri_set = set(map(tuple, t_pdf.values))
    top_pred = t_pdf["pred"].value_counts().index[0]
    got_bgp = {tuple(r) for r in match_pattern(
        triples, [("?a", top_pred, "?b"), ("?b", "?p", "?c")]).collect()}
    want_bgp = {(s1, o1, p2, o2)
                for s1, p1, o1 in tri_set if p1 == top_pred
                for s2, p2, o2 in tri_set if s2 == o1}
    bgp_ok = got_bgp == want_bgp and len(got_bgp) > 0

    # per-entity triangle counts vs a set-intersection oracle
    tc = {r.entity: r.n_triangles
          for r in triangle_counts(edges).collect()}
    adj: dict[int, set[int]] = {}
    for s, d in e_pdf[["src", "dst"]].values:
        if s != d:
            adj.setdefault(int(s), set()).add(int(d))
            adj.setdefault(int(d), set()).add(int(s))
    want_tc: dict[int, int] = {}
    for a in sorted(adj):
        for b2 in adj[a]:
            if b2 <= a:
                continue
            for c2 in adj[a] & adj[b2]:
                if c2 > b2:
                    for v in (a, b2, c2):
                        want_tc[v] = want_tc.get(v, 0) + 1
    tri_ok = tc == want_tc

    # datalog fixpoint: located_in transitivity + works_for∘located_in ⇒
    # based_in, vs a driver-side naive fixpoint on the same facts
    rules = [
        ([("?x", "located_in", "?y"), ("?y", "located_in", "?z")],
         ("?x", "located_in", "?z")),
        ([("?p", "works_for", "?o"), ("?o", "located_in", "?c")],
         ("?p", "based_in", "?c")),
    ]
    got_inf = {tuple(r) for r in infer(triples, rules, max_rounds=20)
               .collect()}
    facts = set(tri_set)
    base_facts = set(facts)
    for _ in range(20):
        loc = {(s, o) for s, p, o in facts if p == "located_in"}
        wf = {(s, o) for s, p, o in facts if p == "works_for"}
        new = ({(a, "located_in", d) for a, b in loc for c, d in loc
                if b == c}
               | {(a, "based_in", c) for a, b in wf for b2, c in loc
                  if b == b2}) - facts
        if not new:
            break
        facts |= new
    infer_ok = got_inf == (facts - base_facts)

    nt_dir = os.path.join(out_dir, "export_nt")
    write_ntriples(triples_to_ntriples(triples), nt_dir)
    back = read_ntriples(spark, nt_dir)
    # one line per triple ROW (duplicate statements across urls are valid
    # N-Triples); the parsed DISTINCT statement set must round-trip exactly
    spo = lambda df: set(map(tuple, df.select("subj", "pred", "obj")
                             .distinct().toPandas().itertuples(index=False)))
    export_ok = (back.count() == triples.count()
                 and spo(back) == spo(triples))

    result = {
        "edges": n_edges,
        "entities_in_graph": len(nodes),
        "degrees_ok": bool(deg_ok),
        "pagerank_matches_oracle": bool(pr_ok),
        "wcc_min_label_ok": bool(wcc_ok),
        "k_hop_ok": bool(hop_ok),
        "triple_support_ok": bool(sup_ok),
        "bgp_match_ok": bool(bgp_ok),
        "triangles_ok": bool(tri_ok),
        "infer_fixpoint_ok": bool(infer_ok),
        "ntriples_roundtrip_ok": bool(export_ok),
    }
    ok = all(v for k, v in result.items() if k.endswith("_ok"))
    result["ok"] = ok
    print(json.dumps(result))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
