"""Analytics over the materialized entity/edge graph (north_star:
"materialize (subj, pred, obj) triples plus an entity/edge graph").

Once the KG is on disk (``lineage.read_edges``), the questions a consumer
asks are graph-shaped: which entities are hubs (degree), which are
globally central (PageRank), what is within k hops of a seed set. These
are iterative jobs Spark has no built-in operator for; each is expressed
as DataFrame joins/aggregations with the same scale discipline as the CC
stage (``pipeline.connected_components``):

* the edge list is hash-partitioned ONCE on ``src`` and reused across
  every iteration — re-shuffling the (corpus-scale) edge table per round
  is the classic PageRank-on-Spark mistake;
* per-iteration state (ranks / frontier) is small relative to the edges
  and co-partitioned on the same key, so each round's join is exchange-
  free on the big side;
* ``localCheckpoint()`` per round truncates lineage (an unbounded
  iterative plan re-evaluates the whole chain);
* convergence is observed (`Observation`), never assumed, and
  non-convergence raises instead of returning silently-wrong results.

Each operator is parity-tested against a driver-side oracle
(tests/test_graph.py): NumPy power iteration for PageRank, dict-BFS for
k-hop, pandas groupby for degrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _graph_npart(df: DataFrame) -> int:
    # graph working sets are orders of magnitude smaller than the page
    # stream — same sizing rule as the CC stage
    return max(2, int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions")) // 8)


def degrees(edges: DataFrame) -> DataFrame:
    """Per-entity degree over the (src, dst, rel, weight) edge graph →
    (entity, out_degree, in_degree, degree, weighted_degree).

    One pass: explode each edge into its two endpoint roles, then a single
    hash aggregation — no join, map-side partial aggregation applies."""
    ends = edges.select(
        F.col("src").alias("entity"),
        F.lit(1).alias("out_e"), F.lit(0).alias("in_e"),
        F.col("weight"),
    ).unionAll(edges.select(
        F.col("dst").alias("entity"),
        F.lit(0).alias("out_e"), F.lit(1).alias("in_e"),
        F.col("weight"),
    ))
    return ends.groupBy("entity").agg(
        F.sum("out_e").alias("out_degree"),
        F.sum("in_e").alias("in_degree"),
        F.count("*").alias("degree"),
        F.sum("weight").alias("weighted_degree"),
    )


#: above this many collapsed (src, dst) pairs the distributed iteration
#: runs; below it, driver-side sparse power iteration (same dispatch
#: rationale as build_dictionary_state: a Spark round costs seconds of
#: fixed scheduling latency regardless of size, and PageRank needs
#: ~log(tol)/log(alpha) ≈ 130 rounds at 1e-9 — latency-bound on any
#: broadcast-sized graph, throughput-bound only past this)
PR_DISTRIBUTED_THRESHOLD = 5_000_000


def pagerank(edges: DataFrame, alpha: float = 0.85, tol: float = 1e-9,
             max_iter: int = 200, weighted: bool = True,
             distributed_threshold: int = PR_DISTRIBUTED_THRESHOLD,
             exact_iters: int | None = None) -> DataFrame:
    """PageRank over the entity graph → (entity, rank), ranks sum to 1.

    Semantics: directed graph from the distinct (src, dst) pairs (parallel
    edges under different predicates collapse; with ``weighted`` their
    summed weights set the transition probability, else uniform over
    out-neighbors). Dangling mass is redistributed uniformly each round —
    the standard Google-matrix completion, so the result is the exact
    stationary distribution the NumPy oracle computes.

    Dispatch: graphs up to ``distributed_threshold`` collapsed edges run
    as ONE driver-side sparse power iteration (the entity graph is orders
    of magnitude smaller than the corpus; a Spark round is ~seconds of
    fixed latency and convergence needs ~130 of them). Past the threshold,
    the distributed loop below: ranks (|V| rows) join the edge table
    pre-partitioned once on ``src`` — the big side never re-shuffles —
    then one aggregation by ``dst``, and EXACTLY ONE Spark job per round
    (the convergence L1 delta AND the next round's dangling mass ride the
    Observation the eager checkpoint fires). Both paths apply the
    identical update rule and are parity-tested per-iteration
    (``exact_iters`` runs exactly that many rounds, no convergence test —
    the hook that lets tests compare the paths without waiting out ~130
    latency-bound rounds). Raises on non-convergence within
    ``max_iter``."""
    from pyspark.sql import Observation

    spark = edges.sparkSession
    npart = _graph_npart(edges)
    g = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    if not weighted:
        g = g.withColumn("w", F.lit(1.0))
    g = g.localCheckpoint()  # consumed 2-4×: count probe, out_w, trans/collect
    if g.count() <= distributed_threshold:
        return _pagerank_driver(spark, g, alpha, tol, max_iter, exact_iters)
    out_w = g.groupBy("src").agg(F.sum("w").alias("out_w"))
    # loop-invariant sides are PERSISTED, not checkpointed: an
    # InMemoryRelation keeps the repartition's outputPartitioning visible
    # to the planner, so the per-round join reuses it exchange-free — a
    # localCheckpoint here degrades to UnknownPartitioning and silently
    # re-shuffles the (corpus-scale) edge table every round (caught by the
    # plan audit; lineage truncation is only needed for the ITERATED frame)
    trans = (
        g.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .repartition(npart, "src")
        .persist()
    )
    verts = (
        g.select(F.col("src").alias("entity"))
        .union(g.select(F.col("dst").alias("entity")))
        .distinct()
        .join(out_w.select(F.col("src").alias("entity"),
                           F.lit(False).alias("dang")), "entity", "left")
        .select("entity", F.coalesce("dang", F.lit(True)).alias("dang"))
        .repartition(npart, "entity")
        .persist()
    )
    try:
        counts = verts.agg(
            F.count("*").alias("n"),
            F.sum(F.col("dang").cast("long")).alias("nd")).collect()[0]
        n, n_dang = int(counts["n"]), int(counts["nd"] or 0)
        if n == 0:
            return spark.createDataFrame([], "entity long, rank double")
        ranks = verts.select("entity", "dang", F.lit(1.0 / n).alias("rank"))
        d_mass = n_dang / n
        rounds = max_iter if exact_iters is None else exact_iters
        for it in range(rounds):
            obs = Observation(f"pr_delta_{it}")
            new_ranks = (
                _pr_step(verts, ranks, trans, n, alpha, d_mass)
                .observe(
                    obs,
                    F.sum(F.abs(F.col("rank") - F.col("old"))).alias("l1"),
                    F.sum(F.when(F.col("dang"), F.col("rank"))
                          .otherwise(F.lit(0.0))).alias("d_mass"),
                )
                .select("entity", "dang", "rank")
                .localCheckpoint()  # eager — fires the observation + cuts
                # the iterated frame's lineage
            )
            ranks = new_ranks
            got = obs.get
            d_mass = float(got["d_mass"] or 0.0)
            if exact_iters is None and float(got["l1"] or 0.0) <= tol:
                return ranks.select("entity", "rank")
        if exact_iters is not None:
            return ranks.select("entity", "rank")
        raise RuntimeError(
            f"pagerank did not converge to L1 <= {tol} within {max_iter} "
            "iterations; raise max_iter or loosen tol"
        )
    finally:
        trans.unpersist()
        verts.unpersist()


def _pr_step(verts: DataFrame, ranks: DataFrame, trans: DataFrame,
             n: int, alpha: float, d_mass: float) -> DataFrame:
    """One distributed PageRank round (pre-observation) — factored out so
    the plan audit can inspect exactly the shape the loop executes:
    contributions flow through the once-partitioned transition table, the
    per-round shuffles move only vertex-scale rows, never the edge table.
    Emits (entity, dang, rank, old)."""
    contrib = (
        ranks.select(F.col("entity").alias("src"), "rank")
        .join(trans, "src")
        .groupBy(F.col("dst").alias("entity"))
        .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
    )
    base = (1.0 - alpha) / n + alpha * d_mass / n
    return (
        verts.join(contrib, "entity", "left")
        .select(
            "entity", "dang",
            (F.lit(base)
             + F.lit(alpha) * F.coalesce("inflow", F.lit(0.0))
             ).alias("rank"),
        )
        .join(ranks.select("entity", F.col("rank").alias("old")), "entity")
    )


def _pagerank_driver(spark, g: DataFrame, alpha: float, tol: float,
                     max_iter: int, exact_iters: int | None) -> DataFrame:
    """Sparse power iteration on the collapsed (src, dst, w) edge list —
    the broadcast-sized fast path. Identical update rule to the
    distributed loop (uniform dangling redistribution); parity-tested
    iteration-for-iteration against it."""
    import numpy as np
    import pandas as pd

    pdf = g.toPandas()
    nodes = np.unique(np.concatenate([pdf["src"].to_numpy(),
                                      pdf["dst"].to_numpy()]))
    n = len(nodes)
    if n == 0:
        return spark.createDataFrame([], "entity long, rank double")
    idx = {v: i for i, v in enumerate(nodes.tolist())}
    si = pdf["src"].map(idx).to_numpy()
    di = pdf["dst"].map(idx).to_numpy()
    w = pdf["w"].to_numpy(dtype="float64")
    out_w = np.zeros(n)
    np.add.at(out_w, si, w)
    p = w / out_w[si]
    dang = out_w == 0.0
    r = np.full(n, 1.0 / n)
    rounds = max_iter if exact_iters is None else exact_iters
    converged = exact_iters is not None
    for _ in range(rounds):
        inflow = np.zeros(n)
        np.add.at(inflow, di, r[si] * p)
        base = (1.0 - alpha) / n + alpha * r[dang].sum() / n
        r_new = base + alpha * inflow
        l1 = np.abs(r_new - r).sum()
        r = r_new
        if exact_iters is None and l1 <= tol:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"pagerank did not converge to L1 <= {tol} within {max_iter} "
            "iterations; raise max_iter or loosen tol"
        )
    return spark.createDataFrame(
        pd.DataFrame({"entity": nodes.astype("int64"), "rank": r}),
        schema="entity long, rank double",
    )


def k_hop(edges: DataFrame, sources: DataFrame, k: int,
          directed: bool = False) -> DataFrame:
    """Entities within ``k`` hops of a seed set → (entity, dist), dist =
    minimum hop count (0 for the seeds themselves).

    Frontier BFS: each round broadcast-joins only the CURRENT frontier
    (vertex-scale, shrinking) against the materialized adjacency list,
    then anti-joins the visited set — a broadcast hash join streams the
    corpus-scale adjacency in place, so it is never shuffled at all and
    never scanned more than ``k`` times (the checkpoint materializes the
    symmetrized distinct once; its partitioning is irrelevant under a
    broadcast probe). Stops early when the frontier empties."""
    adj = edges.select("src", "dst").distinct()
    if not directed:
        adj = adj.union(adj.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))).distinct()
    adj = adj.localCheckpoint()
    frontier = sources.select(F.col("entity")).distinct().localCheckpoint()
    visited = frontier.select("entity", F.lit(0).alias("dist"))
    for d in range(1, k + 1):
        nxt = (
            adj.join(F.broadcast(frontier.withColumnRenamed("entity", "src")),
                     "src")
            .select(F.col("dst").alias("entity"))
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.union(
            nxt.select("entity", F.lit(d).alias("dist"))
        ).localCheckpoint()
        frontier = nxt
    return visited


def triple_support(triples: DataFrame) -> DataFrame:
    """Support/provenance rollup per DISTINCT (subj, pred, obj) →
    (subj, pred, obj, n_mentions, n_urls, max_conf, mean_conf).

    The KG-quality table consumers filter on (keep assertions seen on ≥k
    distinct pages, rank by confidence). One hash aggregation with
    map-side partials; n_urls is exact distinct within the group —
    bounded by the group's mention count, so no sketch needed (swap in
    approx_count_distinct if a pathological triple appears on a large
    fraction of all pages)."""
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("url").alias("n_urls"),
        F.max("conf").alias("max_conf"),
        F.avg("conf").alias("mean_conf"),
    )


def weakly_connected_components(edges: DataFrame) -> DataFrame:
    """Weakly-connected components of the entity graph → (entity,
    component), component = min entity id of the component (the same
    min-label convention as the canonicalization stage).

    Thin adapter over the pipeline's iterative CC operator (min-label
    propagation + pointer jumping, O(log diameter) rounds, observed
    convergence) — the graph-consumer surface for "which entities form
    one connected cluster" over the MATERIALIZED graph, as opposed to the
    dictionary-side alias graph the pipeline canonicalizes."""
    from .pipeline import connected_components

    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, edges.select("src", "dst").distinct())
    return cc.select(F.col("entity_id").alias("entity"),
                     F.col("canonical_id").alias("component"))
