"""Graph analytics vs driver-side oracles (NumPy power iteration, dict
BFS, pandas groupby) on deterministic random graphs plus the pipeline's
own materialized edge graph."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _rand_edges(n_nodes=40, n_edges=160, seed=3):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n_nodes, n_edges)
    dst = rng.randint(0, n_nodes, n_edges)
    keep = src != dst
    pdf = pd.DataFrame({
        "src": src[keep].astype("int64"),
        "dst": dst[keep].astype("int64"),
        "rel": [f"r{i % 3}" for i in range(keep.sum())],
        "weight": rng.uniform(0.1, 1.0, keep.sum()).round(6),
    })
    return pdf


@pytest.fixture(scope="module")
def edges_pdf():
    return _rand_edges()


@pytest.fixture(scope="module")
def edges_df(spark, edges_pdf):
    return spark.createDataFrame(edges_pdf)


def test_degrees_match_pandas(edges_df, edges_pdf):
    from char_ner_spark.graph import degrees

    got = degrees(edges_df).toPandas().set_index("entity").sort_index()
    out_d = edges_pdf.groupby("src").size()
    in_d = edges_pdf.groupby("dst").size()
    w = pd.concat([
        edges_pdf[["src", "weight"]].rename(columns={"src": "e"}),
        edges_pdf[["dst", "weight"]].rename(columns={"dst": "e"}),
    ]).groupby("e")["weight"].sum()
    for e in got.index:
        assert got.loc[e, "out_degree"] == out_d.get(e, 0)
        assert got.loc[e, "in_degree"] == in_d.get(e, 0)
        assert got.loc[e, "degree"] == out_d.get(e, 0) + in_d.get(e, 0)
        assert got.loc[e, "weighted_degree"] == pytest.approx(w[e], abs=1e-9)
    assert set(got.index) == set(edges_pdf.src) | set(edges_pdf.dst)


def _pagerank_oracle(edges_pdf, alpha=0.85, weighted=True, iters=2000):
    g = edges_pdf.groupby(["src", "dst"])["weight"].sum().reset_index()
    if not weighted:
        g["weight"] = 1.0
    nodes = sorted(set(g.src) | set(g.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for s, d, w in g.itertuples(index=False):
        P[idx[s], idx[d]] = w
    row = P.sum(axis=1)
    dangling = row == 0
    P[~dangling] /= row[~dangling, None]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r_new = (1 - alpha) / n + alpha * (
            r @ P + r[dangling].sum() / n)
        if np.abs(r_new - r).sum() <= 1e-14:
            r = r_new
            break
        r = r_new
    return dict(zip(nodes, r))


@pytest.mark.parametrize("weighted", [True, False])
def test_pagerank_matches_power_iteration(edges_df, edges_pdf, weighted):
    from char_ner_spark.graph import pagerank

    got = {
        r.entity: r.rank
        for r in pagerank(edges_df, tol=1e-12, weighted=weighted,
                          max_iter=2000).collect()
    }
    want = _pagerank_oracle(edges_pdf, weighted=weighted)
    assert set(got) == set(want)
    for e, v in want.items():
        assert got[e] == pytest.approx(v, abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_distributed_path_parity(edges_df):
    """The distributed loop applies the identical update rule to the
    driver power iteration — compared iteration-for-iteration (8 rounds,
    no convergence wait: each distributed round is a full Spark job)."""
    from char_ner_spark.graph import pagerank

    dist = {
        r.entity: r.rank
        for r in pagerank(edges_df, exact_iters=8,
                          distributed_threshold=0).collect()
    }
    drv = {
        r.entity: r.rank
        for r in pagerank(edges_df, exact_iters=8).collect()
    }
    assert set(dist) == set(drv)
    for e, v in drv.items():
        assert dist[e] == pytest.approx(v, abs=1e-12)


def test_pagerank_dangling_nodes(spark):
    """A sink node (no out-edges) must not leak rank mass."""
    from char_ner_spark.graph import pagerank

    pdf = pd.DataFrame({
        "src": [1, 2, 3], "dst": [2, 4, 4],
        "rel": ["r"] * 3, "weight": [1.0] * 3,
    })
    got = {r.entity: r.rank
           for r in pagerank(spark.createDataFrame(pdf), tol=1e-12,
                             max_iter=2000).collect()}
    want = _pagerank_oracle(pdf)
    for e, v in want.items():
        assert got[e] == pytest.approx(v, abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_nonconvergence_raises(edges_df):
    from char_ner_spark.graph import pagerank

    with pytest.raises(RuntimeError, match="did not converge"):
        pagerank(edges_df, tol=1e-15, max_iter=1)


def _bfs_oracle(edges_pdf, seeds, k, directed):
    adj: dict[int, set[int]] = {}
    for s, d in edges_pdf[["src", "dst"]].itertuples(index=False):
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, k + 1):
        nxt = set()
        for v in frontier:
            nxt |= adj.get(v, set())
        nxt -= dist.keys()
        for v in nxt:
            dist[v] = hop
        frontier = nxt
    return dist


@pytest.mark.parametrize("directed", [False, True])
def test_k_hop_matches_bfs(spark, edges_df, edges_pdf, directed):
    from char_ner_spark.graph import k_hop

    seeds = [int(edges_pdf.src.iloc[0]), int(edges_pdf.dst.iloc[-1])]
    src_df = spark.createDataFrame(
        pd.DataFrame({"entity": pd.Series(seeds, dtype="int64")}))
    got = {r.entity: r.dist
           for r in k_hop(edges_df, src_df, k=3, directed=directed).collect()}
    want = _bfs_oracle(edges_pdf, seeds, 3, directed)
    assert got == want


def test_k_hop_frontier_exhaustion(spark):
    """k larger than the graph's eccentricity stops early, no error."""
    from char_ner_spark.graph import k_hop

    pdf = pd.DataFrame({"src": [1, 2], "dst": [2, 3],
                        "rel": ["r", "r"], "weight": [1.0, 1.0]})
    src_df = spark.createDataFrame(
        pd.DataFrame({"entity": pd.Series([1], dtype="int64")}))
    got = {r.entity: r.dist
           for r in k_hop(spark.createDataFrame(pdf), src_df, k=10,
                          directed=True).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_analytics_on_pipeline_graph(spark):
    """The operators run on the pipeline's own materialized edge graph."""
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.graph import degrees, k_hop, pagerank
    from char_ner_spark.pipeline import run_pipeline

    alias = make_alias_table(40, seed=11)
    pages = make_pages(20, seed=11, alias_df=alias)
    out = run_pipeline(spark, spark.createDataFrame(pages), alias)
    edges = out["edges"].localCheckpoint()
    if edges.limit(1).count() == 0:
        pytest.skip("fixture produced no edges")
    deg = degrees(edges)
    pr = pagerank(edges, tol=1e-10, max_iter=2000)
    assert pr.count() == deg.count()
    top = pr.orderBy(F.desc("rank")).first()
    assert top.rank > 0
    seed_df = edges.select(F.col("src").alias("entity")).limit(1)
    hop = k_hop(edges, seed_df, k=2)
    assert hop.filter("dist = 0").count() == 1


def test_triple_support_matches_pandas(spark):
    from char_ner_spark.graph import triple_support

    pdf = pd.DataFrame({
        "subj": [1, 1, 1, 2], "pred": ["p", "p", "p", "q"],
        "obj": [3, 3, 3, 4],
        "url": ["u1", "u1", "u2", "u3"], "sent_idx": [0, 1, 0, 0],
        "conf": [0.9, 0.7, 0.8, 0.5],
    })
    got = {(r.subj, r.pred, r.obj):
           (r.n_mentions, r.n_urls, round(r.max_conf, 9),
            round(r.mean_conf, 9))
           for r in triple_support(spark.createDataFrame(pdf)).collect()}
    assert got == {
        (1, "p", 3): (3, 2, 0.9, round((0.9 + 0.7 + 0.8) / 3, 9)),
        (2, "q", 4): (1, 1, 0.5, 0.5),
    }


def test_weakly_connected_components_matches_union_find(spark, edges_df,
                                                        edges_pdf):
    from char_ner_spark.graph import weakly_connected_components

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges_pdf[["src", "dst"]].itertuples(index=False):
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    comp_min: dict[int, int] = {}
    for v in list(parent):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v)] for v in parent}
    got = {r.entity: r.component
           for r in weakly_connected_components(edges_df).collect()}
    assert got == want


def _ppr_oracle(edges_pdf, seed_set, alpha=0.85, iters=5000):
    g = edges_pdf.groupby(["src", "dst"])["weight"].sum().reset_index()
    nodes = sorted(set(g.src) | set(g.dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for s, d, w in g.itertuples(index=False):
        P[idx[s], idx[d]] = w
    row = P.sum(axis=1)
    dangling = row == 0
    P[~dangling] /= row[~dangling, None]
    seeds = [idx[s] for s in seed_set if s in idx]
    e = np.zeros(n)
    e[seeds] = 1.0 / len(seeds)
    r = e.copy()
    for _ in range(iters):
        r_new = (1 - alpha + alpha * r[dangling].sum()) * e + alpha * (r @ P)
        if np.abs(r_new - r).sum() <= 1e-14:
            return dict(zip(nodes, r_new))
        r = r_new
    return dict(zip(nodes, r))


def test_personalized_pagerank_matches_oracle(spark, edges_df, edges_pdf):
    from char_ner_spark.graph import pagerank

    seed_vals = sorted(set(edges_pdf.src))[:2]
    seeds = spark.createDataFrame([(int(s),) for s in seed_vals],
                                  "entity long")
    got = {r.entity: r.rank
           for r in pagerank(edges_df, tol=1e-12, max_iter=5000,
                             personalize=seeds).collect()}
    want = _ppr_oracle(edges_pdf, set(seed_vals))
    assert set(got) == set(want)
    for e, v in want.items():
        assert got[e] == pytest.approx(v, abs=1e-8)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # locality: the seeds hold more mass than under classic PageRank
    classic = {r.entity: r.rank
               for r in pagerank(edges_df, tol=1e-12,
                                 max_iter=5000).collect()}
    assert sum(got[s] for s in seed_vals) > sum(classic[s]
                                                for s in seed_vals)


def test_personalized_pagerank_distributed_parity(spark, edges_df,
                                                  edges_pdf):
    from char_ner_spark.graph import pagerank

    seed_vals = sorted(set(edges_pdf.dst))[:3]
    seeds = spark.createDataFrame([(int(s),) for s in seed_vals],
                                  "entity long")
    dist = {r.entity: r.rank
            for r in pagerank(edges_df, exact_iters=6,
                              distributed_threshold=0,
                              personalize=seeds).collect()}
    drv = {r.entity: r.rank
           for r in pagerank(edges_df, exact_iters=6,
                             personalize=seeds).collect()}
    assert set(dist) == set(drv)
    for e, v in drv.items():
        assert dist[e] == pytest.approx(v, abs=1e-12)


def test_personalized_pagerank_guards(spark, edges_df):
    from char_ner_spark.graph import pagerank

    ghost = spark.createDataFrame([(10**9,)], "entity long")
    with pytest.raises(ValueError, match="no seed entity"):
        pagerank(edges_df, personalize=ghost)
    with pytest.raises(ValueError, match="no seed entity"):
        pagerank(edges_df, personalize=ghost, distributed_threshold=0,
                 exact_iters=2)
