"""BGP pattern matching (`graph.match_pattern`) vs a DuckDB SQL oracle and
a nested-loop Python matcher, and `graph.triangle_counts` vs a set-based
Python oracle — deterministic random graphs, skew/self-loop/parallel-edge
edge cases included."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from char_ner_spark.graph import match_pattern, triangle_counts

PREDS = ["works_for", "located_in", "born_in"]


def _rand_triples(n_rows=300, n_ent=25, seed=7):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame({
        "subj": rng.randint(0, n_ent, n_rows).astype("int64"),
        "pred": [PREDS[i] for i in rng.randint(0, len(PREDS), n_rows)],
        "obj": rng.randint(0, n_ent, n_rows).astype("int64"),
        # mention-level extras the operator must ignore
        "url": [f"u{i % 40}" for i in range(n_rows)],
        "conf": rng.uniform(0.5, 1.0, n_rows).round(6),
    })
    return pdf


@pytest.fixture(scope="module")
def triples_pdf():
    return _rand_triples()


@pytest.fixture(scope="module")
def triples_df(spark, triples_pdf):
    return spark.createDataFrame(triples_pdf)


def _py_match(triples_pdf, pattern):
    """Nested-loop BGP matcher over the distinct triple set — the
    semantics oracle. Returns a set of solution tuples in first-appearance
    variable order."""
    tri = set(map(tuple, triples_pdf[["subj", "pred", "obj"]].values))
    var_order = []
    for pat in pattern:
        for term in pat:
            if isinstance(term, str) and term.startswith("?"):
                if term[1:] not in var_order:
                    var_order.append(term[1:])
    sols = [dict()]
    for s, p, o in pattern:
        nxt = []
        for binding in sols:
            for ts, tp, to in tri:
                b = dict(binding)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if isinstance(term, str) and term.startswith("?"):
                        v = term[1:]
                        if v in b and b[v] != val:
                            ok = False
                            break
                        b[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(b)
        sols = nxt
    return {tuple(b[v] for v in var_order) for b in sols}, var_order


def _spark_rows(df):
    return {tuple(r) for r in df.collect()}


def test_chain_pattern_vs_duckdb(triples_df, triples_pdf):
    got = match_pattern(triples_df, [("?person", "works_for", "?org"),
                                     ("?org", "located_in", "?place")])
    assert got.columns == ["person", "org", "place"]
    con = duckdb.connect()
    con.register("t", triples_pdf)
    want = con.execute("""
        WITH d AS (SELECT DISTINCT subj, pred, obj FROM t)
        SELECT a.subj AS person, a.obj AS org, b.obj AS place
        FROM d a JOIN d b ON a.obj = b.subj
        WHERE a.pred = 'works_for' AND b.pred = 'located_in'
    """).fetchall()
    assert _spark_rows(got) == set(map(tuple, want))


def test_star_and_repeated_var(triples_df, triples_pdf):
    # star: same subject in two legs
    got = match_pattern(triples_df, [("?x", "works_for", "?a"),
                                     ("?x", "born_in", "?b")])
    want, order = _py_match(triples_pdf, [("?x", "works_for", "?a"),
                                          ("?x", "born_in", "?b")])
    assert got.columns == order
    assert _spark_rows(got) == want
    # repeated variable inside one leg: self-assertions only
    got2 = match_pattern(triples_df, [("?x", "?p", "?x")])
    want2, _ = _py_match(triples_pdf, [("?x", "?p", "?x")])
    assert _spark_rows(got2) == want2


def test_constant_subject_and_ground_gate(triples_df, triples_pdf):
    tri = triples_pdf[["subj", "pred", "obj"]].drop_duplicates()
    s0, p0, o0 = tri.iloc[0]
    got = match_pattern(triples_df, [(int(s0), p0, "?o")])
    want, _ = _py_match(triples_pdf, [(int(s0), p0, "?o")])
    assert _spark_rows(got) == want

    # ground gate present: result unchanged; absent: result empty
    base = [("?x", "works_for", "?y")]
    want_base, _ = _py_match(triples_pdf, base)
    with_gate = match_pattern(triples_df, base + [(int(s0), p0, int(o0))])
    assert _spark_rows(with_gate) == want_base
    missing = match_pattern(triples_df, base + [(10**9, p0, int(o0))])
    assert missing.count() == 0


def test_product_guard(triples_df):
    pat = [("?a", "works_for", "?b"), ("?c", "born_in", "?d")]
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(triples_df, pat)
    n1 = match_pattern(triples_df, pat[:1]).count()
    n2 = match_pattern(triples_df, pat[1:]).count()
    prod = match_pattern(triples_df, pat, allow_product=True)
    assert prod.count() == n1 * n2


def test_no_variables_rejected(triples_df):
    with pytest.raises(ValueError, match="binds no variables"):
        match_pattern(triples_df, [(1, "works_for", 2)])
    with pytest.raises(ValueError, match="empty pattern"):
        match_pattern(triples_df, [])


def test_match_pattern_fuzz_python_oracle(spark):
    """Random small triple sets × random patterns vs the nested-loop
    matcher — shapes include chains, stars, constants, repeats."""
    rng = np.random.RandomState(42)
    for trial in range(12):
        pdf = _rand_triples(n_rows=rng.randint(20, 120),
                            n_ent=rng.randint(4, 12), seed=100 + trial)
        df = spark.createDataFrame(pdf)
        n_legs = rng.randint(1, 4)
        variables = ["?x", "?y", "?z", "?w"]
        pattern = []
        for _ in range(n_legs):
            s = (variables[rng.randint(0, 3)] if rng.rand() < 0.8
                 else int(rng.randint(0, 12)))
            p = (PREDS[rng.randint(0, len(PREDS))] if rng.rand() < 0.7
                 else "?p")
            o = (variables[rng.randint(0, 4)] if rng.rand() < 0.8
                 else int(rng.randint(0, 12)))
            pattern.append((s, p, o))
        want, order = _py_match(pdf, pattern)
        if not order:
            continue  # all-ground pattern: rejected by design
        try:
            got = match_pattern(df, pattern, allow_product=True)
        except ValueError:
            continue
        assert got.columns == order, pattern
        assert _spark_rows(got) == want, pattern


def _py_triangles(edges_pdf):
    adj = {}
    for s, d in edges_pdf[["src", "dst"]].values:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    counts = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for v in (a, b, c):
                        counts[v] = counts.get(v, 0) + 1
    return counts


def _tri_check(spark, edges_pdf):
    got = {r["entity"]: r["n_triangles"]
           for r in triangle_counts(spark.createDataFrame(edges_pdf)).collect()}
    assert got == _py_triangles(edges_pdf)


def test_triangle_counts_random(spark):
    rng = np.random.RandomState(5)
    for seed in (1, 2, 3):
        rng = np.random.RandomState(seed)
        n, m = 30, 150
        pdf = pd.DataFrame({
            "src": rng.randint(0, n, m).astype("int64"),
            "dst": rng.randint(0, n, m).astype("int64"),
            "rel": "r",
            "weight": 1.0,
        })
        _tri_check(spark, pdf)


def test_triangle_counts_edge_cases(spark):
    # self-loops, parallel + reversed duplicates, a hub star (no triangles
    # through the star alone), one explicit triangle + one square
    pdf = pd.DataFrame({
        "src": [1, 1, 2, 2, 1, 3, 3, 10, 10, 10, 10, 20, 21, 22, 23],
        "dst": [1, 2, 1, 3, 3, 1, 2, 11, 12, 13, 14, 21, 22, 23, 20],
        "rel": "r", "weight": 1.0,
    })
    pdf = pdf.astype({"src": "int64", "dst": "int64"})
    _tri_check(spark, pdf)
    # triangle {1,2,3} counted once per member; square 20-23 contributes none
    got = {r["entity"]: r["n_triangles"]
           for r in triangle_counts(
               pdf.pipe(lambda p: spark.createDataFrame(p))).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------------------
# property paths + filters/select
# ---------------------------------------------------------------------------

def _py_closure(tri_pdf, preds, max_depth, src=None, dst=None):
    E = {(s, o) for s, p, o in
         tri_pdf[["subj", "pred", "obj"]].drop_duplicates().values
         if p in preds}
    paths = set(E)
    frontier = set(E)
    for _ in range(1, max_depth):
        nxt = {(a, c) for a, b in frontier for b2, c in E
               if b == b2} - paths
        if not nxt:
            break
        paths |= nxt
        frontier = nxt
    if src is not None:
        paths = {(a, b) for a, b in paths if a == src}
    if dst is not None:
        paths = {(a, b) for a, b in paths if b == dst}
    return paths


def test_alternation_vs_duckdb(triples_df, triples_pdf):
    from char_ner_spark.graph import PredPath

    got = match_pattern(
        triples_df, [("?a", ("works_for", "born_in"), "?b")])
    con = duckdb.connect()
    con.register("t", triples_pdf)
    want = con.execute("""
        SELECT DISTINCT subj AS a, obj AS b FROM t
        WHERE pred IN ('works_for', 'born_in')
    """).fetchall()
    assert _spark_rows(got) == set(map(tuple, want))
    # PredPath object form is identical to the tuple sugar
    got2 = match_pattern(
        triples_df, [("?a", PredPath(["born_in", "works_for"]), "?b")])
    assert _spark_rows(got2) == _spark_rows(got)


def test_closure_chain_planted(spark):
    # a → b → c → d chain plus noise: p+ must find all forward pairs
    pdf = pd.DataFrame({
        "subj": [1, 2, 3, 7, 8],
        "pred": ["located_in"] * 4 + ["works_for"],
        "obj": [2, 3, 4, 8, 9],
    })
    df = spark.createDataFrame(pdf)
    got = _spark_rows(match_pattern(df, [("?x", "located_in+", "?y")]))
    assert got == {(1, 2), (2, 3), (3, 4), (1, 3), (2, 4), (1, 4), (7, 8)}
    # constant seed restricts to reachable-from-1
    got1 = _spark_rows(match_pattern(df, [(1, "located_in+", "?y")]))
    assert got1 == {(2,), (3,), (4,)}
    # bounded depth cuts long paths
    got_d1 = _spark_rows(match_pattern(
        df, [("?x", __import__("char_ner_spark.graph", fromlist=["PredPath"])
              .PredPath(["located_in"], closure=True, max_depth=1), "?y")]))
    assert got_d1 == {(1, 2), (2, 3), (3, 4), (7, 8)}


def test_closure_vs_duckdb_recursive_cte(triples_df, triples_pdf):
    got = _spark_rows(match_pattern(triples_df, [("?x", "works_for+", "?y")]))
    con = duckdb.connect()
    con.register("t", triples_pdf)
    want = con.execute("""
        WITH RECURSIVE e AS (
            SELECT DISTINCT subj, obj FROM t WHERE pred = 'works_for'
        ), cl(s, o, d) AS (
            SELECT subj, obj, 1 FROM e
            UNION
            SELECT cl.s, e.obj, cl.d + 1 FROM cl JOIN e ON cl.o = e.subj
            WHERE cl.d < 8
        )
        SELECT DISTINCT s, o FROM cl
    """).fetchall()
    assert got == set(map(tuple, want))


def test_closure_fuzz_python_oracle(spark):
    rng = np.random.RandomState(9)
    for trial in range(6):
        pdf = _rand_triples(n_rows=rng.randint(20, 80),
                            n_ent=rng.randint(4, 9), seed=300 + trial)
        df = spark.createDataFrame(pdf)
        want = _py_closure(pdf, {"located_in"}, 8)
        got = _spark_rows(match_pattern(df, [("?x", "located_in+", "?y")]))
        assert got == want, trial
        # cycle pattern: x reaches itself
        gotc = _spark_rows(match_pattern(df, [("?x", "located_in+", "?x")]))
        assert gotc == {(a,) for a, b in want if a == b}, trial
        # dst-seeded
        if want:
            dsts = sorted({b for _, b in want})
            d0 = dsts[0]
            gd = _spark_rows(match_pattern(df, [("?x", "located_in+", int(d0))]))
            assert gd == {(a,) for a, b in want if b == d0}, trial


def test_closure_composes_with_plain_legs(triples_df, triples_pdf):
    pattern = [("?a", "works_for", "?b"), ("?b", "located_in+", "?c")]
    got = _spark_rows(match_pattern(triples_df, pattern))
    cl = _py_closure(triples_pdf, {"located_in"}, 8)
    tri = set(map(tuple, triples_pdf[["subj", "pred", "obj"]]
                  .drop_duplicates().values))
    want = {(s, o, c) for s, p, o in tri if p == "works_for"
            for (b, c) in cl if b == o}
    assert got == want


def test_filters_and_select(triples_df, triples_pdf):
    pattern = [("?person", "works_for", "?org"),
               ("?org", "located_in", "?place")]
    got = match_pattern(triples_df, pattern,
                        filters=["person != place", "org % 2 = 0"],
                        select=["person", "place"])
    assert got.columns == ["person", "place"]
    want_full, _ = _py_match(triples_pdf, pattern)
    want = {(p, pl) for p, o, pl in want_full if p != pl and o % 2 == 0}
    assert _spark_rows(got) == want
    with pytest.raises(ValueError, match="unbound"):
        match_pattern(triples_df, pattern, select=["nope"])


# ---------------------------------------------------------------------------
# OPTIONAL / MINUS
# ---------------------------------------------------------------------------

def test_optional_left_join(triples_df, triples_pdf):
    req = [("?person", "works_for", "?org")]
    opt = [("?person", "born_in", "?birth")]
    got = match_pattern(triples_df, req, optional=[opt])
    assert got.columns == ["person", "org", "birth"]
    want_req, _ = _py_match(triples_pdf, req)
    born = {}
    tri = set(map(tuple, triples_pdf[["subj", "pred", "obj"]]
                  .drop_duplicates().values))
    for s, p, o in tri:
        if p == "born_in":
            born.setdefault(s, set()).add(o)
    want = set()
    for person, org in want_req:
        if person in born:
            want |= {(person, org, b) for b in born[person]}
        else:
            want.add((person, org, None))
    assert _spark_rows(got) == want
    # unmatched rows really are null, not dropped
    assert any(b is None for _, _, b in _spark_rows(got)) == any(
        p not in born for p, _ in want_req)


def test_optional_guards(triples_df):
    req = [("?person", "works_for", "?org")]
    with pytest.raises(ValueError, match="shares no variable"):
        match_pattern(triples_df, req, optional=[[("?a", "born_in", "?b")]])
    with pytest.raises(ValueError, match="two optional groups"):
        match_pattern(
            triples_df, req,
            optional=[[("?person", "born_in", "?x")],
                      [("?org", "located_in", "?x")]])


def test_minus_removal(triples_df, triples_pdf):
    req = [("?person", "works_for", "?org")]
    got = match_pattern(triples_df, req,
                        minus=[[("?person", "born_in", "?anywhere")]])
    want_req, _ = _py_match(triples_pdf, req)
    tri = set(map(tuple, triples_pdf[["subj", "pred", "obj"]]
                  .drop_duplicates().values))
    born = {s for s, p, o in tri if p == "born_in"}
    want = {(p, o) for p, o in want_req if p not in born}
    assert _spark_rows(got) == want
    with pytest.raises(ValueError, match="shares no variable"):
        match_pattern(triples_df, req, minus=[[("?a", "born_in", "?b")]])


def test_optional_then_minus_then_filter(triples_df, triples_pdf):
    req = [("?person", "works_for", "?org")]
    got = match_pattern(
        triples_df, req,
        optional=[[("?org", "located_in", "?place")]],
        minus=[[("?person", "born_in", 0)]],
        filters=["place IS NOT NULL"],
        select=["person", "place"])
    tri = set(map(tuple, triples_pdf[["subj", "pred", "obj"]]
                  .drop_duplicates().values))
    loc = {}
    for s, p, o in tri:
        if p == "located_in":
            loc.setdefault(s, set()).add(o)
    born0 = {s for s, p, o in tri if p == "born_in" and o == 0}
    want = {(person, pl)
            for person, org in _py_match(triples_pdf, req)[0]
            if person not in born0
            for pl in loc.get(org, set())}
    assert _spark_rows(got) == want


# ---------------------------------------------------------------------------
# CONSTRUCT + datalog fixpoint inference
# ---------------------------------------------------------------------------

def _py_apply_rule(facts, body, head):
    sols = [dict()]
    for s, p, o in body:
        nxt = []
        for b in sols:
            for ts, tp, to in facts:
                bb = dict(b)
                ok = True
                for term, val in ((s, ts), (p, tp), (o, to)):
                    if isinstance(term, str) and term.startswith("?"):
                        v = term[1:]
                        if v in bb and bb[v] != val:
                            ok = False
                            break
                        bb[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    nxt.append(bb)
        sols = nxt
    out = set()
    for b in sols:
        t = tuple(b[t[1:]] if isinstance(t, str) and t.startswith("?") else t
                  for t in head)
        out.add(t)
    return out


def _py_infer(tri_pdf, rules, max_rounds=10):
    facts = set(map(tuple, tri_pdf[["subj", "pred", "obj"]]
                    .drop_duplicates().values))
    base = set(facts)
    for _ in range(max_rounds):
        new = set()
        for body, head in rules:
            new |= _py_apply_rule(facts, body, head)
        new -= facts
        if not new:
            return facts - base
        facts |= new
    raise RuntimeError("oracle did not converge")


def test_construct_vs_python(triples_df, triples_pdf):
    from char_ner_spark.graph import construct

    got = _spark_rows(construct(
        triples_df,
        [("?p", "works_for", "?o"), ("?o", "located_in", "?c")],
        head=("?p", "based_in", "?c")))
    facts = set(map(tuple, triples_pdf[["subj", "pred", "obj"]]
                    .drop_duplicates().values))
    want = _py_apply_rule(
        facts, [("?p", "works_for", "?o"), ("?o", "located_in", "?c")],
        ("?p", "based_in", "?c"))
    assert got == want and all(p == "based_in" for _, p, _ in got)
    with pytest.raises(ValueError, match="not bound"):
        construct(triples_df, [("?p", "works_for", "?o")],
                  head=("?p", "based_in", "?nope"))


def test_infer_transitive_closure_rule(spark):
    from char_ner_spark.graph import infer

    pdf = pd.DataFrame({
        "subj": [1, 2, 3, 7],
        "pred": ["located_in"] * 4,
        "obj": [2, 3, 4, 8],
    })
    rule = ([("?x", "located_in", "?y"), ("?y", "located_in", "?z")],
            ("?x", "located_in", "?z"))
    got = _spark_rows(infer(spark.createDataFrame(pdf), [rule]))
    # derived = closure minus the base edges
    assert got == {(1, "located_in", 3), (1, "located_in", 4),
                   (2, "located_in", 4)}
    # include_base returns the full closure
    got_all = _spark_rows(infer(spark.createDataFrame(pdf), [rule],
                                include_base=True))
    assert got_all == got | {(1, "located_in", 2), (2, "located_in", 3),
                             (3, "located_in", 4), (7, "located_in", 8)}


def test_infer_multi_rule_interaction(triples_df, triples_pdf):
    from char_ner_spark.graph import infer

    rules = [
        ([("?p", "works_for", "?o"), ("?o", "located_in", "?c")],
         ("?p", "based_in", "?c")),
        # recursive through the DERIVED pred: based_in lifts through
        # located_in containment
        ([("?p", "based_in", "?c"), ("?c", "located_in", "?d")],
         ("?p", "based_in", "?d")),
    ]
    got = _spark_rows(infer(triples_df, rules, max_rounds=15))
    want = _py_infer(triples_pdf, rules, max_rounds=15)
    assert got == want and len(got) > 0


def test_infer_guards(spark, triples_df):
    from char_ner_spark.graph import infer

    pdf = pd.DataFrame({"subj": [1, 2, 3], "pred": ["p"] * 3,
                        "obj": [2, 3, 1]})  # 3-cycle: closure saturates
    rule = ([("?x", "p", "?y"), ("?y", "p", "?z")], ("?x", "p", "?z"))
    # converges (closure of a cycle is all 9 pairs) within enough rounds
    got = _spark_rows(infer(spark.createDataFrame(pdf), [rule]))
    assert len(got) == 9 - 3
    # too-low round budget fails loud, not silently-partial
    with pytest.raises(RuntimeError, match="fixpoint"):
        infer(triples_df,
              [([("?x", "works_for", "?y")], ("?y", "works_for", "?x"))],
              max_rounds=1)
    with pytest.raises(ValueError, match="property paths"):
        infer(triples_df, [([("?x", "p+", "?y")], ("?x", "q", "?y"))])
