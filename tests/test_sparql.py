"""SPARQL-subset front end: textual queries must compile to exactly the
same solutions as the programmatic match_pattern calls (the front end is
sugar — no second semantics), plus parse-error coverage."""

import numpy as np
import pandas as pd
import pytest

from char_ner_spark.graph import PredPath, match_pattern
from char_ner_spark.sparql import SparqlError, parse, sparql

PREDS = ["works_for", "located_in", "born_in"]


@pytest.fixture(scope="module")
def triples_df(spark):
    rng = np.random.RandomState(7)
    n = 300
    pdf = pd.DataFrame({
        "subj": rng.randint(0, 25, n).astype("int64"),
        "pred": [PREDS[i] for i in rng.randint(0, 3, n)],
        "obj": rng.randint(0, 25, n).astype("int64"),
    })
    return spark.createDataFrame(pdf)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_parse_basic_chain():
    args = parse("""
        SELECT ?person ?place WHERE {
          ?person works_for ?org .
          ?org located_in ?place .
        }""")
    assert args["pattern"] == [("?person", "works_for", "?org"),
                               ("?org", "located_in", "?place")]
    assert args["select"] == ["person", "place"]
    assert args["optional"] is None and args["minus"] is None


def test_query_equals_programmatic(triples_df):
    q = """SELECT * WHERE {
             ?person works_for ?org .
             ?org located_in ?place .
           }"""
    got = sparql(triples_df, q)
    want = match_pattern(triples_df, [("?person", "works_for", "?org"),
                                      ("?org", "located_in", "?place")])
    assert got.columns == want.columns
    assert _rows(got) == _rows(want)


def test_paths_alternation_and_closure(triples_df):
    got = sparql(triples_df, """
        SELECT * WHERE { ?a works_for|born_in ?b . }""")
    want = match_pattern(triples_df,
                         [("?a", ("works_for", "born_in"), "?b")])
    assert _rows(got) == _rows(want)

    got2 = sparql(triples_df, "SELECT * WHERE { ?x located_in+ ?y . }")
    want2 = match_pattern(triples_df, [("?x", "located_in+", "?y")])
    assert _rows(got2) == _rows(want2)

    got3 = sparql(triples_df,
                  "SELECT * WHERE { ?x works_for|located_in+ ?y . }")
    want3 = match_pattern(
        triples_df,
        [("?x", PredPath(["works_for", "located_in"], closure=True), "?y")])
    assert _rows(got3) == _rows(want3)


def test_full_query_optional_minus_filter(triples_df):
    q = """
        SELECT ?person ?place WHERE {
          ?person works_for ?org .
          OPTIONAL { ?org located_in ?place . }
          MINUS { ?person born_in 0 . }
          FILTER (?place IS NOT NULL AND ?org % 2 = 0)
        }"""
    got = sparql(triples_df, q)
    want = match_pattern(
        triples_df, [("?person", "works_for", "?org")],
        optional=[[("?org", "located_in", "?place")]],
        minus=[[("?person", "born_in", 0)]],
        filters=["place IS NOT NULL AND org % 2 = 0"],
        select=["person", "place"])
    assert got.columns == ["person", "place"]
    assert _rows(got) == _rows(want)


def test_constant_terms_and_numbers(triples_df):
    row = triples_df.limit(1).collect()[0]
    got = sparql(triples_df,
                 f"SELECT * WHERE {{ {row.subj} {row.pred} ?o . }}")
    want = match_pattern(triples_df, [(row.subj, row.pred, "?o")])
    assert _rows(got) == _rows(want)


def test_filter_with_comparison_operators(triples_df):
    got = sparql(triples_df, """
        SELECT * WHERE { ?a works_for ?b . FILTER (?a < ?b AND ?a >= 2) }""")
    want = match_pattern(triples_df, [("?a", "works_for", "?b")],
                         filters=["a < b AND a >= 2"])
    assert _rows(got) == _rows(want)


def test_parse_errors():
    for q, msg in [
        ("SELECT WHERE { ?a p ?b . }", "SELECT needs"),
        ("SELECT * WHERE { ?a p ?b . } trailing", "trailing"),
        ("SELECT * WHERE { ?a p ?b ", "unterminated"),
        ("SELECT * WHERE { ?a <http://x> ?b . }", "IRIs"),
        ('SELECT * WHERE { ?a p "lit" . }', "literals"),
        ("SELECT * WHERE { ?a p ?b . } UNION SELECT", "UNION"),
        ("SELECT * WHERE { ?a p ?b . } ORDER BY ?a", "ORDER BY"),
        ("SELECT * WHERE { ?a p ?b . } LIMIT 5", "LIMIT"),
        ("SELECT * WHERE { @ }", "unexpected character"),
    ]:
        with pytest.raises(SparqlError, match=msg):
            parse(q)


def test_distinct_keyword_accepted():
    args = parse("SELECT DISTINCT ?a WHERE { ?a works_for ?b . }")
    assert args["select"] == ["a"]
