"""Tokenized relation middles (round-3): gap text is normalized before
template lookup, identically in the Python oracle and the Spark join key."""

import pandas as pd
import pytest

from char_ner_spark import relations as R

GAPS = [
    " acquired ",
    " acquired, ",
    " Acquired ",
    "  acquired\t",
    " acquired. ",
    " übernahm ",
    " ÜBERNAHM, ",
    " adquirió ",
    " -- adquirió -- ",
    " is part of ",
    " is  part   of ",
    "",
    " ",
    " , ",
    " unrelated words ",
    " acquired by proxy ",  # round-4: fires " acquired <2> " (2 filler)
    " acquired by the crafty proxy ",  # over bound (3 filler) — must NOT fire
    "\nwurde geboren in\n",
]


def test_normalize_gap_tokenizes():
    assert R.normalize_gap(" acquired, ") == " acquired "
    assert R.normalize_gap(" Acquired ") == " acquired "
    assert R.normalize_gap("  is \t part \n of ") == " is part of "
    assert R.normalize_gap("") == " "
    assert R.normalize_gap(" ,;- ") == " "
    # unicode template chars survive (explicit punct class, not \w)
    assert R.normalize_gap(" ÜBERNAHM, ") == " übernahm "


def test_match_middle_fires_on_punctuation_variants():
    want = ("acquired", True)
    assert R.match_middle("en", " acquired ") == want
    assert R.match_middle("en", " acquired, ") == want
    assert R.match_middle("en", " Acquired. ") == want
    # round-4 bounded gap: ≤2 filler tokens fire, over-bound does not
    assert R.match_middle("en", " acquired by proxy ") == want
    assert R.match_middle("en", " acquired rival ") == want
    assert R.match_middle("en", " acquired the giant rival conglomerate ") is None
    assert R.match_middle("en", " was born in ") == ("born_in", True)
    assert R.match_middle("en", " was born maybe in ") == ("born_in", True)
    assert R.match_middle("en", " was born long long ago in ") is None
    assert R.match_middle("de", " übernahm, ") == ("acquired", True)
    assert R.match_middle("en", "") is None
    assert R.match_middle("en", " , ") is None


def test_extract_sentence_triples_tokenized_gap():
    sent = "Acme Corp acquired, Widget Inc"
    mentions = [(0, 9, 1, 0.9), (20, 30, 2, 0.8)]
    got = R.extract_sentence_triples(sent, mentions, "en")
    assert got == [(1, "acquired", 2, 0.8)]


def test_spark_gap_norm_parity_fuzz(spark):
    """500 seeded random strings over a hostile alphabet (unicode letters,
    every punctuation char in the class, whitespace runs, empties): the JVM
    and Python normalizations must agree byte-for-byte — this is the claim
    that justified the explicit character class over \\w."""
    import random

    from pyspark.sql import functions as F

    from char_ner_spark.pipeline import _gap_norm_col

    rng = random.Random(20160731)
    alphabet = (
        "abcXYZ019 üöäßñéí  .,;:!?¡¿\"'()[]{}«»„“”‘’-–—/\\|+*&%$#@~^<>=_\t\n"
    )
    gaps = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(500)
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"g": gaps}))
    got = [r.n for r in sdf.select(_gap_norm_col(F.col("g")).alias("n")).collect()]
    want = [R.normalize_gap(g) for g in gaps]
    assert got == want


def test_spark_gap_toks_parity_fuzz(spark):
    """The single-pass tokenizer (round-5 fast path: split on the combined
    separator class) must yield exactly normalize_gap(g).split() on the
    same hostile alphabet — this is the claim that lets extract_triples
    skip the replace-chain string materialization per pair."""
    import random

    from pyspark.sql import functions as F

    from char_ner_spark.pipeline import _gap_toks_col

    rng = random.Random(20160731)
    alphabet = (
        "abcXYZ019 üöäßñéí  .,;:!?¡¿\"'()[]{}«»„“”‘’-–—/\\|+*&%$#@~^<>=_\t\n"
    )
    gaps = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(500)
    ] + GAPS
    sdf = spark.createDataFrame(pd.DataFrame({"g": gaps}))
    got = [list(r.t) for r in sdf.select(_gap_toks_col(F.col("g")).alias("t")).collect()]
    want = [R.normalize_gap(g).split() for g in gaps]
    assert got == want


def test_spark_gap_norm_parity_and_join(spark):
    """The JVM gap normalization must equal normalize_gap byte-for-byte on
    every shape (unicode, tabs, empties), and extract_triples must fire on
    punctuation/case gap variants end to end."""
    from pyspark.sql import functions as F

    from char_ner_spark.pipeline import _gap_norm_col, extract_triples, middles_table

    sdf = spark.createDataFrame(pd.DataFrame({"g": GAPS}))
    got = [r.n for r in sdf.select(_gap_norm_col(F.col("g")).alias("n")).collect()]
    assert got == [R.normalize_gap(g) for g in GAPS]

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [1, 3, 5, 7, 9],
                "next_entity": [2, 4, 6, 8, 10],
                "lang": ["en", "en", "de", "en", "en"],
                "next_gap": [" acquired, ", " Acquired ", " übernahm, ",
                             " acquired by proxy ",
                             " acquired by the crafty proxy "],
                "link_score": [0.9, 0.9, 0.9, 0.9, 0.9],
                "next_score": [0.8, 0.8, 0.8, 0.8, 0.8],
                "url": ["u1", "u2", "u3", "u4", "u5"],
                "sent_idx": [0, 0, 0, 0, 0],
            }
        )
    )
    canon = spark.createDataFrame([], "entity_id long, canonical_id long")
    out = extract_triples(pairs, canon, middles_table(spark)).collect()
    got_triples = {(r.subj, r.pred, r.obj) for r in out}
    # (7, 8): the 2-filler gap fires under round-4 bounded templates;
    # (9, 10): 3 filler tokens exceed the bound and must not
    assert got_triples == {(1, "acquired", 2), (3, "acquired", 4),
                           (5, "acquired", 6), (7, "acquired", 8)}


def test_match_middles_dedupes_overlapping_templates():
    """' was born in ' matches both the exact middle and the gap template
    at f=0 — one hit, not two (and extract emits one triple)."""
    assert R.match_middles("en", " was born in ") == [("born_in", True)]
    got = R.extract_sentence_triples(
        "A was born in B", [(0, 1, 1, 0.9), (14, 15, 2, 0.8)], "en"
    )
    assert got == [(1, "born_in", 2, 0.8)]


def test_gap_template_post_slot_spark_parity(spark):
    """The mid-slot template ' was born <1> in ' must fire identically in
    Spark (pre/post/f equi-join keys) and the Python matcher across filler
    counts 0, 1 (fires) and 2 (over bound)."""
    from char_ner_spark.pipeline import extract_triples, middles_table

    gaps = [" was born in ", " was born maybe in ", " was born way back in "]
    for g in gaps[:2]:
        assert R.match_middle("en", g) == ("born_in", True), g
    assert R.match_middle("en", gaps[2]) is None

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [1, 3, 5],
                "next_entity": [2, 4, 6],
                "lang": ["en"] * 3,
                "next_gap": gaps,
                "link_score": [0.9] * 3,
                "next_score": [0.8] * 3,
                "url": ["u1", "u2", "u3"],
                "sent_idx": [0, 0, 0],
            }
        )
    )
    canon = spark.createDataFrame([], "entity_id long, canonical_id long")
    out = extract_triples(pairs, canon, middles_table(spark)).collect()
    assert {(r.subj, r.pred, r.obj) for r in out} == {
        (1, "born_in", 2), (3, "born_in", 4)
    }


def test_gap_match_spark_oracle_lockstep_fuzz(spark):
    """Randomized token gaps (template stems, filler runs 0-4, decoys) —
    the Spark key-generation + equi-join must agree with match_middles on
    every row, across languages."""
    import random

    from char_ner_spark.pipeline import extract_triples, middles_table

    rng = random.Random(20160731)
    stems = ["acquired", "was born", "übernahm", "adquirió", "kocht",
             "is part of", "works for", "unrelated"]
    fillers = ["the", "big", "rival", "old", "2021"]
    rows = []
    for i in range(200):
        stem = stems[rng.randrange(len(stems))]
        nf = rng.randrange(5)
        mid = " ".join([stem] + [fillers[rng.randrange(len(fillers))]
                                 for _ in range(nf)])
        if stem == "was born" and rng.random() < 0.7:
            mid += " in"
        lang = ["en", "de", "es", "nl"][rng.randrange(4)]
        rows.append((100 + 2 * i, 101 + 2 * i, lang, f" {mid} ",
                     0.9, 0.8, f"u{i}", 0))
    pairs = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "entity_id", "next_entity", "lang", "next_gap",
            "link_score", "next_score", "url", "sent_idx",
        ])
    )
    canon = spark.createDataFrame([], "entity_id long, canonical_id long")
    out = extract_triples(pairs, canon, middles_table(spark)).collect()
    got = {}
    for r in out:
        got.setdefault(r.url, set()).add((r.subj, r.pred, r.obj))
    for (eid, nid, lang, gap, ls, ns, url, _si) in rows:
        want = set()
        for pred, subj_left in R.match_middles(lang, gap):
            s, o = (eid, nid) if subj_left else (nid, eid)
            want.add((s, pred, o))
        assert got.get(url, set()) == want, (url, lang, gap)
