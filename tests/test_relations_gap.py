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
    " acquired by proxy ",  # superset must NOT fire " acquired "
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
    assert R.match_middle("en", " acquired by proxy ") is None
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
                "entity_id": [1, 3, 5, 7],
                "next_entity": [2, 4, 6, 8],
                "lang": ["en", "en", "de", "en"],
                "next_gap": [" acquired, ", " Acquired ", " übernahm, ",
                             " acquired by proxy "],
                "link_score": [0.9, 0.9, 0.9, 0.9],
                "next_score": [0.8, 0.8, 0.8, 0.8],
                "url": ["u1", "u2", "u3", "u4"],
                "sent_idx": [0, 0, 0, 0],
            }
        )
    )
    canon = spark.createDataFrame([], "entity_id long, canonical_id long")
    out = extract_triples(pairs, canon, middles_table(spark)).collect()
    got_triples = {(r.subj, r.pred, r.obj) for r in out}
    assert got_triples == {(1, "acquired", 2), (3, "acquired", 4),
                           (5, "acquired", 6)}
