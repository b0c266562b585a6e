"""Length-split (P5) and model save/load (S3) coverage."""

import tempfile

import numpy as np

from char_ner_spark import tagger as TG, textops as X


def test_split_long_sentences_deterministic():
    long_sent = ("alpha beta " * 300).strip() + "."  # ~3300 chars, no terminator inside
    text = "Short one. " + long_sent
    sents = X.split_sentences(text, max_len=500)
    assert sents[0] == "Short one."
    assert all(len(s) <= 500 for s in sents)
    assert " ".join(sents[1:]) == long_sent
    # stable across calls
    assert sents == X.split_sentences(text, max_len=500)


def test_split_long_spaceless_hard_cut():
    s = "x" * 1200 + "."
    sents = X.split_sentences(s, max_len=500)
    assert [len(c) for c in sents] == [500, 500, 201]
    assert "".join(sents) == s


def test_tagger_handles_long_sentence():
    # a planted mention after sub-splitting is still found
    long_text = ("filler " * 400) + "Alice Smith works for Acme Corp."
    sents = X.split_sentences(long_text, max_len=300)
    res = TG.tag_sentences(sents, "en")
    surfaces = [
        s[b:e] for s, spans in zip(sents, res) for b, e, _, _ in spans
    ]
    assert "Alice Smith" in surfaces and "Acme Corp" in surfaces


def test_weights_save_load_roundtrip():
    d = tempfile.mkdtemp()
    path = TG.save_weights("en", d)
    loaded = TG.load_weights(path)
    orig = TG.model_weights("en")
    assert set(loaded) == set(orig)
    for k in orig:
        assert np.array_equal(loaded[k], orig[k]), k


def test_extract_text_no_double_unescape():
    """'&amp;lt;' is source text containing the literal string '&lt;' — it
    must decode to '&lt;', not be double-unescaped to '<'."""
    from char_ner_spark.textops import extract_text

    assert extract_text(b"<p>a &amp;lt; b</p>") == "a &lt; b"
    assert extract_text(b"<p>a &lt; b &amp; c</p>") == 'a < b & c'


def test_minhash_arithmetic_exact():
    """The universal-hash products must stay inside int64 (the 61-bit
    modulus silently wrapped); verify vs arbitrary-precision Python ints."""
    import numpy as np

    from char_ner_spark import textops as TX

    grams = TX.char_ngrams("steveldu corp")
    sig = TX.minhash_signature(grams)
    xs = sorted((TX._hash_token(g) & TX._MERSENNE) for g in grams)
    for i in range(TX.MINHASH_K):
        want = min((int(TX._MH_A[i]) * x + int(TX._MH_B[i])) % TX._MERSENNE
                   for x in xs)
        assert int(sig[i]) == want, i
