"""Hypothesis property tests for the pure engine kernels (SURVEY §5.2:
property layer). These cover the algebraic invariants the hand-picked
example tests can't exhaust: arbitrary tag sequences, adversarial unicode
text, arbitrary HTML-ish byte soup."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from char_ner_spark import spans, textops

NER = st.sampled_from(["PER", "LOC", "ORG", "MISC"])


@st.composite
def bio_seq(draw):
    """A structurally-valid BIO sequence (I- only continues a same-type run)."""
    n = draw(st.integers(0, 30))
    out, prev = [], "O"
    for _ in range(n):
        choices = ["O", "B"]
        if prev != "O":
            choices.append("I")
        c = draw(st.sampled_from(choices))
        if c == "O":
            out.append("O")
            prev = "O"
        elif c == "B":
            t = draw(NER)
            out.append(f"B-{t}")
            prev = t
        else:
            out.append(f"I-{prev}")
    return out


@given(bio_seq())
def test_bio_bioes_roundtrip(tags):
    assert spans.bioes2bio(spans.bio2bioes(tags)) == tags


@given(bio_seq())
def test_bio_spans_reconstruct(tags):
    """spans2bio(bio_spans(x)) == x — span extraction is lossless on BIO."""
    sp = spans.bio_spans(tags)
    assert spans.spans2bio(len(tags), sp) == tags
    # spans are disjoint, ordered, in-bounds
    for (b, e, t), nxt in zip(sp, sp[1:] + [None]):
        assert 0 <= b < e <= len(tags)
        if nxt is not None:
            assert e <= nxt[0]


@given(bio_seq())
def test_io_conversion_preserves_span_count_lower_bound(tags):
    """IO loses boundaries between ADJACENT same-type spans but must keep
    every other span intact: converting BIO→IO→BIO merges adjacent
    same-type runs, so span count can only drop, and total tagged length
    is preserved."""
    io = spans.bio2io(tags)
    back = spans.io2bio(io)
    orig, merged = spans.bio_spans(tags), spans.bio_spans(back)
    assert len(merged) <= len(orig)
    assert sum(e - b for b, e, _ in merged) == sum(e - b for b, e, _ in orig)


@given(st.text(alphabet=string.printable + "üéßñ日本語", max_size=200))
def test_word_tag_char_class_roundtrip(text):
    """word tags → char classes → word tags is the identity on any text
    (the reference's core char↔word projection, SURVEY §2.9 M5)."""
    offs = spans.word_offsets(text)
    words = [text[b:e] for b, e in offs]
    tags = ["B-PER" if i % 3 == 0 else "O" for i in range(len(words))]
    classes = spans.word_tags_to_char_classes(text, tags)
    assert len(classes) == len(text)
    assert spans.char_classes_to_word_tags(text, classes) == tags


@given(st.text(max_size=300))
def test_normalize_surface_idempotent(s):
    n1 = textops.normalize_surface(s)
    assert textops.normalize_surface(n1) == n1
    assert n1 == n1.strip()
    assert "  " not in n1


@given(st.text(max_size=4000), st.integers(16, 64))
def test_split_sentences_bounds_and_coverage(text, max_len):
    sents = textops.split_sentences(text, max_len=max_len)
    joined = "".join(sents)
    for s in sents:
        assert 0 < len(s) <= max_len
    # no content characters are lost: the splitter may only drop whitespace
    # and REDUNDANT terminators (a .!? not preceded by a non-terminator char
    # — '...' keeps one dot, a bare '?' is not a sentence). Terminators that
    # close real content ('U.S.' has two) must all survive.
    def content(s: str) -> list[str]:
        return sorted(c for c in s if not c.isspace() and c not in ".!?")

    assert content(joined) == content(text)
    kept_terms = sum(c in ".!?" for c in joined)
    expected_terms = sum(
        c in ".!?" and i > 0 and text[i - 1] not in ".!?"
        for i, c in enumerate(text)
    )
    assert kept_terms == expected_terms


@settings(max_examples=60)
@given(st.binary(max_size=500))
def test_extract_text_total_and_deterministic(raw):
    """extract_text never raises on arbitrary byte soup (Common-Crawl
    reality) and is deterministic (byte-identity contract)."""
    a = textops.extract_text(raw)
    b = textops.extract_text(raw)
    assert a == b
    assert isinstance(a, str)
    # whitespace runs are collapsed — extraction output never carries
    # tab/newline runs into the sentence splitter
    assert "  " not in a and "\t" not in a and "\n" not in a


@given(st.text(alphabet="abc &;ltgampquo#39nbs", max_size=120))
def test_extract_text_single_unescape(payload):
    """Entity decoding happens exactly once: text containing the literal
    string '&amp;lt;' must surface as '&lt;', never '<' (round-2 fix)."""
    html = f"<html><body><p>{payload}&amp;lt;</p></body></html>".encode()
    out = textops.extract_text(html)
    assert out.endswith("&lt;")


def test_batch_jaccard_pairs_matches_set_jaccard():
    """The packed-gram-code sorted-array Jaccard must equal the Python-set
    definition bit-for-bit, pair by pair (round-4: it replaced the per-row
    set builds on the fuzzy-scoring paths)."""
    import numpy as np

    from char_ner_spark.textops import (
        batch_jaccard_pairs,
        char_ngrams,
        jaccard,
        normalize_surface,
    )

    rng = np.random.RandomState(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    def rand_s():
        k = rng.randint(0, 14)
        return "".join(alphabet[rng.randint(len(alphabet))] for _ in range(k))

    left = [rand_s() for _ in range(500)] + ["", "a", "ab", "acme corp"]
    right = [rand_s() for _ in range(500)] + ["", "b", "ab", "acme corpp"]
    got = batch_jaccard_pairs(left, right)
    for i, (l, r) in enumerate(zip(left, right)):
        ln, rn = normalize_surface(l), normalize_surface(r)
        want = jaccard(char_ngrams(ln), char_ngrams(rn))
        assert got[i] == want, (i, l, r, got[i], want)
    # already_norm path agrees on normalized inputs
    norm_l = [normalize_surface(s) for s in left]
    norm_r = [normalize_surface(s) for s in right]
    got2 = batch_jaccard_pairs(norm_l, norm_r, already_norm=True)
    assert np.array_equal(got, got2)


def test_fuzzy_batch_equals_per_surface_fuzzy():
    """AliasIndex._fuzzy_batch must reproduce the historical per-surface
    probe exactly (scores, winners, unlinkables)."""
    from char_ner_spark.fixtures import make_alias_table
    from char_ner_spark.linking import AliasIndex
    from char_ner_spark.textops import minhash_bands_batch, normalize_surface

    idx = AliasIndex(make_alias_table(n_entities=60, seed=5))
    import numpy as np

    rng = np.random.RandomState(13)
    surfaces = []
    for alias in idx.rows["alias"].tolist()[:120]:
        s = list(alias)
        if len(s) > 2:
            s[rng.randint(len(s))] = "x"  # typo → fuzzy path
        surfaces.append("".join(s))
    norms = [normalize_surface(s) for s in surfaces]
    bands = minhash_bands_batch(norms, already_norm=True)
    batch = idx._fuzzy_batch(norms, bands)

    # the historical per-surface probe, reimplemented from sets (the live
    # _fuzzy delegates to _fuzzy_batch, so compare against first principles)
    from char_ner_spark.linking import JACCARD_MIN, best_candidate, fuzzy_score
    from char_ner_spark.textops import char_ngrams, jaccard

    hits = 0
    for i, norm in enumerate(norms):
        grams = char_ngrams(norm)
        cands, seen = [], set()
        for bi, bh in enumerate(bands[i]):
            for rid in idx.bands.get((bi, int(bh)), []):
                if rid in seen:
                    continue
                seen.add(rid)
                j = jaccard(grams, char_ngrams(idx.rows["alias_norm"].iloc[rid]))
                if j >= JACCARD_MIN:
                    eid, prior = idx.row_ep[rid]
                    cands.append((fuzzy_score(j, prior), eid))
        want = best_candidate(cands)
        assert batch[i] == want, (i, norm, batch[i], want)
        hits += want is not None
    assert hits > 20, hits  # the fuzzy path actually carried weight here
