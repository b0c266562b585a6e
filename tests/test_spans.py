"""Span-algebra property + fixture tests (SURVEY.md §5.2 unit layer).

Mirrors the reference's implicit invariants: scheme conversions round-trip
(ref:src/encoding.py), char→word→char tag mapping is consistent
(ref:src/rep.py)."""

import random

import pytest

from char_ner_spark import spans as S

CLASSES = ["PER", "LOC", "ORG", "MISC"]


def random_bio(rng: random.Random, n: int) -> list[str]:
    tags = []
    i = 0
    while i < n:
        if rng.random() < 0.6:
            tags.append("O")
            i += 1
        else:
            cls = rng.choice(CLASSES)
            span_len = min(rng.randint(1, 3), n - i)
            tags.append("B-" + cls)
            tags.extend("I-" + cls for _ in range(span_len - 1))
            i += span_len
    return tags


@pytest.mark.parametrize("seed", range(20))
def test_bioes_roundtrip(seed):
    rng = random.Random(seed)
    bio = random_bio(rng, rng.randint(1, 40))
    assert S.bioes2bio(S.bio2bioes(bio)) == bio


@pytest.mark.parametrize("seed", range(20))
def test_io_bio_roundtrip_when_no_adjacent_same_class(seed):
    rng = random.Random(seed)
    bio = random_bio(rng, rng.randint(1, 40))
    # io2bio(bio2io(x)) == x unless two same-class spans touch (lossy case)
    sp = S.bio_spans(bio)
    touching = any(
        a[1] == b[0] and a[2] == b[2] for a, b in zip(sp, sp[1:])
    )
    if not touching:
        assert S.io2bio(S.bio2io(bio)) == bio


@pytest.mark.parametrize("seed", range(20))
def test_spans_roundtrip(seed):
    rng = random.Random(seed)
    bio = random_bio(rng, rng.randint(1, 40))
    assert S.spans2bio(len(bio), S.bio_spans(bio)) == bio


def test_bioes_marks():
    assert S.bio2bioes(["B-PER", "I-PER", "O", "B-LOC"]) == [
        "B-PER", "E-PER", "O", "S-LOC",
    ]


def test_malformed_i_start_treated_as_begin():
    assert S.bio_spans(["I-PER", "I-PER", "O"]) == [(0, 2, "PER")]


@pytest.mark.parametrize("seed", range(10))
def test_char_word_roundtrip(seed):
    rng = random.Random(seed + 100)
    words = ["w%d" % rng.randint(0, 9) for _ in range(rng.randint(1, 12))]
    text = " ".join(words)
    bio = random_bio(rng, len(words))
    classes = S.word_tags_to_char_classes(text, bio)
    back = S.char_classes_to_word_tags(text, classes)
    # span sets must match (B/I distinction for touching same-class spans
    # merges through the char representation only when the gap is tagged)
    assert S.bio_spans(back) == S.bio_spans(bio) or S.bio2io(back) == S.bio2io(bio)


def test_char_spans_offsets():
    text = "Alice Smith works at Acme."
    wt = ["B-PER", "I-PER", "O", "O", "B-ORG"]
    classes = S.word_tags_to_char_classes(text, wt)
    assert S.char_spans(text, classes) == [(0, 11, "PER"), (21, 26, "ORG")]
    assert text[0:11] == "Alice Smith"


@pytest.mark.parametrize("seed", range(20))
def test_nospace_roundtrip_without_adjacent_same_class(seed):
    """Repnospace: word→char→word identity holds when no two same-class
    spans touch (the scheme's documented information limit)."""
    rng = random.Random(seed + 500)
    tags = random_bio(rng, rng.randint(1, 20))
    sp = S.bio_spans(tags)
    if any(a[1] == b[0] and a[2] == b[2] for a, b in zip(sp, sp[1:])):
        return  # touching same-class spans — the documented lossy case
    words = ["w%d" % rng.randint(0, 9) for _ in tags]
    text = " ".join(words)
    classes = S.word_tags_to_char_classes(text, tags, scheme="nospace")
    # separator chars never carry a class under Repnospace
    for i, ch in enumerate(text):
        if ch == " ":
            assert classes[i] == S.OUT
    assert S.char_classes_to_word_tags(text, classes, scheme="nospace") == tags


def test_nospace_merges_adjacent_same_class_spans():
    """B-X B-X is indistinguishable from B-X I-X without space labels —
    Repnospace decodes the merge (lossy by design); Repstd keeps them apart."""
    text = "aa bb"
    tags = ["B-PER", "B-PER"]
    no = S.word_tags_to_char_classes(text, tags, scheme="nospace")
    assert S.char_classes_to_word_tags(text, no, scheme="nospace") == ["B-PER", "I-PER"]
    std = S.word_tags_to_char_classes(text, tags, scheme="std")
    assert S.char_classes_to_word_tags(text, std, scheme="std") == tags


def test_scheme_validation():
    with pytest.raises(ValueError):
        S.word_tags_to_char_classes("a", ["O"], scheme="bogus")
    with pytest.raises(ValueError):
        S.char_classes_to_word_tags("a", ["O"], scheme="bogus")
