"""Span algebra: IO / BIO / BIOES tag-scheme conversions and span⇄offset maps.

Pure Python, shared verbatim by the Spark UDFs, the single-process oracle,
and the tests — this is the part of the reference with exact semantics
independent of model weights (ref:src/encoding.py:~1-110 `io2bio`/`bio2io`/
`bio2bilou`, ref:src/rep.py:~15-180 `get_cseq`/`get_ts`/char→word recovery;
reconstructed, see SURVEY.md §0).

Conventions:
  - word-level tags are lowercase-insensitive strings like ``B-PER``,
    ``I-LOC``, ``O`` (CoNLL classes PER/LOC/ORG/MISC).
  - char-level tags are per-character class labels (IO at char level);
    a space between two words of the same entity carries that class
    (the reference's Repstd keeps spaces; SURVEY §1.1 D4).
"""

from __future__ import annotations

OUT = "O"


def _split(tag: str) -> tuple[str, str]:
    if tag == OUT or tag == "":
        return OUT, ""
    if len(tag) > 1 and tag[1] == "-":
        return tag[0].upper(), tag[2:]
    return "I", tag  # bare class treated as inside


def io2bio(tags: list[str]) -> list[str]:
    """IO→BIO: first tag of a class run becomes B- (ref:src/encoding.py)."""
    out: list[str] = []
    prev_cls = ""
    for t in tags:
        mark, cls = _split(t)
        if mark == OUT:
            out.append(OUT)
            prev_cls = ""
        else:
            out.append(("I-" if cls == prev_cls else "B-") + cls)
            prev_cls = cls
    return out


def bio2io(tags: list[str]) -> list[str]:
    """BIO→IO: drop the B/I distinction (lossy when same-class spans touch)."""
    return [t if t == OUT else "I-" + _split(t)[1] for t in tags]


def bio2bioes(tags: list[str]) -> list[str]:
    """BIO→BIOES (a.k.a. BILOU): add S- for singletons, E- for span ends."""
    out: list[str] = []
    n = len(tags)
    for i, t in enumerate(tags):
        mark, cls = _split(t)
        if mark == OUT:
            out.append(OUT)
            continue
        nxt_mark, nxt_cls = _split(tags[i + 1]) if i + 1 < n else (OUT, "")
        continues = nxt_mark == "I" and nxt_cls == cls
        if mark == "B":
            out.append(("B-" if continues else "S-") + cls)
        else:  # I
            out.append(("I-" if continues else "E-") + cls)
    return out


def bioes2bio(tags: list[str]) -> list[str]:
    """BIOES→BIO: S→B, E→I."""
    out: list[str] = []
    for t in tags:
        mark, cls = _split(t)
        if mark == OUT:
            out.append(OUT)
        elif mark in ("B", "S"):
            out.append("B-" + cls)
        else:
            out.append("I-" + cls)
    return out


def bio_spans(tags: list[str]) -> list[tuple[int, int, str]]:
    """BIO tag list → [(start_idx, end_idx_exclusive, class)] token spans.

    Tolerant of malformed I- starts (treated as B-), matching conlleval's
    phrase extraction (ref:conlleval.pl behavior)."""
    spans: list[tuple[int, int, str]] = []
    start, cur = -1, ""
    for i, t in enumerate(tags):
        mark, cls = _split(t)
        if mark == OUT:
            if cur:
                spans.append((start, i, cur))
                cur = ""
        elif mark == "B" or cls != cur or not cur:
            if cur:
                spans.append((start, i, cur))
            start, cur = i, cls
    if cur:
        spans.append((start, len(tags), cur))
    return spans


def spans2bio(n: int, spans: list[tuple[int, int, str]]) -> list[str]:
    """Inverse of :func:`bio_spans` for non-overlapping spans."""
    tags = [OUT] * n
    for s, e, cls in spans:
        for i in range(s, min(e, n)):
            tags[i] = ("B-" if i == s else "I-") + cls
    return tags


# ---------------------------------------------------------------------------
# char-level representation (ref:src/rep.py get_cseq/get_ts, Repstd scheme)
# ---------------------------------------------------------------------------


def word_offsets(text: str) -> list[tuple[int, int]]:
    """[(start, end_exclusive)] char offsets of whitespace-separated words."""
    offs: list[tuple[int, int]] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace():
            j += 1
        offs.append((i, j))
        i = j
    return offs


def word_tags_to_char_classes(text: str, word_tags: list[str],
                              scheme: str = "std") -> list[str]:
    """Word-level BIO tags → per-char class labels over ``text``.

    Every char of a word carries the word's class. Scheme (the reference's
    D4 axis, ref:src/rep.py Repstd vs Repnospace):
      - ``std``: a space carries the shared class of its neighbors when the
        right word is an I- continuation of the left word's entity (spaces
        inside multi-word entities are labeled);
      - ``nospace``: separator chars are always OUT — the char stream carries
        no span-bridging information (lossy for adjacent same-class spans,
        see :func:`char_classes_to_word_tags`).
    """
    if scheme not in ("std", "nospace"):
        raise ValueError(f"unknown scheme {scheme!r}")
    offs = word_offsets(text)
    assert len(offs) == len(word_tags), (len(offs), len(word_tags))
    classes = [OUT] * len(text)
    for (s, e), t in zip(offs, word_tags):
        _, cls = _split(t)
        c = cls if t != OUT else OUT
        for i in range(s, e):
            classes[i] = c
    if scheme == "nospace":
        return classes
    # Repstd — spaces inside a multi-word entity: same class both sides AND
    # the right word is an I- continuation of the left word's span
    for k, ((_, le), tl) in enumerate(zip(offs[:-1], word_tags[:-1])):
        rs, _ = offs[k + 1]
        tr = word_tags[k + 1]
        ml, cl = _split(tl)
        mr, cr = _split(tr)
        if tl != OUT and tr != OUT and cl == cr and mr == "I":
            for i in range(le, rs):
                classes[i] = cl
    return classes


def char_classes_to_word_tags(text: str, classes: list[str],
                              scheme: str = "std") -> list[str]:
    """Char classes → word BIO tags (majority class per word; the reference's
    char→word recovery, ref:src/rep.py:~120-180 — consistent after Viterbi's
    word-constant constraint, majority is the fallback).

    Span joining per scheme:
      - ``std``: adjacent same-class words merge iff the separating chars
        also carry the class (space-bridged entity) — exact inverse of the
        Repstd encoding;
      - ``nospace``: adjacent same-class words ALWAYS merge — without space
        labels the char stream cannot distinguish one multi-word entity from
        two touching same-class entities, so the decoder takes the merge
        (the reference's documented Repnospace lossiness).
    """
    if scheme not in ("std", "nospace"):
        raise ValueError(f"unknown scheme {scheme!r}")
    offs = word_offsets(text)
    word_cls: list[str] = []
    for s, e in offs:
        counts: dict[str, int] = {}
        for i in range(s, e):
            counts[classes[i]] = counts.get(classes[i], 0) + 1
        word_cls.append(max(counts, key=lambda c: (counts[c], c != OUT)))
    tags: list[str] = []
    for k, cls in enumerate(word_cls):
        if cls == OUT:
            tags.append(OUT)
            continue
        joined = False
        if k > 0 and word_cls[k - 1] == cls:
            if scheme == "nospace":
                joined = True
            else:
                # gap (the inter-word whitespace) is non-empty by
                # construction: word offsets are maximal non-space runs
                gap = range(offs[k - 1][1], offs[k][0])
                joined = all(classes[i] == cls for i in gap)
        tags.append(("I-" if joined else "B-") + cls)
    return tags


def char_spans(text: str, classes: list[str]) -> list[tuple[int, int, str]]:
    """Char classes → [(begin, end_exclusive, class)] char-offset spans,
    trimmed to word boundaries (no partial-word spans)."""
    word_tags = char_classes_to_word_tags(text, classes)
    offs = word_offsets(text)
    out: list[tuple[int, int, str]] = []
    for s_tok, e_tok, cls in bio_spans(word_tags):
        out.append((offs[s_tok][0], offs[e_tok - 1][1], cls))
    return out
