"""Dependency-pattern relation templates (north_rule: "(subj, pred, obj)
triples from dependency-pattern templates applied per sentence window").

One registry shared by the fixture generator, the oracle, and the Spark
extraction UDF: a predicate fires when the text between two adjacent linked
mentions in a sentence exactly matches a template middle (a lightweight,
deterministic stand-in for dependency paths — no parser in the sandbox).
Middles are all-lowercase so the tagger never mistakes them for mentions.
"""

from __future__ import annotations

LANGS = ["en", "de", "es", "nl"]  # CoNLL-2003/2002 mirror (BASELINE.json north_star)

#: lang → {middle_text: (predicate, subj_is_left)}
MIDDLES: dict[str, dict[str, tuple[str, bool]]] = {
    "en": {
        " works for ": ("works_for", True),
        " is located in ": ("located_in", True),
        " acquired ": ("acquired", True),
        " was born in ": ("born_in", True),
        " is part of ": ("part_of", True),
        " is owned by ": ("acquired", False),
    },
    "de": {
        " arbeitet bei ": ("works_for", True),
        " liegt in ": ("located_in", True),
        " übernahm ": ("acquired", True),
        " wurde geboren in ": ("born_in", True),
        " gehört zu ": ("part_of", True),
    },
    "es": {
        " trabaja para ": ("works_for", True),
        " se encuentra en ": ("located_in", True),
        " adquirió ": ("acquired", True),
        " nació en ": ("born_in", True),
        " es parte de ": ("part_of", True),
    },
    "nl": {
        " werkt voor ": ("works_for", True),
        " ligt in ": ("located_in", True),
        " kocht ": ("acquired", True),
        " werd geboren in ": ("born_in", True),
        " hoort bij ": ("part_of", True),
    },
}

#: bounded-gap templates (round-4, SURVEY §2.9 M8 "regex/POS-lite"): the
#: ``<N>`` slot admits up to N filler tokens at that position, so
#: " acquired rival " and " acquired the startup " fire while
#: " acquired the giant rival conglomerate " (over bound) does not.
#: Exactly one slot per template; literal parts normalize like any middle.
GAP_MIDDLES: dict[str, dict[str, tuple[str, bool]]] = {
    "en": {
        " acquired <2> ": ("acquired", True),
        " was born <1> in ": ("born_in", True),
    },
    "de": {" übernahm <2> ": ("acquired", True)},
    "es": {" adquirió <2> ": ("acquired", True)},
    "nl": {" kocht <2> ": ("acquired", True)},
}

PREDICATES = sorted({p for m in MIDDLES.values() for p, _ in m.values()})

# Gap normalization (round-3): template lookup happens on a TOKENIZED gap —
# lowercase, punctuation → space, whitespace collapsed — so " acquired, ",
# " Acquired " and " acquired " all fire the same template. The exact same
# rule runs in three places and MUST stay in lockstep: this Python oracle
# (normalize_gap), the Spark join key (pipeline._gap_norm_col — JVM regex,
# parity-tested), and the broadcast template table (pipeline.middles_table).
# The character class is explicit (no \w / \p{L}) because Java and Python
# regex disagree on what \w matches — an explicit class is identical in both.
GAP_PUNCT_PATTERN = (
    "[.,;:!?¡¿\"'()\\[\\]{}«»„“”‘’\\-–—/\\\\|+*&%$#@~^<>=_]"
)
GAP_WS_PATTERN = "[ \t\n\r]+"
#: single-pass separator class: punct ∪ whitespace. Splitting lower(text)
#: on this yields exactly normalize_gap(text).split() (plus removable empty
#: strings at the edges) — the round-5 fast path pipeline._gap_toks_col
#: uses it to tokenize gaps in ONE regex pass instead of replace+replace+
#: re-split; parity is fuzz-tested in tests/test_relations_gap.py
GAP_SEP_PATTERN = GAP_PUNCT_PATTERN[:-1] + " \t\n\r]+"

import re as _re

_GAP_PUNCT_RE = _re.compile(GAP_PUNCT_PATTERN)
_GAP_WS_RE = _re.compile(GAP_WS_PATTERN)


def normalize_gap(text: str) -> str:
    """Canonical form of the text between two adjacent mentions, framed by
    single spaces (keeps the word-boundary convention of the template keys)."""
    t = _GAP_WS_RE.sub(" ", _GAP_PUNCT_RE.sub(" ", text.lower())).strip()
    return f" {t} " if t else " "


#: lang → {normalized_middle: (predicate, subj_is_left)}
NORM_MIDDLES: dict[str, dict[str, tuple[str, bool]]] = {
    lang: {normalize_gap(mid): hit for mid, hit in mids.items()}
    for lang, mids in MIDDLES.items()
}
for _lang, _mids in MIDDLES.items():  # normalization must not merge templates
    assert len(NORM_MIDDLES[_lang]) == len(_mids), _lang

_GAP_SLOT_RE = _re.compile(r"^<(\d+)>$")


def _parse_template(spec: str) -> tuple[tuple[str, ...], int, tuple[str, ...]]:
    """Template spec → (pre_tokens, gap_max, post_tokens). Specs without a
    ``<N>`` slot parse as exact (gap_max 0, empty post). Literal parts are
    normalized with the same rule as observed gaps."""
    raw = spec.split()
    slots = [i for i, t in enumerate(raw) if _GAP_SLOT_RE.match(t)]
    if not slots:
        toks = tuple(normalize_gap(spec).split())
        return toks, 0, ()
    assert len(slots) == 1, f"one gap slot per template: {spec!r}"
    i = slots[0]
    gmax = int(_GAP_SLOT_RE.match(raw[i]).group(1))
    pre = tuple(normalize_gap(" ".join(raw[:i])).split())
    post = tuple(normalize_gap(" ".join(raw[i + 1:])).split())
    assert pre or post, f"a template needs literal tokens: {spec!r}"
    return pre, gmax, post


#: lang → [(pre_tokens, gap_max, post_tokens, predicate, subj_is_left)];
#: one registry drives the Python oracle (match_middles), the Spark
#: broadcast template table (pipeline.middles_table) and the Spark gap-key
#: generator (pipeline — the three MUST stay in lockstep)
TEMPLATES: dict[str, list[tuple[tuple[str, ...], int, tuple[str, ...], str, bool]]] = {
    lang: sorted(
        {
            (*_parse_template(spec), pred, subj_left)
            for spec, (pred, subj_left) in
            list(mids.items()) + list(GAP_MIDDLES.get(lang, {}).items())
        }
    )
    for lang, mids in MIDDLES.items()
}

#: distinct (|pre|, |post|) → max gap bound among templates of that shape,
#: across ALL languages — the driver-side constants the Spark key generator
#: expands observed gaps against (lang mismatches die in the equi-join)
TEMPLATE_SHAPES: dict[tuple[int, int], int] = {}
for _ts in TEMPLATES.values():
    for _pre, _gmax, _post, _p, _s in _ts:
        k = (len(_pre), len(_post))
        TEMPLATE_SHAPES[k] = max(TEMPLATE_SHAPES.get(k, 0), _gmax)


def match_middles(lang: str, middle: str) -> list[tuple[str, bool]]:
    """ALL template hits for the text between two mentions, deduplicated
    and deterministically ordered. A template (pre, gmax, post) matches
    when the normalized gap tokens are pre ++ filler(≤gmax) ++ post."""
    toks = normalize_gap(middle).split()
    n = len(toks)
    hits: set[tuple[str, bool]] = set()
    for pre, gmax, post, pred, subj_left in TEMPLATES.get(lang, []):
        lp, lq = len(pre), len(post)
        if lp + lq <= n <= lp + lq + gmax \
                and tuple(toks[:lp]) == pre \
                and (not lq or tuple(toks[n - lq:]) == post):
            hits.add((pred, subj_left))
    return sorted(hits)


def match_middle(lang: str, middle: str) -> tuple[str, bool] | None:
    """First (deterministic) template hit or None. Historical single-hit
    surface; sentence extraction emits EVERY hit via match_middles."""
    hits = match_middles(lang, middle)
    return hits[0] if hits else None


def extract_sentence_triples(
    sent_text: str,
    mentions: list[tuple[int, int, int, float]],
    lang: str,
) -> list[tuple[int, str, int, float]]:
    """Linked mentions of one sentence → [(subj_entity, pred, obj_entity, conf)].

    ``mentions``: (begin, end, entity_id, link_score), begin-sorted.
    Adjacent pairs only (the per-sentence-window pattern, SURVEY §2.5 W2).
    """
    out: list[tuple[int, str, int, float]] = []
    ms = sorted(mentions)
    for left, right in zip(ms, ms[1:]):
        middle = sent_text[left[1] : right[0]]
        for pred, subj_left in match_middles(lang, middle):
            subj, obj = (left[2], right[2]) if subj_left else (right[2], left[2])
            conf = round(min(left[3], right[3]), 6)
            out.append((subj, pred, obj, conf))
    return out
