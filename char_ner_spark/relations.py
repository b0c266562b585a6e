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


def match_middle(lang: str, middle: str) -> tuple[str, bool] | None:
    """Middle text between two mentions → (predicate, subj_is_left) or None.
    Matches on the normalized gap (tokenized middles)."""
    return NORM_MIDDLES.get(lang, {}).get(normalize_gap(middle))


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
        hit = match_middle(lang, middle)
        if hit is None:
            continue
        pred, subj_left = hit
        subj, obj = (left[2], right[2]) if subj_left else (right[2], left[2])
        conf = round(min(left[3], right[3]), 6)
        out.append((subj, pred, obj, conf))
    return out
