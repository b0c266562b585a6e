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


def match_middle(lang: str, middle: str) -> tuple[str, bool] | None:
    """Middle text between two mentions → (predicate, subj_is_left) or None."""
    return MIDDLES.get(lang, {}).get(middle)


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
