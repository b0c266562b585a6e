"""Mention → entity linking contract (north_rule: "link mentions to a
broadcast alias dictionary with candidate-generation via char-ngram MinHash
and contextual scoring").

Pure functions here define the semantics once; ``pipeline.py`` expresses the
same logic as DataFrame ops (broadcast hash join for exact matches, banded
MinHash LSH join for fuzzy candidates) and ``oracle.py`` runs it
single-process. Both must produce identical links.
"""

from __future__ import annotations

import pandas as pd

from .textops import char_ngrams, jaccard, minhash_bands, normalize_surface

#: fuzzy candidates below this trigram-Jaccard are dropped
JACCARD_MIN = 0.30
#: link score weights: exact = 1.0 + w_prior*prior; fuzzy = w_j*jacc + w_prior*prior
W_JACCARD = 0.7
W_PRIOR = 0.3


def exact_score(prior: float) -> float:
    return round(1.0 + W_PRIOR * prior, 6)


def fuzzy_score(jacc: float, prior: float) -> float:
    return round(W_JACCARD * jacc + W_PRIOR * prior, 6)


def best_candidate(cands: list[tuple[float, int]]) -> tuple[float, int] | None:
    """Deterministic winner: max score, ties broken by smaller entity_id."""
    if not cands:
        return None
    return max(cands, key=lambda c: (c[0], -c[1]))


class AliasIndex:
    """Single-process alias index (oracle side; the Spark side broadcasts the
    same alias table and reproduces this with joins)."""

    def __init__(self, alias_df: pd.DataFrame):
        self.exact: dict[str, list[tuple[int, float]]] = {}
        self.bands: dict[tuple[int, int], list[int]] = {}  # (band_idx, hash) -> alias row ids
        self.rows = alias_df.reset_index(drop=True)
        norms = [normalize_surface(a) for a in self.rows["alias"]]
        self.rows = self.rows.assign(alias_norm=norms)
        for rid, (norm, eid, prior) in enumerate(
            zip(norms, self.rows["entity_id"], self.rows["prior"])
        ):
            self.exact.setdefault(norm, []).append((int(eid), float(prior)))
            for bi, bh in enumerate(minhash_bands(norm)):
                self.bands.setdefault((bi, bh), []).append(rid)

    def link(self, surface: str) -> tuple[int, float] | None:
        """Surface → (entity_id, score) or None (unlinkable)."""
        norm = normalize_surface(surface)
        cands: list[tuple[float, int]] = []
        for eid, prior in self.exact.get(norm, []):
            cands.append((exact_score(prior), eid))
        if not cands:  # fuzzy path only when no exact hit (cheaper, same contract in Spark)
            grams = char_ngrams(norm)
            seen: set[int] = set()
            for bi, bh in enumerate(minhash_bands(norm)):
                for rid in self.bands.get((bi, bh), []):
                    if rid in seen:
                        continue
                    seen.add(rid)
                    row = self.rows.iloc[rid]
                    j = jaccard(grams, char_ngrams(row["alias_norm"]))
                    if j >= JACCARD_MIN:
                        cands.append((fuzzy_score(j, float(row["prior"])), int(row["entity_id"])))
        best = best_candidate(cands)
        if best is None:
            return None
        return best[1], best[0]


def union_find_canonical(alias_df: pd.DataFrame) -> dict[int, int]:
    """entity_id → canonical_id (min id of its connected component; edges =
    entities sharing a normalized alias). Oracle for the Spark CC stage."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo

    by_alias: dict[str, int] = {}
    for eid, alias in zip(alias_df["entity_id"], alias_df["alias"]):
        norm = normalize_surface(alias)
        if norm in by_alias:
            union(int(eid), by_alias[norm])
        else:
            by_alias[norm] = int(eid)
        parent.setdefault(int(eid), int(eid))
    # min-id representative per component
    comp_min: dict[int, int] = {}
    for eid in list(parent):
        r = find(eid)
        comp_min[r] = min(comp_min.get(r, eid), eid)
    return {eid: comp_min[find(eid)] for eid in parent}
