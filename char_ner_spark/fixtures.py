"""Deterministic synthetic corpus per FIXTURES.md §1-2 (no external data).

Generates, from a fixed seed:
  - the alias dictionary (entity_id, canonical_name, alias, lang, prior,
    ner_type) — the broadcast side of linking;
  - the pages table (url, warc_ts, html, text, lang) — exactly
    BASELINE.json input_hint's shape, with a deliberately skewed domain
    distribution (~20% of pages on one domain) to exercise salting.

Everything is pure pandas/NumPy so the oracle and Spark read identical bytes.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from .relations import GAP_MIDDLES, LANGS, MIDDLES, _parse_template

#: spec-sorted parsed gap templates per lang, hoisted out of the page loop
#: (the rng call sequence — and so the seeded corpus — is unchanged)
_GAP_PARSED = {
    lang: [_parse_template(s) for s in sorted(GAP_MIDDLES.get(lang, {}))]
    for lang in LANGS
}

_SYL = ["ka", "lo", "mi", "ran", "vel", "tor", "ben", "sa", "du", "pex",
        "nor", "li", "gar", "zu", "fen", "hol", "qui", "bra", "ste", "mon"]
_ORG_SUFFIX = ["Corp", "Group", "Labs", "Systems", "Holdings"]
_FILLER = {
    "en": "the market report shows steady growth in quarterly revenue and demand".split(),
    "de": "der bericht zeigt ein stetiges wachstum bei umsatz und nachfrage".split(),
    "es": "el informe muestra un crecimiento estable en ingresos y demanda".split(),
    "nl": "het rapport toont een gestage groei in omzet en vraag".split(),
}
_DOMAINS = ["big-portal.example.com"] + [f"site{i:03d}.example.org" for i in range(40)]


def _title_word(rng: np.random.RandomState, nsyl: int) -> str:
    w = "".join(_SYL[rng.randint(len(_SYL))] for _ in range(nsyl))
    return w.capitalize()


def make_alias_table(n_entities: int = 500, seed: int = 42) -> pd.DataFrame:
    """Alias dictionary (FIXTURES.md §2): exact names, misspellings,
    word-swaps; ~4 alias rows per entity."""
    rng = np.random.RandomState(seed)
    rows = []
    prev: tuple[str, str] | None = None
    for eid in range(n_entities):
        ner_type = ["PER", "LOC", "ORG", "MISC"][eid % 4]
        lang = LANGS[rng.randint(len(LANGS))]
        if prev is not None and eid % 10 == 9:
            # deliberate duplicate record of the previous entity — exercises
            # connected-components canonicalization (same canonical alias,
            # distinct entity_id)
            name, ner_type = prev
        elif ner_type == "PER":
            name = f"{_title_word(rng, 2)} {_title_word(rng, 2)}"
        elif ner_type == "ORG":
            name = f"{_title_word(rng, 2)} {_ORG_SUFFIX[rng.randint(len(_ORG_SUFFIX))]}"
        elif ner_type == "LOC":
            name = _title_word(rng, 3)
        else:
            name = f"{_title_word(rng, 2)} {_title_word(rng, 1)}"
        prev = (name, ner_type)
        prior = round(float(rng.uniform(0.1, 1.0)), 4)
        aliases = {name}
        # misspelling: drop one interior char of the longest word
        words = name.split()
        wi = max(range(len(words)), key=lambda i: len(words[i]))
        w = words[wi]
        k = 1 + rng.randint(max(1, len(w) - 2))
        mis = w[:k] + w[k + 1 :]
        aliases.add(" ".join(words[:wi] + [mis] + words[wi + 1 :]))
        # duplicated-letter typo
        k2 = 1 + rng.randint(max(1, len(w) - 1))
        aliases.add(" ".join(words[:wi] + [w[:k2] + w[k2 - 1] + w[k2:]] + words[wi + 1 :]))
        if len(words) == 2:
            aliases.add(f"{words[1]} {words[0]}")  # swapped order
        for alias in sorted(aliases):
            rows.append((eid, name, alias, lang, prior, ner_type))
    return pd.DataFrame(
        rows, columns=["entity_id", "canonical_name", "alias", "lang", "prior", "ner_type"]
    )


def make_pages(
    n_pages: int = 200,
    seed: int = 42,
    alias_df: pd.DataFrame | None = None,
    sents_lo: int = 3,
    sents_hi: int = 8,
) -> pd.DataFrame:
    """Pages table, input_hint shape. ~60% of sentences carry a planted
    relation between two alias-dictionary mentions; the rest are filler."""
    if alias_df is None:
        alias_df = make_alias_table(seed=seed)
    rng = np.random.RandomState(seed + 1)
    by_lang: dict[str, pd.DataFrame] = {
        lang: g.reset_index(drop=True) for lang, g in alias_df.groupby("lang")
    }
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for p in range(n_pages):
        lang = LANGS[rng.randint(len(LANGS))]
        pool = by_lang[lang]
        middles = sorted(MIDDLES[lang])
        gap_specs = _GAP_PARSED[lang]
        n_sents = sents_lo + rng.randint(sents_hi - sents_lo + 1)
        sents = []
        for _ in range(n_sents):
            if rng.uniform() < 0.6 and len(pool) >= 2:
                i, j = rng.randint(len(pool)), rng.randint(len(pool))
                if pool.entity_id.iloc[i] == pool.entity_id.iloc[j]:
                    # best-effort nudge only: the next pool row is often
                    # ANOTHER ALIAS OF THE SAME ENTITY (alias rows are
                    # adjacent), so self-relations do occur — deliberately
                    # kept, web text contains them and oracle + engine must
                    # handle them identically (and are tested to)
                    j = (j + 1) % len(pool)
                if gap_specs and rng.uniform() < 0.3:
                    # round-4: instantiate a bounded-gap template with
                    # 1..gmax filler tokens (fires) or gmax+1 (over bound,
                    # must NOT fire) — the golden corpus exercises both
                    # sides of the bound so oracle/Spark drift would show
                    pre, gmax, post = gap_specs[rng.randint(len(gap_specs))]
                    k = 1 + rng.randint(gmax + 1)  # 1..gmax+1
                    filler = _FILLER[lang]
                    fills = tuple(
                        filler[rng.randint(len(filler))] for _ in range(k)
                    )
                    mid = " " + " ".join(pre + fills + post) + " "
                else:
                    mid = middles[rng.randint(len(middles))]
                sents.append(f"{pool.alias.iloc[i]}{mid}{pool.alias.iloc[j]}.")
            else:
                filler = _FILLER[lang]
                k = 4 + rng.randint(6)
                sents.append(" ".join(filler[rng.randint(len(filler))] for _ in range(k)) + ".")
        text = " ".join(sents)
        # skew: ~20% of urls on domain 0 (north_rule host/domain skew)
        domain = _DOMAINS[0] if rng.uniform() < 0.2 else _DOMAINS[1 + rng.randint(len(_DOMAINS) - 1)]
        url = f"https://{domain}/page/{p:07d}"
        warc_ts = t0 + dt.timedelta(seconds=int(p) * 37, microseconds=int(p) % 1000)
        html = (
            "<html><head><title>fixture</title>"
            '<script>var x = 1 < 2;</script></head>'
            f"<body><p>{text}</p></body></html>"
        ).encode("utf-8")
        rows.append((url, warc_ts, html, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
