"""Single-process reference pipeline (the golden oracle, SURVEY.md §5.2).

Runs the exact same pure functions as the Spark pipeline — textops, tagger,
linking, relations — over pandas, producing gold text hashes, mentions, and
triples. The driver's P/R ≥ 0.95 and byte-identity checks compare the Spark
pipeline's output against this module's (FIXTURES.md §3).
"""

from __future__ import annotations

import pandas as pd

from . import relations, textops
from .linking import AliasIndex, union_find_canonical
from .tagger import tag_sentences


def run_oracle(pages: pd.DataFrame, alias_df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """pages(url, warc_ts, html, text, lang) → gold outputs."""
    index = AliasIndex(alias_df)
    canon = union_find_canonical(alias_df)

    hashes = []
    mention_rows = []
    triple_rows = []
    for _, page in pages.iterrows():
        text = textops.extract_text(page["html"])
        hashes.append((page["url"], textops.sha256_text(text)))
        sents = textops.split_sentences(text)
        tagged = tag_sentences(sents, page["lang"])
        for sent_idx, (sent, spans) in enumerate(zip(sents, tagged)):
            linked: list[tuple[int, int, int, float]] = []
            for b, e, ner_type, score in spans:
                surface = sent[b:e]
                mention_rows.append(
                    (page["url"], sent_idx, b, e, surface, ner_type, score, page["lang"])
                )
                hit = index.link(surface)
                if hit is not None:
                    linked.append((b, e, hit[0], hit[1]))
            for subj, pred, obj, conf in relations.extract_sentence_triples(
                sent, linked, page["lang"]
            ):
                triple_rows.append(
                    (canon.get(subj, subj), pred, canon.get(obj, obj),
                     page["url"], sent_idx, conf)
                )

    return {
        "text_hashes": pd.DataFrame(hashes, columns=["url", "sha256"]),
        "mentions": pd.DataFrame(
            mention_rows,
            columns=["url", "sent_idx", "begin", "end", "surface", "ner_type", "score", "lang"],
        ),
        "triples": pd.DataFrame(
            triple_rows, columns=["subj", "pred", "obj", "url", "sent_idx", "conf"]
        ).drop_duplicates().reset_index(drop=True),
        "canon": pd.DataFrame(
            sorted(canon.items()), columns=["entity_id", "canonical_id"]
        ),
    }
