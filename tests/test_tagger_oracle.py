"""Tagger + textops + oracle unit tests (no Spark; SURVEY.md §5.2)."""

import numpy as np

from char_ner_spark import tagger as TG, textops as X
from char_ner_spark.fixtures import make_alias_table, make_pages
from char_ner_spark.linking import AliasIndex, union_find_canonical
from char_ner_spark.oracle import run_oracle


def test_extract_text_byte_identity_on_fixture_pages():
    pages = make_pages(30, seed=7)
    for _, row in pages.iterrows():
        assert X.extract_text(row["html"]) == row["text"]


def test_extract_text_entities_and_scripts():
    html = b"<html><head><title>x</title></head><body><script>a&b</script><p>a &amp; b &lt;c&gt;</p></body></html>"
    assert X.extract_text(html) == "a & b <c>"


def test_sentence_split_deterministic():
    assert X.split_sentences("A b. C d! E?  F") == ["A b.", "C d!", "E?", "F"]


def test_tagger_detects_planted_mentions():
    sent = "Alice Smith works for Acme Corp."
    spans = TG.tag_sentences([sent], "en")[0]
    surfaces = [sent[b:e] for b, e, _, _ in spans]
    assert surfaces == ["Alice Smith", "Acme Corp"]


def test_tagger_batch_composition_determinism():
    sent = "Alice Smith works for Acme Corp in Berlin."
    solo = TG.tag_sentences([sent], "en")[0]
    mixed = TG.tag_sentences(["x" * 80, sent, "lorem ipsum dolor."], "en")[1]
    assert solo == mixed


def test_tagger_viterbi_word_consistency():
    sent = "Bralovel works for Mnlibra."
    w = TG.model_weights("en")
    lg = TG.bilstm_logits(TG.encode_chars(sent)[None, :], w)[0] * 0.05
    lg = lg + TG.feature_bias(sent)
    is_space = np.array([c.isspace() for c in sent])
    path = TG.viterbi_path(lg, is_space, w["trans"])
    # within any word, the class never changes
    for s, e in [(0, 8), (9, 14), (15, 18), (19, 27)]:
        assert len(set(path[s:e].tolist())) == 1


def test_minhash_links_misspellings():
    alias = make_alias_table(50, seed=42)
    idx = AliasIndex(alias)
    # exact
    row = alias.iloc[0]
    hit = idx.link(row["alias"])
    assert hit is not None and hit[0] == row["entity_id"]
    # unseen misspellings (swap two letters): LSH banding is probabilistic —
    # require high aggregate recall rather than any single hit
    canon_rows = alias[alias.alias == alias.canonical_name].drop_duplicates("canonical_name")
    hits = total = 0
    for _, r in canon_rows.iterrows():
        ws = r["canonical_name"].split()
        if len(ws[0]) < 5:
            continue
        typo = ws[0][:2] + ws[0][3] + ws[0][2] + ws[0][4:]
        total += 1
        fuzzy = idx.link(" ".join([typo] + ws[1:]))
        want = set(alias[alias.canonical_name == r["canonical_name"]].entity_id)
        if fuzzy is not None and fuzzy[0] in want:
            hits += 1
    assert total >= 20
    assert hits / total >= 0.7, (hits, total)


def test_union_find_merges_duplicate_entities():
    alias = make_alias_table(50, seed=42)
    canon = union_find_canonical(alias)
    # entity 9 is a planted duplicate of entity 8 (fixtures: eid % 10 == 9)
    assert canon[9] == canon[8]
    assert all(canon[e] <= e for e in canon)


def test_oracle_end_to_end_produces_triples():
    alias = make_alias_table(80, seed=42)
    pages = make_pages(25, seed=42, alias_df=alias)
    out = run_oracle(pages, alias)
    assert len(out["text_hashes"]) == 25
    assert len(out["triples"]) > 0
    t = out["triples"]
    assert set(t.columns) == {"subj", "pred", "obj", "url", "sent_idx", "conf"}
    # subjects/objects are canonical ids
    canon = dict(zip(out["canon"].entity_id, out["canon"].canonical_id))
    assert set(t.subj).issubset(set(canon.values()))
    # deterministic: second run identical
    out2 = run_oracle(pages, alias)
    assert out["triples"].equals(out2["triples"])


def test_path_spans_equals_generic_char_spans():
    """_path_spans (int-path fast extraction) must be bitwise-equivalent to
    the generic string pipeline char_spans(text, classes) — on Viterbi-style
    word-constant paths (fast path) AND arbitrary paths (fallback path)."""
    import random

    from char_ner_spark import spans as S

    rng = random.Random(1234)
    alphabet = "ab cD  Ef.g,» \t"
    for trial in range(800):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        offs = S.word_offsets(text)
        L = len(text)
        if trial % 2 == 0:
            # word-constant (what viterbi_batch's boundary mask guarantees)
            path = [0] * L
            for s, e in offs:
                c = rng.randint(0, TG.NC - 1)
                for i in range(s, e):
                    path[i] = c
            for i in range(L):
                if text[i].isspace():
                    path[i] = rng.randint(0, TG.NC - 1)
        else:
            path = [rng.randint(0, TG.NC - 1) for _ in range(L)]
        fast = TG._path_spans(text, path, offs)
        slow = S.char_spans(text, [TG.CLASSES[k] for k in path])
        assert fast == slow, (text, path)
