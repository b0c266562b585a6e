"""Alias removal: exact equality with a from-scratch recompute over the
reduced dictionary, exact split detection, delta-proportional bands."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from char_ner_spark.linking import union_find_canonical

COLS = ["entity_id", "canonical_name", "alias", "lang", "prior", "ner_type"]


def _pdf(rows):
    return pd.DataFrame(
        [(e, f"E{e}", a, "en", 0.5, "ORG") for e, a in rows], columns=COLS)


@pytest.fixture(scope="module")
def tri_dict():
    # component {1,2,3}: 1-2 via "a" and "b"; 3 attached only via "c"
    return _pdf([(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
                 (3, "c"), (5, "z")])


def test_redundant_removal_no_split(spark, tri_dict):
    from char_ner_spark.pipeline import build_dictionary_state
    from char_ner_spark.removal import remove_aliases

    state = build_dictionary_state(spark, tri_dict)
    new_state, remap, splits = remove_aliases(
        spark, state, tri_dict, _pdf([(1, "b")]))
    assert splits == {}
    assert remap.count() == 0
    got = dict(new_state["canon"].toPandas()[["entity_id", "canonical_id"]]
               .itertuples(index=False))
    keep = tri_dict[~((tri_dict.entity_id == 1) & (tri_dict.alias == "b"))]
    assert got == union_find_canonical(keep)


def test_bridge_removal_splits(spark, tri_dict):
    from char_ner_spark.pipeline import build_dictionary_state
    from char_ner_spark.removal import remove_aliases

    state = build_dictionary_state(spark, tri_dict)
    new_state, remap, splits = remove_aliases(
        spark, state, tri_dict, _pdf([(2, "c")]))
    assert splits == {1: [1, 3]}
    assert {(r.old_canonical_id, r.new_canonical_id)
            for r in remap.collect()} == {(1, 3)}
    got = dict(new_state["canon"].toPandas()[["entity_id", "canonical_id"]]
               .itertuples(index=False))
    keep = tri_dict[~((tri_dict.entity_id == 2) & (tri_dict.alias == "c"))]
    assert got == union_find_canonical(keep)
    assert got[3] == 3 and got[1] == 1 and got[2] == 1


def test_last_alias_removal_keeps_entity(spark, tri_dict):
    """Removing an entity's only alias leaves it a singleton in canon."""
    from char_ner_spark.pipeline import build_dictionary_state
    from char_ner_spark.removal import remove_aliases

    state = build_dictionary_state(spark, tri_dict)
    new_state, remap, splits = remove_aliases(
        spark, state, tri_dict, _pdf([(3, "c")]))
    got = dict(new_state["canon"].toPandas()[["entity_id", "canonical_id"]]
               .itertuples(index=False))
    assert got[3] == 3
    assert splits == {1: [1, 3]}


def test_removed_bands_equal_full_rebuild(spark, tri_dict):
    from char_ner_spark.pipeline import alias_spark_tables, \
        build_dictionary_state
    from char_ner_spark.removal import remove_aliases

    state = build_dictionary_state(spark, tri_dict)
    removed = _pdf([(2, "c"), (1, "b")])
    new_state, _, _ = remove_aliases(spark, state, tri_dict, removed)
    keep = tri_dict[~(((tri_dict.entity_id == 2) & (tri_dict.alias == "c"))
                      | ((tri_dict.entity_id == 1)
                         & (tri_dict.alias == "b")))]
    full = alias_spark_tables(spark, keep)["bands"]
    key = lambda df: set(map(tuple, df.toPandas().itertuples(index=False)))
    assert key(new_state["bands"]) == key(full)


_POOL = ["acme", "globex", "initech", "umbrella", "stark", "x", "yz", ""]


@st.composite
def _dict_and_removal(draw):
    n = draw(st.integers(1, 14))
    rows = [(draw(st.integers(0, 8)), draw(st.sampled_from(_POOL)))
            for _ in range(n)]
    base = pd.DataFrame(rows, columns=["entity_id", "alias"])
    k = draw(st.integers(0, n))
    idx = draw(st.permutations(range(n)))[:k]
    removed = base.iloc[sorted(idx)]
    return base, removed


@settings(max_examples=300, deadline=None)
@given(_dict_and_removal())
def test_removal_pure_core_fuzz(dd):
    from char_ner_spark.removal import _remove_pure

    base, removed = dd
    old_map = union_find_canonical(base)
    new_map, remap_rows, splits = _remove_pure(old_map, base, removed)
    # oracle: recompute over the reduced dictionary (removal by
    # (entity, normalized alias) drops every matching row)
    from char_ner_spark.linking import normalize_surface
    rm = {(int(e), normalize_surface(a))
          for e, a in zip(removed["entity_id"], removed["alias"])}
    keep = base[[(int(e), normalize_surface(a)) not in rm
                 for e, a in zip(base["entity_id"], base["alias"])]]
    want = union_find_canonical(keep)
    for e in old_map:
        want.setdefault(e, e)  # entities never vanish
    assert new_map == want
    for old_c, pieces in splits.items():
        assert len(pieces) > 1 and old_c in pieces
    assert all(oc in splits for oc, _ in remap_rows)


def test_removal_relink_equals_full_recompute(spark, tmp_path_factory):
    """The full removal repair path: remove an alias row, re-link the
    affected parts from the mentions sink — the result must equal a
    from-scratch run over the reduced dictionary (winners may change even
    without a split, which no canonical-id remap can express)."""
    from char_ner_spark import lineage
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.incremental import relink_parts
    from char_ner_spark.linking import normalize_surface
    from char_ner_spark.pipeline import build_dictionary_state, run_pipeline
    from char_ner_spark.removal import remove_aliases, stale_canonical_ids

    alias = make_alias_table(60, seed=23)
    pages = make_pages(40, seed=23, alias_df=alias)
    out_dir = str(tmp_path_factory.mktemp("relink"))
    lineage.run_partitioned(
        spark, spark.createDataFrame(pages), alias, out_dir, n_parts=3,
        sinks=("triples", "edges", "mentions", "entities"))
    s0 = lineage.current_snapshot(out_dir)["snapshot_id"]
    before = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    present = set(before["subj"]) | set(before["obj"])
    old = union_find_canonical(alias)
    # an alias row of an entity whose component is materialized in triples
    cand = [i for i in alias.index
            if old[int(alias.loc[i, "entity_id"])] in present]
    assert cand, "fixture must materialize some dictionary component"
    removed = alias.loc[[cand[0]]]

    state = build_dictionary_state(spark, alias)
    new_state, remap, splits = remove_aliases(spark, state, alias, removed)
    stale = stale_canonical_ids(state, removed)
    rm = {(int(e), normalize_surface(a))
          for e, a in zip(removed["entity_id"], removed["alias"])}
    reduced = alias[[(int(e), normalize_surface(a)) not in rm
                     for e, a in zip(alias["entity_id"], alias["alias"])]]
    stats = relink_parts(spark, out_dir, new_state, reduced,
                         canon_ids=stale)
    assert stats.get("triples", {}).get("rewritten"), \
        "parts referencing the touched component must re-link"

    key = lambda pdf: set(
        map(tuple, pdf[["subj", "pred", "obj", "url", "sent_idx", "conf"]]
            .round({"conf": 6}).itertuples(index=False)))
    got = lineage.read_triples(spark, out_dir).drop("part_id").toPandas()
    want = run_pipeline(spark, spark.createDataFrame(pages), reduced
                        )["triples"].toPandas()
    assert key(got) == key(want)

    # edges re-aggregate to the re-linked graph
    from char_ner_spark.pipeline import edges_from_triples
    ekey = lambda pdf: {(r.src, r.dst, r.rel): round(r.weight, 6)
                        for r in pdf.itertuples()}
    got_e = lineage.read_edges(spark, out_dir).toPandas()
    want_e = edges_from_triples(
        lineage.read_triples(spark, out_dir).drop("part_id")).toPandas()
    assert ekey(got_e) == ekey(want_e)

    # entities dimension refreshed (removed-alias dictionary, new canon)
    ents = lineage.read_table(spark, out_dir, "entities").toPandas()
    want_canon = dict(new_state["canon"].toPandas()[
        ["entity_id", "canonical_id"]].itertuples(index=False))
    got_canon = dict(ents[["entity_id", "canonical_id"]]
                     .itertuples(index=False))
    assert got_canon == want_canon

    # pre-removal state still time-travels
    pinned = lineage.read_triples(spark, out_dir, snapshot_id=s0) \
        .drop("part_id").toPandas()
    assert key(pinned) == key(before)
