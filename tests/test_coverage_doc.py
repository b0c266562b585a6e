"""docs/COVERAGE.md is the auditor's map of the registry — it must never
drift from `build_queries()` again (round 4 shipped four stale names).
Two-way enforcement:

1. the auto-generated block (tools/gen_coverage.py) must list exactly the
   registry names with the right oracle flags;
2. every registry name must appear somewhere in the doc, and every name the
   narrative cites as "(oracled)" must be a real registry name.
"""

import os
import re

import pytest

DOC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "COVERAGE.md")


@pytest.fixture(scope="module")
def registry():
    from char_ner_spark.driver_queries import build_queries

    return set(build_queries())


@pytest.fixture(scope="module")
def doc_text():
    with open(DOC) as f:
        return f.read()


def test_generated_block_matches_registry(registry, doc_text):
    import tools.gen_coverage as gc

    m = re.search(re.escape(gc.BEGIN) + r"(.*?)" + re.escape(gc.END),
                  doc_text, flags=re.S)
    assert m, "COVERAGE.md is missing the generated registry block — run " \
              "python tools/gen_coverage.py"
    listed = re.findall(r"^\| \d+ \| `([a-z0-9_]+)` \|", m.group(1), flags=re.M)
    assert sorted(listed) == sorted(registry), (
        "generated block is stale — run python tools/gen_coverage.py"
    )


def test_every_registry_name_documented(registry, doc_text):
    missing = {n for n in registry if n not in doc_text}
    assert not missing, f"registry queries absent from COVERAGE.md: {sorted(missing)}"


def test_narrative_oracled_citations_are_registry_names(registry, doc_text):
    """Any `name` immediately annotated as oracled in the narrative must be
    a live registry name — the exact drift pattern round 4 shipped."""
    cited = re.findall(r"`([a-z0-9_]+)`\s*\((?:all )?oracled", doc_text)
    stale = {n for n in cited if n not in registry}
    assert not stale, f"COVERAGE.md cites non-registry names as oracled: {sorted(stale)}"
