"""Drive the full Spark KG pipeline on the fixture corpus and diff against
the single-process oracle. Prints triple precision/recall (target: 1.0)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd


def main(n_pages: int = 60, n_entities: int = 120) -> int:
    from char_ner_spark.fixtures import make_alias_table, make_pages
    from char_ner_spark.oracle import run_oracle
    from char_ner_spark.pipeline import run_pipeline
    from char_ner_spark.session import build_session

    alias = make_alias_table(n_entities, seed=42)
    pages_pdf = make_pages(n_pages, seed=42, alias_df=alias)

    spark = build_session("pipeline_demo", master="local[8]")
    pages = spark.createDataFrame(pages_pdf)
    out = run_pipeline(spark, pages, alias)

    spark_triples = out["triples"].toPandas()
    spark_hashes = out["extracted"].select("url", "sha256").toPandas()

    gold = run_oracle(pages_pdf, alias)

    # byte-identity per url
    gh = dict(zip(gold["text_hashes"].url, gold["text_hashes"].sha256))
    mismatch = [u for u, h in zip(spark_hashes.url, spark_hashes.sha256) if gh.get(u) != h]
    print(f"text byte-identity: {len(spark_hashes) - len(mismatch)}/{len(spark_hashes)} urls match")

    key = ["subj", "pred", "obj", "url", "sent_idx"]
    sp = set(map(tuple, spark_triples[key].itertuples(index=False)))
    go = set(map(tuple, gold["triples"][key].itertuples(index=False)))
    tp = len(sp & go)
    prec = tp / len(sp) if sp else 1.0
    rec = tp / len(go) if go else 1.0
    print(f"triples: spark={len(sp)} oracle={len(go)} P={prec:.4f} R={rec:.4f}")
    if prec < 1.0 or rec < 1.0:
        print("spark-only:", sorted(sp - go)[:5])
        print("oracle-only:", sorted(go - sp)[:5])
    # conf value parity
    sc = spark_triples.set_index(key)["conf"].to_dict()
    oc = gold["triples"].set_index(key)["conf"].to_dict()
    conf_diff = [k for k in sc if k in oc and abs(sc[k] - oc[k]) > 1e-9]
    print(f"conf exact-match: {len(sc) - len(conf_diff)}/{len(sc)}")
    spark.stop()
    ok = not mismatch and prec >= 0.95 and rec >= 0.95 and not conf_diff
    print("RESULT:", "OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    raise SystemExit(main(n))
