"""char_ner_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-architecture of the capabilities of the public
``ozanarkancan/char-ner`` repo (character-level BiLSTM NER, COLING 2016)
as a web-scale Spark dataflow per BASELINE.json north_rule:

    pages(url, warc_ts, html, text, lang)
      → extract_text (byte-identical per url)
      → char-tensor BiLSTM + Viterbi mention detection (Arrow UDFs)
      → alias linking (broadcast dict + char-ngram MinHash LSH)
      → entity canonicalization (connected components)
      → (subj, pred, obj) triples + entity/edge graph
      → Iceberg-style partitioned parquet, per-partition lineage/resume

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the published CharNER paper. The module layout mirrors
SURVEY.md §7's build plan.
"""

__version__ = "0.1.0"
