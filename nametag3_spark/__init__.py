"""nametag3_spark — a from-scratch PySpark-native knowledge-graph construction engine.

Re-expresses the query & data-processing capabilities of ufal/nametag3
(reference snapshot at /root/reference, studied in SURVEY.md) as an
idiomatic Spark pipeline:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → tokenize (NFC + truecase + word split)          [vectorized pandas UDF]
      → window-pack per conversation                    [applyInPandas]
      → score (pluggable: oracle gazetteer / HF model)  [mapInPandas]
      → decode nested spans (one shared automaton)      [pandas UDF]
      → mentions → (subj, pred, obj) triples            [DataFrame ops]
      → entity linking (broadcast gazetteer + MinHash-LSH blocking)
      → canonicalization (iterative connected components)
      → SPO tables with per-partition lineage/metrics, snapshot-resumable.

Everything relational (joins, aggregations, eval metrics, sampling,
dedup, similarity) stays in built-in pyspark.sql functions so Catalyst
optimizes it; Python appears only in vectorized Arrow-batched UDFs.
"""

__version__ = "0.1.0"
