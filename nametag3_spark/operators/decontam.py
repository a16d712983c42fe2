"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by at least one word n-gram.

This is the standard large-scale LM-pipeline operator (GPT-3 appendix C
13-gram filtering, Brown et al. 2020; Llama-2 A.6 token-level skip-gram
matching) re-expressed as Spark relational algebra. The reference
(nametag3) is a single-corpus NER trainer with no decontamination stage;
this belongs to the training-data-pipeline extension surface alongside
dedup/quality/langid (SURVEY §2 extensions).

Scale shape (the 100 TB answer): the benchmark side is an *evaluation*
set — thousands of documents, not billions — so its distinct n-gram set
is broadcast-joined against the exploded corpus n-grams (ids only, the
text never shuffles). The corpus side is a narrow scan → explode →
hash-join → partial-aggregated count per doc. No corpus self-join, no
sort; the only wide exchange is the per-doc count groupBy, keyed on
doc_id (uniform — synthetic skew impossible since each doc contributes
at most its own n-gram count). The broadcast is guarded the same way as
``linking.py``: above ``broadcast_max`` distinct benchmark n-grams the
join falls back to a shuffle join and AQE decides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(text_col: Column, n: int) -> Column:
    """Sliding word n-grams as array<string>, after lower+trim+split on
    whitespace. Documents shorter than ``n`` words contribute one
    partial (shorter) shingle — the same convention as the Jaccard
    shingler in this repo, and identical to the DuckDB twin's
    ``ws[i+1:i+n]`` slice, so the oracle hashes match on the edge."""
    w = F.split(F.lower(F.trim(text_col)), r"\s+")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(w, i + 1, n), " "),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max: int = 5_000_000,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``n``-grams
    appear anywhere in ``benchmark``, plus the keep/drop flag.

    Returns (id_col, n_grams, n_overlap, contaminated) — ``n_grams`` is
    the document's own distinct-shingle count so downstream policy can
    threshold on the overlap *fraction*, not just presence.
    """
    bench_ngrams = (
        benchmark.select(
            F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("ng")
        )
        .distinct()
    )
    # Guarded broadcast: an eval set is tiny next to the corpus, but the
    # guard keeps a mis-pointed "benchmark" from OOMing the driver.
    n_bench = bench_ngrams.count()
    if n_bench <= broadcast_max:
        bench_ngrams = F.broadcast(bench_ngrams)

    corpus_ngrams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("ng"),
    )
    overlap = (
        corpus_ngrams.join(bench_ngrams, "ng")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    per_doc = corpus.select(
        F.col(id_col),
        F.size(F.array_distinct(word_ngrams(F.col(text_col), n))).cast("long").alias(
            "n_grams"
        ),
    )
    return (
        per_doc.join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
