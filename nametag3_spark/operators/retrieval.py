"""BM25 ranked retrieval over a document corpus.

The training-data pipeline's search primitive: given a bag of query
terms, rank documents by Okapi BM25 — the lexical complement of the
embedding ANN path (`similarity.py`). A KG builder uses it to pull
candidate evidence documents for an entity surface before linking
(the reference stops at per-sentence entities, `nametag3_server.py:
278-320`; retrieval is what a downstream KG/RAG consumer runs next).

Spark-first scale shape (100 TB corpus, ~10 query terms):

* ONE scan of the corpus computes both the per-doc length and the
  exploded token stream; the query-term filter is an ``isin`` In-list
  Catalyst pushes below the explode's shuffle boundary, so only
  matching (doc, term) rows — |terms| * doc-frequency, not the corpus
  token count — ever shuffle;
* term statistics (document frequency) aggregate map-side first; the
  df table is ≤ |query terms| rows and broadcasts onto the tf table;
* the global top-k is ``orderBy(...).limit(k)`` — Spark plans
  TakeOrderedAndProject (per-partition heaps + driver merge of k
  rows), never a full sort;
* scores are fixed-point BIGINT micro-units: each per-term
  contribution rounds to 6 decimals before an INTEGER sum, so the
  aggregation is exact and order-independent — bit-identical across
  engines and partitionings (float summation order can never flip a
  rank or a hash).

IDF uses the Lucene/BM25+ form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
(always positive, robust to df > N/2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TOKEN_SEP = "[^a-z0-9]+"


def _tokens(text_col: F.Column) -> F.Column:
    """Lowercased alphanumeric tokens; the same expression DuckDB
    writes as ``list_filter(string_split_regex(lower(trim(x)),
    '[^a-z0-9]+'), t -> t <> '')`` — the character class is
    engine-identical (no escapes, no unicode classes)."""
    return F.filter(
        F.split(F.lower(F.trim(text_col)), _TOKEN_SEP),
        lambda t: t != "",
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for one query (a bag of lowercase terms) by
    BM25. Returns ``(doc_id, n_terms_hit, score_micro, rank)`` —
    ``score_micro`` = BM25 score in parts-per-million fixed point
    (BIGINT), rank 1-based dense on (score desc, doc_id asc).

    Duplicate query terms are deduplicated (standard bag-of-words BM25
    scores each distinct term once per document).
    """
    terms = sorted({t.lower() for t in query_terms})
    if not terms:
        raise ValueError("empty query")
    if k < 1:
        raise ValueError("k must be >= 1")

    toks = docs.select(
        F.col(id_col),
        _tokens(F.col(text_col)).alias("toks"),
    ).select(
        F.col(id_col),
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    )
    tf = (
        toks.where(F.col("term").isin(terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )

    # two exact driver scalars (one tiny job): corpus size and total
    # token count — avgdl = exact-int / exact-int, one double divide,
    # identical in any engine
    totals = docs.select(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(
            F.sum(F.size(_tokens(F.col(text_col)))).cast("long"), F.lit(0)
        ).alias("tok"),
    ).first()
    n_docs, avgdl = int(totals["n"]), float(totals["tok"]) / float(
        totals["n"] or 1
    )

    contrib = (
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    scored = (
        tf.join(dfreq, "term")  # df table ≤ |terms| rows: broadcasts
        .select(
            F.col(id_col),
            F.round(contrib * F.lit(1_000_000.0), 0)
            .cast("long")
            .alias("c_micro"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.sum("c_micro").cast("long").alias("score_micro"),
        )
    )
    top = (
        scored.orderBy(F.desc("score_micro"), F.asc(id_col))
        .limit(k)  # TakeOrderedAndProject — never a full sort
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("score_micro"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "n_terms_hit", "score_micro", "rank"
    )
