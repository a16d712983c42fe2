"""Corpus-level sequence packing for LM pretraining: concat-and-chunk.

GPT-style pretraining concatenates documents (within a shard) and slices
the token stream into fixed-budget training blocks; every packer since
GPT-2 (and the block-diagonal-attention refinements) starts from this
layout. This operator computes, per document, WHERE its tokens land:
shard, stream offset, and the first/last chunk indices — the metadata a
downstream tokenizer-writer consumes to emit packed examples without
ever materializing the concatenated stream on one machine.

The reference (nametag3) packs sentence windows per request
(`operators/encode.py` mirrors nametag3_dataset.py); this is the
corpus-scale sibling on the training-data-pipeline extension surface.

Scale shape: documents hash into ``n_shards`` uniform shards (portable
Knuth multiplicative hash — DuckDB reproduces it, and shard membership
is independent of cluster size); within a shard the order is
(hash, id) — deterministic, seed-free, cluster-size-invariant. The only
wide operation is one window cumsum PER SHARD; shards bound window-state
skew (pick n_shards ≈ corpus_tokens / 10^8 at 100 TB so each window
partition stays executor-sized). No self-join, no collect; the window
is the plan's single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nametag3_spark.operators.similarity import (
    PORTABLE_SAMPLE_A,
    PORTABLE_SAMPLE_M,
)


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: (id, shard, n_tokens, start_tok, first_chunk,
    last_chunk, spans_boundary) under concat-and-chunk packing with
    ``budget`` tokens per training block, independently per shard.

    ``spans_boundary`` marks documents sliced across two-or-more blocks
    (the fraction downstream loss-masking policies care about).
    Token counts use the whitespace tokenizer (`textstats.token_count`
    convention) — swap in real tokenizer lengths upstream by providing a
    pre-computed ``n_tokens`` column named anything and aliasing it to
    ``text_col``'s count via a select before calling.
    """
    h = F.pmod(F.col(id_col) * F.lit(PORTABLE_SAMPLE_A), F.lit(PORTABLE_SAMPLE_M))
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    base = docs.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("_h"),
        n_tok.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    out = base.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        start,
    )
    first = F.floor(F.col("start_tok") / budget)
    last = F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / budget)
    return out.select(
        F.col(id_col),
        "shard",
        "n_tokens",
        "start_tok",
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last > first).alias("spans_boundary"),
    )
