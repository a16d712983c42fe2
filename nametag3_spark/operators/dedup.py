"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash-LSH, SimHash, and n-gram-Jaccard near-dup — all over a
``documents(doc_id, text, ...)`` table, all built from JVM-side SQL
functions (no Python in the hot path):

* exact: hash-groupBy on the normalized text; keeps min doc_id.
* MinHash-LSH: word-shingle signatures via ``xxhash64`` with per-
  permutation salts, banded; doc pairs sharing a band bucket are
  candidates, verified by true shingle Jaccard. One shuffle on band keys.
* SimHash: 64-bit sign-aggregated token hashes; near-dups = identical
  simhash prefix buckets (Hamming verification on candidates).
* n-gram Jaccard: direct verified similarity for candidate pairs.

At 100 TB the LSH path is the scale path: signatures are computed in one
projection pass, the band join is an equi-join AQE can split on skew, and
verification touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def _word_shingles(col: str = "text", k: int = 3):
    """k-word shingles as array<string> (distinct)."""
    words = F.split(F.lower(F.col(col)), r"\s+")
    n = F.size(words)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the min id per identical normalized text.

    groupBy on a 64-bit content hash first (cheap shuffle key), then the
    full text inside the group to be collision-safe.
    """
    normalized = F.lower(F.trim(F.col(text_col)))
    return (
        docs.withColumn("_content_hash", F.xxhash64(normalized))
        .groupBy("_content_hash", normalized.alias("_norm_text"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def minhash_signature_expr(col, n_hashes: int = N_HASHES):
    """MinHash signature as ONE nested expression:
    ``transform(0..n-1, p -> array_min(transform(sh, s -> xxhash64(s, p))))``.
    A flat ``array(min0, min1, …)`` of n separate subtrees codegens to an
    n×-bigger method — this form compiles ~n× faster and runs the same.
    (The inner lambda takes ONE arg on purpose: 2-arg F.transform lambdas
    mean (element, index), which would rebind the permutation id.)"""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda p: F.array_min(F.transform(col, lambda s: F.xxhash64(s, p))),
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    sig = minhash_signature_expr(F.col("_sh"))
    return (
        docs.withColumn("_sh", _word_shingles(text_col, k))
        .where(F.size("_sh") > 0)
        .select(F.col(id_col), F.col("_sh"), sig.alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    k: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded MinHash.

    Candidate generation: explode each doc into N_BANDS (band_idx,
    band_hash) keys; self-join on the band key. Verification: true Jaccard
    on shingle sets, computed only for candidates.
    """
    sigs = minhash_signatures(docs, id_col, text_col, k)
    bands = sigs.select(
        F.col(id_col),
        F.col("_sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            *[F.col("sig")[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)]
                        ).alias("band_hash"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "_sh", "band.band_idx", "band.band_hash")

    left = bands.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col(id_col).alias("id_a"),
        F.col("_sh").alias("_sh_a"),
    )
    right = bands.select(
        F.col("band_idx"),
        F.col("band_hash"),
        F.col(id_col).alias("id_b"),
        F.col("_sh").alias("_sh_b"),
    )
    cands = (
        left.join(right, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sh_a", "_sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token hashes per bit.

    Bitwise majority via aggregate over words — stays in SQL expressions.
    """
    # One compact expression instead of 64 separate aggregate subtrees
    # (the expanded form codegens a 64×-bigger method and dominates the
    # query's compile time). Per bit b: majority sign of word-hash bit b.
    sim = F.expr(
        f"""
        aggregate(
          transform(sequence(0, 63), b ->
            if(aggregate(array_distinct(split(lower({text_col}), '\\\\s+')),
                         0,
                         (acc, w) -> acc + if((shiftright(xxhash64(w), b) & 1) = 1, 1, -1)
               ) > 0,
               shiftleft(1L, b), 0L)),
          0L, (acc, v) -> acc | v)
        """
    )
    return docs.select(F.col(id_col), sim.alias("simhash"))


def simhash_buckets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix_bits: int = 16
) -> DataFrame:
    """Docs sharing a simhash prefix bucket (near-dup candidates)."""
    sh = simhash(docs, id_col, text_col)
    bucket = F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    return sh.select(id_col, "simhash", bucket.alias("bucket"))


def ngram_jaccard_pairs(
    docs_a: DataFrame,
    docs_b: DataFrame,
    join_keys: list[str],
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Verified k-gram Jaccard for already-blocked pairs (equi-join on
    ``join_keys``)."""
    a = docs_a.withColumn("_sh_a", _word_shingles(text_col, k)).drop(text_col)
    b = docs_b.withColumn("_sh_b", _word_shingles(text_col, k)).drop(text_col)
    return a.join(b, join_keys).withColumn(
        "jaccard",
        F.when(
            F.size(F.array_union("_sh_a", "_sh_b")) > 0,
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        ).otherwise(F.lit(0.0)),
    )
