"""Entity linking: mention → gazetteer candidates → canonical-ready edges.

Two tiers, per the north rule:

1. **Broadcast exact join** — the gazetteer is small (≪ executor memory
   even at millions of aliases), so ``F.broadcast`` keeps the big mentions
   side shuffle-free. Match on normalized surface (lower + NFC happens
   upstream).
2. **MinHash-LSH blocking** for fuzzy candidates — character-shingle
   MinHash signatures, banded; mentions and aliases that share a band
   bucket become candidate pairs, verified by Jaccard. Implemented with
   built-in SQL functions (``xxhash64`` with per-permutation seeds +
   ``groupBy`` on band keys), NOT a Python loop, so it scales: the
   candidate join is an equi-join on (band_idx, band_hash) that AQE can
   split on skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_HASHES = 12
N_BANDS = 4  # rows per band = N_HASHES / N_BANDS
SHINGLE_K = 3
# distinct unmatched surfaces above which the best-candidate map must NOT
# be broadcast (same role as canonicalize.BROADCAST_EDGE_LIMIT): at 10^12
# turns the unmatched-surface set (typos, novel entities) is the part of
# the data most likely to be unbounded
BROADCAST_SURFACE_LIMIT = 2_000_000


def link_exact(mentions: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """Broadcast equi-join on normalized surface; adds entity_id (nullable)."""
    gaz = F.broadcast(
        gazetteer.select(
            F.col("alias_norm"),
            F.col("entity_id"),
            F.col("entity_type"),
        )
    )
    return mentions.join(
        gaz,
        (mentions["mention_norm"] == gaz["alias_norm"])
        & (mentions["label"] == gaz["entity_type"]),
        "left",
    ).drop("alias_norm", "entity_type")


def _shingles(col: str):
    """char-3-gram shingles of a normalized string, as array<string>."""
    # sliding window via sequence + substring — stays JVM-side
    padded = F.concat(F.lit("^"), F.col(col), F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - SHINGLE_K + 1, F.lit(1))),
            lambda i: padded.substr(i, F.lit(SHINGLE_K)),
        )
    )


def minhash_signature(df: DataFrame, text_col: str, out_col: str = "sig") -> DataFrame:
    """array<bigint> MinHash signature over char shingles — pure SQL fns,
    one nested transform (see dedup.minhash_signature_expr). Two-level
    hashing: each shingle string is hashed once; the permutations mix the
    8-byte hash, not the string."""
    from nametag3_spark.operators.dedup import minhash_signature_expr

    shingled = df.withColumn("_sh", _shingles(text_col))
    hashed = F.transform(F.col("_sh"), lambda s: F.xxhash64(s))
    return shingled.withColumn(
        out_col, minhash_signature_expr(hashed, N_HASHES)
    ).drop("_sh")


def _banded(df: DataFrame, id_cols: list[str]) -> DataFrame:
    rows_per_band = N_HASHES // N_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(
                    *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(N_BANDS)
        ]
    )
    return df.select(*id_cols, F.explode(bands).alias("band")).select(
        *id_cols, F.col("band.band_idx"), F.col("band.band_hash")
    )


def lsh_candidates(
    mentions: DataFrame,
    gazetteer: DataFrame,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy mention→alias candidates via banded MinHash + Jaccard verify.

    Returns (mention_norm, entity_id, jaccard). Distinct mention surfaces
    are deduped FIRST (``groupBy mention_norm``) so head entities with
    millions of identical mentions cost one signature, not millions —
    the main skew lever at 100 TB.
    """
    distinct_mentions = mentions.select("mention_norm").distinct()
    m_sig = minhash_signature(distinct_mentions, "mention_norm")
    g_sig = minhash_signature(
        gazetteer.select("entity_id", "alias_norm").distinct(), "alias_norm"
    )

    m_bands = _banded(m_sig, ["mention_norm"])
    g_bands = _banded(g_sig, ["entity_id", "alias_norm"])

    cands = (
        m_bands.join(
            F.broadcast(g_bands), ["band_idx", "band_hash"]
        )  # gazetteer side stays broadcastable
        .select("mention_norm", "entity_id", "alias_norm")
        .distinct()
    )
    # verify with true Jaccard on shingle sets (JVM-side array ops)
    verified = (
        cands.withColumn("_ms", _shingles("mention_norm"))
        .withColumn("_as", _shingles("alias_norm"))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_ms", "_as"))
            / F.size(F.array_union("_ms", "_as")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("mention_norm", "entity_id", "jaccard")
    )
    return verified


def link_mentions(
    mentions: DataFrame,
    gazetteer: DataFrame,
    fuzzy: bool = True,
    broadcast_surface_limit: int = BROADCAST_SURFACE_LIMIT,
) -> DataFrame:
    """Exact broadcast link, then LSH fallback for unmatched surfaces.

    Output: mentions + ``entity_id`` (nullable) + ``link_method``
    (exact | lsh | null).

    The best-candidate map (one row per distinct unmatched surface) is
    broadcast only when a cheap ``approx_count_distinct`` over the
    unmatched side proves it under ``broadcast_surface_limit``; otherwise
    it joins by shuffle and AQE picks the physical strategy from runtime
    stats. Mirrors canonicalize.py's edge-bounded canonical-map guard.
    """
    exact = link_exact(mentions, gazetteer)
    if not fuzzy:
        return exact.withColumn(
            "link_method",
            F.when(F.col("entity_id").isNotNull(), F.lit("exact")),
        )
    unmatched = exact.where(F.col("entity_id").isNull()).drop("entity_id")
    matched = exact.where(F.col("entity_id").isNotNull()).withColumn(
        "link_method", F.lit("exact")
    )
    lsh = lsh_candidates(unmatched, gazetteer)
    # best candidate per surface (highest jaccard, stable tiebreak on id)
    best = (
        lsh.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("mention_norm").orderBy(
                    F.col("jaccard").desc(), F.col("entity_id")
                )
            ),
        )
        .where(F.col("_rk") == 1)
        .select("mention_norm", "entity_id")
    )
    # single-row partial aggregation — no shuffle of the data, one scan
    # (cached upstream in the pipeline) — bounds the broadcast build side
    n_unmatched = unmatched.agg(
        F.approx_count_distinct("mention_norm").alias("n")
    ).first()[0]
    if n_unmatched <= broadcast_surface_limit:
        best = F.broadcast(best)
    fuzzy_linked = unmatched.join(best, "mention_norm", "left").withColumn(
        "link_method",
        F.when(F.col("entity_id").isNotNull(), F.lit("lsh")),
    )
    return matched.unionByName(fuzzy_linked)
