"""Training-time sampling operators (SURVEY.md §2.10 R1-R4, A5).

The reference's WeightedRandomSamplerFromDatasets draws dataset indices
from a multinomial over per-corpus weights, with four weighting schemes
(nametag3_dataset_collection.py:30-99,196-221). Spark mapping: compute the
per-corpus fraction dict on the driver (tiny groupBy), then ``sampleBy``
with a fixed seed — the shuffle-free stratified sample. Upsampling of
small corpora (the reference's replacement loop) = union of
``sample(withReplacement=True)`` draws.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_weights(
    df: DataFrame,
    corpus_col: str = "corpus",
    scheme: str = "proportional",
    temperature: float = 2.0,
) -> dict[str, float]:
    """Per-corpus sampling weights, normalized to sum 1.

    Schemes (nametag3_dataset_collection.py:196-221):
      proportional — w ∝ corpus size
      uniform      — equal
      temperature_logits — softmax(size / T)
      temperature_probs  — (size ** (1/T)) normalized
    """
    counts = {
        r[corpus_col]: r["n"]
        for r in df.groupBy(corpus_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if scheme == "proportional":
        raw = dict(counts)
    elif scheme == "uniform":
        raw = {k: 1.0 for k in counts}
    elif scheme == "temperature_logits":
        m = max(counts.values())
        raw = {k: math.exp((v - m) / temperature) for k, v in counts.items()}
    elif scheme == "temperature_probs":
        raw = {k: v ** (1.0 / temperature) for k, v in counts.items()}
    else:
        raise ValueError(f"unknown scheme: {scheme}")
    total = sum(raw.values())
    return {k: v / total for k, v in raw.items()}


def stratified_sample(
    df: DataFrame,
    target_rows: int,
    corpus_col: str = "corpus",
    scheme: str = "proportional",
    temperature: float = 2.0,
    seed: int = 42,
) -> DataFrame:
    """Draw ~target_rows with per-corpus weights; small corpora are
    upsampled WITH replacement when their quota exceeds their size (the
    reference's upsampling loop, nametag3_dataset_collection.py:60-84)."""
    counts = {
        r[corpus_col]: r["n"]
        for r in df.groupBy(corpus_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weights = corpus_weights(df, corpus_col, scheme, temperature)
    parts = []
    for corpus, w in sorted(weights.items()):
        quota = target_rows * w
        frac = quota / counts[corpus]
        sub = df.where(F.col(corpus_col) == corpus)
        if frac <= 1.0:
            parts.append(sub.sample(withReplacement=False, fraction=frac, seed=seed))
        else:
            parts.append(sub.sample(withReplacement=True, fraction=frac, seed=seed))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # global shuffle with a seeded order (R1's final permutation)
    return out.orderBy(F.rand(seed))


def subword_masking(
    df: DataFrame, col: str, prob: float, mask_value, seed: int = 42
) -> DataFrame:
    """R3: replace a column's value with ``mask_value`` w.p. ``prob``."""
    return df.withColumn(
        col,
        F.when(F.rand(seed) < prob, F.lit(mask_value)).otherwise(F.col(col)),
    )
