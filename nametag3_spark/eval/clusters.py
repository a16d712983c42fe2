"""Pairwise clustering metrics for entity canonicalization quality.

The north-rule pipeline canonicalizes linked mentions with an iterative
connected-components merge (`operators/canonicalize.py`); this module
measures HOW WELL a predicted clustering matches a gold one — the
standard entity-resolution evaluation (pairwise precision / recall /
F1 over co-clustered item pairs), the metric the reference's span-level
P/R gate (`nametag3.py:253-284` eval flow) plays for NER spans.

Spark-first scale shape: the naive definition enumerates all
co-clustered pairs — O(Σ n_c²), catastrophic at 10^12 mentions with
hot entities. The counting identity avoids materializing ANY pair:

    true-positive pairs  = Σ over (pred, gold) CELLS      C(n_cell, 2)
    predicted pairs      = Σ over pred clusters           C(n_pred, 2)
    gold pairs           = Σ over gold clusters           C(n_gold, 2)

so the whole metric is three hash aggregations over the assignment
table (map-side partial combine, one shuffle each on a different key —
Catalyst runs them as independent stages off one scan). Ratios are
emitted as BIGINT parts-per-million fixed-point (the `kg_conflicts`
convention): cross-engine hash comparison stays exact, no float drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_cluster_metrics(
    assignments: DataFrame,
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """Pairwise P/R/F1 of a predicted clustering against gold.

    ``assignments``: one row per item carrying its predicted and gold
    cluster ids (any type; NULL ids are dropped — an unclustered item
    contributes no pairs). Duplicate item rows count as distinct items
    by design: the caller owns item identity.

    Returns ONE row: ``tp_pairs, pred_pairs, gold_pairs,
    precision_ppm, recall_ppm, f1_ppm`` — all BIGINT. Empty (or
    pair-free) sides yield 0 ppm rather than NULL/NaN, so the row is
    always well-formed for downstream gating.
    """

    def _pair_sum(df: DataFrame, keys: list[str]) -> DataFrame:
        # Σ C(n,2) per group, one hash aggregate with map-side
        # partials; DIV keeps everything BIGINT (float division would
        # cast back differently across engines: Spark truncates,
        # DuckDB rounds)
        return (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.expr("n * (n - 1) DIV 2")).cast("long"),
                    F.lit(0).cast("long"),
                ).alias("pairs")
            )
        )

    a = assignments.select(
        F.col(pred_col).alias("p"), F.col(gold_col).alias("g")
    ).where(F.col(pred_col).isNotNull() & F.col(gold_col).isNotNull())

    tp = _pair_sum(a, ["p", "g"]).withColumnRenamed("pairs", "tp_pairs")
    pp = _pair_sum(a, ["p"]).withColumnRenamed("pairs", "pred_pairs")
    gp = _pair_sum(a, ["g"]).withColumnRenamed("pairs", "gold_pairs")

    # three 1-row frames — the crossJoins are trivially broadcast;
    # all ratios use integer DIV (Spark) == // (DuckDB) on positives:
    # exact, no float cast whose rounding differs across engines
    out = tp.crossJoin(pp).crossJoin(gp)
    prec = F.when(
        F.col("pred_pairs") > 0,
        F.expr("tp_pairs * 1000000 DIV pred_pairs").cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    rec = F.when(
        F.col("gold_pairs") > 0,
        F.expr("tp_pairs * 1000000 DIV gold_pairs").cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out = out.withColumn("precision_ppm", prec).withColumn(
        "recall_ppm", rec
    )
    # harmonic mean in ppm space, same integer division
    f1 = F.when(
        (F.col("precision_ppm") + F.col("recall_ppm")) > 0,
        F.expr(
            "2 * precision_ppm * recall_ppm "
            "DIV (precision_ppm + recall_ppm)"
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return out.withColumn("f1_ppm", f1).select(
        "tp_pairs",
        "pred_pairs",
        "gold_pairs",
        "precision_ppm",
        "recall_ppm",
        "f1_ppm",
    )
