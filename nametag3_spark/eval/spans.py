"""Evaluation operators as DataFrame queries (SURVEY.md §2.5 A1-A3, A7-A8).

The reference shells out to external Perl/Python scripts
(run_conlleval.sh, compare_nested_entities.py,
compare_ne_outputs_v3_corrected.pl); here each metric is a distributed
aggregation over span tables, so evaluation scales with the data instead
of being a driver-side subprocess.

Span tables have columns (doc-ish keys..., start_tok, end_tok, label).
All functions take explicit key columns so they work for both the
transcript pipeline (conv_id, turn_idx) and CoNLL corpora (doc_id,
sent_idx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_KEYS = ["conv_id", "turn_idx", "start_tok", "end_tok", "label"]


def multiset_span_counts(spans: DataFrame, keys: list[str]) -> DataFrame:
    return spans.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def span_prf(
    system: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Strict span multiset P/R/F1 — compare_nested_entities.py:45-53 as
    one aggregation: groupBy counts on both sides, full outer join,
    sum(least(gold_n, sys_n))."""
    keys = keys or DEFAULT_KEYS
    sys_counts = multiset_span_counts(system, keys).withColumnRenamed("n", "n_sys")
    gold_counts = multiset_span_counts(gold, keys).withColumnRenamed("n", "n_gold")
    joined = sys_counts.join(gold_counts, keys, "full")
    agg = joined.agg(
        F.sum(
            F.least(F.coalesce("n_sys", F.lit(0)), F.coalesce("n_gold", F.lit(0)))
        ).alias("correct"),
        F.sum(F.coalesce("n_sys", F.lit(0))).alias("retrieved"),
        F.sum(F.coalesce("n_gold", F.lit(0))).alias("gold"),
    )
    return agg.select(
        "correct",
        "retrieved",
        "gold",
        (F.col("correct") / F.col("retrieved")).alias("precision"),
        (F.col("correct") / F.col("gold")).alias("recall"),
        (
            2
            * F.col("correct")
            / F.col("retrieved")
            * (F.col("correct") / F.col("gold"))
            / ((F.col("correct") / F.col("retrieved")) + (F.col("correct") / F.col("gold")))
        ).alias("f1"),
    )


def per_type_prf(
    system: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """conlleval-style per-type span P/R/F1 (+ micro rollup row with NULL
    label, the grouping-sets candidate from SURVEY.md A7/A8)."""
    keys = keys or DEFAULT_KEYS
    assert "label" in keys
    sys_counts = multiset_span_counts(system, keys).withColumnRenamed("n", "n_sys")
    gold_counts = multiset_span_counts(gold, keys).withColumnRenamed("n", "n_gold")
    joined = sys_counts.join(gold_counts, keys, "full")
    per_label = joined.rollup("label").agg(
        F.sum(
            F.least(F.coalesce("n_sys", F.lit(0)), F.coalesce("n_gold", F.lit(0)))
        ).alias("correct"),
        F.sum(F.coalesce("n_sys", F.lit(0))).alias("retrieved"),
        F.sum(F.coalesce("n_gold", F.lit(0))).alias("gold"),
    )
    return per_label.select(
        "label",
        "correct",
        "retrieved",
        "gold",
        F.when(F.col("retrieved") > 0, F.col("correct") / F.col("retrieved"))
        .otherwise(F.lit(0.0))
        .alias("precision"),
        F.when(F.col("gold") > 0, F.col("correct") / F.col("gold"))
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )


def macro_avg_f1(per_corpus_prf: DataFrame, f1_col: str = "f1") -> DataFrame:
    """Macro-average over corpora (nametag3.py:290-291, A2)."""
    return per_corpus_prf.agg(F.avg(f1_col).alias("macro_avg_f1"))


def per_type_and_length_prf(
    system: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """CNEC-official-style breakdown (A7): P/R counts cubed over
    (label, span-length class), where the length class is the eval
    script's oneword/twoword/multiword split
    (compare_ne_outputs_v3_corrected.pl:280-345)."""
    keys = keys or DEFAULT_KEYS
    length_class = (
        F.when(F.col("end_tok") == F.col("start_tok"), F.lit("oneword"))
        .when(F.col("end_tok") == F.col("start_tok") + 1, F.lit("twoword"))
        .otherwise(F.lit("multiword"))
    )
    sys_counts = (
        system.withColumn("len_class", length_class)
        .groupBy(*keys, "len_class")
        .agg(F.count(F.lit(1)).alias("n_sys"))
    )
    gold_counts = (
        gold.withColumn("len_class", length_class)
        .groupBy(*keys, "len_class")
        .agg(F.count(F.lit(1)).alias("n_gold"))
    )
    joined = sys_counts.join(gold_counts, [*keys, "len_class"], "full")
    return joined.cube("label", "len_class").agg(
        F.sum(
            F.least(F.coalesce("n_sys", F.lit(0)), F.coalesce("n_gold", F.lit(0)))
        ).alias("correct"),
        F.sum(F.coalesce("n_sys", F.lit(0))).alias("retrieved"),
        F.sum(F.coalesce("n_gold", F.lit(0))).alias("gold"),
    )


def cnec_eval(
    system: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """CNEC official eval's three-level breakdown as one DataFrame —
    Type, Suptype, Span rows (compare_ne_outputs_v3_corrected.pl:
    read_ne dedups (span, class) pairs; suptype = first character of the
    class, deduped per span (get_subtypes, :127-131); span = the span key
    regardless of class; counts :236-305).

    Output rows: (metric, gold_n, retrieved, correct_retrieved,
    precision, recall, f1) for metric ∈ {type, suptype, span}.
    """
    keys = keys or DEFAULT_KEYS
    span_keys = [k for k in keys if k != "label"]
    sys_tl = system.select(*span_keys, "label").distinct()
    gold_tl = gold.select(*span_keys, "label").distinct()

    def metric_row(name: str, s: DataFrame, g: DataFrame, join_keys: list[str]) -> DataFrame:
        counts = (
            s.agg(F.count(F.lit(1)).alias("retrieved"))
            .crossJoin(g.agg(F.count(F.lit(1)).alias("gold_n")))
            .crossJoin(
                s.join(g, join_keys).agg(
                    F.count(F.lit(1)).alias("correct_retrieved")
                )
            )
        )
        p = F.when(
            F.col("retrieved") > 0, F.col("correct_retrieved") / F.col("retrieved")
        ).otherwise(F.lit(0.0))
        r = F.when(
            F.col("gold_n") > 0, F.col("correct_retrieved") / F.col("gold_n")
        ).otherwise(F.lit(0.0))
        return counts.select(
            F.lit(name).alias("metric"),
            "gold_n",
            "retrieved",
            "correct_retrieved",
            p.alias("precision"),
            r.alias("recall"),
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)).alias("f1"),
        )

    sup = F.substring(F.col("label"), 1, 1).alias("sup")
    sys_sup = sys_tl.select(*span_keys, sup).distinct()
    gold_sup = gold_tl.select(*span_keys, sup).distinct()
    sys_sp = sys_tl.select(*span_keys).distinct()
    gold_sp = gold_tl.select(*span_keys).distinct()

    return (
        metric_row("type", sys_tl, gold_tl, [*span_keys, "label"])
        .unionByName(metric_row("suptype", sys_sup, gold_sup, [*span_keys, "sup"]))
        .unionByName(metric_row("span", sys_sp, gold_sp, span_keys))
    )


def token_accuracy(
    system_tokens: DataFrame,
    gold_tokens: DataFrame,
    keys: list[str] | None = None,
    label_col: str = "label",
) -> DataFrame:
    """conlleval's token-level accuracy row (the reference parses
    'accuracy:' from run_conlleval.sh output, nametag3_dataset.py:569-574):
    fraction of tokens whose system label equals the gold label. Inner
    join on the token keys — conlleval assumes the same token stream on
    both sides."""
    keys = keys or ["conv_id", "turn_idx", "token_idx"]
    s = system_tokens.select(*keys, F.col(label_col).alias("_sys_label"))
    g = gold_tokens.select(*keys, F.col(label_col).alias("_gold_label"))
    return s.join(g, keys).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            (F.col("_sys_label") == F.col("_gold_label")).cast("long")
        ).alias("n_correct"),
        F.avg(
            (F.col("_sys_label") == F.col("_gold_label")).cast("double")
        ).alias("accuracy"),
    )


def confusion_matrix(
    system: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Type confusion over boundary-matching spans: inner-join system and
    gold on the SPAN keys (without label) → count (gold_label,
    sys_label) pairs — the CNEC eval's confusion table."""
    keys = [k for k in (keys or DEFAULT_KEYS) if k != "label"]
    s = system.select(*keys, F.col("label").alias("sys_label"))
    g = gold.select(*keys, F.col("label").alias("gold_label"))
    return (
        s.join(g, keys)
        .groupBy("gold_label", "sys_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
