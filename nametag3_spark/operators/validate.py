"""Input validation operators (SURVEY.md P10 + schema guards).

The reference rejects HTTP payloads over ``max_request_size`` (4 MiB
default, nametag3_server.py:510-518,732) and bills by total form length
(:593). Batch equivalent: split the input into (accepted, rejected) on a
per-turn byte budget and emit a metrics row set (the A4 billing-sum
pattern) — rejected rows are quarantined with a reason, never silently
dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_TURN_BYTES = 4 * 1024 * 1024  # reference default max_request_size


def validate_turns(
    transcripts: DataFrame, max_turn_bytes: int = MAX_TURN_BYTES
) -> tuple[DataFrame, DataFrame]:
    """→ (accepted, rejected-with-reason). One pass, no Python."""
    checked = transcripts.withColumn(
        "_reject_reason",
        F.when(F.col("text").isNull(), F.lit("null_text"))
        .when(F.octet_length("text") > max_turn_bytes, F.lit("oversize"))
        .when(F.col("turn_idx").isNull() | (F.col("turn_idx") < 0), F.lit("bad_turn_idx"))
        .when(F.col("conv_id").isNull(), F.lit("null_conv_id")),
    )
    accepted = checked.where(F.col("_reject_reason").isNull()).drop("_reject_reason")
    rejected = checked.where(F.col("_reject_reason").isNotNull()).withColumnRenamed(
        "_reject_reason", "reject_reason"
    )
    return accepted, rejected


def billing_metrics(transcripts: DataFrame) -> DataFrame:
    """A4: billed characters + turn counts per conversation-day."""
    return (
        transcripts.groupBy(
            F.col("conv_id"), F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.length("text")).alias("billed_chars"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
