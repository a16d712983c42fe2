"""Batch transcript ingest: JSONL / CSV / parquet → the input-contract
schema ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``, validated and de-duplicated.

The pipeline's only assumption about its input (`pipeline.py`,
`data/synth.py:TRANSCRIPT_SCHEMA`) is this column contract plus the
stable ``(conv_id, turn_idx)`` ordering invariant — this module is the
boundary that ENFORCES it for external data:

* columns are selected by NAME and cast to the contract types with
  ``try_cast`` — a malformed ``turn_idx``/``ts`` becomes NULL and the
  row lands in the quarantine, it never throws mid-scan (ANSI mode);
* rows failing the contract (NULL conv_id/turn_idx/text) split into a
  quarantine DataFrame with a ``_reason`` column — same shape as
  ``operators/validate.py``'s request quarantine;
* duplicate ``(conv_id, turn_idx)`` keys keep the LAST DELIVERY when
  ``dedup=True`` (re-delivered export chunks), via a max-by aggregation
  — one shuffle, no window sort. Delivery order = lexicographic FILE
  NAME (the documented contract: exporters name chunks in increasing
  order — part-NNNNN, date-stamped drops), with in-file row order as
  the tie-break; physical partition order is never used (Spark plans
  file partitions sorted by size, so it does not track delivery).

Scale shape: schema-on-read with explicit schema (no sampling pass —
an inference pass over 100 TB of JSONL is a full extra scan), casts
and filters are JVM-side, and the quarantine split reuses one cached
scan when the caller materializes both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_CONTRACT = (
    ("conv_id", "string"),
    ("turn_idx", "int"),
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
)
# JSONL/CSV are read as all-strings and cast EXPLICITLY below:
# try_cast semantics (malformed → NULL → quarantine) instead of the
# reader's permissive-mode row mangling
_RAW_SCHEMA = ", ".join(f"{c} string" for c, _ in _CONTRACT)


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    dedup: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Read external transcripts; returns ``(good, quarantine)``.

    ``fmt``: ``jsonl`` | ``csv`` (header row expected) | ``parquet``.
    ``good`` carries exactly the contract columns/types; ``quarantine``
    carries the raw strings plus ``_reason``."""
    if fmt == "jsonl":
        raw = spark.read.schema(_RAW_SCHEMA).json(path)
    elif fmt == "csv":
        raw = spark.read.schema(_RAW_SCHEMA).option("header", True).csv(path)
    elif fmt == "parquet":
        raw = spark.read.parquet(path)
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")

    cast = raw.select(
        *[F.col(c).try_cast(t).alias(c) for c, t in _CONTRACT]
    )
    reason = (
        F.when(F.col("conv_id").isNull(), F.lit("null_conv_id"))
        .when(F.col("turn_idx").isNull(), F.lit("bad_turn_idx"))
        .when(F.col("text").isNull(), F.lit("null_text"))
    )
    flagged = cast.withColumn("_reason", reason)
    good = flagged.where(F.col("_reason").isNull()).drop("_reason")
    quarantine = flagged.where(F.col("_reason").isNotNull())

    if dedup:
        # keep the LAST delivery of a re-exported (conv_id, turn_idx):
        # max_by over (file name, in-partition row id) — ONE hash
        # aggregate, no window sort over the corpus. The FILE NAME is
        # the delivery order (documented contract: export chunks carry
        # lexicographically increasing names — part-00001, date-stamped
        # drops, etc.), because Spark plans file-source partitions
        # sorted by SIZE descending, so a bare monotonically_increasing
        # _id tracks layout, not delivery, and which duplicate wins
        # would change with file sizes. The monotonic id only breaks
        # ties WITHIN one file (same-key rows in one chunk keep the
        # later row; approximate across a file's splits).
        ordered = good.withColumn(
            "_delivery",
            F.struct(
                F.input_file_name().alias("file"),
                F.monotonically_increasing_id().alias("seq"),
            ),
        )
        good = (
            ordered.groupBy("conv_id", "turn_idx")
            .agg(
                F.max_by(
                    F.struct(*[c for c, _ in _CONTRACT]), F.col("_delivery")
                ).alias("_row")
            )
            .select("_row.*")
        )
    return good, quarantine
