"""Temporal KG materialization: SCD2 interval facts, as-of snapshots,
and truth-discovery conflict resolution over an assertion log.

The reference emits point-in-time entity assertions (one prediction run
over one input — nametag3.py:282-309; the server re-runs per request,
nametag3_server.py:423-610). A KG *store* built from a 10^12-turn
transcript history sees the same (subject, predicate) asserted again
and again with changing objects, and downstream consumers need three
things the reference never had to provide:

* ``scd2_intervals`` — the slowly-changing-dimension (type 2) compaction
  of an assertion log: consecutive re-assertions of the same value
  collapse into one validity interval ``[valid_from, valid_to)``, the
  open interval is the current fact. This is the standard warehouse
  answer to "what did the KG believe, and when".
* ``asof_facts`` — the point-in-time snapshot over those intervals
  (the time-travel read an evaluator replaying a conversation needs).
* ``resolve_conflicts`` — fixed-point truth discovery (TruthFinder-style,
  Yin et al. 2008, simplified to a FIXED iteration count): when multiple
  sources assert different objects for one (subject, predicate), iterate
  source-trust <-> claim-confidence and keep the argmax object. All
  arithmetic is INTEGER ppm (parts-per-million, BIGINT) — integer sums
  are associative, so Spark and any independent engine (DuckDB oracle)
  agree bit-for-bit regardless of aggregation order, the same trick the
  eval ppm metrics use.

Scale shape (100 TB): every operator here is shuffle-minimal by
construction. ``scd2_intervals`` partitions once by the fact key and
runs BOTH its windows and its groupBy on that same partitioning —
Catalyst plans a single Exchange and reuses the sort. ``asof_facts`` is
a pure filter (predicate-pushdown-able to the interval table's scan).
``resolve_conflicts`` is iterated groupBy-aggregations over claims —
map-side partial aggregation applies, no windows in the loop, and the
per-iteration state (source trust) is a SMALL dimension (|sources| <<
|claims|) joined back broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def scd2_intervals(
    assertions: DataFrame,
    keys: list[str],
    value_col: str = "obj",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assertion log → SCD2 validity intervals.

    Per fact key (``keys``), assertions are ordered by ``ts_col`` (plus
    ``order_cols`` as the deterministic tiebreak for same-timestamp
    re-assertions); consecutive runs of the SAME value collapse to one
    row with ``valid_from`` = first assertion ts, ``valid_to`` = the
    next DIFFERENT value's first ts (NULL for the open/current fact),
    ``is_current`` flagging the open interval.

    One shuffle: change-flagging (lag), island numbering (running sum),
    island aggregation (groupBy) and interval chaining (lead) all use
    the identical ``keys`` partitioning, so Catalyst emits a single
    Exchange and the groupBy rides the window's sort.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    flagged = assertions.withColumn(
        "_chg",
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            1,
        ).otherwise(0),
    ).withColumn("_island", F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    # within an island the value is constant by construction of the
    # change flag; min() is the order-independent way to read it out
    islands = flagged.groupBy(*keys, "_island").agg(
        F.min(ts_col).alias("valid_from"),
        F.min(value_col).alias(value_col),
        F.count(F.lit(1)).alias("n_assertions"),
    )
    w2 = Window.partitionBy(*keys).orderBy("_island")
    return (
        islands.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_island")
        .select(
            *keys, value_col, "valid_from", "valid_to", "is_current",
            "n_assertions",
        )
    )


def asof_facts(intervals: DataFrame, as_of) -> DataFrame:
    """Point-in-time snapshot of an SCD2 interval table: the facts valid
    at ``as_of`` (a timestamp literal or Column). Pure filter — pushes
    down to the interval table's scan, no shuffle."""
    t = F.lit(as_of) if not isinstance(as_of, F.Column) else as_of
    return intervals.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def resolve_conflicts(
    claims: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    source_col: str = "source",
    iters: int = 2,
) -> DataFrame:
    """Truth discovery over conflicting claims, ``iters`` synchronous
    rounds, INTEGER-ppm arithmetic throughout (cross-engine exact).

    Model (TruthFinder simplified to a deterministic closed form):
      * trust0(source) = 1.0 (= 1,000,000 ppm)
      * conf(s,p,o)    = Σ trust(src) over sources asserting (s,p,o)
      * share(s,p,o)   = conf * PPM DIV Σ conf over the (s,p) group
      * trust'(source) = Σ share over the source's claims DIV n_claims
    After ``iters`` rounds the winning object per (s,p) is the one with
    the highest confidence, ties broken by smallest object — emitted
    with its confidence, belief share, and distinct-source count.

    Scale shape: claims dedup once (one shuffle); each round is two
    groupBy aggregations (claim conf, group total) plus a trust update
    whose result is a SMALL source dimension (|sources| ≪ |claims|)
    broadcast-joined back. No window functions inside the loop; the
    final argmax is one ``max_by``-style reduction, not a sort.
    """
    c = claims.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
        F.col(source_col).alias("source"),
    ).dropDuplicates(["subj", "pred", "obj", "source"])
    c = c.persist()
    pinned: list[DataFrame] = [c]
    trust = c.select("source").distinct().withColumn(
        "trust_ppm", F.lit(PPM).cast("long")
    )
    share = None
    for i in range(iters):
        conf = (
            c.join(F.broadcast(trust), "source")
            .groupBy("subj", "pred", "obj")
            .agg(
                F.sum("trust_ppm").alias("conf_ppm"),
                F.count(F.lit(1)).alias("n_sources"),
            )
        )
        tot = conf.groupBy("subj", "pred").agg(
            F.sum("conf_ppm").alias("tot_ppm")
        )
        share = conf.join(tot, ["subj", "pred"]).withColumn(
            "share_ppm",
            F.expr(f"conf_ppm * {PPM} DIV tot_ppm"),
        )
        if i + 1 < iters:
            trust = (
                c.join(
                    share.select("subj", "pred", "obj", "share_ppm"),
                    ["subj", "pred", "obj"],
                )
                .groupBy("source")
                .agg(F.expr("sum(share_ppm) DIV count(1)").alias("trust_ppm"))
            )
            # the trust dim is source-count-bounded tiny; left as plain
            # lineage it would recompute every later round — pin it
            trust = trust.persist()
            pinned.append(trust)
    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("conf_ppm").desc(), F.col("obj")
    )
    out = (
        share.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("subj", "pred", "obj", "conf_ppm", "share_ppm", "n_sources")
    )
    # materialize, then release every pinned intermediate (same contract
    # as dedup.checkpoint_and_release)
    out = out.localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist()
    return out


def snapshot_diff(
    intervals: DataFrame,
    t1,
    t2,
    keys: list[str] | None = None,
    value_col: str = "obj",
) -> DataFrame:
    """Time-travel diff of an SCD2 interval table: the facts that were
    ``added``, ``removed``, or ``changed`` between two as-of instants
    (the KG-audit primitive: "what did the graph learn between the
    Monday and Friday snapshots?"). Unchanged keys are dropped.

    Output: ``keys`` + ``obj_before`` (state at ``t1``, NULL if the key
    did not exist yet), ``obj_after`` (state at ``t2``, NULL if the
    fact's last interval closed in between), ``change``.

    Scale shape: the two snapshots are pushdown-able interval filters
    over the SAME table (``asof_facts``) — two scans, each reading only
    rows whose interval spans its instant (partition/row-group pruning
    on valid_from/valid_to at rest) — followed by ONE full-outer join
    on the fact key. No window, no per-key history replay: the SCD2
    compaction already paid the per-key ordering once.
    """
    ks = keys or ["subj"]
    before = asof_facts(intervals, t1).select(
        *ks, F.col(value_col).alias("obj_before")
    )
    after = asof_facts(intervals, t2).select(
        *ks, F.col(value_col).alias("obj_after")
    )
    j = before.join(after, on=ks, how="full_outer")
    return (
        j.withColumn(
            "change",
            F.when(F.col("obj_before").isNull(), F.lit("added"))
            .when(F.col("obj_after").isNull(), F.lit("removed"))
            .otherwise(F.lit("changed")),
        )
        .where(
            F.col("obj_before").isNull()
            | F.col("obj_after").isNull()
            | (F.col("obj_before") != F.col("obj_after"))
        )
        .select(*ks, "obj_before", "obj_after", "change")
    )


def sessionize_by_gap(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-gap sessionization: within each key's time-ordered event
    stream, a new session starts whenever the gap to the previous
    event exceeds ``gap_seconds`` — the standard conversation/visit
    segmentation a transcript pipeline runs before per-session
    aggregation (the reference's document-boundary grouping,
    nametag3_dataset.py sentence/doc splits, is the NLP twin of this
    log-analytics primitive).

    Adds ``session_idx`` (1-based per key) and ``event_idx`` (1-based
    within the key's ordering). ONE partitioning by the key serves the
    lag AND the running sum — Catalyst plans a single Exchange and
    reuses the sort, so the operator costs exactly one shuffle
    regardless of input size; at 10^12 events the key space (users /
    conversations) keeps partitions balanced and AQE splits any hot
    key's sort spill. Gap arithmetic is integer epoch seconds — exact
    and engine-portable.

    ``tiebreak_col`` orders same-timestamp events deterministically
    (pass the unique event id; required for stable cross-engine
    comparison when timestamps collide).
    """
    if gap_seconds < 0:
        raise ValueError("gap_seconds must be >= 0")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    # NTZ timestamps (plain parquet TIMESTAMP) cannot cast straight to
    # long; the intermediate TIMESTAMP cast interprets them in the
    # session timezone — UTC here (session.py pins it), matching any
    # naive-epoch engine. Differences are tz-invariant either way.
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    new_sess = (
        F.when(F.lag(epoch).over(w).isNull(), F.lit(1))
        .when(epoch - F.lag(epoch).over(w) > F.lit(int(gap_seconds)), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        events.withColumn("_new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn("event_idx", F.row_number().over(w).cast("long"))
        .drop("_new")
    )
