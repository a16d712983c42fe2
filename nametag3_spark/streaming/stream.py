"""Structured Streaming flavor of the pipeline (SURVEY.md §2.11).

The reference has no true streaming — its closest behaviors are
incremental batch yielding (yield_predicted_batches,
nametag3_model.py:856-927) and the HTTP server streaming response chunks
(nametag3_server.py:668-676). The faithful Spark mapping is
``readStream`` on the transcripts table → ``foreachBatch`` reusing the
IDENTICAL batch dataflow per micro-batch → epoch-partitioned sink.
Exactly-once comes from the streaming checkpoint PLUS an idempotent
write: each micro-batch overwrites its own ``epoch_id=N`` partition
(dynamic partition overwrite), so a batch replayed after a failure
between write and checkpoint-commit replaces itself instead of
appending duplicates — strictly stronger than the reference's
early-commit-with-in-band-errors (X8).

Watermarked event-time aggregation over turns (turns/minute per role) is
included as the windowed-aggregation surface — late turns beyond the
watermark are dropped deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nametag3_spark.data.synth import TRANSCRIPT_SCHEMA, gazetteer_df
from nametag3_spark.operators.canonicalize import canonicalize_mentions
from nametag3_spark.operators.infer import extract_mentions_flat
from nametag3_spark.operators.linking import link_mentions
from nametag3_spark.operators.triples import emit_triples


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def triples_micro_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    catalog: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One micro-batch through the same operators as the batch job.

    Returns (triples, mentions, new_catalog); ``mentions`` is persisted
    (it feeds both linking and canonicalization) — the CALLER must
    unpersist it after consuming ``triples``. ``new_catalog`` holds the
    novel surface→canonical rows this batch minted (empty when every
    surface was already cataloged)."""
    from nametag3_spark.operators.canonicalize import canonicalize_incremental

    mentions = extract_mentions_flat(batch_df).persist()
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)
    canonical, new_catalog = canonicalize_incremental(linked, catalog)
    return emit_triples(canonical), mentions, new_catalog


def start_triples_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    catalog_dir: str | None = None,
) -> StreamingQuery:
    """transcripts stream → SPO triples, one ``epoch_id=N`` partition per
    micro-batch, each written with dynamic partition OVERWRITE so replays
    are idempotent (at-least-once delivery × idempotent write =
    exactly-once output).

    ``catalog_dir`` (optional) enables CATALOG-STABLE canonical ids
    across micro-batches: each epoch reads the surface→canonical catalog
    accumulated by STRICTLY EARLIER epochs, pins already-seen surfaces
    to their cataloged id, and writes the surfaces it minted into its
    own ``epoch_id=N`` catalog partition (dynamic overwrite → a replayed
    epoch reconstructs the identical catalog state it saw the first
    time, keeping the exactly-once contract for the catalog too)."""
    stream = read_transcript_stream(spark, input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        catalog = None
        if catalog_dir is not None:
            try:
                catalog = (
                    spark.read.parquet(catalog_dir)
                    # strictly-earlier epochs only: on replay of epoch N
                    # its own stale partition must not feed back in
                    .where(F.col("epoch_id") < epoch_id)
                    .select("surf_node", "entity_canonical")
                )
            except AnalysisException as exc:
                # ONLY the two legitimate empty-catalog shapes may proceed
                # catalog-free: the dir does not exist yet (first epoch)
                # or it holds no data files to infer a schema from (an
                # earlier epoch minted nothing). Anything else — transient
                # FS errors, corrupt footers, permissions — must FAIL the
                # micro-batch so the streaming query retries; silently
                # running catalog-free would re-mint already-cataloged
                # surfaces under fresh ids and permanently break the
                # cross-epoch id-stability contract (round-3 ADVICE).
                msg = str(exc)
                if not any(
                    s in msg
                    for s in (
                        "PATH_NOT_FOUND",
                        "Path does not exist",
                        "UNABLE_TO_INFER_SCHEMA",
                        "Unable to infer schema",
                    )
                ):
                    raise
                catalog = None
        triples, mentions, new_catalog = triples_micro_batch(
            spark, batch_df, catalog
        )
        try:
            (
                triples.withColumn("epoch_id", F.lit(epoch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(output_dir)
            )
            if catalog_dir is not None:
                (
                    new_catalog.withColumn("epoch_id", F.lit(epoch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch_id")
                    .parquet(catalog_dir)
                )
        finally:
            mentions.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def turns_per_minute(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window aggregation: turns/minute per role."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )


def conversation_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SESSION-window aggregation over the turn stream:
    one row per (conv_id, session), where a session closes after
    ``gap`` of silence — Spark's native session_window, the streaming
    twin of ``temporal.sessionize_by_gap`` (which additionally tags
    each EVENT; the aggregate view is what a live dashboard needs).
    Late turns inside the watermark still merge into (or bridge!) their
    session; beyond it the state is dropped — bounded memory at
    10^12-turn scale, the whole point of the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            "conv_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_turns",
        )
    )


def stream_dedup_exact(
    docs: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_exact``: keep the FIRST
    arrival of each normalized-content hash, dropping re-arrivals within
    the event-time watermark.

    The scale property is the state bound: a plain
    ``dropDuplicates(["_content_hash"])`` on a stream keeps every key
    ever seen (state grows with corpus size — unusable at 10^12 rows);
    ``dropDuplicatesWithinWatermark`` evicts keys once the watermark
    passes them, so state is O(arrival rate × watermark window) — the
    correct streaming-ingest dedup for an ever-growing corpus where true
    duplicates arrive close together (retries, crawler revisits,
    replayed producers). Cross-window historical dedup remains the batch
    operator's job over the materialized table.

    Collision safety, same contract as the batch twin: the state key is
    (hash, full normalized text), not the 64-bit hash alone — a hash
    collision inside the watermark must not silently drop a distinct
    document (round-3 ADVICE). The hash still leads the composite key so
    state lookups compare 8 bytes first; the text's state-size cost is
    bounded by the same watermark eviction.
    """
    normalized = F.lower(F.trim(F.col(text_col)))
    return (
        docs.withColumn("_content_hash", F.xxhash64(normalized))
        .withColumn("_norm_text", normalized)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash", "_norm_text"])
        .drop("_content_hash", "_norm_text")
    )


def stream_left_context(
    turns: DataFrame, max_context: int = 64
) -> DataFrame:
    """Custom stateful operator: STREAMING left-context accumulation per
    conversation (``applyInPandasWithState``).

    The batch twin is T4/W3 (`encode.pack_with_left_context` — the
    reference's sliding ``max_context`` window carried across sentences,
    nametag3_dataset.py:273-306). In a stream, a conversation's earlier
    turns may have arrived in PREVIOUS micro-batches, so the rolling
    token tail lives in keyed state: each arriving turn is emitted with
    the context the model should condition on, then appends its own
    tokens to the state.

    Scale properties: state is per-``conv_id`` and HARD-BOUNDED at
    ``max_context`` tokens (eviction before append, same order as the
    batch operator), so state size is O(active conversations ×
    max_context) regardless of stream length; each key's group is
    processed independently, so hot conversations cannot block others.

    Precondition (same as the batch path): turns of one conversation
    arrive in ``turn_idx`` order ACROSS micro-batches (the file/Kafka
    source preserves per-key append order); within a batch they are
    sorted here. Input needs (conv_id, turn_idx, tokens).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, turn_idx int, tokens array<string>, "
        "context array<string>"
    )
    state_schema = "last_turn_idx int, context array<string>"

    def fn(key, pdfs, state):
        (conv_id,) = key
        if state.exists:
            last_idx, ctx = state.get
            ctx = list(ctx)
        else:
            last_idx, ctx = -1, []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values("turn_idx")
            out_rows = []
            for turn_idx, tokens in zip(batch["turn_idx"], batch["tokens"]):
                tokens = list(tokens) if tokens is not None else []
                out_rows.append((conv_id, int(turn_idx), tokens, list(ctx)))
                # evict BEFORE append, like the batch packer: the newest
                # turn's own tokens never displace its context mid-turn
                ctx = (ctx + tokens)[-max_context:]
                last_idx = int(turn_idx)
            state.update((last_idx, ctx))
            yield pd.DataFrame(
                out_rows,
                columns=["conv_id", "turn_idx", "tokens", "context"],
            )

    return turns.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_inference_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    rules: list,
    rounds: int = 2,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Streaming incremental KG inference: a stream of NEW (subj, pred,
    obj) facts runs ``rounds`` SEMI-NAIVE forward-chaining rounds per
    micro-batch with the batch's novel facts as the frontier and the
    store accumulated by STRICTLY EARLIER epochs as the known set —
    old facts are never re-derived, each epoch pays only for its delta.

    Exactly-once via the catalog pattern of ``start_triples_stream``:
    every epoch writes its novel facts (input ∪ derived, minus known)
    into its own ``epoch_id=N`` partition with dynamic overwrite, and
    reads only ``epoch_id < N`` back, so a replayed epoch reconstructs
    the identical known set and rewrites an identical partition.

    ``rounds`` must cover the rule set's cascade depth (a depth-d
    ontology needs d): within one epoch the frontier propagates
    ``rounds`` steps; facts from earlier epochs are complete, so
    cross-epoch cascades need no catch-up.
    """
    from pyspark.errors import AnalysisException

    from nametag3_spark.operators.bgp import _is_path_pred, _semi_naive_rounds

    for patterns, _ in rules:
        for pat in patterns:
            if len(pat) == 3 and _is_path_pred(pat[1]):
                raise ValueError(
                    "property-path patterns are not supported in "
                    f"streaming inference: {pat!r}"
                )

    stream = (
        spark.readStream.schema("subj string, pred string, obj string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        known = None
        try:
            known = (
                spark.read.parquet(store_dir)
                .where(F.col("epoch_id") < epoch_id)
                .select("subj", "pred", "obj")
            )
        except AnalysisException as exc:
            # same contract as the canonical-id catalog: only the two
            # legitimate empty-store shapes may proceed store-free
            msg = str(exc)
            if not any(
                s in msg
                for s in (
                    "PATH_NOT_FOUND",
                    "Path does not exist",
                    "UNABLE_TO_INFER_SCHEMA",
                    "Unable to infer schema",
                )
            ):
                raise
        batch = batch_df.select("subj", "pred", "obj").distinct()
        if known is not None:
            fresh = batch.join(known, on=["subj", "pred", "obj"], how="left_anti")
            seeded = known.unionByName(fresh)
        else:
            fresh = batch
            seeded = batch
        fresh = fresh.localCheckpoint(eager=True)
        seeded = seeded.localCheckpoint(eager=True)
        _, derived_new = _semi_naive_rounds(
            seeded, fresh, rules, rounds,
            mat=lambda df: df.localCheckpoint(eager=True),
        )
        novel = fresh.unionByName(derived_new).distinct()
        (
            novel.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(store_dir)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_query_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    view_dir: str,
    checkpoint_dir: str,
    query: str,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Streaming MATERIALIZED SPARQL VIEW: maintain the result of a
    SPARQL SELECT (or CONSTRUCT) over an append-only triple stream.

    Each micro-batch appends its novel facts to the epoch-partitioned
    ``store_dir`` (the exactly-once catalog pattern shared with the
    other sinks: dynamic overwrite of the batch's own ``epoch_id=N``
    partition, earlier epochs read back as the known set) and then
    recomputes the query over the store AS OF this epoch, writing the
    full result to ``view_dir``'s ``epoch_id=N`` partition. The LATEST
    epoch partition IS the view — ``read_query_view`` returns it. A
    replayed epoch reconstructs the identical store prefix, so it
    rewrites bag-identical store AND view partitions.

    Recompute-per-epoch is Structured Streaming's complete-mode
    semantics: correct for EVERY query shape the front end supports —
    including non-monotone ones (MINUS, !BOUND, aggregates, NOT
    EXISTS), where rows can DISAPPEAR from the view as facts arrive;
    incremental delta maintenance can't express those. The monotone
    fast path is ``start_inference_stream`` (semi-naive, pays only the
    delta); for hot views at scale, coarsen the trigger or maintain a
    pred-partitioned store so the recompute's scans prune.

    ASK queries are rejected (a bool is not a view — wrap it as a
    SELECT and test emptiness downstream)."""
    from pyspark.errors import AnalysisException

    from nametag3_spark.operators.sparql import execute, parse

    form = parse(query)["form"]
    if form not in ("select", "construct"):
        raise ValueError(
            f"materialized views need SELECT or CONSTRUCT, got {form!r}"
        )

    stream = (
        spark.readStream.schema("subj string, pred string, obj string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        known = None
        try:
            known = (
                spark.read.parquet(store_dir)
                .where(F.col("epoch_id") < epoch_id)
                .select("subj", "pred", "obj")
            )
        except AnalysisException as exc:
            msg = str(exc)
            if not any(
                s in msg
                for s in (
                    "PATH_NOT_FOUND",
                    "Path does not exist",
                    "UNABLE_TO_INFER_SCHEMA",
                    "Unable to infer schema",
                )
            ):
                raise
        batch = batch_df.select("subj", "pred", "obj").distinct()
        if known is not None:
            novel = batch.join(
                known, on=["subj", "pred", "obj"], how="left_anti"
            )
            full = known.unionByName(novel)
        else:
            novel = batch
            full = batch
        full = full.localCheckpoint(eager=True)
        (
            novel.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(store_dir)
        )
        (
            execute(full, query)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(view_dir)
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_query_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """The CURRENT materialized view: the highest-epoch partition of a
    ``start_query_stream`` sink (each partition holds a complete
    recompute, so the latest one alone is the answer)."""
    view = spark.read.parquet(view_dir)
    latest = view.agg(F.max("epoch_id").alias("m")).collect()[0].m
    return view.where(F.col("epoch_id") == latest).drop("epoch_id")
