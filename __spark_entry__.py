"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (SURVEY.md §7)
on deterministic synthetic transcripts (the engine's native input — the
BASELINE.json ``input_hint`` schema; /root/testdata has no transcript
table, so the generator synthesizes one, seed 42).

``queries()`` maps SURVEY.md §2 operators onto the provided testdata
tables; each SQL-expressible operator has a DuckDB twin in
``oracle_sql()``. Numeric aggregates are computed on DECIMAL-cast columns
and cast back to DOUBLE so Spark and DuckDB agree bit-for-bit (no
float-sum ordering nondeterminism). Non-SQL-expressible operators
(pipeline stages, hash-based LSH/SimHash/fingerprints whose xxhash64 has
no DuckDB equivalent) are registered without an oracle → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _synth_sizes(sf_dir: str) -> tuple[int, int]:
    if "0.001" in sf_dir:
        return 50, 10
    if "0.01" in sf_dir:
        return 200, 12
    return 2000, 15


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts → mentions → linked → canonical → SPO triples."""
    from nametag3_spark.data.synth import gazetteer_df, synth_transcripts
    from nametag3_spark.operators.canonicalize import canonicalize_mentions
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.linking import link_mentions
    from nametag3_spark.operators.triples import emit_triples, extract_mentions

    transcripts = synth_transcripts(spark, n_convs=20, avg_turns=8)
    mentions = extract_mentions(annotate_turns(transcripts, scorer="oracle"))
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)
    return emit_triples(canonicalize_mentions(linked))


# ---------------------------------------------------------------------------
# SQL-expressible operator queries (SURVEY.md §2 ↔ DuckDB oracles)
# ---------------------------------------------------------------------------

def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/P1/P2: parquet scan with pushed filter + projection."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") < "1995-01-01")
        .where(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            F.col("l_returnflag").alias("flag"),
        )
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-shape: the classic groupBy+multi-agg (exact decimal arithmetic).

    The narrow-scan spread parallelizes the decimal partial aggregation
    (a single-row-group file pins scan+partial-agg to one core; measured
    2×); spreading AFTER the pushed shipdate filter keeps dropped rows
    out of the shuffle. Exact-sum associativity makes the result
    partitioning-invariant."""
    from nametag3_spark.operators.skew import spread_if_narrow

    li = _read(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        spread_if_narrow(
            li.where(F.col("l_shipdate") <= "1998-09-02"), "l_orderkey"
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: equi inner join + filter + projection."""
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(
            "o_orderkey",
            "c_custkey",
            "c_name",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total"),
        )
    )


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: broadcast small-dim chain supplier⋈nation⋈region + agg."""
    sup = _read(spark, sf_dir, "supplier")
    nat = _read(spark, sf_dir, "nation")
    reg = _read(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


def q_multiset_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/A3/U2: multiset intersection size via groupBy counts + least —
    the compare_nested_entities.py:45-48 aggregation shape."""
    ev = _read(spark, sf_dir, "events")
    a = (
        ev.where(F.col("user_id") % 2 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        ev.where(F.col("user_id") % 2 == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, "event_type", "full")
        .select(
            "event_type",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            F.least(F.coalesce("n_a", F.lit(0)), F.coalesce("n_b", F.lit(0))).alias(
                "n_common"
            ),
        )
    )


def q_cube_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: CNEC-style per-category breakdown as CUBE grouping sets.

    Narrow-scan spread: the 4-way grouping-set Expand multiplies the
    scan's rows BEFORE partial aggregation, so a one-task scan pays the
    whole expand+agg on one core (measured 3×). Spread by the
    high-cardinality order key, never by the (3-value) cube keys."""
    from nametag3_spark.operators.skew import spread_if_narrow

    orders = spread_if_narrow(_read(spark, sf_dir, "orders"), "o_orderkey")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2: deterministic top-3 per group via window row_number."""
    orders = _read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_orderstatus", "o_orderkey", "rk")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: session-id assignment = running sum over gap flags (the
    blank-line sentence-grouping pattern, nametag3_dataset.py:170-237)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch, 1).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    with_s = (
        ev.withColumn("session_id", sessions)
    )
    return with_s.groupBy("user_id").agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_carry_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: doc-boundary carry = last non-null over unbounded-preceding
    (the was_docstart flag carry, nametag3_dataset.py:171-190)."""
    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return ev.select(
        "event_id", "user_id", "ts", last_signup.alias("last_signup_ts")
    )


def q_asof_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (scale formulation): most recent prior signup per event,
    expressed as the carry-forward window — one shuffle, no range join."""
    ev = _read(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_signup = F.last(
        F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("asof_signup_ts", last_signup)
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "asof_signup_ts")
    )


def q_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/R2: per-corpus sampling weights with temperature
    (nametag3_dataset_collection.py:196-221): w ∝ count, temperature-
    scaled w**(1/T), normalized. Exact-rational then rounded."""
    orders = _read(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("tot"))
    t = 2.0
    return (
        counts.crossJoin(total)
        .select(
            "o_orderpriority",
            "n",
            F.round((F.col("n") / F.col("tot")), 6).alias("w_proportional"),
            F.round(
                F.pow(F.col("n").cast("double"), 1.0 / t), 4
            ).alias("w_temperature"),
        )
    )


def q_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U3: union + distinct (ConcatDataset + entity-dedup shapes)."""
    orders = _read(spark, sf_dir, "orders")
    a = orders.select(F.col("o_custkey").alias("k"), F.col("o_orderstatus").alias("s"))
    b = orders.select(F.col("o_custkey").alias("k"), F.lit("ALL").alias("s"))
    return (
        a.unionByName(b)
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_distinct_keys"))
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4/except-shape: users with error events but no signup events."""
    ev = _read(spark, sf_dir, "events")
    errs = ev.where(F.col("event_type") == "error").select("user_id").distinct()
    signups = ev.where(F.col("event_type") == "signup").select("user_id").distinct()
    return errs.join(signups, "user_id", "left_anti")


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar string ops: split / startswith / substring / case."""
    part = _read(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.substring(F.col("p_brand"), 1, 5).alias("brand5"),
        F.col("p_name").startswith("a").alias("starts_a"),
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.length(F.col("p_name")).alias("name_len"),
    )


def q_label_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P8: tagset suffixing + suffix strip round-trip on a label col."""
    ev = _read(spark, sf_dir, "events")
    suffixed = F.when(
        F.col("event_type") == "view", F.col("event_type")
    ).otherwise(F.concat(F.col("event_type"), F.lit("-onto")))
    return (
        ev.select("event_id", "event_type", suffixed.alias("tagged"))
        .withColumn(
            "stripped",
            F.regexp_replace(F.col("tagged"), "-onto$", ""),
        )
    )


def q_vocab_unk_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: frozen-vocab lookup with <unk> fallback via broadcast left join."""
    ev = _read(spark, sf_dir, "events")
    vocab = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 3)], "event_type string, label_id int"
    )
    return (
        ev.join(F.broadcast(vocab), "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("label_id"), F.lit(0)).alias("label_id"),
        )
        .groupBy("event_type", "label_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1/R4: seeded deterministic sampling via arithmetic hash — the
    engine-portable stand-in for sampleBy fractions."""
    orders = _read(spark, sf_dir, "orders")
    h = F.pmod(
        F.pmod(F.col("o_orderkey") * F.lit(2654435761), F.lit(4294967296)),
        F.lit(100),
    )
    return (
        orders.where(h < 10)
        .select("o_orderkey", "o_orderstatus")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup (exact): keep min doc_id per normalized text."""
    docs = _read(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("_norm"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keep_id", "dup_count")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword estimate.
    Narrow-scan spread: the per-word ``aggregate`` lambda is interpreted
    per element — parallelize it instead of pinning it to the scan task."""
    from nametag3_spark.operators.skew import spread_if_narrow

    docs = spread_if_narrow(_read(spark, sf_dir, "documents"), "doc_id")
    words = F.split(F.trim(F.col("text")), r"\s+")
    subwords = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("int"),
    )
    return docs.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        subwords.alias("n_subwords_est"),
        F.length("text").alias("n_chars_calc"),
    )


def q_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punct / stopword ratios (JVM-side expressions)."""
    docs = _read(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_tokens = F.size(words)
    stop = F.array(*[F.lit(w) for w in ["the", "and", "of", "to", "is", "in"]])
    n_stop = F.size(F.array_intersect(words, stop))
    n_punct = F.size(F.split(F.col("text"), r"[.,;:!?]")) - 1
    return docs.select(
        "doc_id",
        F.round(n_punct / F.greatest(n_tokens, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style rule filter → keep/drop + failed-rule reasons
    (thresholds tuned so the synth corpus splits both ways: word count,
    mean word length, stopword presence all bind)."""
    from nametag3_spark.operators.textstats import quality_filter

    docs = _read(spark, sf_dir, "documents")
    return quality_filter(
        docs, min_words=30, max_mean_word_len=4.5, min_stop_hits=1
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 20 == 0 act as the
    held-out eval set; every other document is flagged when it shares a
    word 4-gram with it (n=4 splits the synth corpus ~10% contaminated)."""
    from nametag3_spark.operators.decontam import decontaminate

    docs = _read(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    return decontaminate(corpus, bench, n=4)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a deterministically synthesized PII-bearing column
    (the synth corpus is word salad with no PII, so both engines append
    the same doc_id-derived email/IP/phone suffixes — the portable-synth
    convention the media queries established). The redacted STRING itself
    is part of the hash-verified output."""
    from nametag3_spark.operators.privacy import pii_scrub

    docs = _read(spark, sf_dir, "documents")
    d = F.col("doc_id")
    raw = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact u"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" from 10."), (d % 256).cast("string"), F.lit(".0.1")),
        ).otherwise(F.lit("")),
    )
    return pii_scrub(docs.select("doc_id", raw.alias("text")))


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals over word 2-grams: top-ngram share +
    duplicate-ngram fraction per document."""
    from nametag3_spark.operators.textstats import repetition_stats

    docs = _read(spark, sf_dir, "documents")
    return repetition_stats(docs, n=2)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk pretraining packing metadata (budget 64 tokens,
    4 shards — small budget so the synth docs straddle chunk boundaries
    both ways)."""
    from nametag3_spark.operators.packing import pack_sequences

    return pack_sequences(
        _read(spark, sf_dir, "documents"), budget=64, n_shards=4
    )


def q_ngram_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup between blocked pairs (doc_id, doc_id+1)."""
    docs = _read(spark, sf_dir, "documents")

    def shingles(col):
        w = F.split(F.lower(F.trim(col)), r"\s+")
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(w) - 3, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, 3)),
            )
        )

    a = docs.select(F.col("doc_id").alias("id_a"), shingles(F.col("text")).alias("sh_a"))
    b = docs.select((F.col("doc_id") - 1).alias("id_a"), shingles(F.col("text")).alias("sh_b"))
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword hits.
    Narrow-scan spread: split+distinct+intersect per doc on one scan task
    otherwise serializes the whole corpus through one core."""
    from nametag3_spark.operators.skew import spread_if_narrow
    from nametag3_spark.operators.textstats import language_id

    docs = spread_if_narrow(_read(spark, sf_dir, "documents"), "doc_id")
    return language_id(docs).select("doc_id", "lang_pred")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: exact brute-force cosine top-3 for 5 query
    vectors (ids only — float scores excluded from the compare)."""
    from nametag3_spark.operators.similarity import cosine_topk_bruteforce

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return cosine_topk_bruteforce(emb, queries, k=3).select(
        "query_id", "neighbor_id", "rank"
    )


def q_eval_length_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8: the span-eval cube (label × length-class P/R counts) run on
    span-shaped rows derived from events — system = even event_ids,
    gold = odd; identical aggregation to eval/spans.per_type_and_length_prf."""
    from nametag3_spark.eval.spans import per_type_and_length_prf

    ev = _read(spark, sf_dir, "events")
    spans = ev.select(
        "event_id",
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        (F.col("event_id") % 5).cast("int").alias("start_tok"),
        (F.col("event_id") % 5 + F.col("event_id") % 3).cast("int").alias("end_tok"),
        F.col("event_type").alias("label"),
    )
    system = spans.where(F.col("event_id") % 2 == 0).drop("event_id")
    gold = spans.where(F.col("event_id") % 2 == 1).drop("event_id")
    return per_type_and_length_prf(system, gold)


def q_iob2_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IOB→IOB2 converter (reference preprocessing/iob_to_iob2.py) as a
    single window pass over an events-derived token stream."""
    from nametag3_spark.sources.preprocess import iob_to_iob2

    ev = _read(spark, sf_dir, "events")
    toks = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_id").cast("int").alias("token_idx"),
        F.element_at(
            F.array(F.lit("O"), F.lit("I-PER"), F.lit("B-LOC"), F.lit("I-LOC")),
            (F.col("event_id") % 4).cast("int") + 1,
        ).alias("label"),
    )
    return iob_to_iob2(toks, doc_keys=["conv_id"], order_cols=["token_idx"])


def q_eval_suptype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CNEC official Type/Suptype/Span three-level eval
    (compare_ne_outputs_v3_corrected.pl:280-345) on span-shaped rows
    derived from events — suptype = first character of the label."""
    from nametag3_spark.eval.spans import cnec_eval

    ev = _read(spark, sf_dir, "events")
    spans = ev.select(
        "event_id",
        F.col("user_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        (F.col("event_id") % 5).cast("int").alias("start_tok"),
        (F.col("event_id") % 5 + F.col("event_id") % 3).cast("int").alias("end_tok"),
        F.col("event_type").alias("label"),
    )
    system = spans.where(F.col("event_id") % 2 == 0).drop("event_id")
    gold = spans.where(F.col("event_id") % 2 == 1).drop("event_id")
    out = cnec_eval(system, gold)
    return out.select(
        "metric",
        "gold_n",
        "retrieved",
        "correct_retrieved",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


def q_eval_token_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conlleval token-accuracy row (A8): token-label stream derived from
    events; system labels deterministically perturbed (every 10th event
    mislabeled 'O') so accuracy is a real fraction."""
    from nametag3_spark.eval.spans import token_accuracy

    ev = _read(spark, sf_dir, "events")
    toks = ev.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.col("event_id") % 7).cast("int").alias("turn_idx"),
        F.col("event_id").cast("int").alias("token_idx"),
        F.col("event_type").alias("label"),
    )
    system = toks.withColumn(
        "label",
        F.when(F.col("token_idx") % 10 == 0, F.lit("O")).otherwise(F.col("label")),
    )
    out = token_accuracy(system, toks)
    # exact integer ppm (not a rounded double): round-2 ledger showed the
    # two engines' double round/representation differ in the last ulp, so
    # the hash gate needs integer-only arithmetic on both sides
    return out.select(
        "n_tokens",
        "n_correct",
        F.expr("n_correct * 1000000 DIV n_tokens").alias("accuracy_ppm"),
    )


def q_billing_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 billing-sum pattern: per user/day character+value accounting."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.length("event_type")).alias("billed_chars"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 request-size guard as a quarantine breakdown (reason → count)."""
    docs = _read(spark, sf_dir, "documents")
    reason = (
        F.when(F.col("text").isNull(), F.lit("null_text"))
        .when(F.octet_length("text") > 300, F.lit("oversize"))
        .otherwise(F.lit("ok"))
    )
    return docs.groupBy(reason.alias("reason")).agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------------------------------ rows-only
# (non-SQL-expressible: pipeline UDF stages / xxhash64-based sketches)

def q_pipeline_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.triples import extract_mentions

    n_convs, avg_turns = _synth_sizes(sf_dir)
    t = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)
    return extract_mentions(annotate_turns(t)).select(
        "conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface"
    )


def q_pipeline_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed inference path (T1/T3/T6 + J1): transcripts → subword
    window packing → per-window scoring → key-join realignment → decoded
    mentions. Must emit EXACTLY the rows `pipeline_mentions` emits (the
    per-turn unpacked path) — asserted by pytest
    test_pipeline.py::test_window_path_equals_turn_path and visible here
    as identical row counts in the CORRECTNESS ledger."""
    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.operators.encode import pack_conversations
    from nametag3_spark.operators.infer import (
        annotate_turns,
        mentions_from_window_tokens,
        score_windows,
    )

    n_convs, avg_turns = _synth_sizes(sf_dir)
    t = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)
    windows = pack_conversations(annotate_turns(t), max_len=512)
    mentions = mentions_from_window_tokens(score_windows(windows))
    return mentions.select(
        "conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface"
    )


def q_pipeline_seq2seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seq2seq nested head driven distributed (T5 linearize → W7
    autoregressive decode → P9 filter → W5 span decode), teacher-forced —
    must emit exactly the mentions `pipeline_mentions` emits (pytest
    asserts equality; the ledger shows row-count parity)."""
    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.functions.labels import CONTROL_LABELS
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.seq2seq import seq2seq_roundtrip_mentions

    n_convs, avg_turns = _synth_sizes(sf_dir)
    labeled = annotate_turns(synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns))
    # sublabel vocab: tiny, driver-collected once (the reference ships it
    # in mappings.json — S5)
    subs = sorted(
        r["s"]
        for r in labeled.select(F.explode("labels").alias("stack"))
        .where(F.col("stack") != "O")
        .select(F.explode(F.split("stack", r"\|")).alias("s"))
        .distinct()
        .collect()
    )
    subs = [s for s in subs if s not in CONTROL_LABELS]
    mentions = seq2seq_roundtrip_mentions(labeled, subs)
    return mentions.select(
        "conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface"
    )


def q_pipeline_np_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-sourced NumPy model inference over packed windows
    (S5/T6/J1/J5 with real tensors): weights load from an .npz per
    worker, windows dynamically pad, labels gather at first subwords.
    Output: per-label token counts (stable for a fixed seed)."""
    import os
    import tempfile

    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.operators.encode import pack_conversations
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.np_model import NpFlatNER, score_windows_np

    ckpt = os.path.join(tempfile.gettempdir(), "npflat_ckpt_seed42.npz")
    if not os.path.exists(ckpt):
        NpFlatNER.init_random(seed=42).save(ckpt)
    n_convs, avg_turns = _synth_sizes(sf_dir)
    t = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)
    scored = score_windows_np(pack_conversations(annotate_turns(t)), ckpt)
    return scored.groupBy("label").agg(F.count(F.lit(1)).alias("n_tokens"))


def q_pipeline_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nametag3_spark.data.synth import gazetteer_df, synth_transcripts
    from nametag3_spark.operators.canonicalize import canonicalize_mentions
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.linking import link_mentions
    from nametag3_spark.operators.triples import emit_triples, extract_mentions

    n_convs, avg_turns = _synth_sizes(sf_dir)
    t = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)
    mentions = extract_mentions(annotate_turns(t))
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)
    return emit_triples(canonicalize_mentions(linked))


def q_pipeline_span_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level P/R vs the generator's gold mentions (north-rule gate)."""
    from nametag3_spark.data.synth import synth_gold_mentions, synth_transcripts
    from nametag3_spark.eval.spans import span_prf
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.triples import extract_mentions

    n_convs, avg_turns = _synth_sizes(sf_dir)
    t = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns)
    system = extract_mentions(annotate_turns(t))
    gold = synth_gold_mentions(spark, n_convs=n_convs, avg_turns=avg_turns)
    return span_prf(system, gold)


def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/log-compaction (Iceberg MERGE INTO analog, `merge_latest`):
    events split deterministically into an existing table (even ids) and
    an update log (odd ids); per (user_id, event_type) the latest row by
    (ts, event_id) wins. The graph-materialize upsert primitive."""
    from nametag3_spark.operators.triples import merge_latest

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    existing = ev.where(F.col("event_id") % 2 == 0)
    updates = ev.where(F.col("event_id") % 2 == 1)
    return merge_latest(
        existing, updates,
        keys=["user_id", "event_type"],
        order_cols=["ts", "event_id"],
    )


def q_minhash_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        minhash_lsh_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    return checkpoint_and_release(minhash_lsh_pairs(docs, jaccard_threshold=0.5))


def q_jaccard_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-true-pairs near-dup (shared-shingle inverted-index
    blocking, no LSH) — the DuckDB-oracle-able twin of
    ``minhash_dedup_pairs`` and the recall denominator for the LSH path."""
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        jaccard_pairs_exact,
    )

    docs = _read(spark, sf_dir, "documents")
    return checkpoint_and_release(
        jaccard_pairs_exact(docs, jaccard_threshold=0.5).select(
            "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
        )
    )


def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of the banded-MinHash approximation vs the exact
    pair set: (n_exact, n_lsh, n_hit, recall, precision) — on the
    PORTABLE hash family, so DuckDB recomputes the full audit (LSH
    pipeline AND exact inverted-index denominator) and the recall row
    itself is oracle-green, not just its two ingredients. The xxhash64
    production path keeps its own measured-recall coverage via pytest
    (test_operators) at the same threshold."""
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        minhash_recall,
    )

    docs = _read(spark, sf_dir, "documents")
    return checkpoint_and_release(
        minhash_recall(docs, jaccard_threshold=0.5, word_hash="portable")
    )


def q_minhash_pairs_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL banded-MinHash LSH pipeline (shingle hash → 16-perm
    signature → 4-band hashing → hot-bucket cap → candidate join → true-
    Jaccard verify) on the portable md5/affine-mod-P hash family, so
    DuckDB recomputes the identical signatures and band buckets — the
    banding logic itself is oracle-verified, not just its recall. The
    xxhash64 fast path stays the bench/production variant
    (``minhash_dedup_pairs``, rows-only + measured recall)."""
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        minhash_lsh_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    return checkpoint_and_release(
        minhash_lsh_pairs(
            docs, jaccard_threshold=0.5, word_hash="portable"
        ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → per-document keep/drop list via connected
    components (the artifact a training-data pipeline consumes). Runs on
    the EXACT pair set so the oracle can rebuild the same components with
    a recursive CTE; production composes the same operator with the LSH
    pair set."""
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        dedup_keep_list,
        jaccard_pairs_exact,
    )

    docs = _read(spark, sf_dir, "documents")
    pairs = jaccard_pairs_exact(docs, jaccard_threshold=0.5)
    return checkpoint_and_release(dedup_keep_list(docs, pairs))


def q_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-hash variant so the fingerprints AND prefix buckets get a
    DuckDB twin (upgraded from rows-only in round 3)."""
    from nametag3_spark.operators.dedup import simhash_buckets

    docs = _read(spark, sf_dir, "documents")
    return simhash_buckets(docs, word_hash="portable")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-SimHash near-dup pairs with Hamming verification, on the
    portable (md5/60-bit) word hash so DuckDB recomputes the identical
    fingerprints. With max_hamming < n_bands the banding recall is exact
    (pigeonhole), so the blocked Spark result must equal the oracle's
    brute-force all-pairs scan."""
    from nametag3_spark.operators.dedup import (
        checkpoint_and_release,
        simhash_pairs,
    )

    docs = _read(spark, sf_dir, "documents")
    return checkpoint_and_release(
        simhash_pairs(docs, max_hamming=3, n_bands=4, word_hash="portable")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nametag3_spark.operators.textstats import fingerprint

    docs = _read(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint")


def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN on the PORTABLE plane-weight hash: DuckDB recomputes
    the bucket assignment bit-for-bit (float32-corpus x double-weight
    products, in-order fold) plus candidate generation and re-scoring —
    the whole approximate result set is oracle-verified (was rows-only
    through round 3). xxhash64 planes stay the production default."""
    from nametag3_spark.operators.similarity import lsh_bucket_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_bucket_topk(emb, queries, k=3, plane_hash="portable").select(
        "query_id", "neighbor_id", "rank"
    )


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of sign-LSH ANN vs brute-force cosine top-k:
    (n_queries, k, n_hit, recall) — on the portable plane hash, so the
    audit row itself is cross-engine verified: DuckDB rebuilds the
    buckets, the approximate set, the exact set, and the recall
    arithmetic (was rows-only through round 3; the xxhash64 path keeps
    pytest recall coverage)."""
    from nametag3_spark.operators.similarity import (
        cosine_topk_bruteforce,
        lsh_bucket_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 100 == 0)
    k = 3
    exact = cosine_topk_bruteforce(emb, queries_df, k=k).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_bucket_topk(
        emb, queries_df, k=k, n_planes=3, n_tables=12, plane_hash="portable"
    ).select("query_id", "neighbor_id")
    hit = approx.intersect(exact)
    return (
        exact.agg((F.count(F.lit(1)) / k).cast("long").alias("n_queries"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_queries",
            F.lit(k).alias("k"),
            "n_hit",
            F.round(F.col("n_hit") / (F.col("n_queries") * k), 4).alias("recall"),
        )
    )


def q_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at FULL probe (nprobe == n_centroids): every corpus vector
    is a candidate, so the result must equal exact brute-force top-k —
    which DuckDB recomputes, making the whole IVF machinery (driver-
    trained centroid literal, cell assignment, cell join, re-scoring)
    oracle-verifiable cross-engine. The approximate setting's quality is
    quantified separately by ``ivf_recall``."""
    from nametag3_spark.operators.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, k=3, n_centroids=8, nprobe=8
    ).select("query_id", "neighbor_id", "rank")


def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit of IVF ANN (nprobe=3 of 8 cells ≈ 3/8 of the corpus
    scored per query) vs brute-force top-k. Centroids train on the
    PORTABLE hash-ordered sample so the oracle can rebuild bit-identical
    centroids outside Spark (``train_ivf_centroids_duckdb``) and DuckDB
    recomputes the entire audit — cell assignment, nprobe probing,
    candidate re-scoring, exact top-k, and the recall arithmetic — from
    those literals. The xxhash64 sample hash stays the production
    default."""
    from nametag3_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") % 100 == 0)
    k = 3
    exact = cosine_topk_bruteforce(emb, queries_df, k=k).select(
        "query_id", "neighbor_id"
    )
    cents = train_ivf_centroids(emb, n_centroids=8, sample_hash="portable")
    approx = ivf_topk(
        emb, queries_df, k=k, n_centroids=8, nprobe=3, centroids=cents
    ).select("query_id", "neighbor_id")
    hit = approx.intersect(exact)
    return (
        exact.agg((F.count(F.lit(1)) / k).cast("long").alias("n_queries"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_queries",
            F.lit(k).alias("k"),
            "n_hit",
            F.round(F.col("n_hit") / (F.col("n_queries") * k), 4).alias("recall"),
        )
    )


def q_embedding_adjacent_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (exact, blocked on adjacent ids so DuckDB
    can verify): cosine between vec i and i+1, rounded, thresholded."""
    emb = _read(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    a = emb.select(F.col("vec_id").alias("id_a"), vec.alias("va"))
    b = emb.select((F.col("vec_id") - 1).alias("id_a"), vec.alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return (
        a.join(b, "id_a")
        .select(
            "id_a",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 4).alias("cosine"),
        )
        .where(F.col("cosine") > -0.2)
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs (scale path) on the portable
    plane hash: DuckDB rebuilds buckets, hot-bucket cap, candidate pairs,
    and the cosine-threshold verification (oracle-green since round 4)."""
    from nametag3_spark.operators.dedup import checkpoint_and_release
    from nametag3_spark.operators.similarity import embedding_near_dup_pairs

    emb = _read(spark, sf_dir, "embeddings")
    return checkpoint_and_release(
        embedding_near_dup_pairs(
            emb, threshold=0.3, plane_hash="portable"
        ).select("id_a", "id_b")
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) keep/drop list: IVF-cell clustering
    (portable sample hash → DuckDB retrains bit-identical centroids),
    within-cell exact-cosine pairs at threshold 0.35 (the synth embedding
    space is near-random; real corpora use ~0.9), CC keep-list. The
    oracle recomputes clustering, pairing, components, and the keep ids."""
    from nametag3_spark.operators.dedup import checkpoint_and_release
    from nametag3_spark.operators.similarity import (
        semantic_dedup,
        train_ivf_centroids,
    )

    emb = _read(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(
        emb, n_centroids=8, sample_hash="portable"
    )
    return checkpoint_and_release(
        semantic_dedup(emb, threshold=0.35, centroids=cents)
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: binary content → unit-norm feature vectors (stub decode,
    real Spark plumbing: mapInPandas over Arrow binary batches). Runs on
    the PORTABLE media table whose content/metadata are plain arithmetic
    on media_id, and the stub featurizer is integer-exact until its final
    IEEE ops — so DuckDB regenerates the table, recomputes sha256, and
    rebuilds the identical float components (oracle-green; was rows-only
    through round 3).

    The operator keeps the full ``array<float>`` embedding; the QUERY
    projects flat primitives (first component + vector norm) because the
    driver's oracle canonicalizer sorts columns and cannot hash list
    columns."""
    from nametag3_spark.operators.multimodal import (
        decode_and_featurize,
        synth_media_portable,
    )

    feats = decode_and_featurize(synth_media_portable(spark, n=48))
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return feats.select(
        "media_id",
        "kind",
        F.round(F.col("embedding")[0].cast("double"), 4).alias("feat0"),
        F.round(norm, 2).alias("vec_norm"),
        F.size("embedding").alias("dim"),
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: metadata-driven video frame sampling (JVM-side explode,
    Python only for the stubbed frame decode). On the portable media
    table the frame schedule is pure arithmetic on media_id, so DuckDB
    recomputes it exactly (oracle-green; was rows-only through round 3)."""
    from nametag3_spark.operators.multimodal import (
        sample_frames,
        synth_media_portable,
    )

    return sample_frames(synth_media_portable(spark, n=48)).select(
        "media_id", "frame_idx", "ts_ms"
    )


# Co-mention lexicon: fixed surfaces with varied corpus frequency so the
# graph has non-uniform degrees and the ranks separate (plan literal —
# the large-gazetteer path is linking.gazetteer_link's broadcast join).
_GRAPH_LEXICON = [
    "spark", "customer", "vector", "stream", "merge", "query", "join", "scan",
]


def q_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring spans (ExactSubstr candidate
    step, Lee et al. 2022) at k=4 — the word-4-gram density where the
    synthetic corpus repeats across documents without saturating."""
    from nametag3_spark.operators.dedup import repeated_ngram_spans

    docs = _read(spark, sf_dir, "documents")
    return repeated_ngram_spans(docs, k=4, min_docs=2)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 TF-IDF terms (entity-surface/keyword salience
    ranking; rounded-then-ranked so the order is engine-identical)."""
    from nametag3_spark.operators.textstats import tfidf_top_terms

    docs = _read(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_k=5)


def q_comention_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity co-occurrence graph over documents: undirected (src<dst)
    edges weighted by co-occurring document count — the KG edge-
    materialization step downstream of mention extraction
    (nametag3_server.py:278-320 stops at per-sentence entities; the graph
    is what a KG builder derives next)."""
    from nametag3_spark.operators.graph import comention_edges

    docs = _read(spark, sf_dir, "documents")
    return comention_edges(docs, _GRAPH_LEXICON)


def q_pagerank_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration WEIGHTED damped PageRank over the co-mention
    graph (canonical-label selection / noise-node pruning signal).
    Weighted because document-level co-occurrence saturates to a near-
    complete graph on frequent surfaces — the counts carry the signal.
    Exactly 5 synchronous iterations with final 6-decimal rounding, so
    DuckDB recomputes the identical closed form with 5 unrolled CTE
    steps."""
    from nametag3_spark.operators.graph import (
        comention_edges,
        pagerank,
        unpersist_intermediates,
    )

    docs = _read(spark, sf_dir, "documents")
    out = pagerank(
        comention_edges(docs, _GRAPH_LEXICON), iters=5, weight="weight"
    )
    # bounded result (one row per lexicon entry): materialize, then free
    # the persisted adjacency/degree handles (same contract as dedup's
    # checkpoint_and_release).
    out = out.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity triangle count + local clustering coefficient over the
    co-mention graph (degree-ordered node-iterator) — the community-
    density signal a KG builder uses to separate true entity clusters
    from hub noise."""
    from nametag3_spark.operators.graph import (
        comention_edges,
        triangle_counts,
        unpersist_intermediates,
    )

    docs = _read(spark, sf_dir, "documents")
    out = triangle_counts(comention_edges(docs, _GRAPH_LEXICON))
    out = out.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def q_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted label propagation (3 synchronous rounds,
    ties to the smallest label) over the co-mention graph — community
    ids for entity-cluster canonicalization."""
    from nametag3_spark.operators.graph import (
        comention_edges,
        label_propagation,
        unpersist_intermediates,
    )

    docs = _read(spark, sf_dir, "documents")
    out = label_propagation(
        comention_edges(docs, _GRAPH_LEXICON), iters=3, weight="weight"
    )
    out = out.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the STRONG co-mention graph:
    vocabulary-free co-mention edges are thresholded at the MEDIAN
    edge weight (raw co-occurrence graphs saturate toward complete; a
    KG keeps the strong half — an exact percentile, one aggregate over
    the already-aggregated edge list, which is tiny next to the
    corpus), then every NON-adjacent pair is scored by summed
    1/ln(degree) of its common neighbors — the KG-completion candidate
    ranking (propose the strong links the corpus never quite stated).
    Hub middles capped at degree 50; float sum rounded to 6 so both
    engines agree bit-for-bit."""
    from nametag3_spark.operators.graph import (
        adamic_adar,
        comention_edges,
        unpersist_intermediates,
    )

    docs = _read(spark, sf_dir, "documents")
    edges = comention_edges(docs, None)
    # bounded driver scalar: exact median of the edge-weight column
    med = edges.agg(F.expr("percentile(weight, 0.5)").alias("m")).collect()[0][0]
    strong = edges.where(F.col("weight") >= med)
    out = adamic_adar(strong, max_degree=50)
    out = out.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def q_coref_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-heuristic pronoun coreference over a portable transcript
    derivation of the events table: each user's events become ordered
    conversation turns; a turn carries an entity mention or a pronoun
    by a deterministic residue of its event_id (pure column
    expressions, so DuckDB regenerates the identical table — the
    synth_media_portable pattern). Pronoun turns resolve to the most
    recent prior mention in the same conversation via ONE window (one
    shuffle on the conversation key)."""
    from nametag3_spark.operators.coref import resolve_pronouns

    ev = _read(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(11))
    lex = F.array(*[F.lit(s) for s in _GRAPH_LEXICON])
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("turn_idx"),
        F.when(m < 8, F.element_at(lex, (m + 1).cast("int"))).alias("mention"),
        F.when(m == 8, F.lit("he"))
        .when(m == 9, F.lit("she"))
        .when(m == 10, F.lit("they"))
        .alias("pronoun"),
    )
    return resolve_pronouns(turns).select(
        "conv_id", "turn_idx", "pronoun",
        "antecedent", "antecedent_turn", "distance",
    )


def _order_assertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic assertion log the temporal queries share:
    orders re-assert each customer's status over time — (subject,
    value, ts) with the unique order key as the same-timestamp
    tiebreak."""
    return _read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("subj"),
        F.col("o_orderstatus").alias("obj"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )


def q_triples_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 compaction of a KG assertion log: consecutive re-assertions
    of the same (subject → value) collapse into validity intervals
    [valid_from, valid_to), open interval = current fact."""
    from nametag3_spark.operators.temporal import scd2_intervals

    return scd2_intervals(
        _order_assertions(spark, sf_dir),
        keys=["subj"],
        value_col="obj",
        ts_col="ts",
        order_cols=["tb"],
    )


def q_triples_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot of the SCD2 fact table: what the KG
    believed on 1998-01-01 (pure interval filter — pushdown-able)."""
    import datetime

    from nametag3_spark.operators.temporal import asof_facts, scd2_intervals

    iv = scd2_intervals(
        _order_assertions(spark, sf_dir),
        keys=["subj"],
        value_col="obj",
        ts_col="ts",
        order_cols=["tb"],
    )
    return asof_facts(iv, datetime.datetime(1998, 1, 1))


def q_kg_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel diff of the SCD2 fact table: which customer-status
    facts were added / removed / changed between the 1994-06-01 and
    1997-06-01 snapshots (two pushdown interval filters over the same
    table + ONE full-outer join on the fact key — the KG audit query
    "what did the graph learn between snapshots")."""
    import datetime

    from nametag3_spark.operators.temporal import scd2_intervals, snapshot_diff

    iv = scd2_intervals(
        _order_assertions(spark, sf_dir),
        keys=["subj"],
        value_col="obj",
        ts_col="ts",
        order_cols=["tb"],
    )
    return snapshot_diff(
        iv,
        datetime.datetime(1994, 6, 1),
        datetime.datetime(1997, 6, 1),
        keys=["subj"],
    )


def q_kg_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth-discovery conflict resolution (2 synchronous trust/
    confidence rounds, integer-ppm arithmetic): five sources (order
    priorities) assert each customer's status; keep the argmax object
    per (subject, predicate) with confidence + belief share."""
    from nametag3_spark.operators.temporal import resolve_conflicts

    claims = _read(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("subj"),
        F.lit("order_status").alias("pred"),
        F.col("o_orderstatus").alias("obj"),
        F.col("o_orderpriority").alias("source"),
    )
    return resolve_conflicts(claims, iters=2)


def q_kg_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (TransE
    recipe) on a portable affine hash — up to k=2 corruptions per
    positive, drawn from the observed object vocabulary, minus any
    corruption that collides with a true triple. Positives: a
    deterministic 1/17 slice of lineitem as (supplier supplies part)
    and (order contains part) integer-id triples."""
    from nametag3_spark.operators.sampling import negative_triples

    li = _read(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 17 == 0
    )
    pos = li.select(
        F.col("l_suppkey").alias("subj_id"),
        F.lit(0).cast("long").alias("pred_id"),
        F.col("l_partkey").alias("obj_id"),
    ).unionByName(
        li.select(
            F.col("l_orderkey").alias("subj_id"),
            F.lit(1).cast("long").alias("pred_id"),
            F.col("l_partkey").alias("obj_id"),
        )
    )
    return negative_triples(pos, k=2, seed=0)


def q_triples_property_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPO triples → RDF property-table layout (one row per subject,
    one MAX-collapsed column + multiplicity count per predicate; a
    bounded explicit predicate list, never an inferred pivot). Triples:
    lineitem unpivoted to (order, {part | status | flag}, value)."""
    from nametag3_spark.operators.triples import property_table

    tri = _read(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS subj",
        "stack(3, 'part', CAST(l_partkey AS STRING), "
        "'status', l_linestatus, 'flag', l_returnflag) AS (pred, obj)",
    )
    return property_table(tri, ["part", "status", "flag"])


def q_bgp_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP star query over the lineitem triple view: orders with an 'F'
    status line AND an 'R' flag line, with their parts — three patterns
    sharing ?o compile to the property-table one-key join shape, every
    literal pushed below the joins. DISTINCT modifier (set semantics)."""
    from nametag3_spark.operators.bgp import bgp_query

    tri = _read(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS subj",
        "stack(3, 'part', CAST(l_partkey AS STRING), "
        "'status', l_linestatus, 'flag', l_returnflag) AS (pred, obj)",
    )
    return bgp_query(
        tri,
        [("?o", "status", "F"), ("?o", "flag", "R"), ("?o", "part", "?p")],
        select=["o", "p"],
        distinct=True,
    )


def q_bgp_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP chain query over an order→customer→nation triple view:
    orders placed by customers in NATION_7 — a 3-hop join chain where
    the literal object prunes the seed leg before any shuffle."""
    from nametag3_spark.operators.bgp import bgp_query

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    return bgp_query(
        tri,
        [
            ("?order", "ordered_by", "?cust"),
            ("?cust", "in_nation", "?nat"),
            ("?nat", "named", "NATION_7"),
        ],
        select=["order", "cust"],
    )


def q_bgp_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BGP with a SPARQL OPTIONAL block: every customer in NATION_3,
    optionally joined to their pending ('P'-status) orders — customers
    with none keep a NULL ?o, the left-join semantics OPTIONAL exists
    for. The optional group is itself a 2-pattern inner sub-plan."""
    from nametag3_spark.operators.bgp import bgp_query

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            orders.selectExpr(
                "CAST(o_orderkey AS STRING) AS subj",
                "'status' AS pred",
                "o_orderstatus AS obj",
            )
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    return bgp_query(
        tri,
        [("?c", "in_nation", "?nat"), ("?nat", "named", "NATION_3")],
        optional=[[("?o", "ordered_by", "?c"), ("?o", "status", "P")]],
        select=["c", "o"],
    )


def q_sparql_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL with an inner FILTER (SPARQL LeftJoin-condition
    scoping) plus the ``!BOUND`` absent-fact negation idiom, end to
    end through the TEXT front end: customers in NATION_3 with NO
    pending ('P'-status) order whose key is under 2000. The inner
    filter must scope to the left join — a customer whose pending
    orders are all >= 2000 still matches; hoisted to the top level
    the same filter would drop every unmatched customer before
    !BOUND could see the NULL. Reference: nametag3 has no query
    language; this completes the SPARQL OPTIONAL surface
    (SURVEY §2 BGP family)."""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            orders.selectExpr(
                "CAST(o_orderkey AS STRING) AS subj",
                "'status' AS pred",
                "o_orderstatus AS obj",
            )
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    q = """SELECT ?c WHERE {
             ?c in_nation ?nat .
             ?nat named 'NATION_3' .
             OPTIONAL { ?o ordered_by ?c . ?o status 'P' .
                        FILTER (?o < 2000) }
             FILTER (!BOUND(?o))
           }"""
    return execute(tri, q)


def q_sparql_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SPARQL TEXT front end end-to-end (operators/sparql.py):
    a SELECT with a conjunctive (&&) FILTER expression (numeric
    compare via try_cast + STRSTARTS), a MINUS block, and ORDER BY/
    LIMIT modifiers over the order→customer→nation triple view. The
    order key is unique per row, so the LIMIT subset is deterministic
    and cross-engine comparable."""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    q = """SELECT ?o ?c ?nm WHERE {
             ?o ordered_by ?c .
             ?c in_nation ?n .
             ?n named ?nm .
             FILTER (STRSTARTS(?nm, 'NATION_1') && ?o < 5000)
             MINUS { ?c in_nation 13 }
           } ORDER BY ?o ?c LIMIT 200"""
    return execute(tri, q)


def q_sparql_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL GROUP BY aggregation through the TEXT front end: orders
    per nation with distinct-customer counts and the lexicographically
    first order key — one-shuffle hash aggregate over the compiled
    BGP (COUNT→BIGINT on both engines; no float SUM, whose
    association order is engine-dependent). Routes through the
    SELECT-DISTINCT-with-aggregates path (round 5): grouping is finer
    than the projection (?n rides in GROUP BY but not SELECT) and
    Distinct applies after projection — ?n↔?nm is 1:1 in TPC-H, so
    the rows (and the DuckDB oracle) are unchanged while the driver
    witnesses the new projection+dedup plan every round."""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    q = """SELECT DISTINCT ?nm (COUNT(?o) AS ?n_orders)
                  (COUNT(DISTINCT ?c) AS ?n_custs)
                  (MIN(?o) AS ?first_order)
           WHERE {
             ?o ordered_by ?c .
             ?c in_nation ?n .
             ?n named ?nm .
           } GROUP BY ?nm ?n ORDER BY ?nm"""
    return execute(tri, q)


def q_sparql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL subquery through the TEXT front end: an aggregated
    { SELECT ... GROUP BY ... HAVING } block compiled to its own
    DataFrame and joined into the outer chain on the projected var —
    frequent customers (>=15 orders) and their orders. (c, o) pairs
    are unique, so ORDER BY + LIMIT is deterministic.

    (Measured, not changed: spreading the narrow orders scan here is a
    wash — both pattern legs re-shuffle the spread union, costing what
    the parallel partial aggregation saves.)"""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    tri = orders.selectExpr(
        "CAST(o_orderkey AS STRING) AS subj",
        "'ordered_by' AS pred",
        "CAST(o_custkey AS STRING) AS obj",
    )
    q = """SELECT ?c ?o WHERE {
             ?o ordered_by ?c .
             { SELECT ?c (COUNT(?k) AS ?n) WHERE { ?k ordered_by ?c }
               GROUP BY ?c HAVING (?n >= 15) }
           } ORDER BY ?c ?o LIMIT 200"""
    return execute(tri, q)


def q_sparql_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-scoped quad query through the text front end: the order
    status is the named graph (the per-snapshot/provenance shape), a
    graph VARIABLE binds it, and both patterns must match within one
    graph. Counts per graph keep the result small and hashable."""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    quads = orders.selectExpr(
        "o_orderstatus AS graph",
        "CAST(o_orderkey AS STRING) AS subj",
        "'ordered_by' AS pred",
        "CAST(o_custkey AS STRING) AS obj",
    )
    return execute(
        quads,
        "SELECT ?g (COUNT(?o) AS ?n_orders) "
        "(COUNT(DISTINCT ?c) AS ?n_custs) WHERE "
        "{ GRAPH ?g { ?o ordered_by ?c } } GROUP BY ?g ORDER BY ?g",
    )


def q_bgp_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property-path BGP: every strict descendant of PRODUCT via
    `subclass+` (one-or-more path, closed with bounded doubling),
    joined with the plain `subclass` pattern for its direct parent."""
    from nametag3_spark.operators.bgp import bgp_query

    part = _read(spark, sf_dir, "part")
    tri = (
        part.selectExpr(
            "p_brand AS subj", "'subclass' AS pred", "p_type AS obj"
        )
        .unionByName(
            part.selectExpr(
                "p_type AS subj", "'subclass' AS pred", "'PRODUCT' AS obj"
            )
        )
        .distinct()
    )
    return bgp_query(
        tri,
        [("?c", "subclass+", "PRODUCT"), ("?c", "subclass", "?parent")],
        select=["c", "parent"],
        path_depth=4,  # depth-2 hierarchy: 2 doubling rounds suffice
    )


def q_sparql_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a UNION composed with other patterns through the
    TEXT front end (round-5 lift of the two documented structural
    limits at once): the union chain compiles to one binding-set leg,
    joins the in_nation/named patterns, and feeds the one-shuffle hash
    aggregate. Branches are disjoint by construction (an order has one
    status), so the bag-union count equals the filtered count."""
    from nametag3_spark.operators.sparql import execute

    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            orders.selectExpr(
                "CAST(o_orderkey AS STRING) AS subj",
                "'status' AS pred",
                "o_orderstatus AS obj",
            )
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    q = """SELECT ?nm (COUNT(?o) AS ?n_rows) WHERE {
             ?c in_nation ?n .
             ?n named ?nm .
             { ?o ordered_by ?c . ?o status F }
             UNION
             { ?o ordered_by ?c . ?o status P }
           } GROUP BY ?nm ORDER BY ?nm"""
    return execute(tri, q)


def q_bgp_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONSTRUCT rule with FILTER NOT EXISTS: non-pending orders by
    customers in named nations derive (order, shipped_to, nation_name)
    plus a type assertion per nation — single-rule forward chaining,
    the rule-based KG-construction primitive.

    The orders scan is spread when narrow: both orders-derived predicate
    branches otherwise pipeline the whole broadcast-join match chain
    into one scan task (measured >2× at 10× scale)."""
    from nametag3_spark.operators.bgp import construct
    from nametag3_spark.operators.skew import spread_if_narrow

    orders = spread_if_narrow(_read(spark, sf_dir, "orders"), "o_orderkey")
    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        orders.selectExpr(
            "CAST(o_orderkey AS STRING) AS subj",
            "'ordered_by' AS pred",
            "CAST(o_custkey AS STRING) AS obj",
        )
        .unionByName(
            orders.selectExpr(
                "CAST(o_orderkey AS STRING) AS subj",
                "'status' AS pred",
                "o_orderstatus AS obj",
            )
        )
        .unionByName(
            cust.selectExpr(
                "CAST(c_custkey AS STRING) AS subj",
                "'in_nation' AS pred",
                "CAST(c_nationkey AS STRING) AS obj",
            )
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    return construct(
        tri,
        [
            ("?o", "ordered_by", "?c"),
            ("?c", "in_nation", "?nk"),
            ("?nk", "named", "?n"),
        ],
        template=[
            ("?o", "shipped_to", "?n"),
            ("?n", "rdf_type", "Nation"),
        ],
        not_exists=[[("?o", "status", "P")]],
    )


def q_kg_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE over the order/customer/nation triple view: the entity
    card for NATION_7's key — one pushed-down subj-or-obj scan."""
    from nametag3_spark.operators.bgp import describe

    cust = _read(spark, sf_dir, "customer")
    nation = _read(spark, sf_dir, "nation")
    tri = (
        cust.selectExpr(
            "CAST(c_custkey AS STRING) AS subj",
            "'in_nation' AS pred",
            "CAST(c_nationkey AS STRING) AS obj",
        )
        .unionByName(
            nation.selectExpr(
                "CAST(n_nationkey AS STRING) AS subj",
                "'named' AS pred",
                "n_name AS obj",
            )
        )
    )
    return describe(tri, "7")


def q_kg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-predicate triple-store statistics — cardinality and distinct
    subject/object counts, the selectivity numbers a BGP planner seeds
    its join order with (and the skew map for hot-predicate handling).
    One scan, one partial-agg groupBy."""
    tri = _read(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS subj",
        "stack(3, 'part', CAST(l_partkey AS STRING), "
        "'status', l_linestatus, 'flag', l_returnflag) AS (pred, obj)",
    )
    return tri.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_triples"),
        F.countDistinct("subj").cast("long").alias("n_subj"),
        F.countDistinct("obj").cast("long").alias("n_obj"),
    )


def q_kg_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-chaining rule engine in SEMI-NAIVE mode: seed `anc` from
    the subclass edges, then one transitivity round over the delta
    frontier — 2 fixed rounds close the depth-2 part hierarchy. Output:
    the derived `anc` facts only (base triples filtered out)."""
    from nametag3_spark.operators.bgp import apply_rules

    part = _read(spark, sf_dir, "part")
    tri = (
        part.selectExpr("p_brand AS subj", "'subclass' AS pred", "p_type AS obj")
        .unionByName(
            part.selectExpr(
                "p_type AS subj", "'subclass' AS pred", "'PRODUCT' AS obj"
            )
        )
        .distinct()
    )
    rules = [
        ([("?x", "subclass", "?y")], [("?x", "anc", "?y")]),
        ([("?x", "anc", "?y"), ("?y", "anc", "?z")], [("?x", "anc", "?z")]),
    ]
    out = apply_rules(tri, rules, rounds=2, semi_naive=True)
    return out.where(F.col("pred") == "anc").select("subj", "pred", "obj")


def q_kg_type_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS-style type inference: close the brand→type→PRODUCT subclass
    hierarchy derived from the part table (TBox, ontology-sized) with
    iterative doubling, then materialize every inferred ancestor type
    for every part (ABox, corpus-sized, touched once via broadcast
    join). Output: per-(type, inferred) instance counts."""
    from nametag3_spark.operators.ontology import infer_types, transitive_closure

    part = _read(spark, sf_dir, "part")
    tbox = (
        part.selectExpr("p_brand AS child", "p_type AS parent")
        .unionByName(part.selectExpr("p_type AS child", "'PRODUCT' AS parent"))
        .distinct()
    )
    abox = part.selectExpr("CAST(p_partkey AS STRING) AS id", "p_brand AS type")
    # the hierarchy is depth 2; max_depth=4 (2 doubling rounds) halves
    # the plan vs the depth-16 default with an identical closure
    typed = infer_types(abox, transitive_closure(tbox, max_depth=4))
    return (
        typed.groupBy("type", "inferred")
        .agg(F.count("*").cast("long").alias("n_instances"))
    )


def q_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop BFS neighborhoods (minimal hop distance) from two seed
    entities over the co-mention graph — the KG neighborhood-expansion
    primitive (GNN subgraph sampling / related-entity serving)."""
    from nametag3_spark.operators.graph import (
        comention_edges,
        khop_neighbors,
        unpersist_intermediates,
    )

    docs = _read(spark, sf_dir, "documents")
    out = khop_neighbors(
        comention_edges(docs, _GRAPH_LEXICON), sources=["spark", "merge"], k=2
    )
    out = out.localCheckpoint(eager=True)
    unpersist_intermediates()
    return out


def _serve_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared builder for the serving-surface queries: 200 recognize/
    tokenize requests derived deterministically from the documents table
    (doc_id arithmetic picks endpoint/output and injects the reference's
    error paths: unknown model, missing data), processed through
    serving.process_requests in one fused Python pass."""
    from nametag3_spark.serving import ModelRegistry, process_requests

    registry = ModelRegistry()
    registry.register(
        "nametag3-multilingual-250203:nametag3-english",
        scorer="oracle",
        acknowledgements="demo",
    )
    docs = _read(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    outputs = F.array(
        F.lit("xml"), F.lit("vertical"), F.lit("conll"), F.lit("conllu-ne")
    )
    # the documents corpus carries no gazetteer names — prepend a rotating
    # entity-bearing sentence so the recognize path decodes real (incl.
    # nested) spans, not just O-runs
    preambles = F.array(
        F.lit("John Smith visited Bank of New York ."),
        F.lit("Mary Jones arrived in Paris ."),
        F.lit("Acme Corp hired Jan Novák ."),
        F.lit("University of Prague hosts the Olympics ."),
    )
    data = F.concat(
        F.element_at(preambles, (F.col("doc_id") % 4 + 1).cast("int")),
        F.lit("\n"),
        F.col("text"),
    )
    reqs = docs.select(
        F.col("doc_id").cast("string").alias("request_id"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("tokenize"))
        .otherwise(F.lit("recognize"))
        .alias("endpoint"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(data)
        .alias("data"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("no-such-model"))
        .otherwise(F.lit(None).cast("string"))
        .alias("model"),
        F.lit(None).cast("string").alias("input"),
        F.element_at(outputs, (F.col("doc_id") % 4 + 1).cast("int")).alias(
            "output"
        ),
    )
    return process_requests(reqs, registry)


def q_serve_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch request-serving surface (serving.py — the Spark-first analog
    of nametag3_server.py:455-717), full response rows. Rows-only: the
    scorer and renderers are not SQL-expressible; the validation half is
    oracle-verified separately by ``serve_status``."""
    return _serve_responses(spark, sf_dir).select(
        "request_id",
        "status",
        "content_type",
        "model",
        "billing_nfc_len",
        "n_sentences",
        "n_entities",
        F.length("body").alias("body_len"),
    )


def q_serve_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving surface's VALIDATION cascade, cross-engine-verified:
    status code, content type, and resolved canonical model name are pure
    relational logic (error-precedence when-chain + broadcast alias join
    + error/ok union), so DuckDB recomputes them from the same doc_id
    arithmetic — oracle-green coverage for the half of serving.py that is
    SQL-expressible (the scored bodies stay in ``serve_requests``)."""
    return _serve_responses(spark, sf_dir).select(
        "request_id", "status", "content_type", "model"
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a 3-term query — the lexical
    retrieval primitive of the training-data/RAG pipeline
    (operators/retrieval.py). Scores are fixed-point BIGINT micro
    units summed as INTEGERS (order-independent, exact), so DuckDB
    recomputes the identical ranking from the same tokenization."""
    from nametag3_spark.operators.retrieval import bm25_topk

    docs = _read(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "query", "stream"], k=10)


def q_cluster_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise P/R/F1 of a noisy entity canonicalization against gold
    clusters (eval/clusters.py) — the quality gate for the north-rule
    canonicalize stage, computed WITHOUT materializing any pair
    (three keyed aggregations, Σ C(n,2) identities). The portable
    input: customers cluster by nation (gold); the 'canonicalizer'
    mis-merges every 7th customer into the next nation (pred) — pure
    column arithmetic both engines regenerate identically."""
    from nametag3_spark.eval.clusters import pairwise_cluster_metrics

    cust = _read(spark, sf_dir, "customer")
    assign = cust.select(
        F.col("c_nationkey").cast("long").alias("gold_cluster"),
        F.when(
            F.pmod(F.col("c_custkey"), F.lit(7)) == 0,
            F.pmod(F.col("c_nationkey") + 1, F.lit(25)),
        )
        .otherwise(F.col("c_nationkey"))
        .cast("long")
        .alias("pred_cluster"),
    )
    return pairwise_cluster_metrics(assign)


def q_pmi_comention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-weighted co-mention edges over the shared lexicon
    (graph.pmi_edges): association strength replaces raw counts for
    KG edge selection — frequent surfaces stop dominating. Integer
    ppm fixed point from integer-only counts; DuckDB rebuilds the
    mention table, both aggregates, and the ln."""
    from nametag3_spark.operators.graph import pmi_edges

    docs = _read(spark, sf_dir, "documents")
    return pmi_edges(docs, _GRAPH_LEXICON, min_weight=2)


def q_session_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-gap sessionization of the events stream
    (temporal.sessionize_by_gap, 30-min gap): per-session event count
    and start/end epoch — the visit segmentation a transcript
    pipeline runs before per-session rollups. ONE shuffle on the
    user key serves the lag, the running sum, and the final
    aggregation."""
    from nametag3_spark.operators.temporal import sessionize_by_gap

    ev = _read(spark, sf_dir, "events")
    s = sessionize_by_gap(
        ev, gap_seconds=1800, key_col="user_id", ts_col="ts",
        tiebreak_col="event_id",
    )
    ep = F.col("ts").cast("timestamp").cast("long")
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(ep).alias("start_ep"),
        F.max(ep).alias("end_ep"),
    )


# ---------------------------------------------------------------------------
# Driver-window rotation. The round driver executes (and ledgers) only the
# FIRST 50 registered queries; with 94 registered, a static order leaves 44
# queries permanently driver-unwitnessed (round 4 shipped 27 locally-green
# oracle queries and all 8 rows-only pipelines with no ledger row). The
# order is therefore round-dependent: 6 PINNED core queries (cheap, warmup
# absorber first) occupy slots 1-6 every round, and the remaining 88 split
# into two 44-query halves that alternate through slots 7-50 by round
# parity — every query gets a driver row at least every other round,
# pinned ones every round. The round index is the
# count of driver-written CORRECTNESS_r*.json ledgers beside this file
# (deterministic at driver time; the driver writes r{N} AFTER running).
# Within each half the order is measured sf0.01 wall cost ascending, with
# rows-only entries last, so a wall-budget truncation can only ever drop
# the heaviest tail. ``tests/test_driver_contract.py`` locks the policy.

_PINNED = [
    "scan_filter_project",  # warmup absorber: near-zero cost, runs first
    "token_stats",
    "label_rewrite",
    "dedup_exact",
    "bgp_star",
    "sparql_aggregate",
]

# the half that was NOT driver-witnessed in round 4 (27 oracle-backed +
# the 8 rows-only pipelines) — serves on EVEN round indices (round 5 has
# four CORRECTNESS ledgers on disk → index 4 → this half is in-window)
_POOL_EVEN = [
    "eval_suptype",
    "string_functions",
    "kg_diff",
    "coref_resolve",
    "sparql_union",
    "graph_communities",
    "dedup_keep_list",
    "ivf_recall",
    "serve_status",
    "repeated_ngram_spans",
    "graph_khop",
    "minhash_pairs_portable",
    "decontaminate",
    "vocab_unk_fallback",
    "semantic_dedup",
    "graph_triangles",
    "embedding_near_dup",
    "link_prediction",
    "kg_conflicts",
    "tpch_q1",
    "media_features",
    "kg_type_closure",
    "bgp_path",
    "bgp_construct",
    "kg_rules",
    "kg_stats",
    "kg_describe",
    "pagerank_entities",
    "lsh_ann_topk",
    "minhash_recall",
    "ann_recall",
    "sparql_bound",
    # round-5 additions + queries demoted from _PINNED when it shrank
    # to 6 (window stays exactly 50 with 44-query halves)
    "cosine_topk",
    "comention_edges",
    "bm25_search",
    "cluster_eval",
    # rows-only tail (no SQL twin): driver records a rows-only check
    "serve_requests",
    "pipeline_seq2seq",
    "pipeline_mentions",
    "minhash_dedup_pairs",
    "pipeline_windows",
    "pipeline_triples",
    "pipeline_span_eval",
    "pipeline_np_model",
]

# the non-pinned remainder of round 4's witnessed window — serves on ODD
# round indices; all oracle-backed, measured-cost ascending
_POOL_ODD = [
    "sessionize",
    "join_orders_customer",
    "pack_sequences",
    "asof_signup",
    "deterministic_sample",
    "validate_quarantine",
    "quality_features",
    "billing_metrics",
    "langid",
    "quality_filter",
    "fingerprint",
    "pii_redact",
    "bgp_chain",
    "sparql_select",
    "sparql_subquery",
    "sparql_graph",
    "embedding_adjacent_cosine",
    "simhash_buckets",
    "simhash_pairs",  # demoted from _PINNED to make room for sparql_bound
    "iob2_rewrite",
    "upsert_latest",
    "triples_asof",
    "bgp_optional",
    "carry_forward",
    "topk_per_group",
    "triples_property_table",
    "cube_breakdown",
    "union_dedup",
    "media_frames",
    "eval_length_cube",
    "anti_join",
    "sampling_weights",
    "repetition_stats",
    "tfidf_top_terms",
    "ngram_jaccard_adjacent",
    "kg_negative_samples",
    "jaccard_pairs_exact",
    "ivf_ann_topk",
    "multiset_intersection",
    "broadcast_dim_join",
    # round-5 additions + queries demoted from _PINNED when it shrank
    "triples_scd2",
    "eval_token_accuracy",
    "pmi_comention",
    "session_gaps",
]


def _driver_round_index() -> int:
    """How many rounds the driver has completed: it writes one
    CORRECTNESS_r{N}.json beside this file per finished round, so at
    round-N execution time N-1 ledgers exist. Deterministic for the
    whole round (the current round's ledger lands only afterwards)."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    return len(glob.glob(os.path.join(here, "CORRECTNESS_r[0-9]*.json")))


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every registered query, name → callable (order-free)."""
    g = globals()
    return {
        name: g[f"q_{name}"]
        for name in _PINNED + _POOL_EVEN + _POOL_ODD
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration order IS the driver's execution order; the driver
    ledgers only the first 50 entries. Order = 6 pinned core queries,
    then the 44-query rotation half for this round's parity (the
    driver's 50-query window), then the deferred half (driver-unreached
    this round, witnessed last round and next round)."""
    in_window, deferred = (
        (_POOL_EVEN, _POOL_ODD)
        if _driver_round_index() % 2 == 0
        else (_POOL_ODD, _POOL_EVEN)
    )
    reg = _registry()
    return {name: reg[name] for name in _PINNED + in_window + deferred}


def _ivf_recall_oracle() -> str | None:
    """Build the ivf_recall oracle: retrain the centroids OUTSIDE Spark
    (DuckDB sample + the same numpy Lloyd core — bit-identical to what
    ``q_ivf_recall`` trains via the portable sample hash) and ship them
    into the SQL as literals; DuckDB then recomputes cell assignment,
    nprobe probing, candidate re-scoring, exact top-k, and the recall
    arithmetic independently. The driver's oracle run is contractually
    sf0.01; override via SPARK_GRAFT_ORACLE_SF_DIR for local checks at
    other SFs. Returns None (→ rows-only) if the parquet is unreadable."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    try:
        from nametag3_spark.operators.similarity import (
            train_ivf_centroids_duckdb,
        )

        cents = train_ivf_centroids_duckdb(
            f"{sf_dir}/embeddings.parquet", n_centroids=8
        )
    except Exception:
        return None
    values = ",\n                  ".join(
        f"({i}, CAST({c} AS DOUBLE[]))" for i, c in enumerate(cents)
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents(cell, c) AS (VALUES {values}),
        cscore AS (
            SELECT e.vec_id, cents.cell,
                   list_inner_product(e.v, cents.c) AS s
            FROM e CROSS JOIN cents
        ),
        ranked AS (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY s DESC, cell) AS rn
            FROM cscore
        ),
        ccell AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
        qcell AS (SELECT vec_id AS query_id, cell FROM ranked
                  WHERE vec_id % 100 = 0 AND rn <= 3),
        cand AS (
            SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
            FROM qcell q JOIN ccell c USING (cell)
            WHERE q.query_id <> c.vec_id
        ),
        rescored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(qe.v, ne.v) AS cos
            FROM cand
            JOIN e qe ON qe.vec_id = cand.query_id
            JOIN e ne ON ne.vec_id = cand.neighbor_id
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rn
                FROM rescored) WHERE rn <= 3
        ),
        escore AS (
            SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
                   list_cosine_similarity(qe.v, ne.v) AS cos
            FROM e qe CROSS JOIN e ne
            WHERE qe.vec_id % 100 = 0 AND ne.vec_id <> qe.vec_id
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rn
                FROM escore) WHERE rn <= 3
        ),
        hit AS (SELECT query_id, neighbor_id FROM approx
                INTERSECT SELECT query_id, neighbor_id FROM exact),
        counts AS (
            SELECT (SELECT COUNT(*) FROM exact) AS n_ex,
                   (SELECT COUNT(*) FROM hit) AS n_hit
        )
        SELECT CAST(n_ex / 3 AS BIGINT) AS n_queries,
               3 AS k,
               n_hit,
               ROUND(CAST(n_hit AS DOUBLE)
                     / (CAST(n_ex / 3 AS BIGINT) * 3), 4) AS recall
        FROM counts
    """


def _sign_lsh_buckets_union(n_planes: int, n_tables: int) -> str:
    """UNION-ALL CTE body recomputing the portable sign-LSH buckets in
    DuckDB: weight(i,p,t) = (((i*1103515245 + (p+1)*12345 +
    (t+1)*2654435761) % 2001) - 1000)/1000, projection = in-order fold of
    float32-corpus × double-weight products (bit-identical to Spark's
    F.aggregate from 0.0), bucket = Σ_p (proj_p > 0) << p. Mirrors
    similarity._plane_weight/_hyperplane_sign_bits exactly."""

    def proj(p: int, t: int) -> str:
        c_pt = (p + 1) * 12_345 + (t + 1) * 2_654_435_761
        return (
            "list_reduce(list_transform(range(1, len(v)+1), "
            f"i -> v[i] * ((((i-1)*1103515245 + {c_pt}) % 2001) - 1000) "
            "/ 1000.0), (a, b) -> a + b)"
        )

    def bucket(t: int) -> str:
        return " + ".join(
            f"CASE WHEN {proj(p, t)} > 0 THEN {1 << p} ELSE 0 END"
            for p in range(n_planes)
        )

    return "\n                UNION ALL\n                ".join(
        f"SELECT vec_id, {t} AS tbl, {bucket(t)} AS bucket FROM e"
        for t in range(n_tables)
    )


def _lsh_ann_topk_oracle() -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        buckets AS (
                {_sign_lsh_buckets_union(n_planes=4, n_tables=8)}
        ),
        qb AS (SELECT vec_id AS query_id, tbl, bucket FROM buckets
               WHERE vec_id < 5),
        cand AS (
            SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
            FROM qb JOIN buckets b USING (tbl, bucket)
            WHERE qb.query_id <> b.vec_id
        ),
        rescored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(qe.v, ne.v) AS cos
            FROM cand
            JOIN e qe ON qe.vec_id = cand.query_id
            JOIN e ne ON ne.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rk
            FROM rescored) WHERE rk <= 3
    """


def _ann_recall_oracle() -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        buckets AS (
                {_sign_lsh_buckets_union(n_planes=3, n_tables=12)}
        ),
        qb AS (SELECT vec_id AS query_id, tbl, bucket FROM buckets
               WHERE vec_id % 100 = 0),
        cand AS (
            SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
            FROM qb JOIN buckets b USING (tbl, bucket)
            WHERE qb.query_id <> b.vec_id
        ),
        rescored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   list_cosine_similarity(qe.v, ne.v) AS cos
            FROM cand
            JOIN e qe ON qe.vec_id = cand.query_id
            JOIN e ne ON ne.vec_id = cand.neighbor_id
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rn
                FROM rescored) WHERE rn <= 3
        ),
        escore AS (
            SELECT qe.vec_id AS query_id, ne.vec_id AS neighbor_id,
                   list_cosine_similarity(qe.v, ne.v) AS cos
            FROM e qe CROSS JOIN e ne
            WHERE qe.vec_id % 100 = 0 AND ne.vec_id <> qe.vec_id
        ),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rn
                FROM escore) WHERE rn <= 3
        ),
        hit AS (SELECT query_id, neighbor_id FROM approx
                INTERSECT SELECT query_id, neighbor_id FROM exact),
        counts AS (
            SELECT (SELECT COUNT(*) FROM exact) AS n_ex,
                   (SELECT COUNT(*) FROM hit) AS n_hit
        )
        SELECT CAST(n_ex / 3 AS BIGINT) AS n_queries,
               3 AS k,
               n_hit,
               ROUND(CAST(n_hit AS DOUBLE)
                     / (CAST(n_ex / 3 AS BIGINT) * 3), 4) AS recall
        FROM counts
    """


def _embedding_near_dup_oracle() -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        buckets AS (
                {_sign_lsh_buckets_union(n_planes=4, n_tables=8)}
        ),
        clean AS (
            SELECT buckets.* FROM buckets
            ANTI JOIN (SELECT tbl, bucket FROM buckets
                       GROUP BY 1, 2 HAVING COUNT(*) > 10000) hot
            USING (tbl, bucket)
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM clean a JOIN clean b USING (tbl, bucket)
            WHERE a.vec_id < b.vec_id
        )
        SELECT id_a, id_b
        FROM cand
        JOIN e ea ON ea.vec_id = cand.id_a
        JOIN e eb ON eb.vec_id = cand.id_b
        WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3
    """


def _semantic_dedup_oracle() -> str | None:
    """SemDeDup oracle: retrain the IVF centroids outside Spark (portable
    sample hash + the shared numpy Lloyd core → bit-identical to what
    ``q_semantic_dedup`` uses), ship them as literals, then let DuckDB
    independently recompute cell assignment, within-cell cosine pairs,
    the recursive-CTE connected components, and the min-id keep list."""
    import os

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    try:
        from nametag3_spark.operators.similarity import (
            train_ivf_centroids_duckdb,
        )

        cents = train_ivf_centroids_duckdb(
            f"{sf_dir}/embeddings.parquet", n_centroids=8
        )
    except Exception:
        return None
    values = ",\n                  ".join(
        f"({i}, CAST({c} AS DOUBLE[]))" for i, c in enumerate(cents)
    )
    return f"""
        WITH RECURSIVE e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        cents(cell, c) AS (VALUES {values}),
        asg AS (
            SELECT vec_id, v, cell FROM (
                SELECT e.vec_id, e.v, cents.cell,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id
                           ORDER BY list_inner_product(e.v, cents.c) DESC,
                                    cell) AS rn
                FROM e CROSS JOIN cents
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM asg a JOIN asg b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
        ),
        sym AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        cc(node, comp) AS (
            SELECT a, a FROM sym
            UNION
            SELECT s.b, cc.comp FROM cc JOIN sym s ON s.a = cc.node
        ),
        labels AS (
            SELECT node, MIN(comp) AS keep_id FROM cc GROUP BY node
        )
        SELECT e.vec_id,
               COALESCE(l.keep_id, e.vec_id) AS keep_id,
               COALESCE(l.keep_id, e.vec_id) <> e.vec_id AS is_dup
        FROM e LEFT JOIN labels l ON l.node = e.vec_id
    """


def oracle_sql() -> dict[str, str]:
    ivf_recall = _ivf_recall_oracle()
    extras = {"ivf_recall": ivf_recall} if ivf_recall else {}
    extras["lsh_ann_topk"] = _lsh_ann_topk_oracle()
    extras["ann_recall"] = _ann_recall_oracle()
    extras["embedding_near_dup"] = _embedding_near_dup_oracle()
    semantic = _semantic_dedup_oracle()
    if semantic:
        extras["semantic_dedup"] = semantic
    return extras | {
        "scan_filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag AS flag
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1995-01-01' AND l_quantity > 45
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                        AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_orders_customer": """
            SELECT o_orderkey, c_custkey, c_name,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
        """,
        "broadcast_dim_join": """
            SELECT r_name, n_name, COUNT(*) AS n_suppliers,
                   CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "multiset_intersection": """
            WITH a AS (
                SELECT event_type, COUNT(*) AS n_a FROM events
                WHERE user_id % 2 = 0 GROUP BY event_type
            ), b AS (
                SELECT event_type, COUNT(*) AS n_b FROM events
                WHERE user_id % 2 = 1 GROUP BY event_type
            )
            SELECT COALESCE(a.event_type, b.event_type) AS event_type,
                   COALESCE(n_a, 0) AS n_a,
                   COALESCE(n_b, 0) AS n_b,
                   LEAST(COALESCE(n_a, 0), COALESCE(n_b, 0)) AS n_common
            FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
        """,
        "cube_breakdown": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "topk_per_group": """
            SELECT o_orderstatus, o_orderkey, CAST(rk AS INT) AS rk FROM (
                SELECT o_orderstatus, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
        "sessionize": """
            WITH flagged AS (
                SELECT user_id,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "carry_forward": """
            SELECT event_id, user_id, ts,
                   LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_signup_ts
            FROM events
        """,
        "asof_signup": """
            SELECT event_id, user_id, ts, asof_signup_ts FROM (
                SELECT event_id, user_id, ts, event_type,
                       LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
                           OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS asof_signup_ts
                FROM events
            ) WHERE event_type = 'purchase'
        """,
        "sampling_weights": """
            WITH c AS (
                SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
            ), t AS (SELECT SUM(n) AS tot FROM c)
            SELECT o_orderpriority, n,
                   ROUND(n / tot, 6) AS w_proportional,
                   ROUND(POW(CAST(n AS DOUBLE), 0.5), 4) AS w_temperature
            FROM c CROSS JOIN t
        """,
        "union_dedup": """
            SELECT s, COUNT(*) AS n_distinct_keys FROM (
                SELECT DISTINCT * FROM (
                    SELECT o_custkey AS k, o_orderstatus AS s FROM orders
                    UNION ALL
                    SELECT o_custkey AS k, 'ALL' AS s FROM orders
                )
            ) GROUP BY s
        """,
        "anti_join": """
            SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
            AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'signup')
        """,
        "string_functions": """
            SELECT p_partkey,
                   string_split(p_type, ' ')[1] AS type_head,
                   substring(p_brand, 1, 5) AS brand5,
                   starts_with(p_name, 'a') AS starts_a,
                   upper(p_brand) AS brand_upper,
                   concat_ws('-', p_brand, p_type) AS brand_type,
                   CAST(length(p_name) AS INT) AS name_len
            FROM part
        """,
        "label_rewrite": """
            SELECT event_id, event_type,
                   CASE WHEN event_type = 'view' THEN event_type
                        ELSE event_type || '-onto' END AS tagged,
                   regexp_replace(
                       CASE WHEN event_type = 'view' THEN event_type
                            ELSE event_type || '-onto' END, '-onto$', '') AS stripped
            FROM events
        """,
        "vocab_unk_fallback": """
            WITH vocab(event_type, label_id) AS (
                VALUES ('view', 1), ('click', 2), ('signup', 3)
            )
            SELECT e.event_type, COALESCE(v.label_id, 0) AS label_id, COUNT(*) AS n
            FROM events e LEFT JOIN vocab v ON e.event_type = v.event_type
            GROUP BY e.event_type, COALESCE(v.label_id, 0)
        """,
        "deterministic_sample": """
            SELECT o_orderkey, o_orderstatus FROM orders
            WHERE ((o_orderkey * 2654435761) % 4294967296) % 100 < 10
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
            FROM documents GROUP BY lower(trim(text))
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens,
                   CAST(list_sum(list_transform(
                        regexp_split_to_array(trim(text), '\\s+'),
                        w -> CAST(ceil(length(w) / 4.0) AS INT))) AS INT) AS n_subwords_est,
                   CAST(length(text) AS INT) AS n_chars_calc
            FROM documents
        """,
        "quality_features": """
            SELECT doc_id,
                   ROUND((len(regexp_split_to_array(text, '[.,;:!?]')) - 1)
                       / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1), 6)
                       AS punct_ratio,
                   ROUND(len(list_intersect(
                            list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+')),
                            ['the','and','of','to','is','in']))
                       / GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')), 1), 6)
                       AS stopword_ratio
            FROM documents
        """,
        "quality_filter": """
            WITH w AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), m AS (
                SELECT doc_id,
                       CAST(len(ws) AS INT) AS n_words,
                       CAST(list_sum(list_transform(ws, x -> length(x)))
                            AS DOUBLE) / len(ws) AS mean_len,
                       CAST(len(list_intersect(list_distinct(ws),
                            ['the','and','of','to','is','in'])) AS INT)
                           AS stop_hits
                FROM w
            ), r AS (
                SELECT doc_id, n_words, mean_len, stop_hits,
                       concat_ws(',',
                           CASE WHEN n_words < 30 THEN 'too_short' END,
                           CASE WHEN n_words > 100000 THEN 'too_long' END,
                           CASE WHEN mean_len < 3.0 OR mean_len > 4.5
                                THEN 'word_len' END,
                           CASE WHEN stop_hits < 1 THEN 'low_stopword' END
                       ) AS reasons
                FROM m
            )
            SELECT doc_id, n_words,
                   ROUND(mean_len, 4) AS mean_word_len,
                   stop_hits, reasons,
                   reasons = '' AS keep
            FROM r
        """,
        "decontaminate": """
            WITH w AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(ws) - 4, 0) + 1),
                           i -> array_to_string(ws[i+1:i+4], ' ')
                       )) AS ngs
                FROM w
            ), bench AS (
                SELECT DISTINCT unnest(ngs) AS ng FROM g WHERE doc_id % 20 = 0
            ), corp AS (
                SELECT doc_id, unnest(ngs) AS ng FROM g WHERE doc_id % 20 <> 0
            ), ov AS (
                SELECT doc_id, COUNT(*) AS n_overlap
                FROM corp JOIN bench USING (ng) GROUP BY doc_id
            )
            SELECT g.doc_id,
                   CAST(len(g.ngs) AS BIGINT) AS n_grams,
                   CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
                   COALESCE(ov.n_overlap, 0) > 0 AS contaminated
            FROM g LEFT JOIN ov USING (doc_id)
            WHERE g.doc_id % 20 <> 0
        """,
        "pii_redact": """
            WITH raw AS (
                SELECT doc_id,
                       text
                       || CASE WHEN doc_id % 3 = 0
                          THEN ' contact u' || doc_id || '@example.com'
                          ELSE '' END
                       || CASE WHEN doc_id % 4 = 0
                          THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                          THEN ' from 10.' || (doc_id % 256) || '.0.1'
                          ELSE '' END AS text
                FROM documents
            ), c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                           AS BIGINT) AS n_email,
                       CAST(len(regexp_extract_all(text,
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))
                           AS BIGINT) AS n_ipv4,
                       CAST(len(regexp_extract_all(text,
                           '\\b\\d{3}-\\d{4}\\b')) AS BIGINT) AS n_phone,
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(text,
                                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                                   '<EMAIL>', 'g'),
                               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                               '<IP>', 'g'),
                           '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS redacted
                FROM raw
            )
            SELECT doc_id, n_email, n_ipv4, n_phone, redacted,
                   (n_email + n_ipv4 + n_phone) > 0 AS has_pii
            FROM c
        """,
        "pack_sequences": """
            WITH b AS (
                SELECT doc_id,
                       CAST((doc_id * 2654435761) % 4294967296 % 4 AS INT)
                           AS shard,
                       (doc_id * 2654435761) % 4294967296 AS h,
                       CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                            AS BIGINT) AS n_tokens
                FROM documents
            ), s AS (
                SELECT doc_id, shard, n_tokens,
                       CAST(SUM(n_tokens) OVER (
                            PARTITION BY shard ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) - n_tokens
                            AS BIGINT) AS start_tok
                FROM b
            )
            SELECT doc_id, shard, n_tokens, start_tok,
                   CAST(FLOOR(start_tok / 64.0) AS BIGINT) AS first_chunk,
                   CAST(FLOOR((start_tok + n_tokens - 1) / 64.0) AS BIGINT)
                       AS last_chunk,
                   FLOOR((start_tok + n_tokens - 1) / 64.0)
                       > FLOOR(start_tok / 64.0) AS spans_boundary
            FROM s
        """,
        "repeated_ngram_spans": """
            WITH w AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id, len(ws) AS n_words,
                       unnest(list_transform(
                           range(0, GREATEST(len(ws) - 4, 0) + 1),
                           i -> array_to_string(ws[i+1:i+4], ' ')
                       )) AS ng,
                       unnest(range(0, GREATEST(len(ws) - 4, 0) + 1)) AS pos
                FROM w
            ), rep AS (
                SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM g)
                GROUP BY ng HAVING COUNT(*) >= 2
            ), h AS (
                SELECT g.doc_id, g.pos, g.n_words FROM g JOIN rep USING (ng)
            ), i AS (
                SELECT doc_id, pos, n_words,
                       CASE WHEN pos - LAG(pos) OVER (
                                PARTITION BY doc_id ORDER BY pos) <= 4
                            THEN 0 ELSE 1 END AS brk
                FROM h
            ), isl AS (
                SELECT doc_id, pos, n_words,
                       SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM i
            )
            SELECT doc_id,
                   CAST(MIN(pos) AS INT) AS span_start,
                   CAST(LEAST(MAX(pos) + 3, MAX(n_words) - 1) AS INT)
                       AS span_end,
                   CAST(LEAST(MAX(pos) + 3, MAX(n_words) - 1) - MIN(pos) + 1
                        AS INT) AS span_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM isl GROUP BY doc_id, island
        """,
        "tfidf_top_terms": """
            WITH t AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+'))
                           AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, COUNT(*) AS tf FROM t
                GROUP BY doc_id, term
            ), dfreq AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ), nn AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term,
                       CAST(tf.tf AS BIGINT) AS tf,
                       CAST(dfreq.df AS BIGINT) AS df,
                       ROUND(tf.tf * ln(CAST(nn.n AS DOUBLE) / dfreq.df), 6)
                           AS score
                FROM tf JOIN dfreq USING (term) CROSS JOIN nn
            )
            SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, term ASC) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "comention_edges": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            )
            SELECT a.surf AS src, b.surf AS dst,
                   CAST(COUNT(*) AS BIGINT) AS weight
            FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
            GROUP BY a.surf, b.surf
        """,
        # BM25: tokenization, df/tf, the Lucene idf, and the length
        # normalization all mirror retrieval.bm25_topk expression for
        # expression (same association order, same literals written as
        # the same double operations); per-term contributions round to
        # micro-units BEFORE an integer sum, so aggregation order can
        # never change a bit.
        "bm25_search": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(text)),
                                   '[^a-z0-9]+'), t -> t <> '') AS tl
                FROM documents
            ), base AS (
                SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM toks
            ), tf AS (
                SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM base WHERE term IN ('query', 'spark', 'stream')
                GROUP BY doc_id, dl, term
            ), dfreq AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY term
            ), tot AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(len(tl)) AS BIGINT) AS tok
                FROM toks
            ), scored AS (
                SELECT tf.doc_id,
                       CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
                       CAST(SUM(CAST(ROUND(
                           ln(1.0 + (CAST(tot.n AS DOUBLE) - dfreq.df + 0.5)
                                    / (dfreq.df + 0.5))
                           * (tf.tf * (1.2 + 1.0))
                           / (tf.tf + 1.2 * ((1.0 - 0.75)
                              + 0.75 * tf.dl
                                / (CAST(tot.tok AS DOUBLE) / tot.n)))
                           * 1000000.0, 0) AS BIGINT)) AS BIGINT)
                           AS score_micro
                FROM tf JOIN dfreq USING (term) CROSS JOIN tot
                GROUP BY tf.doc_id
            )
            SELECT doc_id, n_terms_hit, score_micro, CAST(rank AS INT) AS rank
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                           ORDER BY score_micro DESC, doc_id ASC) AS rank
                FROM scored
            ) WHERE rank <= 10
        """,
        # pairwise clustering P/R/F1 via the Σ C(n,2) identities —
        # integer-only arithmetic end to end (// == Spark's DIV on
        # positives; a float cast would round in DuckDB but truncate
        # in Spark)
        "cluster_eval": """
            WITH a AS (
                SELECT CAST(c_nationkey AS BIGINT) AS g,
                       CAST(CASE WHEN c_custkey % 7 = 0
                                 THEN (c_nationkey + 1) % 25
                                 ELSE c_nationkey END AS BIGINT) AS p
                FROM customer
            ), tp AS (
                SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
                           AS tp_pairs
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n
                      FROM a GROUP BY p, g)
            ), pp AS (
                SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
                           AS pred_pairs
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY p)
            ), gp AS (
                SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
                           AS gold_pairs
                FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY g)
            ), m AS (
                SELECT tp_pairs, pred_pairs, gold_pairs,
                       CAST(CASE WHEN pred_pairs > 0
                            THEN tp_pairs * 1000000 // pred_pairs
                            ELSE 0 END AS BIGINT) AS precision_ppm,
                       CAST(CASE WHEN gold_pairs > 0
                            THEN tp_pairs * 1000000 // gold_pairs
                            ELSE 0 END AS BIGINT) AS recall_ppm
                FROM tp CROSS JOIN pp CROSS JOIN gp
            )
            SELECT tp_pairs, pred_pairs, gold_pairs, precision_ppm,
                   recall_ppm,
                   CAST(CASE WHEN precision_ppm + recall_ppm > 0
                        THEN 2 * precision_ppm * recall_ppm
                             // (precision_ppm + recall_ppm)
                        ELSE 0 END AS BIGINT) AS f1_ppm
            FROM m
        """,
        # PMI re-weighting of the co-mention graph: the mention table,
        # both aggregates, and ln(weight*N/(cx*cy)) in the same
        # association order as graph.pmi_edges; integer inputs only.
        "pmi_comention": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            ), sd AS (
                SELECT surf, CAST(COUNT(*) AS BIGINT) AS n_docs
                FROM m GROUP BY surf
            ), e AS (
                SELECT a.surf AS src, b.surf AS dst,
                       CAST(COUNT(*) AS BIGINT) AS weight
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
                HAVING COUNT(*) >= 2
            ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
            SELECT e.src, e.dst, e.weight,
                   s1.n_docs AS src_docs, s2.n_docs AS dst_docs,
                   CAST(ROUND(ln((e.weight * CAST(nn.n AS DOUBLE))
                                 / (s1.n_docs * s2.n_docs))
                              * 1000000.0, 0) AS BIGINT) AS pmi_micro
            FROM e JOIN sd s1 ON s1.surf = e.src
                   JOIN sd s2 ON s2.surf = e.dst
                   CROSS JOIN nn
        """,
        # time-gap sessionization: lag + running sum on ONE (user, ts,
        # event_id) ordering, integer epoch-second arithmetic
        "session_gaps": """
            WITH e AS (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, event_id,
                       CASE WHEN LAG(CAST(floor(epoch(ts)) AS BIGINT))
                                 OVER w IS NULL THEN 1
                            WHEN CAST(floor(epoch(ts)) AS BIGINT)
                                 - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
                                 > 1800 THEN 1
                            ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, ep,
                       CAST(SUM(new_s) OVER (
                            PARTITION BY user_id ORDER BY ep, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS session_idx
                FROM e
            )
            SELECT user_id, session_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(ep) AS start_ep, MAX(ep) AS end_ep
            FROM s GROUP BY user_id, session_idx
        """,
        # Adamic-Adar over the STRONG co-mention graph (vocabulary-free
        # edges thresholded at the exact MEDIAN edge weight): wedge join
        # on the middle node (deg in [2, 50]), anti-join vs the known
        # src<dst edge set, sum rounded to 6
        "link_prediction": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf <> ''
            ), ew AS (
                SELECT a.surf AS src, b.surf AS dst, COUNT(*) AS w
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
            ), e AS (
                SELECT src, dst FROM ew
                WHERE w >= (SELECT quantile_cont(w, 0.5) FROM ew)
            ), sym AS (
                SELECT src, dst FROM e
                UNION ALL
                SELECT dst AS src, src AS dst FROM e
            ), deg AS (
                SELECT src, COUNT(*) AS deg FROM sym GROUP BY src
            ), mid AS (
                SELECT sym.src AS z, sym.dst AS leaf, deg.deg
                FROM sym JOIN deg USING (src)
                WHERE deg.deg >= 2 AND deg.deg <= 50
            ), scored AS (
                SELECT x.leaf AS a, y.leaf AS b,
                       CAST(COUNT(*) AS BIGINT) AS common_neighbors,
                       ROUND(SUM(1.0 / ln(x.deg)), 6) AS aa_score
                FROM mid x JOIN mid y
                     ON x.z = y.z AND x.leaf < y.leaf
                GROUP BY x.leaf, y.leaf
            )
            SELECT a AS src, b AS dst, common_neighbors, aa_score
            FROM scored s
            WHERE NOT EXISTS (
                SELECT 1 FROM e WHERE e.src = s.a AND e.dst = s.b
            )
        """,
        # portable transcript turns from events (residue-of-event_id
        # mention/pronoun assignment), then recency coref via one
        # IGNORE-NULLS window — DuckDB regenerates the identical table
        "coref_resolve": """
            WITH t AS (
                SELECT user_id AS conv_id,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS INT) AS turn_idx,
                       event_id % 11 AS m
                FROM events
            ), turns AS (
                SELECT conv_id, turn_idx,
                       CASE WHEN m < 8 THEN list_extract(
                           ['spark','customer','vector','stream',
                            'merge','query','join','scan'],
                           CAST(m + 1 AS INT)) END AS mention,
                       CASE WHEN m = 8 THEN 'he'
                            WHEN m = 9 THEN 'she'
                            WHEN m = 10 THEN 'they' END AS pronoun
                FROM t
            ), r AS (
                SELECT conv_id, turn_idx, pronoun,
                       last_value(mention IGNORE NULLS) OVER w
                           AS antecedent,
                       last_value(CASE WHEN mention IS NOT NULL
                                       THEN turn_idx END IGNORE NULLS)
                           OVER w AS antecedent_turn
                FROM turns
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)
            )
            SELECT conv_id, turn_idx, pronoun, antecedent,
                   antecedent_turn,
                   turn_idx - antecedent_turn AS distance
            FROM r WHERE pronoun IS NOT NULL
        """,
        "pagerank_entities": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            ), e AS (
                SELECT a.surf AS src, b.surf AS dst,
                       CAST(COUNT(*) AS DOUBLE) AS w
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
            ), sym AS (
                SELECT src, dst, SUM(w) AS w FROM (
                    SELECT src, dst, w FROM e
                    UNION ALL
                    SELECT dst AS src, src AS dst, w FROM e
                ) GROUP BY src, dst
            ), deg AS (
                SELECT src, SUM(w) AS strength FROM sym GROUP BY src
            ), nn AS (SELECT COUNT(*) AS n FROM deg),
            r0 AS (
                SELECT src AS node, 1.0 / nn.n AS rank
                FROM deg CROSS JOIN nn
            ),
            r1 AS (
                SELECT sym.dst AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                           + 0.85 * SUM(r.rank * sym.w / deg.strength) AS rank
                FROM sym JOIN deg ON deg.src = sym.src
                         JOIN r0 r ON r.node = sym.src
                         CROSS JOIN nn
                GROUP BY sym.dst
            ),
            r2 AS (
                SELECT sym.dst AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                           + 0.85 * SUM(r.rank * sym.w / deg.strength) AS rank
                FROM sym JOIN deg ON deg.src = sym.src
                         JOIN r1 r ON r.node = sym.src
                         CROSS JOIN nn
                GROUP BY sym.dst
            ),
            r3 AS (
                SELECT sym.dst AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                           + 0.85 * SUM(r.rank * sym.w / deg.strength) AS rank
                FROM sym JOIN deg ON deg.src = sym.src
                         JOIN r2 r ON r.node = sym.src
                         CROSS JOIN nn
                GROUP BY sym.dst
            ),
            r4 AS (
                SELECT sym.dst AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                           + 0.85 * SUM(r.rank * sym.w / deg.strength) AS rank
                FROM sym JOIN deg ON deg.src = sym.src
                         JOIN r3 r ON r.node = sym.src
                         CROSS JOIN nn
                GROUP BY sym.dst
            ),
            r5 AS (
                SELECT sym.dst AS node,
                       (1.0 - 0.85) / MAX(nn.n)
                           + 0.85 * SUM(r.rank * sym.w / deg.strength) AS rank
                FROM sym JOIN deg ON deg.src = sym.src
                         JOIN r4 r ON r.node = sym.src
                         CROSS JOIN nn
                GROUP BY sym.dst
            )
            SELECT node, ROUND(rank, 6) AS pagerank FROM r5
        """,
        "repetition_stats": """
            WITH w AS (
                SELECT doc_id,
                       regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(0, GREATEST(len(ws) - 2, 0) + 1),
                           i -> array_to_string(ws[i+1:i+2], ' ')
                       )) AS ng
                FROM w
            ), pg AS (
                SELECT doc_id, ng, COUNT(*) AS c FROM g GROUP BY doc_id, ng
            )
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_ngrams,
                   CAST(MAX(c) AS BIGINT) AS top_count,
                   ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_ngram_frac,
                   ROUND(1 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_ngram_frac
            FROM pg GROUP BY doc_id
        """,
        "ngram_jaccard_adjacent": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) - 3, 0) + 1),
                           i -> array_to_string(
                                regexp_split_to_array(lower(trim(text)), '\\s+')[i+1:i+3], ' ')
                       )) AS s
                FROM documents
            )
            SELECT a.doc_id AS id_a,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "jaccard_pairs_exact": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(regexp_split_to_array(lower(text), '\\s+')) - 3, 0) + 1),
                           i -> array_to_string(
                                regexp_split_to_array(lower(text), '\\s+')[i+1:i+3], ' ')
                       )) AS s
                FROM documents
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        """,
        "upsert_latest": """
            WITH ranked AS (
                SELECT event_id, ts, user_id, event_type, value, props,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC,
                                    (event_id % 2) DESC
                       ) AS rn
                FROM events
            )
            SELECT event_id, ts, user_id, event_type, value, props
            FROM ranked WHERE rn = 1
        """,
        "minhash_pairs_portable": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(regexp_split_to_array(lower(text), '\\s+')) - 3, 0) + 1),
                           i -> array_to_string(
                                regexp_split_to_array(lower(text), '\\s+')[i+1:i+3], ' ')
                       )) AS s
                FROM documents
            ), hs AS (
                SELECT doc_id,
                       list_distinct(list_transform(s,
                           w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
                                % 2147483647)) AS hs
                FROM sh WHERE len(s) > 0
            ), sig AS (
                SELECT doc_id, hs,
                       list_transform(range(0, 16), p ->
                           list_min(list_transform(hs, h ->
                               ((((p+1)*1103515245 + 12345) % 2147483647) * h
                                + (((p+1)*12345 + 67890) % 2147483647))
                               % 2147483647))) AS sig
                FROM hs
            ), bands AS (
                SELECT doc_id, b.band_idx,
                       (((((sig[b.band_idx*4+1]*31 + sig[b.band_idx*4+2]) % 2147483647) * 31
                          + sig[b.band_idx*4+3]) % 2147483647) * 31
                        + sig[b.band_idx*4+4]) % 2147483647 AS band_hash
                FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_idx) b
            ), clean AS (
                SELECT bands.* FROM bands
                ANTI JOIN (SELECT band_idx, band_hash FROM bands
                           GROUP BY 1, 2 HAVING COUNT(*) > 2000) hot
                USING (band_idx, band_hash)
            ), cands AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM clean a JOIN clean b USING (band_idx, band_hash)
                WHERE a.doc_id < b.doc_id
            )
            SELECT c.id_a, c.id_b,
                   ROUND(CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                         / len(list_distinct(list_concat(ha.hs, hb.hs))), 6) AS jaccard
            FROM cands c
            JOIN hs ha ON ha.doc_id = c.id_a
            JOIN hs hb ON hb.doc_id = c.id_b
            WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                  / len(list_distinct(list_concat(ha.hs, hb.hs))) >= 0.5
        """,
        # the recall audit composes the two already-green CTE families:
        # the portable banded-LSH pipeline (minhash_pairs_portable) as the
        # numerator set, the exact inverted-index pair set
        # (jaccard_pairs_exact) as the denominator; INTERSECT gives hits
        "minhash_recall": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(regexp_split_to_array(lower(text), '\\s+')) - 3, 0) + 1),
                           i -> array_to_string(
                                regexp_split_to_array(lower(text), '\\s+')[i+1:i+3], ' ')
                       )) AS s
                FROM documents
            ), hs AS (
                SELECT doc_id,
                       list_distinct(list_transform(s,
                           w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
                                % 2147483647)) AS hs
                FROM sh WHERE len(s) > 0
            ), sig AS (
                SELECT doc_id, hs,
                       list_transform(range(0, 16), p ->
                           list_min(list_transform(hs, h ->
                               ((((p+1)*1103515245 + 12345) % 2147483647) * h
                                + (((p+1)*12345 + 67890) % 2147483647))
                               % 2147483647))) AS sig
                FROM hs
            ), bands AS (
                SELECT doc_id, b.band_idx,
                       (((((sig[b.band_idx*4+1]*31 + sig[b.band_idx*4+2]) % 2147483647) * 31
                          + sig[b.band_idx*4+3]) % 2147483647) * 31
                        + sig[b.band_idx*4+4]) % 2147483647 AS band_hash
                FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_idx) b
            ), clean AS (
                SELECT bands.* FROM bands
                ANTI JOIN (SELECT band_idx, band_hash FROM bands
                           GROUP BY 1, 2 HAVING COUNT(*) > 2000) hot
                USING (band_idx, band_hash)
            ), cands AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM clean a JOIN clean b USING (band_idx, band_hash)
                WHERE a.doc_id < b.doc_id
            ), lsh AS (
                SELECT c.id_a, c.id_b
                FROM cands c
                JOIN hs ha ON ha.doc_id = c.id_a
                JOIN hs hb ON hb.doc_id = c.id_b
                WHERE CAST(len(list_intersect(ha.hs, hb.hs)) AS DOUBLE)
                      / len(list_distinct(list_concat(ha.hs, hb.hs))) >= 0.5
            ), exact AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
            ), hit AS (
                SELECT id_a, id_b FROM lsh
                INTERSECT SELECT id_a, id_b FROM exact
            ), counts AS (
                SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
                       (SELECT COUNT(*) FROM lsh) AS n_lsh,
                       (SELECT COUNT(*) FROM hit) AS n_hit
            )
            SELECT n_exact, n_lsh, n_hit,
                   ROUND(CAST(n_hit AS DOUBLE) / GREATEST(n_exact, 1), 4) AS recall,
                   ROUND(CAST(n_hit AS DOUBLE) / GREATEST(n_lsh, 1), 4) AS precision
            FROM counts
        """,
        "dedup_keep_list": """
            WITH RECURSIVE sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(0, GREATEST(len(regexp_split_to_array(lower(text), '\\s+')) - 3, 0) + 1),
                           i -> array_to_string(
                                regexp_split_to_array(lower(text), '\\s+')[i+1:i+3], ' ')
                       )) AS s
                FROM documents
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE len(a.s) > 0 AND len(b.s) > 0
                  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                      / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
            ), sym AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ), cc(node, comp) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, cc.comp FROM cc JOIN sym s ON s.a = cc.node
            ), labels AS (
                SELECT node, MIN(comp) AS keep_id FROM cc GROUP BY node
            )
            SELECT d.doc_id,
                   COALESCE(l.keep_id, d.doc_id) AS keep_id,
                   COALESCE(l.keep_id, d.doc_id) <> d.doc_id AS is_dup
            FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
        """,
        "simhash_buckets": """
            WITH wh AS (
                SELECT doc_id,
                       list_transform(
                           list_distinct(regexp_split_to_array(lower(text), '\\s+')),
                           w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)) AS hs
                FROM documents
            )
            SELECT doc_id,
                   list_reduce(
                     list_transform(range(0, 60), b ->
                       CASE WHEN COALESCE(list_sum(list_transform(hs,
                                h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
                            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END),
                     (a, v) -> a | v) AS simhash,
                   list_reduce(
                     list_transform(range(0, 60), b ->
                       CASE WHEN COALESCE(list_sum(list_transform(hs,
                                h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
                            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END),
                     (a, v) -> a | v) >> 44 AS bucket
            FROM wh
        """,
        "simhash_pairs": """
            WITH wh AS (
                SELECT doc_id,
                       list_transform(
                           list_distinct(regexp_split_to_array(lower(text), '\\s+')),
                           w -> CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)) AS hs
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_reduce(
                         list_transform(range(0, 60), b ->
                           CASE WHEN COALESCE(list_sum(list_transform(hs,
                                    h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
                                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END),
                         (a, v) -> a | v) AS simhash
                FROM wh
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "fingerprint": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0 ELSE
                     list_reduce(
                       list_transform(
                         regexp_split_to_array(trim(text), '\\s+'),
                         w -> struct_pack(
                             h := list_reduce(
                                 list_transform(str_split(w, ''),
                                                c -> CAST(ascii(c) AS BIGINT)),
                                 (a, b) -> (a * 31 + b) % 1000000007),
                             pw := CAST(1 AS BIGINT))
                       ),
                       (acc, x) -> struct_pack(
                           h := (acc.h + x.h * ((acc.pw * 31) % 1000000007)) % 1000000007,
                           pw := (acc.pw * 31) % 1000000007)
                     ).h
                   END AS fingerprint
            FROM documents
        """,
        "langid": """
            WITH w AS (
                SELECT doc_id,
                       list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS words
                FROM documents
            ), hits AS (
                SELECT doc_id,
                       len(list_intersect(words, ['the','and','of','to','is','in','that','for'])) AS h_en,
                       len(list_intersect(words, ['el','la','de','que','y','en','los','una'])) AS h_es,
                       len(list_intersect(words, ['der','die','das','und','ist','nicht','ein','zu'])) AS h_de,
                       len(list_intersect(words, ['le','la','les','et','des','est','une','dans'])) AS h_fr
                FROM w
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                        WHEN h_fr = GREATEST(h_en, h_es, h_de, h_fr) THEN 'fr'
                        WHEN h_es = GREATEST(h_en, h_es, h_de, h_fr) THEN 'es'
                        WHEN h_en = GREATEST(h_en, h_es, h_de, h_fr) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM hits
        """,
        "iob2_rewrite": """
            WITH toks AS (
                SELECT CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(event_id AS INT) AS token_idx,
                       CASE CAST(event_id % 4 AS INT)
                            WHEN 0 THEN 'O' WHEN 1 THEN 'I-PER'
                            WHEN 2 THEN 'B-LOC' ELSE 'I-LOC' END AS label
                FROM events
            ),
            lagged AS (
                SELECT conv_id, token_idx, label,
                       lag(label, 1, 'O') OVER (
                           PARTITION BY conv_id ORDER BY token_idx) AS prev
                FROM toks
            )
            SELECT conv_id, token_idx,
                   CASE WHEN label LIKE 'I-%'
                             AND (prev = 'O' OR substr(prev, 3) <> substr(label, 3))
                        THEN 'B-' || substr(label, 3) ELSE label END AS label
            FROM lagged
        """,
        "eval_suptype": """
            WITH spans AS (
                SELECT event_id,
                       CAST(user_id AS VARCHAR) AS conv_id,
                       0 AS turn_idx,
                       CAST(event_id % 5 AS INT) AS start_tok,
                       CAST(event_id % 5 + event_id % 3 AS INT) AS end_tok,
                       event_type AS label
                FROM events
            ),
            sys AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok, label
                    FROM spans WHERE event_id % 2 = 0),
            gld AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok, label
                    FROM spans WHERE event_id % 2 = 1),
            sys_sup AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok,
                               substr(label, 1, 1) AS sup FROM sys),
            gld_sup AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok,
                               substr(label, 1, 1) AS sup FROM gld),
            sys_sp AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok FROM sys),
            gld_sp AS (SELECT DISTINCT conv_id, turn_idx, start_tok, end_tok FROM gld),
            raw AS (
                SELECT 'type' AS metric,
                       (SELECT COUNT(*) FROM gld) AS gold_n,
                       (SELECT COUNT(*) FROM sys) AS retrieved,
                       (SELECT COUNT(*) FROM sys JOIN gld USING
                          (conv_id, turn_idx, start_tok, end_tok, label)) AS correct_retrieved
                UNION ALL
                SELECT 'suptype',
                       (SELECT COUNT(*) FROM gld_sup),
                       (SELECT COUNT(*) FROM sys_sup),
                       (SELECT COUNT(*) FROM sys_sup JOIN gld_sup USING
                          (conv_id, turn_idx, start_tok, end_tok, sup))
                UNION ALL
                SELECT 'span',
                       (SELECT COUNT(*) FROM gld_sp),
                       (SELECT COUNT(*) FROM sys_sp),
                       (SELECT COUNT(*) FROM sys_sp JOIN gld_sp USING
                          (conv_id, turn_idx, start_tok, end_tok))
            )
            SELECT metric, gold_n, retrieved, correct_retrieved,
                   ROUND(CASE WHEN retrieved > 0
                         THEN CAST(correct_retrieved AS DOUBLE) / retrieved
                         ELSE 0 END, 6) AS precision,
                   ROUND(CASE WHEN gold_n > 0
                         THEN CAST(correct_retrieved AS DOUBLE) / gold_n
                         ELSE 0 END, 6) AS recall,
                   ROUND(CASE WHEN (CASE WHEN retrieved > 0 THEN CAST(correct_retrieved AS DOUBLE) / retrieved ELSE 0 END)
                            + (CASE WHEN gold_n > 0 THEN CAST(correct_retrieved AS DOUBLE) / gold_n ELSE 0 END) > 0
                         THEN 2 * (CASE WHEN retrieved > 0 THEN CAST(correct_retrieved AS DOUBLE) / retrieved ELSE 0 END)
                                * (CASE WHEN gold_n > 0 THEN CAST(correct_retrieved AS DOUBLE) / gold_n ELSE 0 END)
                              / ((CASE WHEN retrieved > 0 THEN CAST(correct_retrieved AS DOUBLE) / retrieved ELSE 0 END)
                               + (CASE WHEN gold_n > 0 THEN CAST(correct_retrieved AS DOUBLE) / gold_n ELSE 0 END))
                         ELSE 0 END, 6) AS f1
            FROM raw
        """,
        "eval_token_accuracy": """
            WITH toks AS (
                SELECT CAST(user_id AS VARCHAR) AS conv_id,
                       CAST(event_id % 7 AS INT) AS turn_idx,
                       CAST(event_id AS INT) AS token_idx,
                       event_type AS label
                FROM events
            ),
            sys AS (
                SELECT conv_id, turn_idx, token_idx,
                       CASE WHEN token_idx % 10 = 0 THEN 'O' ELSE label END AS label
                FROM toks
            )
            -- explicit BIGINT: DuckDB's SUM(CASE) returns HUGEINT and //
            -- propagates it, while Spark emits BIGINT — values match but a
            -- typed (Arrow) canonicalizer sees different bytes (round-3
            -- ledger: rows+schema green, hash red on type identity alone)
            SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_correct AS BIGINT) AS n_correct,
                   CAST(n_correct * 1000000 // n_tokens AS BIGINT)
                       AS accuracy_ppm
            FROM (
                SELECT COUNT(*) AS n_tokens,
                       SUM(CASE WHEN sys.label = toks.label THEN 1 ELSE 0 END) AS n_correct
                FROM sys JOIN toks USING (conv_id, turn_idx, token_idx)
            )
        """,
        "eval_length_cube": """
            WITH spans AS (
                SELECT event_id,
                       CAST(user_id AS VARCHAR) AS conv_id,
                       0 AS turn_idx,
                       CAST(event_id % 5 AS INT) AS start_tok,
                       CAST(event_id % 5 + event_id % 3 AS INT) AS end_tok,
                       event_type AS label
                FROM events
            ), classed AS (
                SELECT *,
                       CASE WHEN end_tok = start_tok THEN 'oneword'
                            WHEN end_tok = start_tok + 1 THEN 'twoword'
                            ELSE 'multiword' END AS len_class
                FROM spans
            ), sys AS (
                SELECT conv_id, turn_idx, start_tok, end_tok, label, len_class,
                       COUNT(*) AS n_sys
                FROM classed WHERE event_id % 2 = 0
                GROUP BY ALL
            ), gld AS (
                SELECT conv_id, turn_idx, start_tok, end_tok, label, len_class,
                       COUNT(*) AS n_gold
                FROM classed WHERE event_id % 2 = 1
                GROUP BY ALL
            ), joined AS (
                SELECT COALESCE(s.label, g.label) AS label,
                       COALESCE(s.len_class, g.len_class) AS len_class,
                       COALESCE(n_sys, 0) AS n_sys,
                       COALESCE(n_gold, 0) AS n_gold
                FROM sys s FULL OUTER JOIN gld g
                  ON s.conv_id = g.conv_id AND s.turn_idx = g.turn_idx
                 AND s.start_tok = g.start_tok AND s.end_tok = g.end_tok
                 AND s.label = g.label AND s.len_class = g.len_class
            )
            SELECT label, len_class,
                   CAST(SUM(LEAST(n_sys, n_gold)) AS BIGINT) AS correct,
                   CAST(SUM(n_sys) AS BIGINT) AS retrieved,
                   CAST(SUM(n_gold) AS BIGINT) AS gold
            FROM joined
            GROUP BY CUBE (label, len_class)
        """,
        "billing_metrics": """
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(length(event_type)) AS BIGINT) AS billed_chars,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        """,
        "validate_quarantine": """
            SELECT CASE WHEN text IS NULL THEN 'null_text'
                        WHEN octet_length(CAST(text AS BLOB)) > 300 THEN 'oversize'
                        ELSE 'ok' END AS reason,
                   COUNT(*) AS n
            FROM documents
            GROUP BY 1
        """,
        "embedding_adjacent_cosine": """
            SELECT a.vec_id AS id_a,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
            WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 4) > -0.2
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, e.embedding) AS cos
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= 3
        """,
        # the serving validation cascade, recomputed from the same doc_id
        # arithmetic: error precedence is data-missing > unknown-model >
        # invalid-output-for-endpoint (nametag3_server.py do_GET order);
        # with this registry no request can hit the 413 or invalid-input
        # branches, and all valid endpoints here return application/json
        "serve_status": """
            WITH d AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
            r AS (
                SELECT CAST(doc_id AS VARCHAR) AS request_id,
                       CASE
                           WHEN doc_id % 11 = 0 THEN 400
                           WHEN doc_id % 13 = 0 THEN 400
                           WHEN doc_id % 7 = 0 AND doc_id % 4 IN (2, 3) THEN 400
                           ELSE 200
                       END AS status
                FROM d
            )
            SELECT request_id,
                   status,
                   CASE WHEN status = 200 THEN 'application/json'
                        ELSE 'text/plain' END AS content_type,
                   CASE WHEN status = 200
                        THEN 'nametag3-multilingual-250203' END AS model
            FROM r
        """,
        # the portable media table is plain arithmetic on media_id and the
        # stub featurizer is integer-exact until one sqrt + one division +
        # one float32 cast, so DuckDB rebuilds the identical features:
        # component i pools 8 bytes of the repeated sha256 digest (integer
        # sum s_i), unit-norm component = float32(s_i / sqrt(sum s_j^2))
        "media_features": """
            WITH m AS (
                SELECT i AS media_id,
                       ['image','audio','video'][CAST(i % 3 AS INT) + 1] AS kind
                FROM range(48) t(i)
            ), h AS (
                SELECT media_id, kind,
                       sha256('media-' || media_id || '-' || kind) AS hx
                FROM m
            ), b AS (
                SELECT media_id, kind,
                       list_transform(range(0, 32),
                           j -> CAST(('0x' || substr(hx, CAST(2*j+1 AS INT), 2))
                                     AS INT)) AS bytes
                FROM h
            ), s AS (
                SELECT media_id, kind,
                       list_transform(range(0, 32), i ->
                           bytes[((8*i+0)%32)+1] + bytes[((8*i+1)%32)+1]
                         + bytes[((8*i+2)%32)+1] + bytes[((8*i+3)%32)+1]
                         + bytes[((8*i+4)%32)+1] + bytes[((8*i+5)%32)+1]
                         + bytes[((8*i+6)%32)+1] + bytes[((8*i+7)%32)+1]
                       ) AS sums
                FROM b
            ), n AS (
                SELECT media_id, kind, sums,
                       sqrt(CAST(list_reduce(list_transform(sums, x -> x*x),
                                             (a, c) -> a + c) AS DOUBLE))
                           AS denom
                FROM s
            ), v AS (
                SELECT media_id, kind,
                       list_transform(sums, x -> CAST(x / denom AS FLOAT)) AS vec
                FROM n
            )
            SELECT media_id, kind,
                   ROUND(CAST(vec[1] AS DOUBLE), 4) AS feat0,
                   ROUND(sqrt(list_reduce(list_transform(vec,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             (a, c) -> a + c)), 2) AS vec_norm,
                   CAST(32 AS INT) AS dim
            FROM v
        """,
        # frame schedule = arithmetic on the portable metadata: videos are
        # media_id % 3 = 2, duration 100 + (id*7919) % 59900 ms, one frame
        # per second capped at 16 (truncating division, hence FLOOR)
        "media_frames": """
            WITH m AS (
                SELECT i AS media_id,
                       100 + (i * 7919) % 59900 AS duration_ms
                FROM range(48) t(i)
                WHERE i % 3 = 2
            ), f AS (
                SELECT media_id,
                       unnest(range(0,
                           LEAST(GREATEST(
                               CAST(FLOOR(duration_ms / 1000.0) AS INT) - 1,
                               0), 15) + 1)) AS frame_idx
                FROM m
            )
            SELECT media_id,
                   CAST(frame_idx AS INT) AS frame_idx,
                   CAST(frame_idx * 1000 AS INT) AS ts_ms
            FROM f
        """,
        # exact triangle enumeration (a<b<c over the src<dst edge set)
        # recomputes what Spark's degree-ordered node-iterator counts
        "graph_triangles": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            ), e AS (
                SELECT a.surf AS src, b.surf AS dst
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
            ), tri AS (
                SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
                FROM e e1
                JOIN e e2 ON e2.src = e1.dst
                JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
            ), pn AS (
                SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
                    SELECT a AS node FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri
                ) GROUP BY node
            ), deg AS (
                SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
                    SELECT src AS node FROM e
                    UNION ALL SELECT dst FROM e
                ) GROUP BY node
            )
            SELECT deg.node,
                   COALESCE(pn.tri, 0) AS triangles,
                   deg.degree,
                   ROUND(CASE WHEN deg.degree >= 2
                              THEN (2.0 * COALESCE(pn.tri, 0))
                                   / (deg.degree * (deg.degree - 1))
                              ELSE 0.0 END, 6) AS clustering
            FROM deg LEFT JOIN pn ON pn.node = deg.node
        """,
        # 3 unrolled synchronous label-propagation rounds, integer vote
        # sums, ties to the smallest label — the exact closed form
        "graph_communities": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            ), e AS (
                SELECT a.surf AS src, b.surf AS dst,
                       CAST(COUNT(*) AS BIGINT) AS w
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
            ), sym AS (
                SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
                    SELECT src, dst, w FROM e
                    UNION ALL
                    SELECT dst AS src, src AS dst, w FROM e
                ) GROUP BY src, dst
            ), l0 AS (
                SELECT DISTINCT src AS node, src AS label FROM sym
            ), l1 AS (
                SELECT node, label FROM (
                    SELECT sym.dst AS node, l.label,
                           CAST(SUM(sym.w) AS BIGINT) AS s
                    FROM sym JOIN l0 l ON l.node = sym.src
                    GROUP BY sym.dst, l.label
                ) QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY s DESC, label) = 1
            ), l2 AS (
                SELECT node, label FROM (
                    SELECT sym.dst AS node, l.label,
                           CAST(SUM(sym.w) AS BIGINT) AS s
                    FROM sym JOIN l1 l ON l.node = sym.src
                    GROUP BY sym.dst, l.label
                ) QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY s DESC, label) = 1
            ), l3 AS (
                SELECT node, label FROM (
                    SELECT sym.dst AS node, l.label,
                           CAST(SUM(sym.w) AS BIGINT) AS s
                    FROM sym JOIN l2 l ON l.node = sym.src
                    GROUP BY sym.dst, l.label
                ) QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY node ORDER BY s DESC, label) = 1
            )
            SELECT node, label AS community FROM l3
        """,
        # lag-flag → running-sum islands → island agg → lead chaining:
        # the standard SCD2 compaction, same total order as Spark
        "triples_scd2": """
            WITH a AS (
                SELECT o_custkey AS subj, o_orderstatus AS obj,
                       o_orderdate AS ts, o_orderkey AS tb
                FROM orders
            ), f AS (
                SELECT subj, obj, ts, tb,
                       CASE WHEN LAG(obj) OVER w IS NULL
                                 OR LAG(obj) OVER w <> obj
                            THEN 1 ELSE 0 END AS chg
                FROM a WINDOW w AS (PARTITION BY subj ORDER BY ts, tb)
            ), g AS (
                SELECT subj, obj, ts,
                       SUM(chg) OVER (PARTITION BY subj ORDER BY ts, tb
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM f
            ), i AS (
                SELECT subj, island,
                       MIN(ts) AS valid_from, MIN(obj) AS obj,
                       CAST(COUNT(*) AS BIGINT) AS n_assertions
                FROM g GROUP BY subj, island
            )
            SELECT subj, obj, valid_from,
                   LEAD(valid_from) OVER w2 AS valid_to,
                   (LEAD(valid_from) OVER w2 IS NULL) AS is_current,
                   n_assertions
            FROM i WINDOW w2 AS (PARTITION BY subj ORDER BY island)
        """,
        "triples_asof": """
            WITH a AS (
                SELECT o_custkey AS subj, o_orderstatus AS obj,
                       o_orderdate AS ts, o_orderkey AS tb
                FROM orders
            ), f AS (
                SELECT subj, obj, ts, tb,
                       CASE WHEN LAG(obj) OVER w IS NULL
                                 OR LAG(obj) OVER w <> obj
                            THEN 1 ELSE 0 END AS chg
                FROM a WINDOW w AS (PARTITION BY subj ORDER BY ts, tb)
            ), g AS (
                SELECT subj, obj, ts,
                       SUM(chg) OVER (PARTITION BY subj ORDER BY ts, tb
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM f
            ), i AS (
                SELECT subj, island,
                       MIN(ts) AS valid_from, MIN(obj) AS obj,
                       CAST(COUNT(*) AS BIGINT) AS n_assertions
                FROM g GROUP BY subj, island
            ), iv AS (
                SELECT subj, obj, valid_from,
                       LEAD(valid_from) OVER w2 AS valid_to,
                       (LEAD(valid_from) OVER w2 IS NULL) AS is_current,
                       n_assertions
                FROM i WINDOW w2 AS (PARTITION BY subj ORDER BY island)
            )
            SELECT * FROM iv
            WHERE valid_from <= TIMESTAMP '1998-01-01'
              AND (valid_to IS NULL OR valid_to > TIMESTAMP '1998-01-01')
        """,
        # SCD2 snapshots at two instants + one full-outer join on the
        # fact key; unchanged keys dropped
        "kg_diff": """
            WITH a AS (
                SELECT o_custkey AS subj, o_orderstatus AS obj,
                       o_orderdate AS ts, o_orderkey AS tb
                FROM orders
            ), f AS (
                SELECT subj, obj, ts, tb,
                       CASE WHEN LAG(obj) OVER w IS NULL
                                 OR LAG(obj) OVER w <> obj
                            THEN 1 ELSE 0 END AS chg
                FROM a WINDOW w AS (PARTITION BY subj ORDER BY ts, tb)
            ), g AS (
                SELECT subj, obj, ts,
                       SUM(chg) OVER (PARTITION BY subj ORDER BY ts, tb
                                      ROWS UNBOUNDED PRECEDING) AS island
                FROM f
            ), i AS (
                SELECT subj, island,
                       MIN(ts) AS valid_from, MIN(obj) AS obj
                FROM g GROUP BY subj, island
            ), iv AS (
                SELECT subj, obj, valid_from,
                       LEAD(valid_from) OVER w2 AS valid_to
                FROM i WINDOW w2 AS (PARTITION BY subj ORDER BY island)
            ), s1 AS (
                SELECT subj, obj AS obj_before FROM iv
                WHERE valid_from <= TIMESTAMP '1994-06-01'
                  AND (valid_to IS NULL
                       OR valid_to > TIMESTAMP '1994-06-01')
            ), s2 AS (
                SELECT subj, obj AS obj_after FROM iv
                WHERE valid_from <= TIMESTAMP '1997-06-01'
                  AND (valid_to IS NULL
                       OR valid_to > TIMESTAMP '1997-06-01')
            )
            SELECT COALESCE(s1.subj, s2.subj) AS subj,
                   obj_before, obj_after,
                   CASE WHEN obj_before IS NULL THEN 'added'
                        WHEN obj_after IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM s1 FULL OUTER JOIN s2 ON s1.subj = s2.subj
            WHERE obj_before IS NULL OR obj_after IS NULL
               OR obj_before <> obj_after
        """,
        # 2 unrolled truth-discovery rounds, all-BIGINT ppm arithmetic
        # (integer sums are order-independent; every SUM cast back from
        # DuckDB's HUGEINT to match Spark's BIGINT type identity)
        "kg_conflicts": """
            WITH c AS (
                SELECT DISTINCT o_custkey AS subj,
                       'order_status' AS pred,
                       o_orderstatus AS obj,
                       o_orderpriority AS source
                FROM orders
            ), t0 AS (
                SELECT DISTINCT source,
                       CAST(1000000 AS BIGINT) AS trust
                FROM c
            ), c1 AS (
                SELECT subj, pred, obj,
                       CAST(SUM(t0.trust) AS BIGINT) AS conf
                FROM c JOIN t0 USING (source)
                GROUP BY subj, pred, obj
            ), tot1 AS (
                SELECT subj, pred, CAST(SUM(conf) AS BIGINT) AS tot
                FROM c1 GROUP BY subj, pred
            ), s1 AS (
                SELECT c1.subj, c1.pred, c1.obj,
                       CAST(conf * 1000000 // tot AS BIGINT) AS share
                FROM c1 JOIN tot1 USING (subj, pred)
            ), t1 AS (
                SELECT source,
                       CAST(SUM(share) // COUNT(*) AS BIGINT) AS trust
                FROM c JOIN s1 USING (subj, pred, obj)
                GROUP BY source
            ), c2 AS (
                SELECT subj, pred, obj,
                       CAST(SUM(t1.trust) AS BIGINT) AS conf_ppm,
                       CAST(COUNT(*) AS BIGINT) AS n_sources
                FROM c JOIN t1 USING (source)
                GROUP BY subj, pred, obj
            ), tot2 AS (
                SELECT subj, pred, CAST(SUM(conf_ppm) AS BIGINT) AS tot
                FROM c2 GROUP BY subj, pred
            ), s2 AS (
                SELECT c2.subj, c2.pred, c2.obj, c2.conf_ppm,
                       CAST(conf_ppm * 1000000 // tot AS BIGINT)
                           AS share_ppm,
                       c2.n_sources
                FROM c2 JOIN tot2 USING (subj, pred)
            )
            SELECT subj, pred, obj, conf_ppm, share_ppm, n_sources
            FROM s2
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY subj, pred
                ORDER BY conf_ppm DESC, obj) = 1
        """,
        # the portable affine corruption hash is plain 64-bit integer
        # arithmetic — DuckDB redraws the identical filtered sample
        "kg_negative_samples": """
            WITH li AS (
                SELECT l_suppkey, l_orderkey, l_partkey
                FROM lineitem WHERE l_orderkey % 17 = 0
            ), pos AS (
                SELECT DISTINCT s, p, o FROM (
                    SELECT l_suppkey AS s, CAST(0 AS BIGINT) AS p,
                           l_partkey AS o FROM li
                    UNION ALL
                    SELECT l_orderkey AS s, CAST(1 AS BIGINT) AS p,
                           l_partkey AS o FROM li
                )
            ), vocab AS (
                SELECT o AS obj,
                       ROW_NUMBER() OVER (ORDER BY o) - 1 AS idx
                FROM (SELECT DISTINCT o FROM pos)
            ), nv AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vocab
            ), drawn AS (
                SELECT s, p, o, j,
                       ((s % 1000003) * 1103515245
                        + (p % 1000003) * 1234567891
                        + (o % 1000003) * 987654323
                        + (CAST(j AS BIGINT) + 1) * 1327217885)
                       % 2147483647 AS h
                FROM pos CROSS JOIN (SELECT unnest([0, 1]) AS j)
            ), corr AS (
                SELECT d.s, d.p, v.obj AS o_neg, d.j
                FROM drawn d
                CROSS JOIN nv
                JOIN vocab v ON v.idx = d.h % nv.n
                WHERE v.obj <> d.o
            )
            SELECT c.s AS subj_id, c.p AS pred_id, c.o_neg AS obj_id,
                   CAST(c.j AS INT) AS neg_rank
            FROM corr c
            WHERE NOT EXISTS (
                SELECT 1 FROM pos
                WHERE pos.s = c.s AND pos.p = c.p AND pos.o = c.o_neg
            )
        """,
        # conditional aggregation over the unpivoted triples — the same
        # explicit-predicate-list pivot Spark runs
        "triples_property_table": """
            WITH t AS (
                SELECT l_orderkey AS subj, 'part' AS pred,
                       CAST(l_partkey AS VARCHAR) AS obj FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'status', l_linestatus FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'flag', l_returnflag FROM lineitem
            )
            SELECT subj,
                   MAX(CASE WHEN pred = 'part' THEN obj END) AS part,
                   CAST(SUM(CASE WHEN pred = 'part' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_part,
                   MAX(CASE WHEN pred = 'status' THEN obj END) AS status,
                   CAST(SUM(CASE WHEN pred = 'status' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_status,
                   MAX(CASE WHEN pred = 'flag' THEN obj END) AS flag,
                   CAST(SUM(CASE WHEN pred = 'flag' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_flag
            FROM t GROUP BY subj
        """,
        # BGP star = self-joins on the shared subject var with literal
        # predicates pushed into each leg
        "bgp_star": """
            WITH t AS (
                SELECT l_orderkey AS subj, 'part' AS pred,
                       CAST(l_partkey AS VARCHAR) AS obj FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'status', l_linestatus FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'flag', l_returnflag FROM lineitem
            )
            SELECT DISTINCT a.subj AS o, c.obj AS p
            FROM t a
            JOIN t b ON b.subj = a.subj
            JOIN t c ON c.subj = a.subj
            WHERE a.pred = 'status' AND a.obj = 'F'
              AND b.pred = 'flag' AND b.obj = 'R'
              AND c.pred = 'part'
        """,
        "bgp_chain": """
            WITH t AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS subj,
                       'ordered_by' AS pred,
                       CAST(o_custkey AS VARCHAR) AS obj FROM orders
                UNION ALL
                SELECT CAST(c_custkey AS VARCHAR), 'in_nation',
                       CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT CAST(n_nationkey AS VARCHAR), 'named', n_name
                FROM nation
            )
            SELECT a.subj AS "order", a.obj AS cust
            FROM t a
            JOIN t b ON b.subj = a.obj AND b.pred = 'in_nation'
            JOIN t c ON c.subj = b.obj AND c.pred = 'named'
                    AND c.obj = 'NATION_7'
            WHERE a.pred = 'ordered_by'
        """,
        # GRAPH-variable quad aggregation: graph = order status
        "sparql_graph": """
            SELECT o_orderstatus AS g,
                   COUNT(CAST(o_orderkey AS VARCHAR)) AS n_orders,
                   COUNT(DISTINCT CAST(o_custkey AS VARCHAR)) AS n_custs
            FROM orders
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        # text front end: FILTERs + MINUS + ORDER BY/LIMIT; the numeric
        # FILTER is a double try_cast on the Spark side, plain numeric
        # compare here; MINUS on ?c == excluding nation-13 customers
        # (each customer has exactly one in_nation triple)
        "sparql_select": """
            SELECT CAST(o.o_orderkey AS VARCHAR) AS o,
                   CAST(o.o_custkey AS VARCHAR) AS c,
                   n.n_name AS nm
            FROM orders o
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
            WHERE starts_with(n.n_name, 'NATION_1')
              AND o.o_orderkey < 5000
              AND cu.c_nationkey <> 13
            ORDER BY CAST(o.o_orderkey AS VARCHAR),
                     CAST(o.o_custkey AS VARCHAR)
            LIMIT 200
        """,
        # text-front-end GROUP BY aggregation: counts are BIGINT on
        # both engines; MIN over VARCHAR is binary-collation on both
        "sparql_aggregate": """
            SELECT n.n_name AS nm,
                   COUNT(CAST(o.o_orderkey AS VARCHAR)) AS n_orders,
                   COUNT(DISTINCT CAST(o.o_custkey AS VARCHAR)) AS n_custs,
                   MIN(CAST(o.o_orderkey AS VARCHAR)) AS first_order
            FROM orders o
            JOIN customer cu ON cu.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
            GROUP BY n.n_name
            ORDER BY n.n_name
        """,
        # aggregate over a UNION composed with other patterns: the
        # branch statuses are disjoint, so bag-union COUNT == the
        # two-status filtered count per nation
        "sparql_union": """
            WITH u AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS o,
                       CAST(o_custkey AS VARCHAR) AS c
                FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT CAST(o_orderkey AS VARCHAR),
                       CAST(o_custkey AS VARCHAR)
                FROM orders WHERE o_orderstatus = 'P'
            )
            SELECT n.n_name AS nm, CAST(COUNT(u.o) AS BIGINT) AS n_rows
            FROM u
            JOIN customer cu ON CAST(cu.c_custkey AS VARCHAR) = u.c
            JOIN nation n ON n.n_nationkey = cu.c_nationkey
            GROUP BY n.n_name
            ORDER BY n.n_name
        """,
        # text-front-end subquery: the aggregated { SELECT } block is
        # the IN/HAVING subquery; counts are BIGINT on both engines
        "sparql_subquery": """
            SELECT CAST(o_custkey AS VARCHAR) AS c,
                   CAST(o_orderkey AS VARCHAR) AS o
            FROM orders
            WHERE o_custkey IN (
                SELECT o_custkey FROM orders
                GROUP BY o_custkey HAVING COUNT(*) >= 15
            )
            ORDER BY CAST(o_custkey AS VARCHAR),
                     CAST(o_orderkey AS VARCHAR)
            LIMIT 200
        """,
        # OPTIONAL block = LEFT JOIN of the inner-joined optional group
        "bgp_optional": """
            WITH t AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS subj,
                       'ordered_by' AS pred,
                       CAST(o_custkey AS VARCHAR) AS obj FROM orders
                UNION ALL
                SELECT CAST(o_orderkey AS VARCHAR), 'status',
                       o_orderstatus FROM orders
                UNION ALL
                SELECT CAST(c_custkey AS VARCHAR), 'in_nation',
                       CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT CAST(n_nationkey AS VARCHAR), 'named', n_name
                FROM nation
            ), req AS (
                SELECT a.subj AS c
                FROM t a
                JOIN t b ON b.subj = a.obj AND b.pred = 'named'
                        AND b.obj = 'NATION_3'
                WHERE a.pred = 'in_nation'
            ), opt AS (
                SELECT o.subj AS o, o.obj AS c
                FROM t o
                JOIN t s ON s.subj = o.subj AND s.pred = 'status'
                        AND s.obj = 'P'
                WHERE o.pred = 'ordered_by'
            )
            SELECT req.c, opt.o FROM req LEFT JOIN opt ON opt.c = req.c
        """,
        # OPTIONAL's inner FILTER scopes to the left join; !BOUND then
        # keeps exactly the unmatched side = NOT EXISTS over the
        # filtered optional group
        "sparql_bound": """
            WITH t AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS subj,
                       'ordered_by' AS pred,
                       CAST(o_custkey AS VARCHAR) AS obj FROM orders
                UNION ALL
                SELECT CAST(o_orderkey AS VARCHAR), 'status',
                       o_orderstatus FROM orders
                UNION ALL
                SELECT CAST(c_custkey AS VARCHAR), 'in_nation',
                       CAST(c_nationkey AS VARCHAR) FROM customer
                UNION ALL
                SELECT CAST(n_nationkey AS VARCHAR), 'named', n_name
                FROM nation
            ), req AS (
                SELECT a.subj AS c
                FROM t a
                JOIN t b ON b.subj = a.obj AND b.pred = 'named'
                        AND b.obj = 'NATION_3'
                WHERE a.pred = 'in_nation'
            ), opt AS (
                SELECT o.obj AS c
                FROM t o
                JOIN t s ON s.subj = o.subj AND s.pred = 'status'
                        AND s.obj = 'P'
                WHERE o.pred = 'ordered_by'
                  AND TRY_CAST(o.subj AS DOUBLE) < 2000
            )
            SELECT r.c AS c FROM req r
            WHERE NOT EXISTS (SELECT 1 FROM opt o WHERE o.c = r.c)
        """,
        "kg_describe": """
            WITH t AS (
                SELECT CAST(c_custkey AS VARCHAR) AS subj,
                       'in_nation' AS pred,
                       CAST(c_nationkey AS VARCHAR) AS obj FROM customer
                UNION ALL
                SELECT CAST(n_nationkey AS VARCHAR), 'named', n_name
                FROM nation
            )
            SELECT subj, pred, obj FROM t
            WHERE subj = '7' OR obj = '7'
        """,
        "kg_stats": """
            WITH t AS (
                SELECT l_orderkey AS subj, 'part' AS pred,
                       CAST(l_partkey AS VARCHAR) AS obj FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'status', l_linestatus FROM lineitem
                UNION ALL
                SELECT l_orderkey, 'flag', l_returnflag FROM lineitem
            )
            SELECT pred,
                   CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
            FROM t GROUP BY pred
        """,
        # 2 unrolled forward-chaining rounds: round 1 seeds anc from the
        # subclass edges, round 2 adds the 2-step transitive pairs
        "kg_rules": """
            WITH e AS (
                SELECT DISTINCT p_brand AS c, p_type AS p FROM part
                UNION
                SELECT DISTINCT p_type, 'PRODUCT' FROM part
            ), two AS (
                SELECT a.c, b.p FROM e a JOIN e b ON b.c = a.p
            )
            SELECT DISTINCT subj, 'anc' AS pred, obj FROM (
                SELECT c AS subj, p AS obj FROM e
                UNION ALL
                SELECT c, p FROM two
            )
        """,
        # CONSTRUCT = distinct matches templated into a union of triple
        # shapes; NOT EXISTS = anti-join on the witness key
        "bgp_construct": """
            WITH m AS (
                SELECT DISTINCT CAST(o.o_orderkey AS VARCHAR) AS ord,
                       n.n_name AS nat
                FROM orders o
                JOIN customer c ON c.c_custkey = o.o_custkey
                JOIN nation n ON n.n_nationkey = c.c_nationkey
                WHERE NOT EXISTS (
                    SELECT 1 FROM orders p
                    WHERE CAST(p.o_orderkey AS VARCHAR)
                              = CAST(o.o_orderkey AS VARCHAR)
                      AND p.o_orderstatus = 'P'
                )
            )
            SELECT DISTINCT subj, pred, obj FROM (
                SELECT ord AS subj, 'shipped_to' AS pred, nat AS obj FROM m
                UNION ALL
                SELECT nat, 'rdf_type', 'Nation' FROM m
            )
        """,
        # property path subclass+ == recursive-CTE strict closure pairs
        # (depth-capped at 4 in the query; real depth is 2, CTE converges)
        "bgp_path": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT p_brand AS subj, p_type AS obj FROM part
                UNION
                SELECT DISTINCT p_type, 'PRODUCT' FROM part
            ), clo AS (
                SELECT subj AS child, obj AS ancestor, 1 AS hops FROM e
                UNION ALL
                SELECT c.child, e.obj, c.hops + 1
                FROM clo c JOIN e ON e.subj = c.ancestor
                WHERE c.hops < 8
            ), pairs AS (
                -- no child <> ancestor filter: pred+ includes
                -- cycle-closing matches (SPARQL arbitrary-length
                -- semantics); this edge set is acyclic, so the filter
                -- would be a no-op here anyway
                SELECT DISTINCT child, ancestor FROM clo
            )
            SELECT p.child AS c, e.obj AS parent
            FROM pairs p JOIN e ON e.subj = p.child
            WHERE p.ancestor = 'PRODUCT'
        """,
        # recursive-CTE min-hop closure == the doubling closure for any
        # hierarchy of depth <= 16; MIN(inferred) keeps direct rows direct
        "kg_type_closure": """
            WITH RECURSIVE e AS (
                SELECT DISTINCT p_brand AS child, p_type AS parent FROM part
                UNION
                SELECT DISTINCT p_type, 'PRODUCT' FROM part
            ), clo AS (
                SELECT child, parent AS ancestor, 1 AS hops FROM e
                UNION ALL
                SELECT c.child, e.parent, c.hops + 1
                FROM clo c JOIN e ON e.child = c.ancestor
                WHERE c.hops < 16
            ), clom AS (
                SELECT child, ancestor, MIN(hops) AS hops FROM clo
                WHERE child <> ancestor GROUP BY child, ancestor
            ), inst AS (
                SELECT CAST(p_partkey AS VARCHAR) AS id, p_brand AS type
                FROM part
            ), typed AS (
                SELECT id, type, FALSE AS inferred FROM inst
                UNION ALL
                SELECT i.id, c.ancestor, TRUE
                FROM inst i JOIN clom c ON c.child = i.type
            ), agg AS (
                SELECT id, type, MIN(inferred) AS inferred FROM typed
                GROUP BY id, type
            )
            SELECT type, inferred,
                   CAST(COUNT(*) AS BIGINT) AS n_instances
            FROM agg GROUP BY type, inferred
        """,
        # unrolled 2-hop min-distance BFS over the symmetrized edge set
        "graph_khop": """
            WITH m AS (
                SELECT DISTINCT doc_id AS d, surf FROM (
                    SELECT doc_id,
                           unnest(regexp_split_to_array(trim(text), '\\s+'))
                               AS surf
                    FROM documents
                ) WHERE surf IN ('spark','customer','vector','stream',
                                 'merge','query','join','scan')
            ), e AS (
                SELECT a.surf AS src, b.surf AS dst
                FROM m a JOIN m b ON a.d = b.d AND a.surf < b.surf
                GROUP BY a.surf, b.surf
            ), sym AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM e
                    UNION ALL SELECT dst, src FROM e
                )
            ), h0 AS (
                SELECT source, source AS node, 0 AS hops
                FROM (SELECT unnest(['spark', 'merge']) AS source)
            ), r1 AS (
                SELECT source, node, MIN(hops) AS hops FROM (
                    SELECT source, node, hops FROM h0
                    UNION ALL
                    SELECT h0.source, sym.dst AS node, 1
                    FROM h0 JOIN sym ON sym.src = h0.node
                ) GROUP BY source, node
            ), r2 AS (
                SELECT source, node, MIN(hops) AS hops FROM (
                    SELECT source, node, hops FROM r1
                    UNION ALL
                    SELECT f.source, sym.dst AS node, 2
                    FROM r1 f JOIN sym ON sym.src = f.node
                    WHERE f.hops = 1
                ) GROUP BY source, node
            )
            SELECT source, node, CAST(hops AS INT) AS hops FROM r2
        """,
        # full-probe IVF must equal exact brute-force top-k — same oracle
        "ivf_ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, e.embedding) AS cos
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, CAST(rk AS INT) AS rank FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= 3
        """,
    }
