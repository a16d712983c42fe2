"""End-to-end pipeline: span P/R vs gold ≥ 0.95 (in practice 1.0),
linking/canonicalization correctness, snapshot resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from nametag3_spark.data.synth import (
    gazetteer_df,
    synth_gold_mentions,
    synth_transcripts,
)
from nametag3_spark.operators.canonicalize import canonicalize_mentions
from nametag3_spark.operators.infer import annotate_turns
from nametag3_spark.operators.linking import link_mentions
from nametag3_spark.operators.triples import emit_triples, extract_mentions
from nametag3_spark.pipeline import PipelineRun

N_CONVS, AVG_TURNS = 30, 8


def _mentions(spark):
    transcripts = synth_transcripts(spark, n_convs=N_CONVS, avg_turns=AVG_TURNS)
    return extract_mentions(annotate_turns(transcripts, scorer="oracle"))


def test_span_precision_recall_vs_gold(spark):
    """Strict span multiset P/R, computed exactly as
    compare_nested_entities.py:45-53 (multiset intersection)."""
    sys_spans = (
        _mentions(spark)
        .groupBy("conv_id", "turn_idx", "start_tok", "end_tok", "label")
        .count()
        .withColumnRenamed("count", "n_sys")
    )
    gold_spans = (
        synth_gold_mentions(spark, n_convs=N_CONVS, avg_turns=AVG_TURNS)
        .groupBy("conv_id", "turn_idx", "start_tok", "end_tok", "label")
        .count()
        .withColumnRenamed("count", "n_gold")
    )
    joined = sys_spans.join(
        gold_spans, ["conv_id", "turn_idx", "start_tok", "end_tok", "label"], "full"
    ).agg(
        F.sum(F.least(F.coalesce("n_sys", F.lit(0)), F.coalesce("n_gold", F.lit(0)))).alias("correct"),
        F.sum(F.coalesce("n_sys", F.lit(0))).alias("retrieved"),
        F.sum(F.coalesce("n_gold", F.lit(0))).alias("gold"),
    )
    row = joined.collect()[0]
    precision = row["correct"] / row["retrieved"]
    recall = row["correct"] / row["gold"]
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # the oracle scorer is deterministic: expect exact parity
    assert precision == 1.0 and recall == 1.0


def test_flat_and_staged_paths_identical(spark):
    """extract_mentions_flat (throughput path, fused Python pass) must
    produce exactly the rows of annotate_turns → extract_mentions
    (staged/snapshot path)."""
    from nametag3_spark.operators.infer import extract_mentions_flat

    transcripts = synth_transcripts(spark, n_convs=15, avg_turns=6)
    staged = extract_mentions(annotate_turns(transcripts)).select(
        "conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface",
        "mention_norm", "role", "tool",
    )
    flat = extract_mentions_flat(transcripts).select(
        "conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface",
        "mention_norm", "role", "tool",
    )
    assert sorted(map(tuple, staged.collect())) == sorted(map(tuple, flat.collect()))


def test_per_turn_text_equality_invariant(spark):
    """input_hint invariant: the labeled stage preserves every turn's text
    byte-for-byte under stable (conv_id, turn_idx) ordering."""
    transcripts = synth_transcripts(spark, n_convs=12, avg_turns=6)
    labeled = annotate_turns(transcripts)
    inp = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in transcripts.orderBy("conv_id", "turn_idx").collect()
    ]
    out = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in labeled.orderBy("conv_id", "turn_idx").collect()
    ]
    assert inp == out


def test_mention_surfaces_are_truecased(spark):
    surfaces = {r["surface"] for r in _mentions(spark).select("surface").distinct().collect()}
    assert not any(s.isupper() and len(s) > 2 for s in surfaces), surfaces


def test_linking_exact_and_canonical(spark):
    mentions = _mentions(spark)
    gaz = gazetteer_df(spark)
    linked = link_mentions(mentions, gaz, fuzzy=False)
    total = linked.count()
    exact = linked.where(F.col("entity_id").isNotNull()).count()
    assert exact / total > 0.9  # everything planted comes from the gazetteer

    canonical = canonicalize_mentions(linked)
    # aliases of the same entity must canonicalize together:
    # "John" and "John Smith" are both E001
    canon_ids = {
        r["mention_norm"]: r["entity_canonical"]
        for r in canonical.select("mention_norm", "entity_canonical").distinct().collect()
    }
    assert canon_ids.get("john") == canon_ids.get("john smith") == "e:E001"
    assert canon_ids.get("jan novák") == canon_ids.get("novák") == "e:E003"


def test_triples_shape(spark):
    mentions = _mentions(spark)
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)
    canonical = canonicalize_mentions(linked)
    triples = emit_triples(canonical)
    preds = {r["pred"] for r in triples.select("pred").distinct().collect()}
    assert "type" in preds
    assert any(p.startswith("mentioned_by_") for p in preds)
    assert any(p.startswith("observed_via_") for p in preds)
    assert "co_mentioned_with" in preds
    assert triples.where(F.col("subj").isNull() | F.col("obj").isNull()).count() == 0


def test_pipeline_quarantines_invalid_turns(spark, tmp_path):
    """Invalid rows land in the 'rejected' snapshot; valid rows flow on."""
    import json
    import os

    good = synth_transcripts(spark, n_convs=5, avg_turns=4)
    bad = spark.createDataFrame(
        [(None, 0, "user", "no conv", None, None),
         ("c9", -1, "user", "bad idx", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    run = PipelineRun(spark, warehouse=str(tmp_path / "wh"))
    triples = run.run(good.unionByName(bad))
    assert triples.count() > 0
    rejected = spark.read.parquet(str(tmp_path / "wh" / "rejected" / "data"))
    assert rejected.count() == 2
    assert set(r["reject_reason"] for r in rejected.collect()) == {
        "null_conv_id", "bad_turn_idx",
    }
    # lineage manifest recorded for the quarantine snapshot too
    with open(os.path.join(tmp_path, "wh", "rejected", "_MANIFEST.json")) as fh:
        manifest = json.load(fh)
    assert manifest["row_count"] == 2


def test_pipeline_resume(spark, tmp_path):
    transcripts = synth_transcripts(spark, n_convs=10, avg_turns=5)
    run1 = PipelineRun(spark, warehouse=str(tmp_path / "wh"))
    t1 = run1.run(transcripts).orderBy("subj", "pred", "obj", "conv_id", "turn_idx")
    rows1 = [tuple(r) for r in t1.collect()]
    assert len(run1.stages_run) == 6 and not run1.stages_skipped

    # rerun: every stage must resume from its snapshot without recompute
    run2 = PipelineRun(spark, warehouse=str(tmp_path / "wh"))
    t2 = run2.run(transcripts).orderBy("subj", "pred", "obj", "conv_id", "turn_idx")
    rows2 = [tuple(r) for r in t2.collect()]
    assert len(run2.stages_skipped) == 6 and not run2.stages_run
    assert rows1 == rows2  # byte-identical output


def test_window_path_equals_turn_path(spark):
    """The packed-window inference path (pack → score_windows → realign →
    decode) must emit exactly the mentions the per-turn path emits —
    closing the T1/T3/T6/J1 correctness gap (reference packing
    nametag3_dataset.py:273-306, realignment nametag3_model.py:963-1042)."""
    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.operators.encode import pack_conversations
    from nametag3_spark.operators.infer import (
        annotate_turns,
        mentions_from_window_tokens,
        score_windows,
    )
    from nametag3_spark.operators.triples import extract_mentions

    t = synth_transcripts(spark, n_convs=12, avg_turns=8)
    labeled = annotate_turns(t)

    turn_path = {
        tuple(r)
        for r in extract_mentions(labeled)
        .select("conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface")
        .collect()
    }
    # max_len=64 forces multi-window conversations (turn-boundary splits)
    windows = pack_conversations(labeled, max_len=64)
    assert windows.groupBy("conv_id").count().agg({"count": "max"}).collect()[0][0] > 1
    window_path = {
        tuple(r)
        for r in mentions_from_window_tokens(score_windows(windows))
        .select("conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface")
        .collect()
    }
    assert window_path == turn_path
    assert len(turn_path) > 0


def test_window_path_merges_oversized_turn_continuations(spark):
    """A turn LONGER than the window budget splits into continuation
    windows; score_windows must merge those segments back into one
    label_batch call so the window path equals the per-turn path even
    past the budget. The fixture plants 'Mary Jones' EXACTLY at the
    split: 12 one-subword fillers fill window 0 to 13 words ('Mary' is
    word 13), so 'Jones' lands in window 1 — unmerged segment scoring
    would tag the standalone-alias 'Mary' instead of 'Mary Jones'."""
    from nametag3_spark.data.synth import TRANSCRIPT_SCHEMA
    from nametag3_spark.operators.encode import pack_conversations
    from nametag3_spark.operators.infer import (
        mentions_from_window_tokens,
        score_windows,
    )

    text = " ".join(["zzzz"] * 12 + ["Mary", "Jones"] + ["zzzz"] * 10)
    t = spark.createDataFrame(
        [("c1", 0, "user", text, None, None)], TRANSCRIPT_SCHEMA
    )
    labeled = annotate_turns(t)
    windows = pack_conversations(labeled, max_len=16)
    win_rows = windows.orderBy("window_idx").collect()
    assert len(win_rows) >= 2  # the single turn really did split
    assert win_rows[0]["words"][-1] == "Mary"  # ...and mid-entity

    cols = ["conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface"]
    turn_path = {
        tuple(r) for r in extract_mentions(labeled).select(*cols).collect()
    }
    window_path = {
        tuple(r)
        for r in mentions_from_window_tokens(score_windows(windows))
        .select(*cols)
        .collect()
    }
    assert ("c1", 0, 12, 13, "PER", "Mary Jones") in turn_path
    assert window_path == turn_path


def test_cc_long_chain_distributed_pointer_jumping(spark):
    """A 120-node chain has diameter far above max_iterations=25; plain
    min-propagation would need 120 rounds. Pointer jumping converges in
    ~log2 rounds — this passing through the DISTRIBUTED path (forced via
    driver_threshold=1) is the convergence proof."""
    from nametag3_spark.operators.canonicalize import connected_components

    edges = [("n%03d" % i, "n%03d" % (i + 1)) for i in range(120)]
    df = spark.createDataFrame(edges, "src string, dst string")
    comp = connected_components(df, driver_threshold=1, max_iterations=25)
    comps = {r["component"] for r in comp.collect()}
    assert comps == {"n000"}  # one component, min id wins
    assert comp.count() == 121


def test_cc_nonconvergence_raises(spark):
    """If the loop cannot converge within max_iterations, it must raise —
    never silently split a component."""
    import pytest

    from nametag3_spark.operators.canonicalize import connected_components

    edges = [("n%03d" % i, "n%03d" % (i + 1)) for i in range(40)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, driver_threshold=1, max_iterations=2)


def test_canonicalize_broadcast_guard_plans(spark):
    """Small (driver-path) edge sets broadcast the canonical map; when the
    edge count is unknown-large (distributed path), the plan must NOT
    broadcast it."""
    from nametag3_spark.operators.canonicalize import canonicalize_mentions

    mentions = _mentions(spark)
    linked = link_mentions(mentions, gazetteer_df(spark), fuzzy=False)

    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    small = canonicalize_mentions(linked)  # driver path → broadcast
    plan_small = plan_of(small)
    # guard path: force distributed CC (edge count unknown) → shuffle join
    big = canonicalize_mentions(linked, driver_threshold=1)
    plan_big = plan_of(big)

    def final_join_is_broadcast(plan):
        # the canonical-map join is the LAST join in the plan (top-most);
        # look for a BroadcastHashJoin whose build side feeds _surf_node
        return "BroadcastHashJoin" in plan

    assert final_join_is_broadcast(plan_small)
    # distributed path: the canon join must not be broadcast (other small
    # joins in the subtree may still broadcast — check the canon join by
    # asserting at least one SortMergeJoin/ShuffledHashJoin LeftOuter exists)
    assert ("SortMergeJoin LeftOuter" in plan_big) or ("ShuffledHashJoin LeftOuter" in plan_big)

    # and the guarded path still computes the same canonicalization
    a = {tuple(r) for r in small.select("mention_norm", "entity_canonical").distinct().collect()}
    b = {tuple(r) for r in big.select("mention_norm", "entity_canonical").distinct().collect()}
    assert a == b


def test_link_mentions_best_broadcast_guard_plans(spark):
    """The fuzzy best-candidate map (one row per distinct UNMATCHED
    surface — the unbounded set at 10^12 turns) must broadcast only when
    the approx-distinct count proves it under the bound; over the bound
    the join must fall back to shuffle. Mirrors the canonicalize guard."""
    import contextlib
    import io

    # perturb half the surfaces so they MISS the exact gazetteer join and
    # exercise the fuzzy path (synth mentions otherwise all match exactly,
    # making `unmatched` empty and the guard trivially satisfied)
    mentions = _mentions(spark).withColumn(
        "mention_norm",
        F.when(
            F.crc32(F.col("mention_norm")) % 2 == 0,
            F.concat(F.col("mention_norm"), F.lit("x")),
        ).otherwise(F.col("mention_norm")),
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    small = link_mentions(mentions, gazetteer_df(spark), fuzzy=True)
    plan_small = plan_of(small)
    cols = ["conv_id", "turn_idx", "mention_norm", "entity_id", "link_method"]
    a = {tuple(r) for r in small.select(*cols).collect()}

    # under the bound the hint guarantees broadcast regardless of stats
    assert "SortMergeJoin LeftOuter" not in plan_small
    assert "ShuffledHashJoin LeftOuter" not in plan_small

    # over the bound the hint is dropped and Catalyst decides from stats;
    # at test scale its estimator still thinks `best` is tiny, so emulate
    # the 100 TB estimate by disabling the auto-broadcast threshold — the
    # un-hinted best join must then plan as a shuffle join while the
    # HINTED gazetteer broadcasts survive
    orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = link_mentions(
            mentions, gazetteer_df(spark), fuzzy=True, broadcast_surface_limit=0
        )
        plan_big = plan_of(big)
        assert ("SortMergeJoin LeftOuter" in plan_big) or (
            "ShuffledHashJoin LeftOuter" in plan_big
        )
        assert "BroadcastHashJoin" in plan_big  # hinted gaz joins intact
        b = {tuple(r) for r in big.select(*cols).collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
    assert a == b and len(a) > 0


def test_iceberg_waiver_and_store_contract(spark, tmp_path):
    """Container waiver: no Iceberg jars + no network (COVERAGE.md). The
    probe must return False gracefully, and the parquet SnapshotStore
    must honor the documented manifest contract (fingerprint, row_count,
    per-partition lineage rows summing to the total)."""
    from nametag3_spark.pipeline import SnapshotStore, iceberg_available

    assert iceberg_available(spark) is False

    store = SnapshotStore(str(tmp_path / "wh"))
    df = spark.range(0, 100, 1, 4).withColumnRenamed("id", "x")
    manifest = store.write(df, "stage1", fingerprint="fp-abc")
    assert manifest["fingerprint"] == "fp-abc"
    assert manifest["row_count"] == 100
    assert sum(p["rows"] for p in manifest["partitions"]) == 100
    assert store.is_current("stage1", "fp-abc")
    assert not store.is_current("stage1", "fp-other")
    assert store.read(spark, "stage1").count() == 100


def test_merge_latest_upsert_semantics(spark):
    """merge_latest: latest order wins per key; on an exact order tie the
    UPDATES side beats existing (MERGE INTO update semantics); keys
    absent from updates keep their existing row."""
    from nametag3_spark.operators.triples import merge_latest

    schema = "k string, ts int, v string"
    existing = spark.createDataFrame(
        [("a", 1, "old-a"), ("b", 5, "old-b"), ("c", 3, "old-c")], schema
    )
    updates = spark.createDataFrame(
        [("a", 2, "new-a"),   # newer → wins
         ("b", 5, "new-b")],  # exact tie → updates side wins
        schema,
    )
    got = {
        r["k"]: (r["ts"], r["v"])
        for r in merge_latest(existing, updates, ["k"], ["ts"]).collect()
    }
    assert got == {"a": (2, "new-a"), "b": (5, "new-b"), "c": (3, "old-c")}


def test_property_table_pivot_semantics(spark):
    """property_table: MAX-collapse per predicate + multiplicity count;
    missing predicate -> NULL cell / 0 count; predicates outside the
    explicit list are ignored entirely."""
    from nametag3_spark.operators.triples import property_table

    tri = spark.createDataFrame(
        [
            ("e1", "name", "alice"),
            ("e1", "knows", "bob"),
            ("e1", "knows", "carol"),     # multi-valued -> MAX + count 2
            ("e2", "name", "dave"),
            ("e2", "ignored.pred", "x"),  # not in the predicate list
        ],
        "subj string, pred string, obj string",
    )
    got = {
        r.subj: (r.name, r.n_name, r.knows, r.n_knows)
        for r in property_table(tri, ["name", "knows"]).collect()
    }
    assert got == {
        "e1": ("alice", 1, "carol", 2),
        "e2": ("dave", 1, None, 0),
    }


def test_property_table_sanitizes_dotted_predicates(spark):
    from nametag3_spark.operators.triples import property_table

    tri = spark.createDataFrame(
        [("e1", "foaf.name", "alice")], "subj string, pred string, obj string"
    )
    out = property_table(tri, ["foaf.name"])
    assert out.columns == ["subj", "foaf_name", "n_foaf_name"]
    assert out.collect()[0].foaf_name == "alice"
