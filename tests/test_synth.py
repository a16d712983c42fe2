"""Synthetic transcript generator: determinism, schema, skew shape."""

from __future__ import annotations

from nametag3_spark.data.synth import (
    gazetteer_df,
    synth_gold_mentions,
    synth_transcripts,
)


def test_schema_matches_input_hint(spark):
    df = synth_transcripts(spark, n_convs=5, avg_turns=4)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_across_partitionings(spark):
    a = synth_transcripts(spark, n_convs=12, avg_turns=6, partitions=1)
    b = synth_transcripts(spark, n_convs=12, avg_turns=6, partitions=7)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_turn_idx_dense_and_ordered(spark):
    df = synth_transcripts(spark, n_convs=6, avg_turns=5)
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"])
    for _conv, group in pdf.groupby("conv_id"):
        assert list(group["turn_idx"]) == list(range(len(group)))
        assert group["ts"].is_monotonic_increasing


def test_hot_conversations_exist(spark):
    df = synth_transcripts(spark, n_convs=100, avg_turns=10)
    counts = df.groupBy("conv_id").count().toPandas()
    assert counts["count"].max() >= 10 * counts["count"].median()


def test_gold_mentions_align_with_text(spark):
    from nametag3_spark.functions.text import prep_tokens

    turns = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in synth_transcripts(spark, n_convs=10, avg_turns=8).collect()
    }
    gold = synth_gold_mentions(spark, n_convs=10, avg_turns=8).collect()
    assert len(gold) > 0
    for g in gold:
        tokens = prep_tokens(turns[(g["conv_id"], g["turn_idx"])])
        surface = " ".join(tokens[g["start_tok"] : g["end_tok"] + 1])
        assert surface == g["surface"], (g, tokens)


def test_gazetteer_df(spark):
    gaz = gazetteer_df(spark)
    assert gaz.count() > 20
    assert set(gaz.columns) == {
        "entity_id",
        "alias",
        "entity_type",
        "alias_ntok",
        "alias_norm",
    }
