from __future__ import annotations

from pyspark.sql import functions as F

from nametag3_spark.operators.validate import billing_metrics, validate_turns


def test_validate_turns(spark):
    rows = [
        ("c1", 0, "user", "fine", None, "2026-01-01 00:00:00"),
        ("c1", 1, "user", None, None, "2026-01-01 00:00:07"),
        ("c1", -2, "user", "bad idx", None, "2026-01-01 00:00:14"),
        (None, 0, "user", "no conv", None, "2026-01-01 00:00:21"),
        ("c2", 0, "user", "x" * 5000, None, "2026-01-01 00:00:28"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    accepted, rejected = validate_turns(df, max_turn_bytes=4096)
    assert accepted.count() == 1
    reasons = {r["reject_reason"] for r in rejected.collect()}
    assert reasons == {"null_text", "bad_turn_idx", "null_conv_id", "oversize"}
    # accepted keeps the exact input schema
    assert accepted.columns == df.columns


def test_billing_metrics(spark):
    df = spark.createDataFrame(
        [("c1", 0, "u", "abcd", None, "2026-01-01 01:00:00"),
         ("c1", 1, "u", "ab", None, "2026-01-01 02:00:00"),
         ("c1", 2, "u", "a", None, "2026-01-02 01:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {(r["conv_id"], str(r["day"])): (r["billed_chars"], r["n_turns"])
            for r in billing_metrics(df).collect()}
    assert rows[("c1", "2026-01-01")] == (6, 2)
    assert rows[("c1", "2026-01-02")] == (1, 1)


def test_read_transcripts_jsonl_contract(spark, tmp_path):
    """External JSONL ingest: explicit schema (no inference scan),
    try_cast contract enforcement with a reasoned quarantine, and
    last-delivery-wins key dedup; the good side feeds the pipeline's
    mention extractor directly."""
    import json

    from nametag3_spark.operators.infer import extract_mentions_flat
    from nametag3_spark.sources.transcripts import read_transcripts

    rows = [
        {"conv_id": "c1", "turn_idx": "0", "role": "user",
         "text": "Hello Paris", "tool": None, "ts": "2026-01-01T00:00:00"},
        {"conv_id": "c1", "turn_idx": "1", "role": "assistant",
         "text": "Hi", "tool": "search", "ts": "2026-01-01T00:00:05"},
        {"conv_id": "c1", "turn_idx": "oops", "role": "user",
         "text": "bad idx", "tool": None, "ts": None},
        {"conv_id": None, "turn_idx": "2", "role": "user",
         "text": "no conv", "tool": None, "ts": None},
        {"conv_id": "c1", "turn_idx": "1", "role": "assistant",
         "text": "Hi v2", "tool": None, "ts": "2026-01-01T00:00:06"},
    ]
    src = tmp_path / "jsonl"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    good, quar = read_transcripts(spark, str(src), fmt="jsonl")
    assert dict(good.dtypes) == {
        "conv_id": "string", "turn_idx": "int", "role": "string",
        "text": "string", "tool": "string", "ts": "timestamp",
    }
    got = sorted((r.conv_id, r.turn_idx, r.text) for r in good.collect())
    assert got == [("c1", 0, "Hello Paris"), ("c1", 1, "Hi v2")]
    assert sorted(r._reason for r in quar.collect()) == [
        "bad_turn_idx", "null_conv_id",
    ]
    # the contract output runs straight through the scorer path
    mentions = extract_mentions_flat(good)
    assert mentions.count() >= 1
    # csv path enforces the same contract
    csv = tmp_path / "csv"
    csv.mkdir()
    (csv / "a.csv").write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        "c9,0,user,Hello Berlin,,2026-01-02T00:00:00\n"
        "c9,zz,user,bad,,\n"
    )
    g2, q2 = read_transcripts(spark, str(csv), fmt="csv")
    assert [(r.conv_id, r.turn_idx) for r in g2.collect()] == [("c9", 0)]
    assert [r._reason for r in q2.collect()] == ["bad_turn_idx"]


def test_read_transcripts_dedup_is_delivery_ordered_not_layout(spark, tmp_path):
    """last-delivery-wins must follow FILE NAME order, not physical
    partition order: Spark packs file partitions sorted by size
    descending, so a LARGE later delivery would get the LOWEST
    partition ids and a bare monotonic-id dedup would resurrect the
    superseded row from the small early chunk."""
    import json

    from nametag3_spark.sources.transcripts import read_transcripts

    def row(text, idx=0, conv="c1"):
        return {"conv_id": conv, "turn_idx": str(idx), "role": "user",
                "text": text, "tool": None, "ts": "2026-01-01T00:00:00"}

    src = tmp_path / "drops"
    src.mkdir()
    # early delivery: ONE row, the soon-to-be-superseded version
    (src / "part-00000.jsonl").write_text(json.dumps(row("old")) + "\n")
    # later delivery: much larger (hundreds of filler rows), so the
    # size-descending planner reads it FIRST
    filler = [row(f"filler {i}", idx=i, conv="cF") for i in range(400)]
    (src / "part-00001.jsonl").write_text(
        "\n".join(json.dumps(r) for r in [row("new")] + filler) + "\n"
    )
    good, _ = read_transcripts(spark, str(src), fmt="jsonl")
    winner = [r.text for r in good.where("conv_id = 'c1'").collect()]
    assert winner == ["new"]
