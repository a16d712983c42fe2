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
