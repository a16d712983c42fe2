"""Temporal KG materialization (operators/temporal.py): SCD2 interval
compaction, as-of snapshots, and fixed-iteration integer-ppm truth
discovery — hand-computed goldens plus determinism-under-repartition."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

T = lambda d, h=0: datetime.datetime(2024, 1, d, h)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, obj string, ts timestamp, tb long"
    )


def test_scd2_collapses_runs_and_chains_intervals(spark):
    from nametag3_spark.operators.temporal import scd2_intervals

    # A(t1), A(t2) collapse; B(t3); back to A(t5) — re-assertion of an
    # old value after a change opens a NEW interval, never extends old
    log = _log(spark, [
        ("x", "A", T(1), 1),
        ("x", "A", T(2), 2),
        ("x", "B", T(3), 3),
        ("x", "A", T(5), 4),
    ])
    got = sorted(
        scd2_intervals(log, keys=["subj"], order_cols=["tb"]).collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.obj, r.valid_from, r.valid_to, r.is_current, r.n_assertions)
            for r in got] == [
        ("A", T(1), T(3), False, 2),
        ("B", T(3), T(5), False, 1),
        ("A", T(5), None, True, 1),
    ]


def test_scd2_same_timestamp_tiebreak(spark):
    from nametag3_spark.operators.temporal import scd2_intervals

    # two assertions at the SAME ts: the order_cols tiebreak decides
    # which value wins the instant (higher tb = later in the log)
    log = _log(spark, [
        ("x", "A", T(1), 10),
        ("x", "B", T(1), 20),
    ])
    got = sorted(
        scd2_intervals(log, keys=["subj"], order_cols=["tb"]).collect(),
        key=lambda r: (r.valid_from, r.obj),
    )
    assert [(r.obj, r.is_current) for r in got] == [("A", False), ("B", True)]
    # the superseded A interval closes at the same instant it opened
    assert got[0].valid_to == T(1)


def test_scd2_independent_subjects(spark):
    from nametag3_spark.operators.temporal import scd2_intervals

    log = _log(spark, [
        ("x", "A", T(1), 1),
        ("y", "B", T(1), 2),
        ("y", "B", T(2), 3),
    ])
    got = scd2_intervals(log, keys=["subj"], order_cols=["tb"])
    assert got.count() == 2
    assert got.where(F.col("is_current")).count() == 2


def test_asof_snapshot_boundaries(spark):
    from nametag3_spark.operators.temporal import asof_facts, scd2_intervals

    log = _log(spark, [
        ("x", "A", T(1), 1),
        ("x", "B", T(3), 2),
    ])
    iv = scd2_intervals(log, keys=["subj"], order_cols=["tb"])
    # inclusive lower bound, exclusive upper: at exactly t3 the new fact holds
    assert [r.obj for r in asof_facts(iv, T(2)).collect()] == ["A"]
    assert [r.obj for r in asof_facts(iv, T(3)).collect()] == ["B"]
    assert [r.obj for r in asof_facts(iv, T(1)).collect()] == ["A"]
    # before any assertion: empty snapshot
    assert asof_facts(iv, datetime.datetime(2023, 12, 31)).count() == 0


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string"
    )


def test_resolve_conflicts_hand_golden(spark):
    from nametag3_spark.operators.temporal import resolve_conflicts

    # e1: A asserted by s1,s2 / B by s3;  e2: C by s1 / B by s2,s3.
    # Round 1 shares: e1 A=666666 B=333333; e2 C=333333 B=666666.
    # Trust': s1=(666666+333333)//2=499999, s2=666666, s3=499999.
    # Round 2: e1 conf(A)=1166665 conf(B)=499999 tot=1666664
    #          share(A)=1166665*1e6//1666664=700000 -> winner A.
    # e2 symmetric -> winner B with the same numbers.
    claims = _claims(spark, [
        ("e1", "p", "A", "s1"), ("e1", "p", "A", "s2"), ("e1", "p", "B", "s3"),
        ("e2", "p", "C", "s1"), ("e2", "p", "B", "s2"), ("e2", "p", "B", "s3"),
    ])
    got = {
        (r.subj, r.pred): (r.obj, r.conf_ppm, r.share_ppm, r.n_sources)
        for r in resolve_conflicts(claims, iters=2).collect()
    }
    assert got == {
        ("e1", "p"): ("A", 1166665, 700000, 2),
        ("e2", "p"): ("B", 1166665, 700000, 2),
    }


def test_resolve_conflicts_unanimous_and_tiebreak(spark):
    from nametag3_spark.operators.temporal import resolve_conflicts

    claims = _claims(spark, [
        ("u", "p", "V", "s1"), ("u", "p", "V", "s2"),   # unanimous
        ("t", "p", "A", "s1"), ("t", "p", "B", "s2"),   # exact tie -> min obj
    ])
    got = {
        (r.subj): (r.obj, r.share_ppm, r.n_sources)
        for r in resolve_conflicts(claims, iters=2).collect()
    }
    assert got["u"] == ("V", 1000000, 2)  # full belief share
    assert got["t"][0] == "A"             # deterministic tie -> smallest obj


def test_resolve_conflicts_duplicate_claims_collapse(spark):
    from nametag3_spark.operators.temporal import resolve_conflicts

    # the same (s,p,o,source) row twice must not double a source's vote
    claims = _claims(spark, [
        ("e", "p", "A", "s1"), ("e", "p", "A", "s1"), ("e", "p", "B", "s2"),
    ])
    got = resolve_conflicts(claims, iters=2).collect()
    assert len(got) == 1 and got[0].obj == "A" and got[0].n_sources == 1


def test_resolve_conflicts_deterministic_under_repartition(spark):
    from nametag3_spark.operators.temporal import resolve_conflicts

    rows = [
        (f"e{i % 7}", "p", f"o{(i * 3) % 5}", f"s{i % 4}") for i in range(60)
    ]
    claims = _claims(spark, rows)
    a = sorted(map(tuple, resolve_conflicts(claims, iters=2).collect()))
    b = sorted(map(tuple, resolve_conflicts(claims.repartition(13), iters=2).collect()))
    assert a == b


def test_resolve_conflicts_releases_persisted(spark):
    from nametag3_spark.operators.temporal import resolve_conflicts

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    claims = _claims(spark, [("e", "p", "A", "s1")])
    out = resolve_conflicts(claims, iters=2)
    out.collect()
    # the operator pins claims + each round's trust dim, then releases
    # them all after materializing; only the localCheckpoint RDD of the
    # RESULT may remain in storage
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 1


def test_snapshot_diff_classifies_added_removed_changed(spark):
    """Four fact keys, one per diff class: changed, added, removed (the
    key's last interval closed between the instants), and unchanged
    (dropped from the output)."""
    import datetime

    from nametag3_spark.operators.temporal import (
        scd2_intervals,
        snapshot_diff,
    )

    d = datetime.datetime
    rows = [
        # s1: X until 1995, then Y -> changed
        (1, "X", d(1992, 1, 1), 1), (1, "Y", d(1995, 1, 1), 2),
        # s2: first asserted after t1 -> added
        (2, "A", d(1996, 1, 1), 3),
        # s3: asserted before t1, superseded... no: SCD2 keys always
        # carry a current interval once asserted; "removed" needs the
        # value's interval to CLOSE, i.e. a change to a later value that
        # itself postdates t2 -- not expressible per key. Instead s3
        # changes to a value equal per-instant: unchanged -> dropped.
        (3, "K", d(1992, 6, 1), 4),
        # s4: changes between the instants and again after t2 (the
        # post-t2 tail must not leak into the diff)
        (4, "P", d(1993, 1, 1), 5), (4, "Q", d(1996, 1, 1), 6),
        (4, "R", d(1999, 1, 1), 7),
    ]
    iv = scd2_intervals(
        spark.createDataFrame(
            rows, "subj int, obj string, ts timestamp, tb int"
        ),
        keys=["subj"],
        value_col="obj",
        ts_col="ts",
        order_cols=["tb"],
    )
    out = {r.subj: r for r in snapshot_diff(
        iv, d(1994, 1, 1), d(1997, 1, 1), keys=["subj"]
    ).collect()}
    assert set(out) == {1, 2, 4}  # s3 unchanged -> absent
    assert (out[1].obj_before, out[1].obj_after, out[1].change) == ("X", "Y", "changed")
    assert (out[2].obj_before, out[2].obj_after, out[2].change) == (None, "A", "added")
    assert (out[4].obj_before, out[4].obj_after, out[4].change) == ("P", "Q", "changed")


def test_snapshot_diff_removed_on_closed_interval(spark):
    """A raw interval table (not via scd2_intervals) whose key has NO
    interval spanning t2 diffs as removed."""
    import datetime

    from nametag3_spark.operators.temporal import snapshot_diff

    d = datetime.datetime
    iv = spark.createDataFrame(
        [(7, "gone", d(1990, 1, 1), d(1995, 1, 1))],
        "subj int, obj string, valid_from timestamp, valid_to timestamp",
    )
    out = snapshot_diff(iv, d(1994, 1, 1), d(1996, 1, 1), keys=["subj"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.obj_before, r.obj_after, r.change) == (7, "gone", None, "removed")
