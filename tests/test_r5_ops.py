"""Round-5 operator additions: pairwise cluster-eval metrics
(eval/clusters.py), BM25 retrieval (operators/retrieval.py), PMI
co-mention weighting (graph.pmi_edges), time-gap sessionization
(temporal.sessionize_by_gap)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from nametag3_spark.eval.clusters import pairwise_cluster_metrics
from nametag3_spark.operators.graph import pmi_edges
from nametag3_spark.operators.retrieval import bm25_topk
from nametag3_spark.operators.temporal import sessionize_by_gap


def test_pairwise_cluster_metrics_golden(spark):
    """gold {1,2,3}{4,5}{6} vs pred {1,2}{3,4,5}{6}: tp=2 of 4
    predicted and 4 gold pairs -> P = R = F1 = 0.5."""
    rows = [
        (1, "p1", "g1"), (2, "p1", "g1"), (3, "p2", "g1"),
        (4, "p2", "g2"), (5, "p2", "g2"), (6, "p3", "g3"),
    ]
    df = spark.createDataFrame(
        rows, "item int, pred_cluster string, gold_cluster string"
    )
    got = pairwise_cluster_metrics(df).first()
    assert (got.tp_pairs, got.pred_pairs, got.gold_pairs) == (2, 4, 4)
    assert got.precision_ppm == got.recall_ppm == got.f1_ppm == 500_000


def test_pairwise_cluster_metrics_perfect_and_null(spark):
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, None, "y")]
    df = spark.createDataFrame(
        rows, "item int, pred_cluster string, gold_cluster string"
    )
    got = pairwise_cluster_metrics(df).first()
    # NULL-pred item contributes nothing; remaining clustering is exact
    assert (got.tp_pairs, got.pred_pairs, got.gold_pairs) == (1, 1, 1)
    assert got.f1_ppm == 1_000_000
    # pair-free input: all-zero row, never NULL/NaN
    one = spark.createDataFrame(
        [(1, "a", "x")], "item int, pred_cluster string, gold_cluster string"
    )
    z = pairwise_cluster_metrics(one).first()
    assert tuple(z) == (0, 0, 0, 0, 0, 0)


def test_bm25_topk_matches_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "apple cherry"),
            (3, "banana banana banana durian"),
            (4, "elderberry fig"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(docs, ["apple", "banana"], k=3).collect()

    def idf(df_t, n=4):
        return math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))

    def part(tf, dl, avgdl, k1=1.2, b=0.75):
        return tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))

    avgdl = (3 + 2 + 4 + 2) / 4.0
    exp = {
        1: round(idf(2) * part(2, 3, avgdl) * 1e6)
        + round(idf(2) * part(1, 3, avgdl) * 1e6),
        2: round(idf(2) * part(1, 2, avgdl) * 1e6),
        3: round(idf(2) * part(3, 4, avgdl) * 1e6),
    }
    exp_sorted = sorted(exp.items(), key=lambda t: (-t[1], t[0]))[:3]
    assert [(r.doc_id, r.score_micro) for r in got] == exp_sorted
    assert [r.rank for r in got] == [1, 2, 3]
    # doc 1 hits both terms, docs 2/3 one each
    hits = {r.doc_id: r.n_terms_hit for r in got}
    assert hits[1] == 2 and hits[2] == 1 and hits[3] == 1


def test_bm25_topk_contracts(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a")], "doc_id long, text string"
    )
    # duplicate query terms score once (bag-of-words dedup)
    once = bm25_topk(docs, ["a"], k=5).collect()
    twice = bm25_topk(docs, ["a", "a", "A"], k=5).collect()
    assert [tuple(r) for r in once] == [tuple(r) for r in twice]
    assert len(bm25_topk(docs, ["a"], k=1).collect()) == 1
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(docs, [])


def test_pmi_edges_golden(spark):
    """x appears in 3 of 4 docs, y in 2, together in 2:
    pmi = ln(2*4 / (3*2)) = ln(4/3)."""
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "x"), (4, "z")],
        "doc_id long, text string",
    )
    got = {(r.src, r.dst): r for r in pmi_edges(docs, None).collect()}
    assert set(got) == {("x", "y")}
    e = got[("x", "y")]
    assert (e.weight, e.src_docs, e.dst_docs) == (2, 3, 2)
    assert e.pmi_micro == round(math.log(4.0 / 3.0) * 1e6)
    # min_weight filters sub-threshold pairs
    assert pmi_edges(docs, None, min_weight=3).count() == 0
    # lexicon restricts the vocabulary like comention_edges
    assert pmi_edges(docs, ["x", "z"]).count() == 0


def test_sessionize_by_gap_golden(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: events at +0s, +10s, +2000s, +2010s, +9999s
        (1, t0, 10),
        (1, t0 + dt.timedelta(seconds=10), 11),
        (1, t0 + dt.timedelta(seconds=2000), 12),
        (1, t0 + dt.timedelta(seconds=2010), 13),
        (1, t0 + dt.timedelta(seconds=9999), 14),
        # user 2: one event — its own session; isolation from user 1
        (2, t0 + dt.timedelta(seconds=5), 20),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = sessionize_by_gap(
        df, gap_seconds=1800, tiebreak_col="event_id"
    ).collect()
    by_event = {r.event_id: (r.session_idx, r.event_idx) for r in got}
    assert by_event == {
        10: (1, 1), 11: (1, 2), 12: (2, 3), 13: (2, 4), 14: (3, 5),
        20: (1, 1),
    }
    # boundary: a gap EXACTLY equal to the threshold does not split
    two = spark.createDataFrame(
        [(1, t0, 1), (1, t0 + dt.timedelta(seconds=1800), 2)],
        "user_id int, ts timestamp, event_id int",
    )
    s = sessionize_by_gap(two, gap_seconds=1800, tiebreak_col="event_id")
    assert {r.session_idx for r in s.collect()} == {1}
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize_by_gap(two, gap_seconds=-1)


def test_sessionize_matches_native_session_window(spark):
    """Away from the exact-boundary corner (our split is gap-EXCLUSIVE,
    F.session_window's is inclusive), sessionize_by_gap partitions
    events identically to Spark's built-in session_window — the
    idiomatic aggregation twin (ours additionally yields per-EVENT
    session ids, which session_window cannot)."""
    import pyspark.sql.functions as F

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows, eid = [], 0
    for u in (1, 2, 3):
        ts = t0
        for step in (5, 100, 2000, 7, 1900, 1, 1, 5000):
            ts = ts + dt.timedelta(seconds=step * u)
            eid += 1
            rows.append((u, ts, eid))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")

    ours = (
        sessionize_by_gap(df, gap_seconds=1800, tiebreak_col="event_id")
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
        )
    )
    native = df.groupBy(
        "user_id", F.session_window("ts", "1800 seconds").alias("w")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("start"),
        F.max("ts").alias("end"),
    )
    a = sorted(
        (r.user_id, r.n, r.start, r.end) for r in ours.collect()
    )
    b = sorted(
        (r.user_id, r.n, r.start, r.end) for r in native.collect()
    )
    assert a == b


# ---- hypothesis differentials ----------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    assign=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_pairwise_metrics_match_bruteforce_pairs(spark, assign):
    """The Σ C(n,2) counting identities equal literal pair
    enumeration on arbitrary small clusterings."""
    import itertools

    df = spark.createDataFrame(
        [(p, g) for p, g in assign], "pred_cluster int, gold_cluster int"
    )
    got = pairwise_cluster_metrics(df).first()
    pairs = list(itertools.combinations(range(len(assign)), 2))
    tp = sum(
        1
        for i, j in pairs
        if assign[i][0] == assign[j][0] and assign[i][1] == assign[j][1]
    )
    pp = sum(1 for i, j in pairs if assign[i][0] == assign[j][0])
    gp = sum(1 for i, j in pairs if assign[i][1] == assign[j][1])
    assert (got.tp_pairs, got.pred_pairs, got.gold_pairs) == (tp, pp, gp)
    assert got.precision_ppm == (tp * 1_000_000 // pp if pp else 0)
    assert got.recall_ppm == (tp * 1_000_000 // gp if gp else 0)


@given(
    gaps=st.lists(st.integers(0, 4000), min_size=1, max_size=30),
    threshold=st.sampled_from([1, 600, 1800]),
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_python_reference(spark, gaps, threshold):
    """Window-based sessionization equals the obvious sequential
    scan for arbitrary gap sequences and thresholds."""
    t0 = dt.datetime(2026, 3, 1)
    ts, rows = t0, []
    for i, g in enumerate(gaps):
        ts = ts + dt.timedelta(seconds=g)
        rows.append((1, ts, i))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, event_id int")
    got = {
        r.event_id: r.session_idx
        for r in sessionize_by_gap(
            df, gap_seconds=threshold, tiebreak_col="event_id"
        ).collect()
    }
    sess, exp = 0, {}
    for i, g in enumerate(gaps):
        if i == 0 or g > threshold:  # gaps[i] = gap from event i-1
            sess += 1
        exp[i] = sess
    assert got == exp
