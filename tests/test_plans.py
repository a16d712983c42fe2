"""Physical-plan regression guards: the optimizations we rely on at
100 TB must be visible in the plan — pushdown, pruning, broadcast.
These fail loudly if a refactor silently loses them."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_scan_filter_project(spark, SF))
    assert "PushedFilters:" in p
    assert "IsNotNull(l_shipdate)" in p or "LessThan(l_shipdate" in p
    # column pruning: projection never reads the full 11-column lineitem
    assert "l_extendedprice" not in p.split("ReadSchema")[1]


def test_dim_joins_are_broadcast(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_broadcast_dim_join(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_gazetteer_link_is_broadcast_with_one_python_stage(spark):
    from nametag3_spark.data.synth import gazetteer_df, synth_transcripts
    from nametag3_spark.operators.infer import extract_mentions_flat
    from nametag3_spark.operators.linking import link_exact

    t = synth_transcripts(spark, n_convs=4, avg_turns=3)
    mentions = extract_mentions_flat(t)
    p = plan_of(link_exact(mentions, gazetteer_df(spark)))
    assert "BroadcastHashJoin" in p
    # exactly TWO Python nodes: the synth generator + the fused scorer —
    # a third would mean decode split back into its own chained stage
    assert p.count(") MapInPandas") == 2
    assert "ArrowEvalPython" not in p  # no extra pandas-UDF stage


def test_partial_aggregation_present(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_tpch_q1(spark, SF))
    # map-side combine: two HashAggregate levels around the exchange
    tree = p.split("== Physical Plan ==")[1]
    agg_count = tree.count("HashAggregate")
    assert agg_count >= 2


def test_topk_prunes_columns(spark):
    import __spark_entry__ as E

    p = plan_of(E.q_topk_per_group(spark, SF))
    read = p.split("ReadSchema")[1].splitlines()[0]
    assert "o_orderdate" not in read and "o_orderpriority" not in read
