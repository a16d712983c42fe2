"""KG graph analytics: co-mention edge construction and fixed-iteration
PageRank (operators/graph.py) — hand-computed goldens, a pure-Python
differential PageRank, determinism under repartitioning, and the
persist-registry release contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _py_pagerank(edges, iters=5, damping=0.85):
    """Independent reference: synchronous weighted damped PageRank over
    the symmetrized edge set, uniform init — mirrors graph.pagerank's
    math with plain dicts. ``edges`` items are (src, dst) or
    (src, dst, w)."""
    sym = {}
    for e in edges:
        s, d = e[0], e[1]
        w = float(e[2]) if len(e) > 2 else 1.0
        sym[(s, d)] = sym.get((s, d), 0.0) + w
        sym[(d, s)] = sym.get((d, s), 0.0) + w
    nodes = sorted({s for s, _ in sym})
    strength = {v: sum(w for (s, _), w in sym.items() if s == v) for v in nodes}
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: 0.0 for v in nodes}
        for (s, d), w in sym.items():
            nxt[d] += rank[s] * w / strength[s]
        rank = {v: (1.0 - damping) / n + damping * nxt[v] for v in nodes}
    return {v: round(r, 6) for v, r in rank.items()}


def test_comention_edges_counts(spark):
    from nametag3_spark.operators.graph import comention_edges

    docs = spark.createDataFrame(
        [
            (1, "spark joins the query"),
            (2, "query spark spark"),  # repeated surface counts once per doc
            (3, "query alone here"),
            (4, "spark   query"),  # multi-space split
        ],
        "doc_id long, text string",
    )
    got = {
        (r.src, r.dst): r.weight
        for r in comention_edges(docs, ["spark", "query", "ghost"]).collect()
    }
    # src < dst lexicographically; 'ghost' never occurs -> no node
    assert got == {("query", "spark"): 3}


def test_pagerank_matches_python_reference(spark):
    from nametag3_spark.operators.graph import pagerank, unpersist_intermediates

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.pagerank for r in pagerank(df, iters=5).collect()}
    unpersist_intermediates()
    assert got == _py_pagerank(edges, iters=5)
    # probability mass is conserved (symmetrized graph has no dangling nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_weighted_pagerank_matches_python_reference(spark):
    from nametag3_spark.operators.graph import pagerank, unpersist_intermediates

    # complete triangle: unweighted would be uniform; the weights break it
    edges = [("a", "b", 10), ("b", "c", 1), ("a", "c", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {
        r.node: r.pagerank
        for r in pagerank(df, iters=5, weight="weight").collect()
    }
    unpersist_intermediates()
    assert got == _py_pagerank(edges, iters=5)
    assert got["a"] == got["b"]  # symmetric under the weight pattern
    assert got["c"] < got["a"]  # weakly-tied node ranks strictly lower


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from nametag3_spark.operators.graph import pagerank, unpersist_intermediates

    df = spark.createDataFrame(
        [("hub", leaf) for leaf in ("x", "y", "z", "w")], "src string, dst string"
    )
    got = {r.node: r.pagerank for r in pagerank(df, iters=5).collect()}
    unpersist_intermediates()
    assert got["hub"] > max(got[leaf] for leaf in ("x", "y", "z", "w"))
    leaf_ranks = {got[leaf] for leaf in ("x", "y", "z", "w")}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly


def test_pagerank_empty_edges(spark):
    from nametag3_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    assert pagerank(empty, iters=3).count() == 0


def test_pagerank_deterministic_under_repartition(spark):
    from nametag3_spark.operators.graph import pagerank, unpersist_intermediates

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, pagerank(df, iters=5).collect()))
    unpersist_intermediates()
    b = sorted(map(tuple, pagerank(df.repartition(13), iters=5).collect()))
    unpersist_intermediates()
    assert a == b


def test_pagerank_releases_persisted_intermediates(spark):
    from nametag3_spark.operators import graph

    df = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = graph.pagerank(df, iters=2)
    assert len(graph._PERSISTED) == 2  # sym + deg held until released
    out.localCheckpoint(eager=True)
    assert graph.unpersist_intermediates() == 2
    assert graph._PERSISTED == []
