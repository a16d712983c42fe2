"""Ontology closure + type inference (operators/ontology.py):
hand-computed goldens on small DAGs, a pure-Python Floyd-style
differential, cycle/diamond/depth-cap behavior, and the direct-vs-
inferred flag contract."""

from __future__ import annotations

import pytest


def _py_closure(edges, max_depth):
    """Independent BFS-per-node min-hop closure."""
    adj = {}
    for c, p in edges:
        if c != p:
            adj.setdefault(c, set()).add(p)
    out = {}
    for start in adj:
        dist = {start: 0}
        frontier = [start]
        d = 0
        while frontier and d < max_depth:
            d += 1
            nxt = []
            for n in frontier:
                for m in adj.get(n, ()):
                    if m not in dist:
                        dist[m] = d
                        nxt.append(m)
            frontier = nxt
        for n, h in dist.items():
            if n != start and h <= max_depth:
                out[(start, n)] = h
    return out


def test_closure_chain_and_diamond(spark):
    from nametag3_spark.operators.ontology import transitive_closure

    edges = [
        ("poodle", "dog"), ("dog", "mammal"), ("mammal", "animal"),
        ("cat", "mammal"),
        # diamond: two length-2 routes to 'thing', min-hop kept
        ("dog", "pet"), ("pet", "thing"), ("animal", "thing"),
    ]
    df = spark.createDataFrame(edges, "child string, parent string")
    got = {(r.child, r.ancestor): r.hops for r in transitive_closure(df).collect()}
    assert got == _py_closure(edges, 16)
    assert got[("poodle", "animal")] == 3
    assert got[("dog", "thing")] == 2  # via pet OR mammal->animal: min=2


def test_closure_cycle_terminates(spark):
    from nametag3_spark.operators.ontology import transitive_closure

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "child string, parent string")
    got = {(r.child, r.ancestor): r.hops for r in transitive_closure(df).collect()}
    # every node reaches the other two; reflexive pairs dropped
    assert got == _py_closure(edges, 16)
    assert len(got) == 6 and ("a", "a") not in got


def test_closure_depth_cap(spark):
    from nametag3_spark.operators.ontology import transitive_closure

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(chain, "child string, parent string")
    got = {(r.child, r.ancestor): r.hops for r in transitive_closure(df, max_depth=2).collect()}
    assert got == _py_closure(chain, 2)
    assert max(got.values()) == 2
    with pytest.raises(ValueError):
        transitive_closure(df, max_depth=0)


def test_infer_types_direct_wins_and_broadcast(spark):
    from nametag3_spark.operators.ontology import infer_types, transitive_closure

    tbox = spark.createDataFrame(
        [("poodle", "dog"), ("dog", "animal")], "child string, parent string"
    )
    clo = transitive_closure(tbox)
    abox = spark.createDataFrame(
        # rex holds BOTH a subtype and its ancestor directly: the
        # (rex, dog) row must stay inferred=false after the merge
        [("rex", "poodle"), ("rex", "dog"), ("tom", "dog")],
        "id string, type string",
    )
    rows = {(r.id, r.type): r.inferred for r in infer_types(abox, clo).collect()}
    assert rows == {
        ("rex", "poodle"): False,
        ("rex", "dog"): False,
        ("rex", "animal"): True,
        ("tom", "dog"): False,
        ("tom", "animal"): True,
    }
    # the TBox side must broadcast — corpus never shuffles for the join
    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        infer_types(abox, clo).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
    assert "SortMergeJoin" not in buf.getvalue()
