"""SPARQL text front end (operators/sparql.py): parser unit tests
(pure Python, fast) and execute() equivalence with the programmatic
API on the shared tiny graph."""

from __future__ import annotations

import pytest

from nametag3_spark.operators.sparql import SparqlSyntaxError, parse

TRIPLES = [
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("carol", "works_at", "acme"),
    ("bob", "works_at", "acme"),
    ("alice", "works_at", "globex"),
    ("dave", "knows", "erin"),
]


def _tri(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


# ---- parser (no Spark) ------------------------------------------------


def test_parse_select_forms():
    s = parse("SELECT ?x ?w WHERE { ?x works_at ?w . ?x knows carol }")
    assert s["form"] == "select" and s["select"] == ["x", "w"]
    assert s["patterns"] == [("?x", "works_at", "?w"), ("?x", "knows", "carol")]
    assert not s["distinct"]
    s = parse("SELECT DISTINCT * WHERE { ?x knows ?y }")
    assert s["select"] is None and s["distinct"]


def test_parse_blocks_and_values():
    s = parse(
        """SELECT ?x WHERE {
             ?x knows ?y .
             OPTIONAL { ?y works_at ?w }
             FILTER NOT EXISTS { ?x works_at globex }
             VALUES ?y { bob carol 'two words' }
           }"""
    )
    assert s["optional"] == [[("?y", "works_at", "?w")]]
    assert s["not_exists"] == [[("?x", "works_at", "globex")]]
    assert s["values"] == {"y": ["bob", "carol", "two words"]}


def test_parse_graph_and_construct_and_ask():
    s = parse("SELECT * WHERE { GRAPH ?g { ?s ?p ?o } }")
    assert s["graph"] == "?g" and s["patterns"] == [("?s", "?p", "?o")]
    s = parse("CONSTRUCT { ?a coworker ?b } WHERE { ?a works_at ?w . ?b works_at ?w }")
    assert s["form"] == "construct" and s["template"] == [("?a", "coworker", "?b")]
    s = parse("ASK { alice knows+ ?x }")
    assert s["form"] == "ask" and s["patterns"] == [("alice", "knows+", "?x")]


def test_parse_quoted_keywords_are_literals():
    # a quoted 'OPTIONAL' is a term, not a keyword
    s = parse("SELECT * WHERE { ?x 'OPTIONAL' ?y }")
    assert s["patterns"] == [("?x", "OPTIONAL", "?y")]


def test_parse_errors():
    for bad, msg in [
        ("FOO { }", "must start with"),
        ("SELECT WHERE { ?x p ?y }", "needs '\\*' or"),
        ("SELECT ?x WHERE { ?x p }", "3 terms"),
        ("SELECT ?x WHERE { ?x p ?y", "unterminated group|end of query"),
        ("SELECT ?x WHERE { ?x p ?y } trailing", "trailing"),
        ("SELECT * WHERE { ?x p ?y . GRAPH g { ?a q ?b } }", "GRAPH must be"),
        ("SELECT * WHERE { VALUES x { a } }", "needs a \\?var"),
        ("ASK { 'unterminated", "unterminated string"),
    ]:
        with pytest.raises(SparqlSyntaxError, match=msg):
            parse(bad)


# ---- execute() vs programmatic API ------------------------------------


def test_execute_select_matches_programmatic(spark):
    from nametag3_spark.operators.bgp import bgp_query
    from nametag3_spark.operators.sparql import execute

    q = """SELECT ?x ?w WHERE {
             alice knows ?x .
             OPTIONAL { ?x works_at ?w }
           }"""
    got = {tuple(r) for r in execute(_tri(spark), q).collect()}
    want = {
        tuple(r)
        for r in bgp_query(
            _tri(spark),
            [("alice", "knows", "?x")],
            select=["x", "w"],
            optional=[[("?x", "works_at", "?w")]],
        ).collect()
    }
    assert got == want and got == {("bob", "acme"), ("carol", "acme")}


def test_execute_ask_construct_and_path(spark):
    from nametag3_spark.operators.sparql import execute

    tri = _tri(spark)
    assert execute(tri, "ASK { alice knows+ ?x . ?x works_at acme }") is True
    assert execute(tri, "ASK { erin knows ?x }") is False
    out = execute(
        tri,
        "CONSTRUCT { ?a affiliated ?w } WHERE "
        "{ ?a knows ?b . ?b works_at ?w }",
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("alice", "affiliated", "acme"),
        ("bob", "affiliated", "acme"),
    }


def test_execute_graph_scope(spark):
    from nametag3_spark.operators.sparql import execute

    quads = spark.createDataFrame(
        [
            ("g1", "a", "p", "b"),
            ("g2", "a", "p", "c"),
        ],
        "graph string, subj string, pred string, obj string",
    )
    got = {
        tuple(r)
        for r in execute(quads, "SELECT ?o WHERE { GRAPH g2 { a p ?o } }").collect()
    }
    assert got == {("c",)}
    rows = execute(quads, "SELECT ?g ?o WHERE { GRAPH ?g { a p ?o } }").collect()
    assert {(r.g, r.o) for r in rows} == {("g1", "b"), ("g2", "c")}
