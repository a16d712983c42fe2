"""KG graph analytics: co-mention edge construction and fixed-iteration
PageRank over the entity graph.

The reference stops at emitting entities (nametag3.py:282-309 writes
spans; the server renders them) — downstream KG construction ranks the
canonicalized entities by graph centrality to pick canonical labels,
prune noise nodes, and order gazetteer candidates. This module adds that
step Spark-first:

* ``comention_edges`` — the standard co-occurrence graph: two entity
  surfaces are linked iff they appear in the same document; edge weight
  is the number of co-occurring documents. Mentions come from a caller
  supplied lexicon (broadcast, gazetteer-style — the same shape as
  ``linking.gazetteer_link``); swap in pipeline mentions upstream by
  passing any (doc, surface) DataFrame to ``pagerank`` directly.
* ``pagerank`` — damped PageRank, a FIXED number of synchronous
  iterations (deterministic, cluster-size-invariant; no convergence
  test, so both engines compute the identical closed-form).

Scale shape (100 TB): mention extraction is one scan + explode; the
within-doc pairing self-joins on doc_id, so its cost is bounded by
per-document mention count (cap long docs upstream), never corpus².
PageRank shuffles (node) per iteration — the adjacency and degree
tables are persisted once and reused across iterations, ranks stay a
linear lineage. Every node in a symmetrized edge list has degree >= 1,
so no dangling-mass correction is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Persisted adjacency/degree handles; same ownership contract as
# dedup._PERSISTED — callers release after the consuming action.
_PERSISTED: list[DataFrame] = []


def unpersist_intermediates(blocking: bool = False) -> int:
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking)
        n += 1
    return n


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def comention_edges(
    docs: DataFrame,
    lexicon: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Undirected co-mention edges (src < dst lexicographically) with
    ``weight`` = number of documents where both surfaces occur.

    The lexicon is a plan literal (an ``isin`` over an exploded token
    column) — for a large gazetteer pass a DataFrame and broadcast-join
    instead (``linking.gazetteer_link`` is that path).
    """
    mentions = (
        docs.select(
            F.col(id_col).alias("_doc"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("surf"),
        )
        .where(F.col("surf").isin(list(lexicon)))
        .distinct()
    )
    a = mentions.alias("a")
    b = mentions.alias("b")
    return (
        a.join(b, on=[F.col("a._doc") == F.col("b._doc"),
                      F.col("a.surf") < F.col("b.surf")])
        .groupBy(F.col("a.surf").alias("src"), F.col("b.surf").alias("dst"))
        .agg(F.count("*").cast("long").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """(node, pagerank) after exactly ``iters`` synchronous iterations
    over the SYMMETRIZED edge set, uniform 1/N init, damping ``d``:

        r'(v) = (1-d)/N + d * sum_{u->v} r(u) * w(u,v) / strength(u)

    where strength(u) = sum of u's outgoing weights (plain degree when
    ``weight`` is None). Weighted mode matters for co-mention graphs:
    document-level co-occurrence saturates to a near-complete graph on
    any frequent lexicon, where unweighted PageRank degenerates to
    uniform — the co-occurrence counts are the signal.

    ``round_to`` rounds the final rank so independent engines (different
    float summation orders) agree bit-for-bit on the emitted value.
    """
    w = (F.col(weight) if weight else F.lit(1)).cast("double").alias("w")
    sym = _persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w)
        .union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"), w))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    deg = _persist(sym.groupBy("src").agg(F.sum("w").alias("strength")))
    n = deg.count()  # bounded driver scalar: one aggregate, no row pull
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node string, pagerank double")
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("rank"))
    contrib_base = sym.join(deg, on="src")  # (src, dst, w, strength), cached parents
    for _ in range(iters):
        ranks = (
            contrib_base.join(ranks, on=[F.col("src") == F.col("node")])
            .select(
                F.col("dst").alias("_to"),
                (F.col("rank") * F.col("w") / F.col("strength")).alias("c"),
            )
            .groupBy(F.col("_to").alias("node"))
            .agg((F.lit((1.0 - damping) / n) + damping * F.sum("c")).alias("rank"))
        )
    return ranks.select("node", F.round("rank", round_to).alias("pagerank"))
