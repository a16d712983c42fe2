"""Canonicalization: iterative connected components over the mention graph.

Mentions that share a gazetteer entity, or surfaces that co-refer (exact
same normalized surface + type), form edges; each connected component's
minimum id becomes the canonical entity id (north rule: "canonicalized
with an iterative connected-components merge over the mention graph").

Algorithm: alternating large-star/small-star style min-label propagation —
each iteration is one shuffle (groupBy min over neighbors), the driver
loops until no label changes. Components here are shallow (alias cliques),
so convergence is a handful of iterations; ``localCheckpoint`` truncates
lineage each round so plans don't grow, which is what keeps the driver
loop viable at 10^12 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


DRIVER_CC_THRESHOLD = 1_000_000


def _union_find(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find (path compression + union by min)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {node: find(node) for node in list(parent)}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    driver_threshold: int = DRIVER_CC_THRESHOLD,
) -> DataFrame:
    """(src, dst) string edges → (node, component) with component = min id.

    Adaptive strategy (the 100 TB design): the edge set here is DISTINCT
    (surface, entity) pairs — already deduped far below mention
    cardinality (the skew/scale lever is that dedup, not the CC itself).
    When the deduped graph fits comfortably on the driver (≤ ~1M edges),
    a driver-side union-find finishes in milliseconds instead of paying
    one Spark shuffle per propagation round. Above the threshold, the
    distributed min-propagation loop runs — one shuffle per round,
    lineage truncated per iteration — converging in O(component diameter).
    """
    spark = edges.sparkSession
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).distinct()
    # single action: pull at most threshold+1 deduped edges; if they all
    # fit, finish on the driver (union-find), else go distributed
    head = sym.limit(driver_threshold + 1).collect()
    if not head:
        return spark.createDataFrame([], "node string, component string")
    if len(head) <= driver_threshold:
        mapping = _union_find([(r["a"], r["b"]) for r in head])
        return spark.createDataFrame(
            list(mapping.items()), "node string, component string"
        )
    sym = sym.localCheckpoint(eager=True)

    # distributed path: iterative min-label propagation
    sym2 = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym2.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            sym2.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("component").alias("n_comp"))
            .withColumnRenamed("a", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"),
                (
                    F.coalesce(F.col("n_comp"), F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=False)  # materialized by the count below
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def canonicalize_mentions(linked: DataFrame) -> DataFrame:
    """linked mentions → + ``entity_canonical``.

    Edges:
      * surface-node ↔ entity-node when linking found an entity_id
      * (surfaces sharing an entity therefore merge transitively)
    Unlinked surfaces canonicalize to their own surface key.
    """
    surf = F.concat(F.lit("m:"), F.col("mention_norm"), F.lit("|"), F.col("label"))
    edges = (
        linked.where(F.col("entity_id").isNotNull())
        .select(
            surf.alias("src"),
            F.concat(F.lit("e:"), F.col("entity_id")).alias("dst"),
        )
        .distinct()
    )
    components = connected_components(edges)
    # canonical id of a component: its min entity node if any, else min node
    canon = (
        components.groupBy("component")
        .agg(
            F.min(F.when(F.col("node").startswith("e:"), F.col("node"))).alias(
                "canon_entity"
            )
        )
        .join(components, "component")
        .select(
            "node",
            F.coalesce(F.col("canon_entity"), F.col("component")).alias(
                "entity_canonical"
            ),
        )
    )
    return (
        linked.withColumn("_surf_node", surf)
        .join(
            F.broadcast(canon).withColumnRenamed("node", "_surf_node"),
            "_surf_node",
            "left",
        )
        .withColumn(
            "entity_canonical",
            F.coalesce(F.col("entity_canonical"), F.col("_surf_node")),
        )
        .drop("_surf_node")
    )
