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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(src, dst) string edges → (node, component) with component = min id.

    Pure DataFrame min-propagation: component(v) starts as v; each round
    every node adopts the min component among itself and its neighbors.
    Converges in O(component diameter) rounds.
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("component", F.col("node"))
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # neighbor's current component, min-reduced per node
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
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
        ).localCheckpoint(eager=True)
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
