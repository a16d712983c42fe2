"""RDFS-style ontology closure and type inference over a KG.

The reference emits typed entities (PER/ORG/LOC… and CNEC's two-level
supertype/subtype hierarchy — `nametag3_dataset.py`'s tagset handling,
mirrored by `eval_suptype`); a KG that stores typed nodes needs the
standard inference step: close the subclass hierarchy (TBox) and
materialize every inferred ancestor type for every instance (ABox).

Scale split — the whole design:

* the TBox (subclass edge set) is ontology-sized: thousands of edges,
  never corpus-sized. ``transitive_closure`` closes it IN SPARK with
  iterative doubling — ceil(log2(max_depth)) self-join rounds, each
  doubling the reachable path length — so closure cost is
  O(closure · log(depth)) with NO dependence on the instance corpus.
  min-hop distances are kept (groupBy-min each round) so the closure
  is also the hierarchy-depth table.
* the ABox (instance → direct type) is the 100 TB side and is touched
  exactly ONCE: ``infer_types`` broadcast-joins the closed (and
  therefore still tiny) TBox onto it. No iteration, no shuffle on the
  corpus beyond the final distinct.

Cycles in the edge set don't diverge: distinct/min-agg keeps the
closure bounded by |V|²; reflexive pairs are dropped to match RDFS
practice (a class is not its own strict ancestor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast


def transitive_closure(
    edges: DataFrame,
    max_depth: int = 16,
    child: str = "child",
    parent: str = "parent",
    broadcast_build: bool = True,
    keep_cycles: bool = False,
) -> DataFrame:
    """(child, ancestor, hops) for every ancestor reachable in ≤
    ``max_depth`` subclass steps, hops = the MINIMAL step count.

    Iterative doubling: r rounds cover paths of length ≤ 2^r, so the
    default 4 rounds (max_depth 16) close any realistic ontology; the
    round count is fixed by ``max_depth``, never data-adaptive, so the
    plan is deterministic and both engines can unroll it exactly.

    ``broadcast_build=True`` (the TBox default) pins every doubling
    round shuffle-free; pass False for edge sets whose closure may
    outgrow a broadcast (e.g. BGP property paths over corpus
    predicates) and let AQE pick the join strategy per round.

    ``keep_cycles=False`` (the ontology default) is the STRICT-ancestor
    closure: self-pairs are dropped at every round, so a node is never
    its own ancestor even through a cycle. ``keep_cycles=True`` keeps
    cycle-closing pairs (``(a, a)`` when a ≥1-hop path a→…→a exists,
    including self-loop edges) — SPARQL's ``pred+`` arbitrary-length
    path semantics, which the BGP layer needs. On acyclic edge sets the
    two modes return identical rows.
    """
    if max_depth < 1:
        raise ValueError("max_depth must be >= 1")
    build = broadcast if broadcast_build else (lambda df: df)
    strict = (lambda df: df) if keep_cycles else (
        lambda df: df.where(F.col("child") != F.col("ancestor"))
    )
    rounds = max(1, (max_depth - 1).bit_length())  # ceil(log2(max_depth))
    clo = strict(
        edges.select(F.col(child).alias("child"), F.col(parent).alias("ancestor"))
    ).distinct().withColumn("hops", F.lit(1))
    for _ in range(rounds):
        # with broadcast_build the doubling rounds stay shuffle-free
        # (ontology-sized contract); otherwise AQE decides per round
        hop = strict(
            clo.alias("a")
            .join(build(clo.alias("b")), F.col("a.ancestor") == F.col("b.child"))
            .select(
                F.col("a.child").alias("child"),
                F.col("b.ancestor").alias("ancestor"),
                (F.col("a.hops") + F.col("b.hops")).alias("hops"),
            )
        )
        clo = (
            clo.unionByName(hop)
            .groupBy("child", "ancestor")
            .agg(F.min("hops").alias("hops"))
        )
    return clo.where(F.col("hops") <= max_depth)


def infer_types(
    instances: DataFrame,
    closure: DataFrame,
    id_col: str = "id",
    type_col: str = "type",
) -> DataFrame:
    """Materialize (id, type, inferred) — each instance's direct type
    (inferred=false) plus every closed ancestor type (inferred=true).

    The corpus-scale ``instances`` side is scanned once; the closure
    joins as an explicit broadcast (it is ontology-sized by
    construction). An instance whose direct type is also reachable as
    an ancestor of another of its types stays direct (min over the
    inferred flag), keeping the output one row per (id, type).
    """
    inst = instances.select(
        F.col(id_col).alias("id"), F.col(type_col).alias("type")
    )
    direct = inst.withColumn("inferred", F.lit(False))
    inferred = (
        inst.join(broadcast(closure), on=[inst.type == closure.child])
        .select("id", F.col("ancestor").alias("type"), F.lit(True).alias("inferred"))
    )
    return (
        direct.unionByName(inferred)
        .groupBy("id", "type")
        .agg(F.min("inferred").alias("inferred"))
    )
