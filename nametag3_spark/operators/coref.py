"""Heuristic conversational coreference: link pronouns to their most
recent entity antecedent within a conversation.

The reference emits per-turn entity mentions and stops
(nametag3_server.py:278-320 renders spans back to the caller); a
transcript KG builder must next decide WHICH entity a pronoun turn is
about, or every "he said ..." turn contributes nothing to the graph.
The recency heuristic — resolve to the most recent preceding mention in
the same conversation — is the classic strong baseline (Hobbs 1978's
distance observation: the vast majority of conversational anaphora
resolve within a few turns), and it is exactly a window function.

Spark-first shape: ONE window over the conversation partitioning
(``last(mention, ignorenulls=True)`` over the preceding rows), so the
whole resolution is one shuffle on conv_id — no self-join, no per-turn
history replay, no Python. At 100 TB the conversation key is the same
partitioning the ingest/sessionize path already uses, so Catalyst
reuses the exchange when coref follows mention extraction in one job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_pronouns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    mention_col: str = "mention",
    pronoun_col: str = "pronoun",
) -> DataFrame:
    """Resolve each pronoun turn to the most recent PRIOR turn in the
    same conversation that carries a (non-null) entity mention.

    Input: one row per turn; ``mention_col`` holds the turn's entity
    surface or NULL, ``pronoun_col`` holds the turn's pronoun token or
    NULL. A turn may be neither (contributes context only).

    Output: the pronoun rows, with ``antecedent`` (the resolved entity
    surface; NULL when the conversation has no prior mention — the
    unresolvable-cataphora case a downstream filter drops or escalates
    to a model), ``antecedent_turn``, and ``distance`` in turns.
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ante = F.last(F.col(mention_col), ignorenulls=True).over(w)
    ante_turn = F.last(
        F.when(F.col(mention_col).isNotNull(), F.col(order_col)),
        ignorenulls=True,
    ).over(w)
    return (
        turns.withColumn("antecedent", ante)
        .withColumn("antecedent_turn", ante_turn)
        .where(F.col(pronoun_col).isNotNull())
        .withColumn(
            "distance", F.col(order_col) - F.col("antecedent_turn")
        )
    )
