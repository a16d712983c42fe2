"""Recency-heuristic pronoun coreference (operators/coref.py).

The reference emits per-turn mentions and stops
(nametag3_server.py:278-320); resolve_pronouns is the downstream
transcript-KG step — one IGNORE-NULLS window per conversation.
"""

from __future__ import annotations


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx int, mention string, pronoun string"
    )


def test_resolves_to_most_recent_prior_mention(spark):
    from nametag3_spark.operators.coref import resolve_pronouns

    t = _turns(spark, [
        (1, 1, "alice", None),
        (1, 2, "bob", None),
        (1, 3, None, "he"),     # -> bob (turn 2), not alice
        (1, 4, None, None),     # context-only turn: not emitted
        (1, 5, None, "they"),   # still bob — mention-less turns between
    ])
    out = {r.turn_idx: r for r in resolve_pronouns(t).collect()}
    assert set(out) == {3, 5}
    assert (out[3].antecedent, out[3].antecedent_turn, out[3].distance) == ("bob", 2, 1)
    assert (out[5].antecedent, out[5].antecedent_turn, out[5].distance) == ("bob", 2, 3)


def test_pronoun_before_any_mention_is_unresolved(spark):
    from nametag3_spark.operators.coref import resolve_pronouns

    t = _turns(spark, [(1, 1, None, "she"), (1, 2, "carol", None)])
    out = resolve_pronouns(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.turn_idx == 1 and r.antecedent is None
    assert r.antecedent_turn is None and r.distance is None


def test_conversations_do_not_leak(spark):
    """The window partitions on conv_id: a mention in one conversation
    never resolves a pronoun in another, whatever the partitioning of
    the input."""
    from nametag3_spark.operators.coref import resolve_pronouns

    t = _turns(spark, [
        (1, 1, "alice", None),
        (2, 2, None, "he"),     # conv 2 has no prior mention
        (2, 3, "dan", None),
        (2, 4, None, "he"),     # -> dan
    ]).repartition(7)
    out = {(r.conv_id, r.turn_idx): r for r in resolve_pronouns(t).collect()}
    assert out[(2, 2)].antecedent is None
    assert out[(2, 4)].antecedent == "dan"
    assert (1, 1) not in out and (2, 3) not in out


def test_same_turn_mention_is_not_its_own_antecedent(spark):
    """The window ends at the PRECEDING row: a turn carrying both a
    mention and a pronoun resolves to the earlier mention."""
    from nametag3_spark.operators.coref import resolve_pronouns

    t = _turns(spark, [
        (1, 1, "alice", None),
        (1, 2, "bob", "he"),    # -> alice, not bob
    ])
    out = resolve_pronouns(t).collect()
    assert len(out) == 1 and out[0].antecedent == "alice"
