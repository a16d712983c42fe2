"""Autoregressive seq2seq decode loop (W7): pointer advance, EOW forcing,
batch independence, round-trip through the span automaton."""

from __future__ import annotations

import numpy as np

from nametag3_spark.functions.labels import CONTROL_LABELS, EOW, LabelVocab
from nametag3_spark.operators.decode import decode_spans
from nametag3_spark.operators.seq2seq import (
    MAX_LABELS_PER_TOKEN,
    decode_autoregressive,
    sublabels_to_stacks,
)

# sublabel vocab: controls + B-P I-P B-pf B-ps
VOCAB = LabelVocab(["B-P", "I-P", "B-pf", "B-ps"]).freeze()
N = len(VOCAB.id2label)


def scripted_step_fn(scripts: list[list[int]]):
    """Mock model: each sequence emits a fixed id script then EOWs forever."""
    pos = [0] * len(scripts)

    def step(prev, ptrs, states):
        logits = np.full((len(scripts), N), -1e9, dtype=np.float32)
        for b, script in enumerate(scripts):
            want = script[pos[b]] if pos[b] < len(script) else EOW
            logits[b, want] = 0.0
            pos[b] += 1
        return logits, states

    return step


def test_cs_gold_sequence():
    """Reproduce the cs example: 'Jmenuji se Jan Novák .' →
    O O B-P|B-pf I-P|B-ps O via the autoregressive head."""
    ids = {lab: VOCAB.get(lab) for lab in ["B-P", "I-P", "B-pf", "B-ps"]}
    script = [
        EOW,                                    # Jmenuji → O
        EOW,                                    # se → O
        ids["B-P"], ids["B-pf"], EOW,           # Jan
        ids["I-P"], ids["B-ps"], EOW,           # Novák
        EOW,                                    # .
    ]
    out = decode_autoregressive(scripted_step_fn([script]), [5])
    stacks = sublabels_to_stacks_seq(out[0])
    assert stacks == ["O", "O", "B-P|B-pf", "I-P|B-ps", "O"]
    # and the shared automaton decodes the expected nested spans
    assert decode_spans(stacks) == [("P", 2, 3), ("pf", 2, 2), ("ps", 3, 3)]


def sublabels_to_stacks_seq(word_subs):
    return sublabels_to_stacks(word_subs, VOCAB.id2label)


def test_force_eow_after_cap():
    b_p = VOCAB.get("B-P")
    script = [b_p] * 50  # never emits EOW on its own
    out = decode_autoregressive(scripted_step_fn([script]), [2])
    assert all(len(w) == MAX_LABELS_PER_TOKEN for w in out[0])


def test_batch_sequences_independent():
    b_p, b_pf = VOCAB.get("B-P"), VOCAB.get("B-pf")
    s1 = [b_p, EOW, EOW]
    s2 = [EOW, b_pf, EOW]
    out = decode_autoregressive(scripted_step_fn([s1, s2]), [2, 2])
    assert out[0] == [[b_p], []]
    assert out[1] == [[], [b_pf]]


def test_empty_and_zero_words():
    out = decode_autoregressive(scripted_step_fn([[]]), [0])
    assert out == [[]]
    assert decode_autoregressive(scripted_step_fn([]), []) == []


def test_control_labels_dropped_in_stacks():
    # a raw control id sneaking into output must be filtered (P9)
    word_subs = [[VOCAB.get("B-P"), 1], []]  # 1 = <pad>
    stacks = sublabels_to_stacks(word_subs, VOCAB.id2label)
    assert stacks == ["B-P", "O"]
    assert CONTROL_LABELS[1] == "<pad>"


def test_seq2seq_distributed_roundtrip_equals_flat_path(spark):
    """Teacher-forced distributed seq2seq (linearize → autoregressive →
    decode) must reproduce the flat path's mentions exactly."""
    from pyspark.sql import functions as F

    from nametag3_spark.data.synth import synth_transcripts
    from nametag3_spark.operators.infer import annotate_turns
    from nametag3_spark.operators.seq2seq import seq2seq_roundtrip_mentions
    from nametag3_spark.operators.triples import extract_mentions

    labeled = annotate_turns(synth_transcripts(spark, n_convs=10, avg_turns=6))
    subs = sorted(
        r["s"]
        for r in labeled.select(F.explode("labels").alias("stack"))
        .where(F.col("stack") != "O")
        .select(F.explode(F.split("stack", r"\|")).alias("s"))
        .distinct()
        .collect()
    )
    via_seq2seq = {
        tuple(r)
        for r in seq2seq_roundtrip_mentions(labeled, subs)
        .select("conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface")
        .collect()
    }
    flat = {
        tuple(r)
        for r in extract_mentions(labeled)
        .select("conv_id", "turn_idx", "start_tok", "end_tok", "label", "surface")
        .collect()
    }
    assert via_seq2seq == flat
    assert len(flat) > 0
