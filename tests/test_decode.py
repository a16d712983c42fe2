"""Differential + property tests for the shared decode automaton (W5/W6)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from nametag3_spark.operators.decode import (
    decode_spans,
    postprocess_stacks,
    spans_to_bio,
)
from tests.reference_oracle import oracle_entities, oracle_postprocess


def _to_conll(stacks: list[str]) -> str:
    return "\n".join(f"w{i}\t{cell}" for i, cell in enumerate(stacks))


def _oracle_spans(stacks: list[str]) -> list[tuple[str, int, int]]:
    return [(t, s, e - 1) for s, e, t in oracle_entities(_to_conll(stacks))]


# ---------------------------------------------------------------- golden

def test_flat_en_gold():
    # examples/en_gold.conll: "John loves Mary ."
    stacks = ["B-PER", "O", "B-PER", "O"]
    assert decode_spans(stacks) == [("PER", 0, 0), ("PER", 2, 2)]


def test_nested_cs_gold():
    # examples/cs_gold.conll: "Jmenuji se Jan Novák ."
    stacks = ["O", "O", "B-P|B-pf", "I-P|B-ps", "O"]
    assert decode_spans(stacks) == [("P", 2, 3), ("pf", 2, 2), ("ps", 3, 3)]


def test_iob_not_iob2_passthrough():
    # IOB input (entity starts with I-) must still form one entity
    stacks = ["I-PER", "I-PER", "O"]
    assert decode_spans(stacks) == [("PER", 0, 1)]
    # and postprocess converts it to BIO
    assert postprocess_stacks(stacks) == ["B-PER", "I-PER", "O"]


def test_adjacent_entities_b_b():
    stacks = ["B-PER", "B-PER"]
    assert decode_spans(stacks) == [("PER", 0, 0), ("PER", 1, 1)]


def test_type_change_closes():
    stacks = ["I-PER", "I-ORG"]
    assert decode_spans(stacks) == [("PER", 0, 0), ("ORG", 1, 1)]


def test_stray_o_truncates_stack():
    # "bad decoder output": O inside a stack cuts deeper labels
    stacks = ["B-A|O|B-C", "I-A"]
    assert decode_spans(stacks) == [("A", 0, 1)]


def test_depth_shrink_closes_inner():
    stacks = ["B-A|B-B", "I-A", "O"]
    assert decode_spans(stacks) == [("A", 0, 1), ("B", 0, 0)]


def test_outermost_first_ordering():
    stacks = ["B-A|B-B", "I-A|I-B"]
    spans = decode_spans(stacks)
    assert spans == [("A", 0, 1), ("B", 0, 1)]


def test_bilou_u_starts_new():
    stacks = ["U-PER", "U-PER"]
    assert decode_spans(stacks) == [("PER", 0, 0), ("PER", 1, 1)]


# ------------------------------------------------------------ differential

LABEL_CELLS = st.sampled_from(
    [
        "O",
        "B-A", "I-A", "B-B", "I-B",
        "B-A|B-B", "I-A|I-B", "I-A|B-B", "B-A|I-B",
        "B-A|B-B|B-C", "I-A|I-B|I-C",
        "B-A|O", "I-A|O|B-B",
    ]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(LABEL_CELLS, min_size=0, max_size=12))
def test_differential_vs_reference_oracle(stacks):
    assert decode_spans(stacks) == _oracle_spans(stacks)


@settings(max_examples=300, deadline=None)
@given(st.lists(LABEL_CELLS, min_size=0, max_size=12))
def test_postprocess_matches_reference_oracle(stacks):
    ours = "\n".join(
        f"w{i}\t{cell}" for i, cell in enumerate(postprocess_stacks(stacks))
    )
    assert ours == oracle_postprocess(_to_conll(stacks))


# --------------------------------------------------------------- properties

@settings(max_examples=200, deadline=None)
@given(st.lists(LABEL_CELLS, min_size=0, max_size=12))
def test_postprocess_idempotent(stacks):
    once = postprocess_stacks(stacks)
    assert postprocess_stacks(once) == once


@settings(max_examples=200, deadline=None)
@given(st.lists(LABEL_CELLS, min_size=0, max_size=12))
def test_spans_unique_and_well_formed(stacks):
    spans = decode_spans(stacks)
    assert len(spans) == len(set(spans))
    for _typ, s, e in spans:
        assert 0 <= s <= e < max(len(stacks), 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(LABEL_CELLS, min_size=0, max_size=12))
def test_decode_render_roundtrip_stable(stacks):
    spans = decode_spans(stacks)
    rendered = spans_to_bio(len(stacks), spans)
    assert decode_spans(rendered) == spans
