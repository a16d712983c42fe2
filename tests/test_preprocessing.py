"""Corpus preprocessing converters vs the reference scripts' documented
behavior (reference preprocessing/*.py docstring examples)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nametag3_spark.sources.preprocess import (
    CNEC_TO_CONLL,
    iob_to_iob2,
    map_cnec_labels_to_conll,
    ontonotes_to_conll,
    uner_to_conll,
)

TOK = "doc_id int, sent_idx int, token_idx int, form string, label string"


def _labels(df):
    return [
        r["label"]
        for r in df.orderBy("doc_id", "sent_idx", "token_idx").collect()
    ]


def test_iob_to_iob2_docstring_example(spark):
    # reference iob_to_iob2.py docstring: John/I-PER loves/O Mary/I-PER
    rows = [
        (0, 0, 0, "John", "I-PER"),
        (0, 0, 1, "loves", "O"),
        (0, 0, 2, "Mary", "I-PER"),
        (0, 0, 3, ".", "O"),
        (0, 1, 0, "Mary", "I-PER"),
        (0, 1, 1, "loves", "O"),
        (0, 1, 2, "John", "I-PER"),
        (0, 1, 3, ".", "O"),
    ]
    out = _labels(iob_to_iob2(spark.createDataFrame(rows, TOK)))
    assert out == ["B-PER", "O", "B-PER", "O", "B-PER", "O", "B-PER", "O"]


def test_iob_to_iob2_adjacent_same_type_keeps_I(spark):
    # I-X directly after an entity of the SAME type stays I-X (that is
    # the IOB reading the converter must preserve)
    rows = [
        (0, 0, 0, "New", "I-LOC"),
        (0, 0, 1, "York", "I-LOC"),
        (0, 0, 2, "Paris", "B-LOC"),
        (0, 0, 3, "London", "I-LOC"),  # follows B-LOC → stays I (same type)
        (0, 0, 4, "Bonn", "I-ORG"),  # type change → B
    ]
    out = _labels(iob_to_iob2(spark.createDataFrame(rows, TOK)))
    assert out == ["B-LOC", "I-LOC", "B-LOC", "I-LOC", "B-ORG"]


def test_iob_to_iob2_carries_across_sentences_not_docs(spark):
    # the reference script never resets at blank lines — an I-PER opening
    # sentence 2 right after sentence 1 ended with I-PER stays I-PER;
    # a new DOCUMENT does reset (each doc starts from prev='O')
    rows = [
        (0, 0, 0, "John", "I-PER"),
        (0, 1, 0, "Smith", "I-PER"),  # same doc, new sentence → stays I
        (1, 0, 0, "Mary", "I-PER"),  # new doc → B
    ]
    out = _labels(iob_to_iob2(spark.createDataFrame(rows, TOK)))
    assert out == ["B-PER", "I-PER", "B-PER"]


def test_cnec_mapping_outermost_and_unmapped(spark):
    rows = [
        (0, 0, 0, "Stanislav", "B-pf|B-ps"),  # outermost pf → PER
        (0, 0, 1, "Procházka", "I-P"),  # container P → PER
        (0, 0, 2, "1996", "B-ty"),  # unmapped → O
        (0, 0, 3, "Praha", "B-gu"),  # LOC
        (0, 0, 4, "NATO", "I-io"),  # ORG
        (0, 0, 5, "ok", "O"),
    ]
    out = _labels(map_cnec_labels_to_conll(spark.createDataFrame(rows, TOK)))
    assert out == ["B-PER", "I-PER", "O", "B-LOC", "I-ORG", "O"]


def test_cnec_mapping_strict_raises_on_unknown(spark):
    rows = [(0, 0, 0, "x", "B-zz")]
    df = map_cnec_labels_to_conll(spark.createDataFrame(rows, TOK))
    with pytest.raises(Exception, match="Unknown NE type"):
        df.collect()
    lenient = map_cnec_labels_to_conll(
        spark.createDataFrame(rows, TOK), strict=False
    )
    assert _labels(lenient) == ["O"]


def test_cnec_map_covers_reference_tables():
    # every fine-grained type appears exactly once across MAP ∪ UNMAPPED
    from nametag3_spark.sources.preprocess import CNEC_UNMAPPED

    assert set(CNEC_TO_CONLL) & set(CNEC_UNMAPPED) == set()
    assert set(CNEC_TO_CONLL.values()) == {"PER", "ORG", "LOC", "MISC"}


def test_uner_cleanup(spark):
    rows = [
        (0, 0, 0, "foo", "B-OTH"),
        (0, 0, 1, "bar", "I-OTH"),
        (0, 0, 2, "baz", "-"),
        (0, 0, 3, "Oslo", "B-LOC"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id int, sent_idx int, token_idx int, form string, tag string"
    )
    out = _labels(uner_to_conll(df))
    assert out == ["O", "O", "O", "B-LOC"]


def test_ontonotes_id_mapping_and_doc_filter(spark):
    id2label = ["O", "B-PERSON", "I-PERSON", "B-ORG"]
    rows = [
        ("docA", 0, 0, "Barack", 1),
        ("docA", 0, 1, "Obama", 2),
        ("docB", 0, 0, "nothing", 0),  # not in annotated set → dropped
    ]
    toks = spark.createDataFrame(
        rows, "doc_id string, sent_idx int, token_idx int, form string, ne_id int"
    )
    annotated = spark.createDataFrame([("docA",)], "doc_id string")
    out = ontonotes_to_conll(toks, id2label, annotated_docs=annotated)
    got = [(r["form"], r["label"]) for r in out.orderBy("token_idx").collect()]
    assert got == [("Barack", "B-PERSON"), ("Obama", "I-PERSON")]
    # no filter → all docs pass, ids map positionally
    out_all = ontonotes_to_conll(toks, id2label)
    assert out_all.count() == 3
    assert (
        out_all.where(F.col("doc_id") == "docB").collect()[0]["label"] == "O"
    )
