"""CoNLL vertical source + renderers (S1, S8-S10), mirroring the
reference examples (en flat, cs nested) as fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nametag3_spark.sources.conll import (
    conll_to_sentences,
    read_conll,
    render_conllu,
    render_vertical,
    render_xml,
    sentence_spans,
)

EN_FIXTURE = """-DOCSTART-\tO

John\tB-PER
loves\tO
Mary\tB-PER
.\tO

Mary\tB-PER
loves\tO
John\tB-PER
.\tO
"""

CS_FIXTURE = """Jmenuji\tO
se\tO
Jan\tB-P|B-pf
Novák\tI-P|B-ps
.\tO
"""


@pytest.fixture(scope="module")
def en_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("conll") / "en.conll"
    p.write_text(EN_FIXTURE)
    return str(p)


@pytest.fixture(scope="module")
def cs_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("conll") / "cs.conll"
    p.write_text(CS_FIXTURE)
    return str(p)


def test_read_conll_en(spark, en_path):
    df = read_conll(spark, en_path)
    rows = sorted(map(tuple, df.collect()))
    assert (0, 0, 0, "John", "B-PER") in rows
    assert (0, 1, 2, "John", "B-PER") in rows
    assert len(rows) == 8  # DOCSTART and blanks dropped
    assert {r[0] for r in rows} == {0}  # one document


def test_sentences_and_spans_en(spark, en_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, en_path)))
    rows = {r["sent_idx"]: r for r in sent.collect()}
    assert list(rows[0]["forms"]) == ["John", "loves", "Mary", "."]
    spans0 = [(m["label"], m["start_tok"], m["end_tok"], m["surface"]) for m in rows[0]["spans"]]
    assert spans0 == [("PER", 0, 0, "John"), ("PER", 2, 2, "Mary")]


def test_nested_spans_cs(spark, cs_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, cs_path)))
    row = sent.collect()[0]
    spans = [(m["label"], m["start_tok"], m["end_tok"], m["surface"]) for m in row["spans"]]
    assert spans == [
        ("P", 2, 3, "Jan Novák"),
        ("pf", 2, 2, "Jan"),
        ("ps", 3, 3, "Novák"),
    ]


def test_render_vertical_cs(spark, cs_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, cs_path)))
    lines = sorted(r["line"] for r in render_vertical(sent).collect())
    # conll2eval_nested.py contract: 1-based ids, tab-separated
    assert lines == ["3\tpf\tJan", "3,4\tP\tJan Novák", "4\tps\tNovák"]


def test_render_xml_en(spark, en_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, en_path)))
    xml = {r["sent_idx"]: r["xml"] for r in render_xml(sent).collect()}
    assert xml[0] == (
        "<sentence>"
        '<ne type="PER"><token>John</token></ne>'
        "<token>loves</token>"
        '<ne type="PER"><token>Mary</token></ne>'
        "<token>.</token>"
        "</sentence>"
    )


def test_render_xml_nesting(spark, cs_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, cs_path)))
    xml = render_xml(sent).collect()[0]["xml"]
    assert (
        '<ne type="P"><ne type="pf"><token>Jan</token></ne>'
        '<ne type="ps"><token>Novák</token></ne></ne>' in xml
    )


def test_render_conllu(spark, cs_path):
    sent = sentence_spans(conll_to_sentences(read_conll(spark, cs_path)))
    lines = render_conllu(sent).collect()[0]["conllu"].split("\n")
    assert lines[2].split("\t")[1] == "Jan"
    assert lines[2].split("\t")[9] == "NE=B-P-B-pf"
    assert lines[3].split("\t")[9] == "NE=I-P-B-ps"
    assert lines[0].split("\t")[9] == "_"


def test_multifile_scan(spark, tmp_path):
    """S3: comma-list/glob of files → one dataset, doc ids disjoint."""
    (tmp_path / "a.conll").write_text("-DOCSTART-\tO\n\nA\tB-PER\n")
    (tmp_path / "b.conll").write_text("-DOCSTART-\tO\n\nB\tB-ORG\n\n-DOCSTART-\tO\n\nC\tO\n")
    df = read_conll(spark, [str(tmp_path / "a.conll"), str(tmp_path / "b.conll")])
    rows = sorted(map(tuple, df.collect()))
    forms_by_doc = {}
    for doc_id, _s, _t, form, label in rows:
        forms_by_doc.setdefault(doc_id, []).append(form)
    assert len(forms_by_doc) == 3  # 1 doc in a + 2 docs in b
    assert sorted(sum(forms_by_doc.values(), [])) == ["A", "B", "C"]


def test_write_conll_roundtrip(spark, tmp_path, cs_path):
    from nametag3_spark.sources.conll import write_conll

    sent = conll_to_sentences(read_conll(spark, cs_path))
    out = str(tmp_path / "out")
    write_conll(sent, out)
    text = "\n".join(
        r["value"] for r in spark.read.text(out).collect()
    )
    assert "Jan\tB-P|B-pf" in text
    assert "Novák\tI-P|B-ps" in text


def test_xml_escaping(spark, tmp_path):
    p = tmp_path / "esc.conll"
    p.write_text('A&B\tB-ORG\n<x>\tO\n')
    sent = sentence_spans(conll_to_sentences(read_conll(spark, str(p))))
    xml = render_xml(sent).collect()[0]["xml"]
    assert "<token>A&amp;B</token>" in xml
    assert "<token>&lt;x&gt;</token>" in xml


def test_conllu_multiword_token_skip():
    """Ranged-id lines contribute their SURFACE form and the covered word
    lines are skipped (reference nametag3_server.py:595-610); empty nodes
    (i.j) and comments are ignored; ids reset across sentence breaks."""
    from nametag3_spark.functions.text import conllu_tokens

    conllu = "\n".join(
        [
            "# sent_id = 1",
            "1-2\tvámonos\t_",
            "1\tvamos\t_",
            "2\tnos\t_",
            "3\tal\t_",
            "3.1\telided\t_",
            "4\tmar\t_",
            "",
            "1\tsegunda\t_",
            "2\tfrase\t_",
        ]
    )
    assert conllu_tokens(conllu) == ["vámonos", "al", "mar", "segunda", "frase"]
    assert conllu_tokens("") == []
    # a multiword range at the very end must not leak into anything after
    assert conllu_tokens("1-2\tdel\t_\n1\tde\t_\n2\tel\t_") == ["del"]
