"""UDPipe-parity goldens for the raw-text tokenizer (S4).

The reference's raw-text path delegates to model-based UDPipe
tokenizers (nametag3_server.py:104-137); this engine ships a
deterministic, dependency-free equivalent (functions/text.py). Two
layers of goldens pin it:

* the reference repo's OWN example files — cs/en raw text against the
  documented vertical output (examples/{cs,en}_input.{txt,conll}) —
  tokenized through the same split_sentences→tokenize_text path the
  serving layer uses;
* documented UDPipe conventions on the constructs the example files
  don't exercise: English clitics (do+n't, it+'s, ca+n't), plural
  possessives, ellipses and dash runs as single tokens, non-Latin
  quote punctuation, attached hyphen compounds, Czech decimal commas.

Pure-Python tests — no SparkSession.
"""

from __future__ import annotations

import os

import pytest

from nametag3_spark.functions.text import split_sentences, tokenize_text

REF_EXAMPLES = "/root/reference/examples"


def _vertical_blocks(path: str) -> list[list[str]]:
    """A .conll vertical file → one token list per sentence block."""
    blocks: list[list[str]] = []
    cur: list[str] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                if cur:
                    blocks.append(cur)
                    cur = []
            else:
                cur.append(line)
    if cur:
        blocks.append(cur)
    return blocks


@pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="reference examples not present"
)
@pytest.mark.parametrize("stem", ["en_input", "cs_input"])
def test_raw_text_matches_reference_vertical(stem):
    """examples/{stem}.txt through the raw-text path must reproduce the
    reference's documented vertical tokenization {stem}.conll exactly
    (sentence boundaries AND word forms)."""
    with open(f"{REF_EXAMPLES}/{stem}.txt", encoding="utf-8") as fh:
        text = fh.read()
    gold = _vertical_blocks(f"{REF_EXAMPLES}/{stem}.conll")
    got = [
        tokenize_text(sent)
        for line in text.splitlines()
        for sent in split_sentences(line)
    ]
    assert got == gold


@pytest.mark.parametrize(
    ("text", "want"),
    [
        # English clitics (UDPipe english models' convention)
        ("Don't stop.", ["Do", "n't", "stop", "."]),
        ("It’s Mary's book.", ["It", "’s", "Mary", "'s", "book", "."]),
        ("We'll see, they've won.",
         ["We", "'ll", "see", ",", "they", "'ve", "won", "."]),
        ("I can't — honestly.", ["I", "ca", "n't", "—", "honestly", "."]),
        # plural possessive: trailing apostrophe detaches
        ("the students' books", ["the", "students", "'", "books"]),
        # names keep their interior apostrophe
        ("O'Brien met O’Neill.", ["O'Brien", "met", "O’Neill", "."]),
        # ellipses and dash runs stay single tokens
        ("Wait... done.", ["Wait", "...", "done", "."]),
        ("Praha — hlavní město…", ["Praha", "—", "hlavní", "město", "…"]),
        ("pages 3--7", ["pages", "3", "--", "7"]),
        # non-Latin punctuation detaches as single tokens
        ("„Ano,“ řekl.", ["„", "Ano", ",", "“", "řekl", "."]),
        ("«Да» — сказал.", ["«", "Да", "»", "—", "сказал", "."]),
        # hyphenated compounds stay attached; decimals stay whole
        ("on-line e-mail", ["on-line", "e-mail"]),
        ("cena 3,14 Kč", ["cena", "3,14", "Kč"]),
        # Czech contractions keep their surface form (MWT splitting is
        # the CoNLL-U source's job, not the raw tokenizer's)
        ("Abych nezapomněl.", ["Abych", "nezapomněl", "."]),
    ],
)
def test_udpipe_convention_goldens(text, want):
    assert tokenize_text(text) == want
