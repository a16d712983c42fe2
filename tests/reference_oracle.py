"""Test-only oracle: the reference's decode/postprocess semantics,
re-expressed INDEPENDENTLY of the production implementation.

Operates on the reference's own text form — "form\\tlabel" lines with
blank-line sentence breaks — following the behavior of
``NameTag3Dataset.postprocess`` (/root/reference/nametag3_dataset.py:607-676)
and ``conll2eval_nested.py:39-100`` as studied in SURVEY.md §2.6 (W5).
It keeps whole label strings (prefix included) in its running state and
closes/opens entities exactly where the reference does, so a divergence
between this and ``nametag3_spark.operators.decode`` is a real parity bug.
"""

from __future__ import annotations


def oracle_entities(conll_text: str) -> list[tuple[int, int, str]]:
    """(start_line, end_line_exclusive, type) per entity, line-indexed over
    the whole text (sentence breaks count as lines), sorted the reference
    way: (start, -end, close-depth insertion)."""
    running: list[str] = []  # whole labels, e.g. "B-PER"
    opened_at: list[int] = []
    out: dict[tuple[int, int, str], int] = {}

    lines = conll_text.split("\n")
    for i, line in enumerate(lines):
        if not line:
            for d in range(len(running)):
                out[(opened_at[d], i, running[d][2:])] = d
            running, opened_at = [], []
            continue
        _form, cell = line.split("\t")
        if cell == "O":
            for d in range(len(running)):
                out[(opened_at[d], i, running[d][2:])] = d
            running, opened_at = [], []
            continue
        labels = cell.split("|")
        for j, lab in enumerate(labels):
            if lab == "O":
                labels = labels[:j]
                break
        for j in range(len(labels)):
            if j < len(running):
                if labels[j].startswith(("B-", "U-")) or running[j][2:] != labels[j][2:]:
                    for d in range(j, len(running)):
                        out[(opened_at[d], i, running[d][2:])] = d
                    running = running[:j]
                    opened_at = opened_at[:j]
                    opened_at.append(i)
            else:
                opened_at.append(i)
        if len(labels) < len(running):
            for d in range(len(labels), len(running)):
                out[(opened_at[d], i, running[d][2:])] = d
        running = labels
        opened_at = opened_at[: len(labels)]
    # end of text closes everything
    for d in range(len(running)):
        out[(opened_at[d], len(lines), running[d][2:])] = d

    return [
        (s, e, t)
        for (s, e, t), _ in sorted(out.items(), key=lambda kv: (kv[0][0], -kv[0][1], kv[1]))
    ]


def oracle_postprocess(conll_text: str) -> str:
    """BIO re-render of the oracle entities (reference postprocess output)."""
    lines = conll_text.split("\n")
    forms = [line.split("\t")[0] if line else "" for line in lines]
    stacks: list[list[str]] = [[] for _ in lines]
    for start, end, typ in oracle_entities(conll_text):
        for i in range(start, end):
            stacks[i].append(("B-" if i == start else "I-") + typ)
    rendered = []
    for form, stack in zip(forms, stacks):
        rendered.append(f"{form}\t{'|'.join(stack) if stack else 'O'}" if form else "")
    while rendered and rendered[-1] == "":
        rendered.pop()
    return "\n".join(rendered)
