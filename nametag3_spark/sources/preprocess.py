"""Corpus preprocessing converters (reference ``preprocessing/``, ~505
LoC of stdin/stdout scripts) as DataFrame transformations over token
tables — the shapes a user needs to load a public NER corpus into the
engine.

All converters are pure column expressions / window functions (JVM-side,
no UDFs): at corpus scale these run as one whole-stage-codegen pass over
the token table.

Token-table convention (what ``sources/conll.read_conll`` produces):
one row per token with ordering keys — ``(doc_id, sent_idx, token_idx,
form, label)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# CNEC 2.0 fine-grained type → CoNLL-2003 coarse label
# (reference preprocessing/map_cnec2.0_labels_to_conll.py MAP, decided by
# manual inspection of CoNLL-2003 vs CNEC 2.0 train data)
CNEC_TO_CONLL = {
    "P": "PER", "pc": "MISC", "pf": "PER", "pp": "PER", "pm": "PER",
    "ps": "PER", "p_": "PER",
    "gh": "LOC", "gq": "LOC", "gs": "LOC", "gu": "LOC", "gl": "LOC",
    "gr": "LOC", "gt": "LOC", "gc": "LOC", "g_": "LOC",
    "ia": "MISC", "if": "ORG", "ic": "ORG", "io": "ORG", "i_": "ORG",
    "oa": "MISC", "or": "MISC", "op": "MISC", "o_": "MISC",
    "ms": "ORG", "mn": "ORG",
}
# CNEC types intentionally dropped (no CoNLL-2003 counterpart)
CNEC_UNMAPPED = [
    "T", "A", "C", "pd", "om", "oe", "tf", "ty", "tm", "th", "td",
    "mi", "me", "ah", "az", "at", "nb", "ni", "ns", "nc", "no", "na", "n_",
]


def iob_to_iob2(
    tokens: DataFrame,
    label_col: str = "label",
    doc_keys: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """IOB → IOB2: an entity-initial ``I-X`` becomes ``B-X`` when the
    previous token's tag is O or a different type.

    Faithful to the reference converter (preprocessing/iob_to_iob2.py):
    the previous tag carries ACROSS sentence boundaries within a document
    (the script never resets at blank lines; only a -DOCSTART- 'O' line
    resets it), so the lag runs per document over the full token order.
    One window pass, no shuffle beyond the doc partitioning.
    """
    doc_keys = doc_keys or ["doc_id"]
    order_cols = order_cols or ["sent_idx", "token_idx"]
    w = Window.partitionBy(*doc_keys).orderBy(*order_cols)
    prev = F.lag(F.col(label_col), 1, "O").over(w)
    needs_b = (
        F.col(label_col).startswith("I-")
        & (
            (prev == "O")
            | (F.substring(prev, 3, 1000) != F.substring(F.col(label_col), 3, 1000))
        )
    )
    return tokens.withColumn(
        label_col,
        F.when(needs_b, F.concat(F.lit("B-"), F.expr(f"substring({label_col}, 3)")))
        .otherwise(F.col(label_col)),
    )


def map_cnec_labels_to_conll(
    tokens: DataFrame, label_col: str = "label", strict: bool = True
) -> DataFrame:
    """CNEC 2.0 → CoNLL-2003 label harmonization (reference
    preprocessing/map_cnec2.0_labels_to_conll.py):

    1. keep only the OUTERMOST entity of a '|'-stacked nested label,
    2. map the 46 fine-grained types to PER/ORG/LOC/MISC,
    3. drop (→ 'O') the types with no CoNLL counterpart.

    ``strict=True`` mirrors the script's exit-on-unknown-type: an
    unmapped, unlisted type raises at execution time (F.raise_error);
    ``strict=False`` maps unknowns to 'O'.
    """
    outer = F.split(F.col(label_col), r"\|")[0]
    prefix = F.substring(outer, 1, 2)  # 'B-' / 'I-'
    netype = F.expr(f"substring(split({label_col}, '\\\\|')[0], 3)")

    mapping = F.create_map(
        *[F.lit(x) for kv in CNEC_TO_CONLL.items() for x in kv]
    )
    mapped = mapping[netype]
    unknown_action = (
        F.raise_error(F.concat(F.lit('Unknown NE type "'), netype, F.lit('"')))
        if strict
        else F.lit("O")
    )
    new_label = (
        F.when(F.col(label_col) == "O", F.lit("O"))
        .when(netype.isin(CNEC_UNMAPPED), F.lit("O"))
        .when(mapped.isNotNull(), F.concat(prefix, mapped))
        .otherwise(unknown_action)
    )
    return tokens.withColumn(label_col, new_label)


def uner_to_conll(
    tokens: DataFrame, form_col: str = "form", tag_col: str = "tag"
) -> DataFrame:
    """UniversalNER IOB2 rows → (form, label) rows (reference
    preprocessing/preprocess_uner.py): drop the inconsistently-annotated
    OTH type and Norwegian's '-' placeholder (both → 'O'). Comment-line
    filtering happens at the reader; this is the row-level cleanup."""
    label = (
        F.when(F.col(tag_col).endswith("OTH"), F.lit("O"))
        .when(F.col(tag_col) == "-", F.lit("O"))
        .otherwise(F.col(tag_col))
    )
    return tokens.select(
        *[c for c in tokens.columns if c not in (form_col, tag_col)],
        F.col(form_col).alias("form"),
        label.alias("label"),
    )


def ontonotes_to_conll(
    tokens: DataFrame,
    id2label: list[str],
    annotated_docs: DataFrame | None = None,
    doc_col: str = "doc_id",
    ne_col: str = "ne_id",
) -> DataFrame:
    """CoNLL-2012 OntoNotes v5 rows (integer NE class ids) → labeled
    token rows (reference preprocessing/preprocess_conll2012-ontonotesv5
    .py): integer id → label string via the dataset's id2label table,
    and — when ``annotated_docs`` (one ``doc_id`` per NE-annotated LDC
    document) is given — a broadcast semi-join keeps only documents with
    real NE annotation, dropping the artificially all-O documents the
    CoNLL-2012 release added."""
    if annotated_docs is not None:
        tokens = tokens.join(
            F.broadcast(annotated_docs.select(doc_col).distinct()),
            doc_col,
            "left_semi",
        )
    labels = F.array(*[F.lit(x) for x in id2label])
    return tokens.withColumn(
        "label", F.element_at(labels, F.col(ne_col).cast("int") + 1)
    ).drop(ne_col)
