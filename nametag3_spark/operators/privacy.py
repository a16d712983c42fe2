"""PII detection and redaction over a text column.

The pre-training scrub every large corpus pipeline runs before tokenizing
(C4 removed pages with blocklisted strings; refined pipelines — e.g. the
BigScience ROOTS / privacy-aware Common Crawl recipes — replace emails,
IPs, and phone numbers with typed placeholder tokens). The reference
(nametag3) tags PER/ORG spans but never scrubs; this operator is part of
the training-data-pipeline extension surface (SURVEY §2 extensions).

Scale shape: one narrow projection of pure JVM regexp expressions
(regexp_extract_all / regexp_replace) — whole-stage codegen, zero
shuffle, zero Python, pushes straight onto the parquet scan. The regex
dialect is the RE2-compatible subset (character classes, bounded
repetition, ``\\b``) so every expression has an exact DuckDB twin and the
redacted STRING ITSELF is cross-engine hash-verified by the ``pii_redact``
oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RE2-compatible subset: no lookaround, no backrefs — portable between
# Java regex (Spark) and RE2 (DuckDB). Kept deliberately conservative;
# recall tuning belongs to the caller via the `patterns` override.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

# Replacement ORDER is part of the contract: emails first (their local
# part may contain digits/dots that the IP pattern would half-match),
# then IPs (dotted digits the phone pattern must not see), then phones.
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ipv4", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
) -> DataFrame:
    """Per document: match counts per PII class, the redacted text, and
    a has_pii flag. Counts are taken on the ORIGINAL text; replacements
    are applied sequentially in ``patterns`` order (each later pattern
    sees the previous placeholders, never the raw earlier matches)."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in patterns
    ]
    redacted = F.col(text_col)
    for _, pat, token in patterns:
        redacted = F.regexp_replace(redacted, pat, token)
    out = docs.select(F.col(id_col), *counts, redacted.alias("redacted"))
    total = None
    for name, _, _ in patterns:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)
