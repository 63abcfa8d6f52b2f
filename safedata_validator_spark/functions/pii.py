"""PII detection and scrubbing for training-data pipelines.

Detects emails, IPv4 addresses, US-style phone numbers, SSN-shaped ids and
16-digit card-shaped numbers in a text column, and rewrites each match to a
typed placeholder token (``<EMAIL>``, ``<IPV4>``, ...). Regex-only — a
heuristic pre-filter of the kind every large corpus pipeline runs before
training, not a compliance guarantee.

All pure Spark Column expressions (regexp_count / regexp_replace —
JVM-side, whole-stage codegen, zero UDFs and zero shuffles: per-row
filters are the cheapest possible distributed shape). Patterns restrict
themselves to syntax Java regex and RE2 interpret identically
(non-capturing groups, \\b, bounded quantifiers) so every operator stays
exactly oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: detection patterns, in SCRUB ORDER — longer/more-specific shapes first so
#: a card number is rewritten before the phone pattern can eat a prefix of
#: it. Order matters only for scrubbing; counts evaluate independently.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b(?:\d{4}[- ]){3}\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}

#: replacement tokens per PII class
PII_TOKENS: dict[str, str] = {k: f"<{k.upper()}>" for k in PII_PATTERNS}


def pii_count(col: Column, kind: str) -> Column:
    """Number of non-overlapping matches of one PII class."""
    return F.regexp_count(F.coalesce(col, F.lit("")), F.lit(PII_PATTERNS[kind])).cast("int")


def scrub_pii(col: Column) -> Column:
    """Rewrite every PII match to its placeholder token, applying the
    patterns in ``PII_PATTERNS`` order (one fused projection — Catalyst
    chains the regexp_replace calls inside a single codegen stage)."""
    out = F.coalesce(col, F.lit(""))
    for kind, pattern in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, PII_TOKENS[kind])
    return out


def pii_audit(
    df: DataFrame, id_col: str, text_col: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document PII profile → (id, [keep...], n_email, n_card, n_ssn,
    n_phone, n_ipv4, chars_redacted). ``chars_redacted`` = length delta
    after scrubbing (0 for clean docs — a clean doc is exactly unchanged;
    negative is possible when a placeholder outgrows a very short match).
    ``keep`` carries grouping columns (e.g. source) through the projection
    so per-stratum rollups need no join back to the corpus."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        *[pii_count(text, k).alias(f"n_{k}") for k in PII_PATTERNS],
        (
            F.length(F.coalesce(text, F.lit(""))) - F.length(scrub_pii(text))
        ).cast("int").alias("chars_redacted"),
    )
