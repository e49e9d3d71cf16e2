"""PII detection and redaction over text columns (training-data hygiene).

Web-scale corpora must be scrubbed of personally identifiable information
before training. This module implements the standard regex pass for the
structured PII classes (emails, SSNs, phone numbers, IPv4 addresses) as
chained JVM ``regexp_replace`` expressions — per-row, zero-shuffle,
whole-stage codegen; at 100 TB it fuses into the same scan stage as any
other text metric.

The patterns are deliberately RE2-safe (no backreferences or lookaround) so
the identical pattern strings run under Java regex (Spark), RE2 (DuckDB /
Go tooling), and PCRE — the DuckDB oracles reuse them verbatim.

Replacement order matters: phones before SSNs (both are digit-dash shapes),
emails before anything that could eat an ``@``-adjacent token.

Reference scope: not a reference-engine operator; part of the added
training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# class -> (pattern, replacement); dict order IS application order.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def redact(col: Column) -> Column:
    """Replace every PII occurrence with its class tag."""
    out = col
    for pattern, repl in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_count(col: Column, kind: str) -> Column:
    """Occurrence count of one PII class (before redaction)."""
    return F.regexp_count(col, F.lit(PII_PATTERNS[kind][0]))


def pii_total(col: Column) -> Column:
    """Total PII occurrences across all classes.

    Counted in application order on the progressively-redacted text so
    overlapping classes (phone/SSN digit shapes) are not double-counted —
    mirrors exactly what :func:`redact` replaces.
    """
    total = F.lit(0)
    cur = col
    for pattern, repl in PII_PATTERNS.values():
        total = total + F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, repl)
    return total
