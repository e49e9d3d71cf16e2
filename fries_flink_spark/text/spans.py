"""Repeated-substring span detection: the signal behind exact-substring
deduplication (Lee et al. 2021, arXiv:2107.06499 — "Deduplicating Training
Data Makes Language Models Better" removes long substrings occurring more
than once in the corpus).

The suffix-array construction the paper uses is a single-machine algorithm;
the distributed formulation is k-gram fingerprinting: hash the k-char window
at every ``stride``-th position, keep hashes occurring more than once
corpus-wide, and map them back to per-document character spans. A stride of
s detects every repeated substring of length ≥ k+s−1 (two copies always
share an aligned window) — the standard coverage/cost dial; s=1 is exact
for length ≥ k.

Per-document span aggregation (count + union coverage) is gaps-and-islands
over the span starts — pure window SQL, integer-exact.

Scale shape: the explode emits len/stride hashes per doc (8-byte xxhash64,
not the text) — ONE shuffle to count, one semi-join back on the hash. The
count aggregation is two-phase; hot hashes (boilerplate) are naturally
bounded because only the (hash, count) pair travels, never the positions of
every occurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["repeated_spans", "repeated_span_stats"]


def repeated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 32,
    stride: int = 4,
    min_count: int = 2,
) -> DataFrame:
    """(id, start, end): 1-based inclusive char spans of k-grams that occur
    ≥ ``min_count`` times corpus-wide (all positions, both within- and
    cross-document repeats)."""
    n = F.greatest((F.length(F.col(text_col)) - (k - 1)), F.lit(0))
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.when(n > 0, F.sequence(F.lit(1), n, F.lit(stride))).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("__pos"),
        F.col(text_col).alias("__t"),
    ).select(
        F.col(id_col),
        F.col("__pos"),
        # md5 prefix, not xxhash64: cross-engine reproducible (the DuckDB
        # oracle computes the identical fingerprint); 16 hex chars = 64 bits,
        # the same collision regime as the paper's fingerprints. Swap for
        # xxhash64 when oracle parity is not required — 4x less shuffle.
        F.substring(
            F.md5(F.col("__t").substr(F.col("__pos"), F.lit(k))), 1, 16
        ).alias("__h"),
    )
    hot = (
        grams.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_count)
        .select("__h")
    )
    return grams.join(hot, "__h", "left_semi").select(
        F.col(id_col),
        F.col("__pos").alias("start"),
        (F.col("__pos") + F.lit(k - 1)).alias("end"),
    )


def repeated_span_stats(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str,
) -> DataFrame:
    """(id, n_spans, chars_covered): span count and the union length of the
    repeated spans per document (0 for clean docs). Gaps-and-islands: a new
    island starts where a span begins past every previous end; covered =
    Σ island (max end − min start + 1). One window per doc — integer-exact.
    """
    w_ord = Window.partitionBy(id_col).orderBy("start", "end")
    prev_max_end = F.max("end").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "__new", F.when(prev_max_end.isNull() | (F.col("start") > prev_max_end + 1), 1).otherwise(0)
    ).withColumn(
        "__isl", F.sum("__new").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = flagged.groupBy(id_col, "__isl").agg(
        (F.max("end") - F.min("start") + 1).alias("__len"),
        F.count(F.lit(1)).alias("__n"),
    )
    per_doc = per_island.groupBy(id_col).agg(
        F.sum("__n").alias("n_spans"),
        F.sum("__len").alias("chars_covered"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("chars_covered", F.lit(0)).alias("chars_covered"),
        )
    )
