"""Vocabulary construction over text columns (corpus token statistics).

Tokenizer-training and corpus-analysis pipelines need global token
frequencies and document frequencies over the whole corpus — at 100 TB this
is the classic two-phase aggregation: explode tokens, then groupBy(token)
with map-side partial counts, so the shuffle carries one row per DISTINCT
token per map task, not one row per token occurrence.

- :func:`vocab_counts` — global occurrence count per token.
- :func:`vocab_topk` — the top-k head of the vocabulary; ``orderBy + limit``
  compiles to TakeOrderedAndProject (per-partition top-k, no full sort).
- :func:`doc_frequency` — per-token document frequency and IDF. The naive
  ``count_distinct(doc_id)`` would shuffle every (token, doc) occurrence;
  instead tokens are deduped PER ROW with ``array_distinct`` before the
  explode, which makes a plain ``count`` exact and keeps the pre-shuffle
  volume at one row per distinct token per document.

Reference scope: not a reference-engine operator (Flink ships no corpus
statistics); part of the training-data pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import tokens


def _norm_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (the vocabulary normalization)."""
    return tokens(F.lower(text))


def vocab_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Global token -> occurrence count (two-phase hash aggregation)."""
    return (
        df.select(F.explode(_norm_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def vocab_topk(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Top-``k`` vocabulary head by occurrence count (ties: token asc)."""
    return (
        vocab_counts(df, text_col)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def doc_frequency(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token -> document frequency + IDF (ln((N+1)/(df+1)) + 1, the
    smoothed scikit-style variant so IDF stays finite and positive).

    ``array_distinct`` dedupes within each document BEFORE the explode, so
    the aggregation is a plain count with map-side partials — no
    ``count_distinct`` shuffle of raw occurrences.
    """
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    per_doc = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_norm_tokens(F.col(text_col)))).alias("token"),
    )
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "doc_freq",
        (
            F.log((F.col("__n") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0
        ).alias("idf"),
    )
