"""Document chunking with overlap — RAG / context-window preprocessing.

Splits each document's whitespace token stream into windows of ``size``
tokens advancing by ``stride`` (< size ⇒ overlapping context), the standard
retrieval-corpus and pretraining-window preparation step.

Chunk rule: starts are 0, stride, 2·stride, … while start < n_tokens; the
last chunk may be shorter than ``size``. Empty / whitespace-only documents
produce no chunks. chunk_id is the 0-based window ordinal (start =
chunk_id · stride).

Scale design (100 TB): the whole operator is a per-row projection +
``posexplode`` — zero shuffles, whole-stage codegen, output proportional to
n_tokens/stride per document. Token arrays never leave the row: the slice
and re-join happen inside the same projection, so there is no
corpus-sized intermediate explode of individual tokens (compare
text/vocab.py which explodes per-token only for vocabulary-sized
aggregates).

Reference scope: not a reference-engine operator; part of the added
training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk_text) overlapping-window chunks.

    ``stride`` defaults to ``size`` (non-overlapping). All other input
    columns are dropped; join back on ``id_col`` if needed (the chunk set is
    usually written as its own corpus).
    """
    if size <= 0:
        raise ValueError(f"size must be > 0, got {size}")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError(f"stride must be > 0, got {stride}")

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return out.select(
        id_col,
        "chunk_id",
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
