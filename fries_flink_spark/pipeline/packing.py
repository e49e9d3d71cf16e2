"""Sequence packing: assign documents to fixed-token-budget training bins.

LLM training consumes documents as fixed-length token sequences; the packer
decides which documents share a sequence (a "bin"). This operator implements
the standard streaming concat-and-chunk packer: documents are laid out in a
deterministic order and a new bin starts whenever the running token total
would pass the budget. The bin id is a pure prefix-sum expression:

    bin_id = floor(cum_tokens_before_this_doc / budget)

which both Spark and any SQL engine evaluate identically (the DuckDB oracle
restates the same window expression).

Scale design: the prefix sum is a window over (part_col, order_col) — one
shuffle on the partition key. Training corpora are packed per shard/source,
so ``part_col`` has high cardinality and the shuffle spreads evenly; within
a stratum the window is a single sorted pass (no row replication). A global
(un-stratified) pack of 100 TB through ONE window partition would serialize
on a single task — callers must pack per shard, which is also what keeps the
layout reproducible as the corpus grows (adding a shard never re-packs the
others).

Reference scope: not a reference-engine operator (Flink has no notion of
token budgets); part of the training-data pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    part_col: str | None = None,
) -> DataFrame:
    """Add ``bin_id``: the training bin of each document under ``budget``.

    Documents longer than the budget get a bin of their own (the packer
    never splits a document; fill ratios over 1.0 mark docs to truncate
    downstream).
    """
    keys = [part_col] if part_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "bin_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    )


def pack_stats(
    packed: DataFrame, token_col: str, budget: int, part_col: str | None = None
) -> DataFrame:
    """Per-bin packing statistics: document count, token total, fill ratio."""
    keys = ([part_col] if part_col else []) + ["bin_id"]
    # No rounding on fill_ratio: tokens / 2^k budgets are binary-exact doubles,
    # but their decimal expansion can terminate in ...5, and round(x, 6) then
    # sits exactly on a decimal tie whose direction differs between engines
    # (Spark HALF_UP vs some DuckDB builds HALF_EVEN). The raw quotient is
    # bit-identical everywhere by IEEE-754 construction.
    return packed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("tokens"),
        (F.sum(token_col) / F.lit(float(budget))).alias("fill_ratio"),
    )
