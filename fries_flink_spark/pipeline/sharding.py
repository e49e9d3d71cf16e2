"""Balanced output sharding: assign documents to a fixed number of output
shards so per-shard token totals are near-equal.

Training jobs read shards in parallel; a fat shard is a straggler for every
epoch that follows, so the one-time layout cost is worth paying. The
assignment is the serpentine (boustrophedon) round-robin over the
token-descending rank:

    rank  = row_number over (tokens DESC, id ASC) − 1
    block = rank div n_shards,  pos = rank mod n_shards
    shard = pos                 if block is even
          = n_shards − 1 − pos  if block is odd

Each block of ``n_shards`` consecutive ranks hits every shard once, with the
direction alternating so a shard that got the biggest item of one block gets
the smallest of the next — the classic static load-balancing heuristic
(within any block, totals differ by at most the block's item spread; overall
imbalance is bounded by the largest single document).

Scale: the rank is a window — per ``part_col`` stratum (training corpora
shard per source, same contract as ``packing.pack_sequences``), so the sort
spreads across strata; an un-stratified call serializes the rank through one
window partition and is only for small tables. All arithmetic is integer —
engine-exact.

Reference scope: not a reference operator; training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_shards", "shard_stats"]


def assign_shards(
    df: DataFrame,
    token_col: str,
    id_col: str,
    n_shards: int,
    part_col: str | None = None,
) -> DataFrame:
    """Add ``shard``: the serpentine-balanced output shard in [0, n_shards)."""
    keys = [part_col] if part_col else []
    w = Window.partitionBy(*keys).orderBy(F.col(token_col).desc(), F.col(id_col).asc())
    rank = F.row_number().over(w) - 1
    block = F.floor(rank / n_shards)
    pos = rank % n_shards
    return df.withColumn(
        "shard",
        F.when(block % 2 == 0, pos)
        .otherwise(F.lit(n_shards - 1) - pos)
        .cast("int"),
    )


def shard_stats(
    sharded: DataFrame, token_col: str, part_col: str | None = None
) -> DataFrame:
    """Per-shard document count and token total (the balance report)."""
    keys = ([part_col] if part_col else []) + ["shard"]
    return sharded.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("tokens"),
    )
