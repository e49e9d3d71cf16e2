"""Data layout for scan pruning: Z-order interleaving and sorted writes.

At 100 TB the fastest query is the one that never reads most of the data:
parquet row-group min/max statistics prune scans, but only if rows with
nearby key values are physically clustered. This module provides

- :func:`zorder_key` — the Morton (Z-order) interleave of several integer
  columns as a single pure-codegen expression: bit ``i`` of column ``j``
  lands at position ``i * n_cols + j``. Sorting by it clusters data along
  ALL participating dimensions at once, so predicates on ANY of them prune
  row groups (a total-order sort by ``(a, b)`` only prunes on ``a``).
- :func:`write_clustered` — range-repartition by the cluster key, sort
  within partitions, write parquet. ``repartitionByRange`` samples the key
  distribution, so output files hold disjoint key ranges — every file is
  then prunable by its footer statistics.

The interleave is plain shift/mask arithmetic (no UDF, no shuffle); the only
exchange in a clustered write is the range partitioning that any global
layout necessarily pays.

Reference scope: the reference's batch sinks write unordered files
(FileSystemTableSink); layout clustering is part of the at-scale surface
this engine adds.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleaved key of ``cols`` (each truncated to ``bits`` low
    bits; values must be non-negative). ``bits * len(cols)`` must fit in a
    signed 64-bit long."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    vals = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    terms = []
    for j, v in enumerate(vals):
        for i in range(bits):
            # bit i of column j -> output bit i*n + j
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(Column.__add__, terms)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_files`` range-disjoint files clustered on the
    Z-order of ``cluster_cols`` (single column = plain sorted layout)."""
    key = (
        F.col(cluster_cols[0]).cast("long")
        if len(cluster_cols) == 1
        else zorder_key(cluster_cols, bits)
    )
    out = (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    out.write.mode("overwrite").format(fmt).save(path)
