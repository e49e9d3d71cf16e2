"""Global consecutive ID assignment (the DataFrame-API zipWithIndex gap).

Training pipelines need dense, stable 0..N-1 ids (shard addressing, embedding
row indexes, sample bookkeeping). Spark's built-ins don't give this:
``monotonically_increasing_id`` leaves ~8-billion gaps between partitions,
and ``row_number()`` over a global ORDER BY serializes all data through ONE
window partition — a non-starter at 100 TB.

The scalable classic is two-pass:

1. Range-partition and sort by the ordering key (the one exchange any global
   total order must pay; files written from this layout are also scan-prunable
   on the key, cf. sources/layout.py), then PERSIST that layout — the count
   job and the id job must observe the identical physical partitioning
   (range boundaries are sampled with a per-execution seed, so re-running
   the exchange could move rows between partitions), and the persist also
   means the input is scanned once, not twice.
2. Count rows per partition — a metadata-sized aggregation (n_partitions
   rows) — and prefix-sum it into per-partition start offsets on the driver.
3. One Arrow pass per partition adds ``offset + local_index``; the per-batch
   running counter lives in the mapInPandas iterator, so no per-row Python
   and no further exchange.

The result equals ``row_number() OVER (ORDER BY key) - 1`` exactly (ties must
be broken — pass a unique key), which is what the DuckDB oracle asserts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_consecutive_ids(
    df: DataFrame,
    order_col: str,
    id_name: str = "row_id",
    n_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_name``: dense 0-based ids in ``order_col`` order.

    ``order_col`` must be duplicate-free for a deterministic result (the
    usual case: a primary key). ``n_partitions`` defaults to the session's
    shuffle partitions. The intermediate ranged layout stays persisted
    (MEMORY_AND_DISK) while the returned DataFrame is alive; call
    ``result.sparkSession.catalog.clearCache()`` or keep a handle and
    ``unpersist()`` once the result is materialized if memory is tight.
    """
    n = n_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartitionByRange(int(n), F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Pin the physical partitioning: repartitionByRange samples its range
    # boundaries with a per-execution seed, so the counts job below and the
    # mapInPandas id job would otherwise each re-plan the exchange and can
    # assign rows to DIFFERENT partitions — duplicate/missing ids. Persisting
    # makes both jobs read the same materialized layout (and pays for the
    # second scan once, cf. the 100 TB note in the module docstring).
    from pyspark import StorageLevel

    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    # pass 1: per-partition counts -> driver prefix sum (n_partitions rows)
    counts = (
        ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__n"]

    out_schema = ranged.drop("__pid").schema.add(id_name, "long", False)
    cols = [f.name for f in out_schema.fields]

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one running counter per partition; batches arrive in partition order
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["__pid"].iloc[0])] + seen
            pdf = pdf.drop(columns="__pid")
            pdf[id_name] = range(base, base + len(pdf))
            seen += len(pdf)
            yield pdf[cols]

    return ranged.mapInPandas(add_ids, schema=out_schema)
