"""Streaming temporal (versioned / FOR SYSTEM_TIME AS OF) join
(SURVEY §2.3, §7.7).

Reference: TemporalRowTimeJoinOperator.java:78 (event-time versioned join),
TemporalProcessTimeJoinOperator.java (probe the LATEST version),
Table.createTemporalTableFunction (Table.java:147), LookupJoinRunner.java:34.

Spark has no FOR SYSTEM_TIME AS OF on streams; the faithful mapping is per
micro-batch (every batch is an epoch — same consistency cut Fries exploits):

- **Processing-time variant** (``temporal_join_proctime``): each batch joins
  against the dimension snapshot CURRENT AT THAT EPOCH. The dim loader runs
  on the driver per batch and broadcasts — identical semantics to the
  reference's proc-time temporal join, where probe rows see the latest
  version at processing time.
- **Event-time variant** (``temporal_join_rowtime``): the versioned dim (key,
  version_ts, attrs) joins as-of on the fact's event time — each fact row
  pairs with the newest version whose version_ts <= fact ts. Batch as-of
  logic shared with operators/joins.asof_join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_join_proctime(
    fact_stream: DataFrame,
    dim_loader: Callable[[int], DataFrame],
    on: list[str],
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
):
    """Start a foreachBatch query joining each epoch's facts against the
    dimension snapshot loaded at that epoch (reference proc-time temporal
    join: probe side always sees the latest version)."""

    def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
        dim = dim_loader(epoch_id)
        sink(batch_df.join(F.broadcast(dim), on, how), epoch_id)

    return fact_stream.writeStream.foreachBatch(run_batch)


def temporal_join_rowtime(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    version_ts: str,
) -> DataFrame:
    """Event-time temporal join for one (micro-)batch: each fact row joins the
    newest dim version with version_ts <= fact_ts (reference
    TemporalRowTimeJoinOperator). One shuffle on the key + one window pass.

    Each probe row gets a unique id BEFORE the join and the version-picking
    window partitions by that id — so duplicate fact rows each keep their own
    output row, matching the reference operator's multiset semantics (a
    partition over all fact columns would silently collapse identical facts).
    """
    from pyspark.sql import Window

    v = versions.select(
        F.col(key).alias("__vk"),
        F.col(version_ts).alias("__vts"),
        *[c for c in versions.columns if c not in (key, version_ts)],
    )
    tagged = facts.withColumn("__fid", F.monotonically_increasing_id())
    joined = tagged.join(
        v,
        (tagged[key] == F.col("__vk")) & (F.col("__vts") <= tagged[fact_ts]),
        "left",
    )
    w = Window.partitionBy("__fid").orderBy(F.col("__vts").desc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fid", "__vk", "__vts")
    )
