"""Join operators beyond plain equi-joins.

Covers the reference's join surface (SURVEY §2.3):
- interval (time-range) join — reference: flink-table-runtime-blink
  .../operators/join/interval/TimeIntervalJoin.java:51 and
  KeyedStream.intervalJoin (KeyedStream.java:438-475)
- temporal / as-of join — reference: .../operators/join/temporal/
  TemporalRowTimeJoinOperator.java:78, Table.createTemporalTableFunction
  (Table.java:147)
- lookup (dimension) join — reference: .../operators/join/lookup/
  LookupJoinRunner.java:34

Spark-first design notes (100 TB scale):
- ``interval_join`` is a single equi-key shuffle join with the time-range as a
  post-join predicate; Catalyst/AQE handle skew. No custom state needed in
  batch; the streaming variant (stream-stream join + watermarks) lives in
  streaming/.
- ``asof_join`` deliberately avoids the O(probe × versions) pairwise explosion
  of a naive range join. It uses the union-then-window trick: tag both inputs,
  union, and take ``last_value(ignorenulls)`` of the build-side payload over a
  key-partitioned, time-ordered window. That is ONE shuffle + ONE sort —
  the same asymptotic cost as a sort-merge join, and it scales linearly.
- ``lookup_join`` is a broadcast equi-join against a dimension snapshot — the
  Spark analog of Flink's per-row external lookup with cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Column,
    left_time: str,
    right_time: str,
    lower,
    upper,
    how: str = "inner",
) -> DataFrame:
    """Equi-key join constrained to ``lower <= right_time - left_time <= upper``.

    ``lower``/``upper`` are Column interval expressions (e.g.
    ``F.expr("INTERVAL 0 SECOND")``) or SQL interval strings.
    """
    if isinstance(lower, str):
        lower = F.expr(f"INTERVAL {lower}")
    if isinstance(upper, str):
        upper = F.expr(f"INTERVAL {upper}")
    key_cond = (
        (left[key] == right[key]) if isinstance(key, str) else key
    )
    cond = (
        key_cond
        & (right[right_time] >= left[left_time] + lower)
        & (right[right_time] <= left[left_time] + upper)
    )
    return left.join(right, cond, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    how: str = "left",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` for the same ``on`` key.

    Implementation: tag + union + last_value-ignore-nulls window (one shuffle
    on ``on``, one sort on time). Ties (equal timestamps) resolve to the right
    (build) row, matching ``FOR SYSTEM_TIME AS OF`` inclusive semantics.
    """
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__rrow"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*right_payload).alias("__rrow"),
    )
    # Right rows sort before left rows at the same timestamp (__side 0 < 1),
    # so an exactly-simultaneous version is visible to the probe row.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = tagged_l.unionByName(tagged_r).withColumn(
        "__asof", F.last("__rrow", ignorenulls=True).over(w)
    )
    out = unioned.filter(F.col("__side") == 1).select(
        *[F.col("__lrow")[c].alias(c) for c in lcols],
        *[F.col("__asof")[c].alias(c) for c in right_payload],
    )
    if how == "inner":
        out = out.filter(F.col(right_payload[0]).isNotNull())
    return out


def lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on,
    how: str = "left",
) -> DataFrame:
    """Dimension lookup join: broadcast the dim snapshot (no fact shuffle)."""
    return fact.join(F.broadcast(dim), on, how)


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join with TIME-BUCKET co-partitioning — the hot-key-safe plan.

    The plain equi-key formulation (``interval_join``) lets Spark emit EVERY
    key-equal pair before the band filter: a key with n left and m right rows
    costs n·m regardless of how narrow the band is — quadratic on hot keys
    (the reference avoids this in streaming by keyed state pruned to the
    band, TimeIntervalJoin.java:51; batch Spark has no such pruning).

    Here both sides also join on a time bucket of width W = upper_s -
    lower_s (one explode of the LEFT row into the <= 2 buckets its band can
    touch; the right side buckets exactly once), so the join key becomes
    (key, bucket) and each candidate pair is generated at most once — pair
    (l, r) meets only in r's bucket. Per-(key, bucket) cost is
    |band-neighborhood| not |key history|: linear in matches at any key
    skew, the batch analog of the reference's banded state.

    ``lower_s``/``upper_s`` are seconds (right_time - left_time band).
    """
    w = max(upper_s - lower_s, 1)
    lsec = F.unix_timestamp(F.col(left_time))
    lo = F.floor((lsec + lower_s) / w)
    hi = F.floor((lsec + upper_s) / w)
    lb = left.withColumn(
        "__bkt", F.explode(F.sequence(lo.cast("long"), hi.cast("long")))
    )
    rb = right.withColumn(
        "__bkt", F.floor(F.unix_timestamp(F.col(right_time)) / w).cast("long")
    )
    lt = F.unix_timestamp(lb[left_time])
    rt = F.unix_timestamp(rb[right_time])
    cond = (
        (lb[key] == rb[key])
        & (lb["__bkt"] == rb["__bkt"])
        & (rt >= lt + lower_s)
        & (rt <= lt + upper_s)
    )
    return lb.join(rb, cond, how).drop("__bkt")
