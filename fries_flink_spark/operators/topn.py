"""Top-N and deduplicate operators (SURVEY §2.7).

Reference: AbstractTopNFunction.java:47 (+ AppendOnly/Retractable/Updatable
variants), RankOperator.java (batch rank), deduplicate/ (RowTimeDeduplicate-
Function.java etc.), planner StreamPhysicalDeduplicate.scala / rank→dedup
conversion (CalcRankTransposeRule).

Spark-first: rank-then-filter over a partitioned window. Catalyst pushes the
``rank <= n`` predicate into the window sort (WindowGroupLimit physical
optimization in Spark 3.5+), so per-partition only the top n rows are kept
before the final filter — the same effect as Flink's TopN state pruning,
with no custom state. ``deduplicate`` keep-first/keep-last is the rank=1
special case, exactly the reference's rank→dedup planner conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RANK_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def top_n(
    df: DataFrame,
    partition_by: list[str | Column],
    order_by: list[Column],
    n: int,
    rank_type: str = "row_number",
    rank_col: str | None = None,
) -> DataFrame:
    """Top-N per group. ``rank_type`` ∈ {row_number, rank, dense_rank}
    (reference RankType.java:22). Keeps the rank column if ``rank_col``."""
    fn = _RANK_FNS[rank_type]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn("__rk", fn().over(w)).filter(F.col("__rk") <= n)
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


def deduplicate(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    keep: str = "first",
) -> DataFrame:
    """Keep first/last row per key by ``order_by`` (reference
    RowTimeDeduplicateFunction keep-first/keep-last semantics)."""
    order = order_by if keep == "first" else [c.desc() for c in order_by]
    return top_n(df, keys, order, 1)
