"""OVER / analytic window queries (SURVEY §2.6): ranking functions, lead/lag,
first/last_value, ROWS and RANGE frames, running and moving aggregates.

Reference: batch over-agg frames .../operators/over/frame/ (RowSlidingOverFrame,
RangeSlidingOverFrame, RowUnboundedPrecedingOverFrame, OffsetOverFrame, … 13
files) on BufferDataOverWindowOperator.java; ranking via FlinkSqlOperatorTable
std ops + aggfunctions/LeadLagAggFunction.java / RankAggFunction.java.
Spark: Window.partitionBy().orderBy().rowsBetween()/rangeBetween() — the
WindowExec operator implements the same frame taxonomy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import micro, query, sorted_result


@query(
    "over_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rk,
           dense_rank()   OVER w AS drk,
           percent_rank() OVER w AS prk,
           cume_dist()    OVER w AS cd,
           ntile(4)       OVER w AS nt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, rn
    """,
)
def over_ranking(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
            F.percent_rank().over(w).alias("prk"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).alias("nt"),
        )
        .orderBy("o_custkey", "rn")
    )


@query(
    "over_lead_lag",
    oracle="""
    SELECT user_id, event_id,
           lag(event_type)     OVER w AS prev_type,
           lead(event_type)    OVER w AS next_type,
           lag(value, 2, -1.0) OVER w AS lag2_value,
           lead(value, 3)      OVER w AS lead3_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def over_lead_lag(spark, sf_dir):
    """LEAD/LAG with offset + default (reference LeadLagAggFunction.java)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.lag("value", 2, -1.0).over(w).alias("lag2_value"),
            F.lead("value", 3).over(w).alias("lead3_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "over_running_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(floor(sum(value) OVER w * 1e4 + 0.5) AS BIGINT) AS running_sum,
           count(*)     OVER w AS running_n,
           min(value)   OVER w AS running_min,
           max(value)   OVER w AS running_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def over_running_sum(spark, sf_dir):
    """ROWS UNBOUNDED PRECEDING frame (reference
    RowUnboundedPrecedingOverFrame.java)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            micro(F.sum("value").over(w), 4).alias("running_sum"),
            F.count(F.lit(1)).over(w).alias("running_n"),
            F.min("value").over(w).alias("running_min"),
            F.max("value").over(w).alias("running_max"),
        )
        .transform(sorted_result, "user_id", "event_id")
    )


@query(
    "over_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mavg3,
           sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS msum3
    FROM events
    ORDER BY user_id, event_id
    """,
)
def over_moving_avg(spark, sf_dir):
    """Sliding ROWS frames (reference RowSlidingOverFrame.java)."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.avg("value").over(base.rowsBetween(-2, 0)).alias("mavg3"),
            F.sum("value").over(base.rowsBetween(-1, 1)).alias("msum3"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "over_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, qty,
           CAST(sum(qty) OVER (PARTITION BY l_orderkey ORDER BY qty
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS range_sum
    FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
          FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def over_range_frame(spark, sf_dir):
    """RANGE (value-based) frame (reference RangeSlidingOverFrame.java)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("bigint").alias("qty")
    )
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("qty")
        .rangeBetween(-5, Window.currentRow)
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        "qty",
        F.sum("qty").over(w).alias("range_sum"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "over_first_last_value",
    oracle="""
    SELECT user_id, event_id,
           first_value(value) OVER w AS first_v,
           last_value(value)  OVER w AS last_v,
           nth_value(value, 2) OVER w AS second_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id, event_id
    """,
)
def over_first_last_value(spark, sf_dir):
    """FIRST_VALUE/LAST_VALUE/NTH_VALUE over explicit full frame (reference
    aggfunctions/FirstValueAggFunction + OffsetOverFrame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.first("value").over(w).alias("first_v"),
            F.last("value").over(w).alias("last_v"),
            F.nth_value("value", 2).over(w).alias("second_v"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "over_global_agg",
    oracle="""
    WITH c AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
               FROM orders),
         t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM c),
         s AS (SELECT o_orderstatus, CAST(sum(cents) AS BIGINT) AS sc,
                      count(*) AS n
               FROM c GROUP BY o_orderstatus)
    SELECT c.o_orderkey, c.o_totalprice,
           CAST(floor(CAST(c.cents AS DOUBLE) / CAST(t.total_cents AS DOUBLE)
                      * 1e10 + 0.5) AS BIGINT) AS price_share,
           CAST(floor(CAST(s.sc AS DOUBLE) / CAST(s.n AS DOUBLE)
                      * 100 + 0.5) AS BIGINT) AS status_avg
    FROM c
    JOIN s USING (o_orderstatus)
    CROSS JOIN t
    ORDER BY o_orderkey
    """,
)
def over_global_agg(spark, sf_dir):
    """Global-aggregate-per-row (SQL `sum(x) OVER ()` / partition-only
    window, flink OverAggregate with an unpartitioned unbounded frame,
    reference flink-table OverWindow planning).

    Physical strategy: Spark's WindowExec executes an unpartitioned
    unbounded window as a SINGLE task holding every row (150M rows in one
    partition at the 1000x dir) — the canonical skewed-window scale-killer.
    The same logical result is computed here as two tiny aggregates (one
    scalar total, one 3-row per-status table) broadcast back onto the
    fully parallel scan: identical output, zero single-task stages, and
    the per-row arithmetic is a fixed IEEE754 op sequence over EXACT
    integer cents (int64-safe: total cents at 1000x ~3.75e16 < 2^63), so
    the result is bit-identical across engines and partitionings by
    construction (the 1000x summation-order defect class, SCALING.md).
    """
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    t = c.agg(F.sum("cents").alias("total_cents"))
    s = c.groupBy("o_orderstatus").agg(
        F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("cents").cast("double") / F.col("total_cents").cast("double")
    a = F.col("sc").cast("double") / F.col("n").cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .join(F.broadcast(s), "o_orderstatus")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.floor(d * F.lit(1e10) + F.lit(0.5)).cast("long").alias("price_share"),
            F.floor(a * F.lit(100.0) + F.lit(0.5)).cast("long").alias("status_avg"),
        )
        .orderBy("o_orderkey")
    )
