"""Sort / limit / offset / Top-N / deduplicate queries (SURVEY §2.7).

Reference: SortOperator.java on BinaryExternalSorter.java:69 (external sort —
Tungsten equivalent built-in), SortLimitOperator.java (top-k = Spark
TakeOrderedAndProject), RankOperator.java, deduplicate/ operator family.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.topn import deduplicate, top_n
from ..registry import query, sorted_result


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def sort_limit(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5
    """,
)
def sort_limit_offset(spark, sf_dir):
    """OFFSET/FETCH (reference Table.offset:887 / fetch:905)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(10)
    )


@query(
    "topn_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rk FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)
def topn_per_group(spark, sf_dir):
    """Top-3 orders per market segment (reference AbstractTopNFunction.java:47,
    RankType ROW_NUMBER)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    return (
        top_n(
            joined.select("c_mktsegment", "o_orderkey", "o_totalprice"),
            ["c_mktsegment"],
            [F.desc("o_totalprice"), F.asc("o_orderkey")],
            3,
            rank_col="rk",
        )
        .transform(sorted_result, "c_mktsegment", "rk")
    )


@query(
    "topn_dense_rank",
    # dense_rank over values == row_number over DISTINCT values, so the
    # oracle aggregates 600M rows to ~150 distinct (flag, qty) pairs BEFORE
    # the window — the direct dense_rank form full-sorts the fact table and
    # exhausted the box's disk at the 1000x dir (oracle-side scale algebra,
    # SCALING.md).
    oracle="""
    SELECT l_returnflag, l_quantity, rk FROM (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity DESC) AS rk
      FROM (SELECT DISTINCT l_returnflag, l_quantity FROM lineitem)
    ) WHERE rk <= 2
    ORDER BY l_returnflag, rk
    """,
)
def topn_dense_rank(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        top_n(
            li.select("l_returnflag", "l_quantity"),
            ["l_returnflag"],
            [F.desc("l_quantity")],
            2,
            rank_type="dense_rank",
            rank_col="rk",
        )
        .dropDuplicates(["l_returnflag", "l_quantity", "rk"])
        .orderBy("l_returnflag", "rk")
    )


@query(
    "dedup_keep_first",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rk
      FROM events
    ) WHERE rk = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_keep_first(spark, sf_dir):
    """Deduplicate keep-first per (user, type) by event time (reference
    RowTimeDeduplicateFunction keep-first)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        deduplicate(
            ev.select("user_id", "event_type", "event_id", "value", "ts"),
            ["user_id", "event_type"],
            [F.col("ts"), F.col("event_id")],
            keep="first",
        )
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@query(
    "dedup_keep_last",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rk
      FROM events
    ) WHERE rk = 1
    ORDER BY user_id, event_type
    """,
)
def dedup_keep_last(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        deduplicate(
            ev.select("user_id", "event_type", "event_id", "value", "ts"),
            ["user_id", "event_type"],
            [F.col("ts"), F.col("event_id")],
            keep="last",
        )
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2",
)
def distinct_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.dropDuplicates(["l_returnflag", "l_linestatus"])
        .select("l_returnflag", "l_linestatus")
        .orderBy("l_returnflag", "l_linestatus")
    )
