"""TPC-H-shaped headline queries (adapted to the driver's synthetic schema).

The reference validates its batch SQL surface with TPC-H / TPC-DS end-to-end
runs (reference: flink-end-to-end-tests/flink-tpch-test/.../TpchDataGenerator.java,
flink-end-to-end-tests/test-scripts/test_tpch.sh:23). These queries exercise the
same operator mix — scan→filter→agg (q6), join+agg+sort+limit (q3), 5-way join
(q5), grouped multi-agg (q1), outer-ish group topn (q10) — re-expressed as
Spark DataFrame plans.

Scale notes (100 TB design):
- All dimension joins (region/nation/customer/supplier/part) are explicitly
  broadcast — no shuffle of the fact table for dimension enrichment.
- Filters are expressed as column predicates on the scan columns so Catalyst
  pushes them into the parquet reader (verified via plans.checks).
- Aggregations are plain groupBy → Tungsten partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------- #
# Q1: pricing summary — grouped multi-aggregate over the fact table.
# Reference operator: batch hash aggregate (SURVEY §2.4,
# flink-table-planner-blink .../physical/batch/BatchPhysicalHashAggregate.scala).
@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                       AS sum_qty,
           sum(l_extendedprice)                                  AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))               AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                       AS avg_qty,
           avg(l_extendedprice)                                  AS avg_price,
           avg(l_discount)                                       AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1999-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------- #
# Q3: shipping priority — join + agg + sort + limit.
# Reference operators: hash join (HashJoinOperator.java:58), SortLimit
# (SortLimitOperator.java). Spark: broadcast(customer) ⋈ orders ⋈ lineitem,
# TakeOrderedAndProject for the top-k.
@query(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d')       AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.filter(F.col("l_shipdate") > F.expr("TIMESTAMP '1998-03-15 00:00:00'"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.expr("TIMESTAMP '1998-03-15 00:00:00'")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------- #
# Q5: local supplier volume — 5-way join (region⋈nation⋈customer⋈orders⋈
# lineitem⋈supplier) + grouped agg. All dims broadcast; only the orders⋈lineitem
# equi-join shuffles, on the natural key.
@query(
    "tpch_q5",
    oracle="""
    SELECT n_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    cust, orders, li, supp, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    dims = (
        supp.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        ).join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01 00:00:00'"))
                & (F.col("o_orderdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------- #
# Q6: forecast revenue — pure scan→filter→agg; the predicate set pushes down to
# the parquet reader (PushedFilters), reading only 4 columns.
@query(
    "tpch_q6",
    oracle="""
    SELECT sum(l_extendedprice * l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# --------------------------------------------------------------------------- #
# Q10: returned items — join + group-by-many-cols + top-k by measure.
@query(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           sum(l_extendedprice * (1 - l_discount)) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    cust, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
                & (F.col("o_orderdate") < F.expr("TIMESTAMP '1997-07-01 00:00:00'"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# Q18-ish: large-volume customers — scalar-subquery/HAVING shape (the reference
# decorrelates IN-subqueries to semi joins, FlinkSubQueryRemoveRule; Catalyst
# does the same automatically when written in SQL).
@query(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def tpch_q18(spark, sf_dir):
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "bk"),
                    F.col("o_orderkey") == F.col("bk"), "left_semi")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )
