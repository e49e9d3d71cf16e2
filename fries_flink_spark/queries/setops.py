"""Set-operation queries (SURVEY §2.8): UNION [ALL], INTERSECT [ALL],
EXCEPT/MINUS [ALL], DISTINCT.

Reference: Table.java:753-830 (minus/minusAll/intersect/intersectAll/union/
unionAll), rewrite rules ReplaceIntersectWithSemiJoinRule /
ReplaceMinusWithAntiJoinRule / RewriteIntersectAllRule / RewriteMinusAllRule.
Spark: union/intersect/intersectAll/except/exceptAll — Catalyst applies the
same semi/anti-join rewrites natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query


def _splits(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return big, urgent


_BIG = "SELECT o_custkey FROM orders WHERE o_totalprice > 200000"
_URGENT = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query(
    "setop_union_all",
    oracle=f"SELECT o_custkey, count(*) AS n FROM ({_BIG} UNION ALL {_URGENT}) GROUP BY o_custkey",
)
def setop_union_all(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.union(urgent).groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "setop_union_distinct",
    oracle=f"SELECT o_custkey FROM ({_BIG} UNION {_URGENT}) ORDER BY o_custkey",
)
def setop_union_distinct(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.union(urgent).distinct().orderBy("o_custkey")


@query(
    "setop_intersect",
    oracle=f"SELECT o_custkey FROM ({_BIG} INTERSECT {_URGENT}) ORDER BY o_custkey",
)
def setop_intersect(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.intersect(urgent).orderBy("o_custkey")


@query(
    "setop_intersect_all",
    oracle=f"SELECT o_custkey FROM ({_BIG} INTERSECT ALL {_URGENT}) ORDER BY o_custkey",
)
def setop_intersect_all(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.intersectAll(urgent).orderBy("o_custkey")


@query(
    "setop_except",
    oracle=f"SELECT o_custkey FROM ({_BIG} EXCEPT {_URGENT}) ORDER BY o_custkey",
)
def setop_except(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.subtract(urgent).orderBy("o_custkey")


@query(
    "setop_except_all",
    oracle=f"SELECT o_custkey FROM ({_BIG} EXCEPT ALL {_URGENT}) ORDER BY o_custkey",
)
def setop_except_all(spark, sf_dir):
    big, urgent = _splits(spark, sf_dir)
    return big.exceptAll(urgent).orderBy("o_custkey")


@query(
    "setop_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders ORDER BY 1, 2",
)
def setop_distinct(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )
