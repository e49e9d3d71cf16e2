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
from ..registry import micro, query, sorted_result


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
           CAST(sum(l_quantity) AS BIGINT)                       AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                                                                 AS sum_base_price,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                AS BIGINT)                                       AS sum_disc_price,
           CAST(CAST(sum((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                          * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) >> 31)
                     AS HUGEINT) * 2147483648
                + sum((CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                       * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))) & 2147483647)
                AS VARCHAR)                                      AS sum_charge,
           CAST(floor(avg(l_quantity) * 1e4 + 0.5) AS BIGINT)    AS avg_qty,
           CAST(floor(avg(l_extendedprice) * 1e4 + 0.5) AS BIGINT) AS avg_price,
           CAST(floor(avg(l_discount) * 1e4 + 0.5) AS BIGINT)    AS avg_disc,
           count(*)                                              AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    # Money sums run over exact per-row integers (cents, cents×discount-pct,
    # cents×disc-pct×tax-pct — all 2-decimal data), so they are summation-
    # order-invariant at ANY scale; the previous rounded double sums held to
    # sf1-scale but a group of 150M rows (the 1000x dir) pushes the 1e-4-unit
    # total past 2^52 where the double sum can no longer represent it.
    # sum_charge needs 128-bit headroom (≤1.1e11/row × 600M rows > int64),
    # but a decimal(38,0) aggregation is ~2× a Tungsten long sum (it doubled
    # q1's bench row in r9). Round-10 formulation: split each per-row product
    # into two int64 accumulators — hi = v >> 31 (≤51 per row) and
    # lo = v & (2^31−1) — sum both as plain long sums (exact to ~4B rows per
    # group), and recombine ONCE per group in decimal(38,0)/HUGEINT:
    # hi·2^31 + lo. The result is emitted as an exact integer STRING so no
    # int128→double cast appears in an oracle-compared column: DuckDB's
    # HUGEINT→double is a two-step ldexp(upper,64)+lower that can double-
    # round vs Spark's correctly-rounded BigDecimal path (ADVICE r9), and
    # the lint rejects int128-typed outputs. Avg columns stay micro-rounded
    # doubles: their divergence window is ~1e-12 of a rounding unit.
    # sum_qty emits BIGINT: l_quantity is integral, its sum exact below 2^53.
    (li,) = _t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_pct = F.lit(100) - F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    tax_pct = F.lit(100) + F.floor(F.col("l_tax") * 100 + 0.5).cast("long")
    charge = cents * disc_pct * tax_pct  # nonneg, ≤ ~1.1e11 per row
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1999-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.sum(cents).cast("long").alias("sum_base_price"),
            F.sum(cents * disc_pct).cast("long").alias("sum_disc_price"),
            (
                F.sum(F.shiftright(charge, 31)).cast("decimal(38,0)")
                * F.lit(2147483648)
                + F.sum(charge.bitwiseAND(F.lit(2147483647)))
            )
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_charge"),
            micro(F.avg("l_quantity"), 4).alias("avg_qty"),
            micro(F.avg("l_extendedprice"), 4).alias("avg_price"),
            micro(F.avg("l_discount"), 4).alias("avg_disc"),
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
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5)
                AS BIGINT)                         AS revenue,
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
            micro(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
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
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5) AS BIGINT) AS revenue
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
            micro(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------- #
# Q6: forecast revenue — pure scan→filter→agg; the predicate set pushes down to
# the parquet reader (PushedFilters), reading only 4 columns.
@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
           AS BIGINT) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    # Single-group revenue sum: per-row exact integerization (cents x
    # discount-percent = 1e-4-dollar units), same rationale as tpch_q19 —
    # one global double sum is summation-order-sensitive at scale.
    (li,) = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_discount") * 100
    ).cast("long")
    return li.filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01 00:00:00'"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(F.sum(rev).cast("long").alias("revenue"))


# --------------------------------------------------------------------------- #
# Q10: returned items — join + group-by-many-cols + top-k by measure.
@query(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(floor(sum(l_extendedprice * (1 - l_discount)) * 1e4 + 0.5)
                AS BIGINT) AS revenue,
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
            # Micro-unit emit: the raw double sum diverged from DuckDB by one
            # ulp at sf0.1 (summation order), the exact class the repo's
            # fixed-point discipline exists for. Ordering uses the SAME
            # rounded integer so the LIMIT cut is engine-deterministic too.
            micro(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
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


# --------------------------------------------------------------------------- #
# Q4 (adapted: lateness = l_shipdate > o_orderdate + 30 days; the driver's
# schema has no commit/receipt dates): order-priority checking — EXISTS
# rewritten to a semi join (reference FlinkSubQueryRemoveRule, SURVEY §4.1).
@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-04-01'"))
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------- #
# Q7: volume shipping between two nations — 6-way join with broadcast dims.
@query(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, CAST(floor(sum(volume) * 1e4 + 0.5) AS BIGINT) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                               AND TIMESTAMP '1996-12-31') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    sup, li, orders, cust, nat = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    # The OR-of-ANDs nation pair can't be pushed below the joins by Catalyst,
    # but its necessary condition — each side's nation ∈ {N1, N2} — can be
    # applied manually: dims shrink to 2/25 nations BEFORE touching the fact
    # tables, so ~92% of lineitem drops at the first broadcast join instead
    # of after the orders⋈customer join.
    pair = ["NATION_1", "NATION_2"]
    n1 = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sup2 = sup.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust2 = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    df = (
        li.filter(
            F.col("l_shipdate").between(
                F.expr("TIMESTAMP '1995-01-01'"), F.expr("TIMESTAMP '1996-12-31'")
            )
        )
        .join(F.broadcast(sup2), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust2), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        df.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(micro(F.sum("volume"), 4).alias("revenue"))
        .transform(sorted_result, "supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------- #
# Q8 (adapted: region filter by key, p_type = 'PROMO'): national market share.
@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           CAST(floor(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume) * 1e6 + 0.5) AS BIGINT) AS mkt_share
    FROM (SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE n1.n_regionkey = 0 AND p_type = 'PROMO'
            AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                AND TIMESTAMP '1996-12-31') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    part, li, sup, orders, cust, nat = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation"
    )
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    df = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                F.col("o_orderdate").between(
                    F.expr("TIMESTAMP '1995-01-01'"), F.expr("TIMESTAMP '1996-12-31'")
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1.filter(F.col("n_regionkey") == 0)),
              F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        df.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            micro(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------- #
# Q12 (adapted: shipmode column absent — classify by order priority instead):
# conditional aggregation after a fact-fact join.
@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def tpch_q12(spark, sf_dir):
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01'"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------- #
# Q13 (adapted: exclusion predicate on priority, not comment): customer order
# count distribution — left outer join with join-condition filter, double agg.
@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------- #
# Q14: promotion effect — conditional ratio aggregate over a broadcast join.
@query(
    "tpch_q14",
    oracle="""
    SELECT CAST(floor(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)) * 1e6 + 0.5)
            AS BIGINT) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-09-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-10-01'"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            micro(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------- #
# Q15: top supplier — agg CTE reused twice (revenue + its max), scalar subquery.
@query(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS BIGINT) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark, sf_dir):
    # The top-supplier predicate is an EQUALITY against max(total_revenue),
    # so total_revenue must be bit-stable across re-evaluations of the same
    # CTE: with double sums, DuckDB's morsel-parallel aggregation summed the
    # revenue CTE's two references in different orders at the 1000x dir
    # (600M rows) and the equality matched ZERO rows (r10 decade find).
    # Exact integer cents x discount-pct units (the same 1e-4-dollar scale
    # the old micro() emit produced) make the sum order-invariant on both
    # engines and the equality exact. Max per-supplier total at 1000x is
    # ~3e14 — well inside int64.
    li, sup = _t(spark, sf_dir, "lineitem", "supplier")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_pct = F.lit(100) - F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01'"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents * disc_pct).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------- #
# Q17 (adapted: brand+size in place of brand+container): small-quantity-order
# revenue — correlated scalar subquery as per-part average join.
@query(
    "tpch_q17",
    oracle="""
    WITH pp AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_size < 15
    ), pa AS (
      SELECT l_partkey AS ap_key, 0.2 * avg(l_quantity) AS avg_qty
      FROM lineitem JOIN pp ON p_partkey = l_partkey
      GROUP BY l_partkey
    )
    SELECT CAST((20000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)) + 7)
                // 14 AS BIGINT) AS avg_yearly
    FROM lineitem
    JOIN pa ON ap_key = l_partkey
    WHERE l_quantity < avg_qty
    """,
)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H q17 shape). Round-8 10x-gate
    hardening, twice over: (1) the old oracle's single dual-condition join
    (part joined on BOTH ap_key and l_partkey) made DuckDB spill >60 GB of
    temp at 6M rows — restructured as CTEs joining the per-part average
    straight to lineitem (identical relational content: restricting the
    average to surviving partkeys cannot change per-key averages); (2) the
    emit integerizes per row (exact cents) and applies the /7 annualization
    with integer rounding-division, floor((2e4·S + 7) / 14) — the
    single-group double sum diverged in its last digit between engines at
    10x, the same class tpch_q19/q6 hit."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("avg_qty")
    )
    return (
        li.join(
            F.broadcast(part.filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") < 15))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("ap_key") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("avg_qty"))
        .agg(
            F.expr(
                "CAST((20000 * sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                " + 7) DIV 14 AS BIGINT)"
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------- #
# Q19 (adapted: brand/size/quantity ranges): disjunctive join predicate —
# the reference plans this as a single join with a residual OR filter.
@query(
    "tpch_q19",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
           AS BIGINT) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 5 AND 40)
    """,
)
def tpch_q19(spark, sf_dir):
    # Revenue emits in 1e-4 dollar units via PER-ROW exact integerization
    # (price is a 2dp decimal in binary floats, discount an integer percent:
    # round(x*100) recovers exact integers; cents * (100 - pct) IS the
    # 1e-4-dollar revenue). A micro(sum(double)) emit diverged by one final
    # digit at the round-8 10x gate: this query aggregates to ONE group, so
    # nothing shortens the float summation and the engines' different
    # summation orders reach the quantization boundary (q1's grouped sums
    # escape by length, not by construction).
    li, part = _t(spark, sf_dir, "lineitem", "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(5, 40)
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(rev).cast("long").alias("revenue"))
    )


# --------------------------------------------------------------------------- #
# Q21 (adapted: lateness by shipdate vs orderdate+60d): suppliers who kept
# multi-supplier orders waiting — the double EXISTS/NOT EXISTS, expressed as
# per-order distinct-supplier counts (same relational content, one pass).
@query(
    "tpch_q21",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
    per_order AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns
      FROM lineitem GROUP BY l_orderkey),
    late_po AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS nls
      FROM late GROUP BY l_orderkey),
    elig AS (
      SELECT p.l_orderkey
      FROM per_order p JOIN late_po q USING (l_orderkey)
      WHERE p.ns > 1 AND q.nls = 1)
    SELECT s_name, count(*) AS numwait
    FROM late JOIN elig USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def tpch_q21(spark, sf_dir):
    # Single pass over the fact table: ONE lineitem-orders join, then a
    # two-level aggregation — (orderkey, suppkey) with map-side partials,
    # collapsed to per-order distinct/late-distinct counts via conditional
    # aggregates. The naive per_order/late_po formulation scans lineitem
    # three times and shuffles it for each countDistinct; here lateness is a
    # flag inside one aggregation. Eligible orders (ns > 1, exactly one late
    # supplier) carry that supplier's id and late-row count out of the same
    # pass, so the only remaining join is the broadcast against supplier.
    li, orders, sup = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    j = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("is_late"), F.lit(1))).alias("late_cnt")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.count(F.when(F.col("late_cnt") > 0, F.lit(1))).alias("nls"),
        F.max(F.when(F.col("late_cnt") > 0, F.col("l_suppkey"))).alias("late_supp"),
        F.sum(F.when(F.col("late_cnt") > 0, F.col("late_cnt"))).alias("late_rows"),
    )
    elig = per_order.filter((F.col("ns") > 1) & (F.col("nls") == 1))
    return (
        elig.join(F.broadcast(sup), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# Q22 (adapted: country code = nation key mod 7; no phone column): customers
# with above-average balance and no orders — scalar subquery + anti join.
@query(
    "tpch_q22",
    oracle="""
    SELECT c_nationkey % 7 AS cntrycode, count(*) AS numcust,
           CAST(floor(sum(c_acctbal) * 1e4 + 0.5) AS BIGINT) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q22(spark, sf_dir):
    # adapted: every synthetic customer has orders, so the classic "never
    # ordered" anti-join is vacuously empty — "no high-value order" keeps the
    # anti-join + scalar-subquery shape with a non-trivial result
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.filter(F.col("o_totalprice") > 300000),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            micro(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# --------------------------------------------------------------------------- #
# Q2 (adapted: lineitem as the part-supplier price relation — the synthetic
# schema has no partsupp): minimum-cost supplier per part, the correlated
# MIN subquery the reference decorrelates into an agg+join
# (flink-table-planner .../rules/logical/subquery rewrites).
@query(
    "tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0 GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey AS b_partkey, min(unit_cost) AS best_cost
      FROM cost GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
           CAST(floor(unit_cost * 1e6 + 0.5) AS BIGINT) AS unit_cost
    FROM cost
    JOIN best     ON b_partkey = l_partkey AND unit_cost = best_cost
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE p_size BETWEEN 10 AND 20 AND r_name = 'ASIA'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark, sf_dir):
    li, part, sup, nat, reg = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    cost = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    dims = (
        sup.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
              F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return (
        cost.join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .join(
            F.broadcast(part.filter(F.col("p_size").between(10, 20))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(dims), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            micro(F.col("unit_cost"), 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------- #
# Q9 (adapted: p_retailprice stands in for ps_supplycost): product-type
# profit by nation and year — the widest join tree in the suite
# (lineitem⋈orders⋈supplier⋈nation⋈part) + agg on derived columns.
@query(
    "tpch_q9",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                    - 10 * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                      * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9(spark, sf_dir):
    # Exact per-row profit in integer 1e-4-dollar units — cents×(100−d_pct)
    # − 10×retail_cents×qty (all 2-decimal data + integral qty, so every
    # row's profit is an exact multiple of 1e-4): the double sum diverged
    # by 52 units at the 1000x dir's ~8M-row (nation, year) groups — the
    # same summation-order class as q1/q11/q15, fixed the same way. Group
    # totals are ~2.7e14, well inside int64.
    li, orders, sup, nat, part = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "part"
    )
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    disc_pct = F.lit(100) - F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    retail_cents = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    profit = cents * disc_pct - F.lit(10) * retail_cents * F.col(
        "l_quantity"
    ).cast("long")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("long").alias("sum_profit"))
    )


# --------------------------------------------------------------------------- #
# Q11 (adapted: lineitem value per part for one nation's suppliers): grouped
# value with a HAVING against a scalar fraction of the GLOBAL total — the
# scalar-subquery-in-HAVING the reference plans as a broadcast nested loop.
@query(
    "tpch_q11",
    oracle="""
    WITH vals AS (
      SELECT l_partkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS v
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v * 100 AS BIGINT) AS value
    FROM vals
    WHERE v * (SELECT count(*) FROM vals) > (SELECT 2 * sum(v) FROM vals)
    ORDER BY value DESC, l_partkey
    """,
)
def tpch_q11(spark, sf_dir):
    # Exact integer per-part values (cents x integral quantity; x100 on emit
    # keeps the original 1e-4-dollar output unit): the double sum diverged
    # in its last rounding unit at the 1000x dir (600M rows, ~3000
    # rows/part — the same summation-order class as q1/q6/rollup). The
    # data-relative bar (2x the mean; the official query's fixed fraction
    # is spec-scaled by 1/SF for the same reason) is evaluated as the
    # cross-multiplied INTEGER predicate v*cnt > 2*total so no float ratio
    # appears anywhere; the total needs 128-bit headroom (~1.2e19 at
    # 1000x), so it alone runs in decimal(38,0)/HUGEINT — a 200k-row
    # second-stage aggregate, not the 600M-row hot path.
    li, sup, nat = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat3 = nat.filter(F.col("n_name") == "NATION_3")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    qty = F.col("l_quantity").cast("long")
    vals = (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat3), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents * qty).alias("v"))
    )
    threshold = vals.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        vals.join(
            F.broadcast(threshold),
            F.col("v").cast("decimal(38,0)") * F.col("cnt")
            > F.lit(2) * F.col("tot"),
        )
        .select("l_partkey", (F.col("v") * 100).cast("long").alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


# --------------------------------------------------------------------------- #
# Q16 (adapted: order-count per part attributes, excluding flagged
# suppliers): NOT IN subquery (null-safe anti join) + COUNT DISTINCT.
@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    li, part, sup = _t(spark, sf_dir, "lineitem", "part", "supplier")
    flagged = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(5, 10, 15, 20, 25)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------- #
# Q20 (adapted: shipped-volume threshold in place of availqty): suppliers
# whose first-half-1996 shipped volume of '%1%' parts exceeds a threshold —
# nested IN subqueries decorrelated to agg + semi joins.
@query(
    "tpch_q20",
    oracle="""
    WITH vol AS (
      SELECT l_suppkey, sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%')
      GROUP BY l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM vol WHERE half_qty > 50)
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    li, part, sup, nat = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    wanted_parts = part.filter(F.col("p_name").like("%blue%")).select("p_partkey")
    vol = (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-07-01'"))
        )
        .join(F.broadcast(wanted_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("half_qty"))
        .filter(F.col("half_qty") > 50)
        .select("l_suppkey")
    )
    return (
        sup.join(F.broadcast(vol), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
