"""Join-operator queries: every join type the reference supports (SURVEY §2.3).

Reference operators: HashJoinOperator.java:58 (equi inner/outer/semi/anti),
SortMergeJoinOperator.java:62, BatchPhysicalNestedLoopJoin.scala (theta/cross),
TimeIntervalJoin.java:51 (interval), TemporalRowTimeJoinOperator.java:78
(as-of), LookupJoinRunner.java:34 (lookup). Spark: ``df.join`` with the join
type string; Catalyst picks broadcast/hash/SMJ/BNLJ, AQE re-picks at runtime.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.joins import asof_join, interval_join, lookup_join
from ..registry import micro, query, sorted_result


def _t(spark, sf_dir, *names):
    return [load_table(spark, sf_dir, n) for n in names]


@query(
    "join_inner",
    oracle="""
    SELECT n_name, count(*) AS n_orders,
           CAST(floor(sum(o_totalprice) * 1e4 + 0.5) AS BIGINT) AS total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner(spark, sf_dir):
    orders, cust, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    return (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            micro(F.sum("o_totalprice"), 4).alias("total"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(floor(coalesce(sum(o_totalprice), 0.0) * 1e4 + 0.5) AS BIGINT) AS total
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(
            orders.filter(
                F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-01-01 00:00:00'")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            micro(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total"),
        )
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM orders
    RIGHT JOIN customer ON o_custkey = c_custkey
        AND o_totalprice > 400000
    ORDER BY c_custkey, o_orderkey
    """,
)
def join_right_outer(spark, sf_dir):
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.filter(F.col("o_totalprice") > 400000)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"), "right")
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark, sf_dir):
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("cnk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = supp.groupBy(F.col("s_nationkey").alias("snk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, F.col("cnk") == F.col("snk"), "full").select(
        F.coalesce("cnk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(
            orders.filter(F.col("o_totalprice") > 300000),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY c_custkey
    """,
)
def join_anti(spark, sf_dir):
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(
            orders.filter(
                F.col("o_orderdate") < F.expr("TIMESTAMP '1996-01-01 00:00:00'")
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
    """,
)
def join_cross(spark, sf_dir):
    region, nation = _t(spark, sf_dir, "region", "nation")
    return region.crossJoin(nation).select("r_name", "n_name").orderBy(
        "r_name", "n_name"
    )


@query(
    "join_theta",
    oracle="""
    SELECT a.s_suppkey, count(*) AS n_richer
    FROM supplier a JOIN supplier b ON b.s_acctbal > a.s_acctbal
    GROUP BY a.s_suppkey
    """,
)
def join_theta(spark, sf_dir):
    """Non-equi (theta) join → Catalyst broadcast-nested-loop.

    Reference: BatchPhysicalNestedLoopJoin.scala / NestedLoopJoinCodeGenerator.
    Scale note: theta joins are inherently O(n·m); keep one side broadcastable
    or pre-bucket the range (see interval_join) — here supplier is a dim table.
    """
    supp, = _t(spark, sf_dir, "supplier")
    a = supp.select(F.col("s_suppkey").alias("a_key"), F.col("s_acctbal").alias("a_bal"))
    b = supp.select(F.col("s_acctbal").alias("b_bal"))
    return (
        a.join(F.broadcast(b), F.col("b_bal") > F.col("a_bal"))
        .groupBy(F.col("a_key").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("n_richer"))
    )


@query(
    "join_interval",
    oracle="""
    SELECT a.user_id, a.event_id AS signup_event, b.event_id AS purchase_event
    FROM events a
    JOIN events b ON a.user_id = b.user_id
      AND a.event_type = 'signup' AND b.event_type = 'purchase'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    ORDER BY a.user_id, signup_event, purchase_event
    """,
)
def join_interval(spark, sf_dir):
    """Interval join (reference TimeIntervalJoin.java:51): purchases within
    30min after a signup by the same user."""
    ev, = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"), F.col("event_id").alias("signup_event"), F.col("ts").alias("a_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_event"),
        F.col("ts").alias("b_ts"),
    )
    joined = interval_join(
        signups.withColumnRenamed("user_id", "s_user"),
        purchases,
        key=F.col("s_user") == F.col("p_user"),
        left_time="a_ts",
        right_time="b_ts",
        lower="0 SECOND",
        upper="30 MINUTE",
    )
    return joined.select(
        F.col("s_user").alias("user_id"), "signup_event", "purchase_event"
    ).orderBy("user_id", "signup_event", "purchase_event")


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, s.event_id AS last_signup_event
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def join_asof(spark, sf_dir):
    """As-of / temporal join (reference TemporalRowTimeJoinOperator.java:78):
    each purchase matched to the user's most recent signup at-or-before it."""
    ev, = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id").alias("last_signup_event"),
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["last_signup_event"],
    )
    return out.select("event_id", "user_id", "last_signup_event").transform(sorted_result, "event_id")


@query(
    "join_lookup",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, n_name
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_totalprice > 450000
    ORDER BY o_orderkey
    """,
)
def join_lookup(spark, sf_dir):
    """Lookup/dimension join (reference LookupJoinRunner.java:34): broadcast
    dim snapshot, zero fact-side shuffle."""
    orders, cust, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    dim = lookup_join(cust, F.broadcast(nation),
                      F.col("c_nationkey") == F.col("n_nationkey"), "inner")
    return (
        lookup_join(
            orders.filter(F.col("o_totalprice") > 450000),
            dim,
            F.col("o_custkey") == F.col("c_custkey"),
            "inner",
        )
        .select("o_orderkey", "o_totalprice", "c_name", "n_name")
        .orderBy("o_orderkey")
    )


@query(
    "join_window",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS w_start
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id, value,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS w_start
      FROM events WHERE event_type = 'purchase')
    SELECT c.w_start, c.user_id,
           c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(floor((c.value + p.value) * 1e4 + 0.5) AS BIGINT) AS combined
    FROM c JOIN p ON c.user_id = p.user_id AND c.w_start = p.w_start
    ORDER BY c.w_start, c.user_id, click_id, purchase_id
    """,
)
def join_window(spark, sf_dir):
    """Window join (reference StreamPhysicalWindowJoin.scala / 1.13 window-TVF
    join): two inputs co-windowed by the same tumble, joined on key + window.
    The window column is part of the equi-join key, so the shuffle co-locates
    by (user, window) — no time-range post-filter needed."""
    ev = load_table(spark, sf_dir, "events")
    w = F.unix_timestamp(F.window("ts", "15 minutes").start).alias("w_start")
    clicks = ev.filter(F.col("event_type") == "click").select(
        w, "user_id", F.col("event_id").alias("click_id"),
        F.col("value").alias("c_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        w, "user_id", F.col("event_id").alias("purchase_id"),
        F.col("value").alias("p_value"),
    )
    return (
        clicks.join(purchases, ["w_start", "user_id"])
        .select(
            "w_start", "user_id", "click_id", "purchase_id",
            micro(F.col("c_value") + F.col("p_value"), 4).alias("combined"),
        )
        .orderBy("w_start", "user_id", "click_id", "purchase_id")
    )


@query(
    "join_runtime_filter",
    oracle="""
    SELECT l_returnflag, count(*) AS n_rows, sum(l_quantity) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_runtime_filter(spark, sf_dir):
    """Fact-side runtime-filter pruning (operators/runtime_filter.py): the
    lineitem probe is cut by a broadcast hash-bucket filter built from the
    urgent-orders keys BEFORE any exchange, then exact-semi-joined. Result
    is identical to the plain semi join (hash inequality => key inequality),
    which is exactly what the oracle asserts."""
    from ..operators.runtime_filter import runtime_filtered_semi

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    survivors = runtime_filtered_semi(
        lineitem, orders, "l_orderkey", "o_orderkey", n_buckets=1 << 16
    )
    return (
        survivors.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("l_quantity").alias("sum_qty"))
        .transform(sorted_result, "l_returnflag")
    )


@query(
    "join_interval_binned",
    oracle="""
    SELECT a.user_id, a.event_id AS signup_event, b.event_id AS purchase_event
    FROM events a
    JOIN events b ON a.user_id = b.user_id
      AND a.event_type = 'signup' AND b.event_type = 'purchase'
      AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    ORDER BY a.user_id, signup_event, purchase_event
    """,
)
def join_interval_binned(spark, sf_dir):
    """Interval join via time-bucket co-partitioning (operators/joins.
    interval_join_binned): identical result to join_interval, but the join
    key is (user, bucket) so a hot user costs its band neighborhood, not its
    whole history — the batch analog of the reference's banded keyed state
    (TimeIntervalJoin.java:51)."""
    from ..operators.joins import interval_join_binned

    ev, = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_event"), F.col("ts").alias("a_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event"), F.col("ts").alias("b_ts")
    )
    joined = interval_join_binned(
        signups, purchases, key="user_id",
        left_time="a_ts", right_time="b_ts", lower_s=0, upper_s=1800,
    )
    return joined.select(
        signups["user_id"].alias("user_id"), "signup_event", "purchase_event"
    ).orderBy("user_id", "signup_event", "purchase_event")
