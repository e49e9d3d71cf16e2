"""SQL-string queries (SURVEY §3.1): the reference's primary entry point —
``TableEnvironment.sqlQuery`` (TableEnvironmentImpl.java:703) — exercised
through ``spark.sql`` over registered views. Everything below rides Catalyst's
parse → analyze → optimize → codegen pipeline; the rewrites involved
(grouping-sets decomposition, subquery decorrelation, window grouping) are the
ones SURVEY §4.1 maps from the Blink planner.
"""

from __future__ import annotations

from ..catalog import register_tables
from ..registry import query


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def sql_grouping_sets(spark, sf_dir):
    """GROUPING SETS + grouping() via SQL string (reference
    DecomposeGroupingSetsRule.scala:205 → Catalyst Expand, automatic)."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               count(*) AS n,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "sql_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def sql_exists_subquery(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS — decorrelated to semi/anti joins by
    Catalyst (reference FlinkSubQueryRemoveRule, SURVEY §4.1)."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey
        """
    )


@query(
    "sql_window_tvf",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def sql_window_tvf(spark, sf_dir):
    """TUMBLE window via SQL (reference window TVFs,
    FlinkSqlOperatorTable.java:1181): Spark's window() grouping expression."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT window.start AS w_start, event_type,
               count(*) AS n, round(sum(value), 4) AS total
        FROM events
        GROUP BY window(ts, '15 minutes'), event_type
        ORDER BY w_start, event_type
        """
    )
