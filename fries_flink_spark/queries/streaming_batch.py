"""Event-time window queries over the events table, batch-oracled (SURVEY §2.5).

These are the batch renditions of the reference's streaming window operators —
the driver's oracle protocol for streaming ops is "run the same logic in batch
over the full events table" (FIXTURES.md). The true streaming versions
(readStream + watermark + the same window exprs) live in
fries_flink_spark/streaming/ and are pytest-verified against these results.

Reference: WindowOperator.java:96 (legacy group windows), SliceAssigners.java:43
(TUMBLE/HOP/CUMULATE TVF slicing), EventTimeSessionWindows.java:46,
StreamPhysicalWindowRank.scala (window Top-N).

Window timestamps are emitted as epoch seconds (bigint) so the oracle compare
is representation-proof.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.windows import cumulate_agg
from ..registry import micro, query, sorted_result


def _ev(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@query(
    "win_tumble",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS w_start,
           event_type,
           count(*)  AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total,
           min(value) AS mn, max(value) AS mx
    FROM events
    GROUP BY 1, 2
    """,
)
def win_tumble(spark, sf_dir):
    """5-minute TUMBLE aggregation (reference TumbleSliceAssigner)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            micro(F.sum("value"), 4).alias("total"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            "event_type",
            "n",
            "total",
            "mn",
            "mx",
        )
    )


@query(
    "win_hop",
    oracle="""
    SELECT CAST((floor(epoch(ts) / 300) - g.k) * 300 AS BIGINT) AS w_start,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM events, generate_series(0, 1) AS g(k)
    GROUP BY 1
    """,
)
def win_hop(spark, sf_dir):
    """10-minute windows sliding every 5 minutes via SLICED execution
    (reference SlicingWindowOperator.java:96 / HopSliceAssigner): rows
    aggregate once into gcd-width slices, only per-slice partials replicate
    into covering windows — Spark's built-in window(size, slide) would
    replicate every raw row size/slide times instead (operators/windows.
    hop_agg_sliced). The oracle enumerates the covering windows per row."""
    from ..operators.windows import hop_agg_sliced

    ev = _ev(spark, sf_dir)
    return hop_agg_sliced(
        ev,
        "ts",
        size_s=600,
        slide_s=300,
        group_cols=[],
        aggs=[("n", "count", ""), ("total", "sum", "value")],
    ).withColumn("total", micro(F.col("total"), 4))


@query(
    "win_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT)                   AS session_start,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def win_session(spark, sf_dir):
    """SESSION windows, 30-minute gap (reference EventTimeSessionWindows.java:46,
    merging assigner). Spark: built-in session_window — gap-merge semantics are
    identical to the oracle's lag/cumsum sessionization."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), micro(F.sum("value"), 4).alias("total"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n",
            "total",
        )
    )


@query(
    "win_cumulate",
    oracle="""
    WITH slices AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             CAST(floor(epoch(ts) / 900) * 900 + 900 AS BIGINT) AS slice_end,
             value
      FROM events
    )
    SELECT w_start,
           w_start + g.k * 900 AS w_end,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM slices, generate_series(1, 4) AS g(k)
    WHERE slice_end <= w_start + g.k * 900
    GROUP BY 1, 2
    """,
)
def win_cumulate(spark, sf_dir):
    """CUMULATE windows: 1-hour max span growing in 15-minute steps (reference
    CumulativeSliceAssigner, FlinkSqlOperatorTable CUMULATE TVF). Implemented
    with the slice-shared two-level plan in operators/windows.cumulate_agg."""
    ev = _ev(spark, sf_dir)
    out = cumulate_agg(
        ev,
        ts="ts",
        max_size="1 HOUR",
        step="15 MINUTE",
        group_cols=[],
        aggs={
            "n": (F.count(F.lit(1)), "sum"),
            "total": (F.sum("value"), "sum"),
        },
    )
    return out.select(
        F.unix_timestamp("window_start").alias("w_start"),
        F.unix_timestamp("window_end").alias("w_end"),
        "n",
        micro(F.col("total"), 4).alias("total"),
    )


@query(
    "win_topn",
    oracle="""
    SELECT w_start, event_type, event_id, value, rk FROM (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type, event_id, value,
             row_number() OVER (
               PARTITION BY CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT),
                            event_type
               ORDER BY value DESC, event_id) AS rk
      FROM events
    ) WHERE rk <= 3
    ORDER BY w_start, event_type, rk
    """,
)
def win_topn(spark, sf_dir):
    """Window Top-N (reference StreamPhysicalWindowRank.scala /
    WindowRankITCase): top-3 events by value per hour per type."""
    ev = _ev(spark, sf_dir)
    with_w = ev.withColumn(
        "w_start", F.unix_timestamp(F.window("ts", "1 hour").start)
    )
    w = Window.partitionBy("w_start", "event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    return (
        with_w.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("w_start", "event_type", "event_id", "value", "rk")
        .orderBy("w_start", "event_type", "rk")
    )


@query(
    "win_grouped_user_day",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY 1, 2
    """,
)
def win_grouped_user_day(spark, sf_dir):
    """Daily per-user rollup — the bread-and-butter streaming agg shape
    (reference GroupAggFunction.java:43) in batch form."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        micro(F.sum("value"), 4).alias("total"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "win_session_dynamic",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'error' THEN 600 ELSE 1800 END AS gap_s
      FROM events),
    flagged AS (
      SELECT user_id, ts, value, gap_s,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w)
                       > lag(gap_s) OVER w
                  THEN 1 ELSE 0 END AS new_session
      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def win_session_dynamic(spark, sf_dir):
    """Session windows with per-row dynamic gap (reference
    DynamicEventTimeSessionWindows): error events shorten the gap to 10
    minutes, everything else 30 — operators/windows.dynamic_session_agg."""
    from ..operators.windows import dynamic_session_agg

    ev = _ev(spark, sf_dir)
    gap = F.when(F.col("event_type") == "error", 600).otherwise(1800)
    out = dynamic_session_agg(
        ev.withColumn("__gap", gap),
        "ts",
        ["user_id"],
        F.col("__gap"),
        [F.count(F.lit(1)).alias("n"), micro(F.sum("value"), 4).alias("total")],
    )
    return out.select(
        "user_id", "session_start", "session_end", "n", "total"
    ).transform(sorted_result, "user_id", "session_start")
