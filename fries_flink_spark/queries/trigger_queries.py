"""Trigger / evictor queries over the events table (SURVEY §2.5).

Batch-deterministic renditions of the reference's window triggers/evictors
(flink-streaming-java .../windowing/triggers/CountTrigger.java:38,
PurgingTrigger.java:36, ContinuousEventTimeTrigger.java:42,
.../evictors/CountEvictor.java:40, TimeEvictor.java:42, DeltaEvictor.java:44)
— see operators/triggers.py for the semantics mapping.

Float hygiene: running/filtered sums go through ``floor(value*100)`` cents
(integer, summation-order-free) so the oracle compare is exact regardless of
either engine's windowed-aggregation tree shape; min/max are order-free
already.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.triggers import (
    continuous_fires,
    count_evictor_agg,
    count_trigger_fires,
    count_trigger_purging,
    delta_evictor_agg,
    time_evictor_agg,
)
from ..registry import micro, query


def _ev(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    return df.withColumn("cents", F.floor(F.col("value") * 100).cast("long"))


@query(
    "trig_count_fires",
    oracle="""
    WITH base AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             value, ts
      FROM events
    ), ranked AS (
      SELECT w_start, event_type, sec, cents, value,
             row_number() OVER (PARTITION BY w_start, event_type
                                ORDER BY ts, event_id) AS rn,
             count(*)    OVER (PARTITION BY w_start, event_type) AS cnt,
             sum(cents)  OVER (PARTITION BY w_start, event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS total_cents,
             count(*)    OVER (PARTITION BY w_start, event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS n_so_far,
             max(value)  OVER (PARTITION BY w_start, event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                              ) AS mx
      FROM base
    )
    SELECT event_type, w_start,
           CAST(ceil(rn / 25.0) AS BIGINT) AS fire_seq,
           sec AS fired_at, n_so_far, CAST(total_cents AS BIGINT) AS total_cents, mx
    FROM ranked
    WHERE rn % 25 = 0 OR rn = cnt
    """,
)
def trig_count_fires(spark, sf_dir):
    """Accumulating CountTrigger(25) on 1-hour tumbles keyed by event_type:
    every 25th element (event-time order, event_id tiebreak) fires the
    running aggregates; the window's final element always fires (reference
    CountTrigger.java:38 inside EventTimeTrigger window close)."""
    ev = _ev(spark, sf_dir)
    out = count_trigger_fires(
        ev,
        ts="ts",
        tie_col="event_id",
        key_cols=["event_type"],
        size_s=3600,
        n=25,
        aggs=[
            ("n_so_far", "count", "cents"),
            ("total_cents", "sum", "cents"),
            ("mx", "max", "value"),
        ],
    )
    return out.select(
        "event_type", "w_start", "fire_seq", "fired_at", "n_so_far", "total_cents", "mx"
    )


@query(
    "trig_count_purging",
    oracle="""
    WITH ranked AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT),
                                             event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT w_start, event_type,
           CAST(floor((rn - 1) / 25) AS BIGINT) AS pane,
           count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
    FROM ranked GROUP BY 1, 2, 3
    """,
)
def trig_count_purging(spark, sf_dir):
    """PurgingTrigger(CountTrigger(25)): disjoint 25-element panes per
    (1-hour window, event_type); the trailing short pane fires at close
    (reference PurgingTrigger.java:36)."""
    ev = _ev(spark, sf_dir)
    return count_trigger_purging(
        ev,
        ts="ts",
        tie_col="event_id",
        key_cols=["event_type"],
        size_s=3600,
        n=25,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        ],
    )


@query(
    "trig_continuous",
    oracle="""
    WITH slices AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             CAST(floor(epoch(ts) / 1200) * 1200 + 1200 AS BIGINT) AS slice_end,
             event_type, value
      FROM events
    )
    SELECT w_start, w_start + g.k * 1200 AS fire_at, event_type,
           count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM slices, generate_series(1, 3) AS g(k)
    WHERE slice_end <= w_start + g.k * 1200
    GROUP BY 1, 2, 3
    """,
)
def trig_continuous(spark, sf_dir):
    """ContinuousEventTimeTrigger(20 min) on 1-hour tumbles == CUMULATE
    (step=20min, max=1h) — accumulating fires at each event-time boundary
    (reference ContinuousEventTimeTrigger.java:42), via the slice-shared
    cumulate plan."""
    ev = load_table(spark, sf_dir, "events")
    out = continuous_fires(
        ev,
        ts="ts",
        key_cols=["event_type"],
        size="1 HOUR",
        interval="20 MINUTE",
        aggs={
            "n": (F.count(F.lit(1)), "sum"),
            "total": (F.sum("value"), "sum"),
        },
    )
    return out.select(
        F.unix_timestamp("window_start").alias("w_start"),
        F.unix_timestamp("window_end").alias("fire_at"),
        "event_type",
        "n",
        micro(F.col("total"), 4).alias("total"),
    )


@query(
    "evict_count",
    oracle="""
    WITH ranked AS (
      SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS w_start,
             event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents, value,
             row_number() OVER (PARTITION BY CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
                                             event_type
                                ORDER BY ts DESC, event_id DESC) AS rev
      FROM events
    )
    SELECT w_start, event_type, count(*) AS n,
           CAST(sum(cents) AS BIGINT) AS total_cents, min(value) AS mn
    FROM ranked WHERE rev <= 3 GROUP BY 1, 2
    """,
)
def evict_count(spark, sf_dir):
    """CountEvictor(3): aggregate only the last 3 elements of each 30-minute
    window per event_type (reference CountEvictor.java:40)."""
    ev = _ev(spark, sf_dir)
    return count_evictor_agg(
        ev,
        ts="ts",
        tie_col="event_id",
        key_cols=["event_type"],
        size_s=1800,
        keep_n=3,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
            F.min("value").alias("mn"),
        ],
    )


@query(
    "evict_time",
    oracle="""
    WITH base AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ), mx AS (
      SELECT w_start, event_type, sec, cents,
             max(sec) OVER (PARTITION BY w_start, event_type) AS max_sec
      FROM base
    )
    SELECT w_start, event_type, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
    FROM mx WHERE sec > max_sec - 600 GROUP BY 1, 2
    """,
)
def evict_time(spark, sf_dir):
    """TimeEvictor(10 min): keep only elements within 10 minutes of the
    window's max timestamp (reference TimeEvictor.java:42)."""
    ev = _ev(spark, sf_dir)
    return time_evictor_agg(
        ev,
        ts="ts",
        key_cols=["event_type"],
        size_s=3600,
        keep_s=600,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        ],
    )


@query(
    "evict_delta",
    oracle="""
    WITH lasts AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents, value,
             last_value(value) OVER (
               PARTITION BY CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT), event_type
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lastv
      FROM events
    )
    SELECT w_start, event_type, count(*) AS n, CAST(sum(cents) AS BIGINT) AS total_cents
    FROM lasts WHERE abs(value - lastv) < 20.0 GROUP BY 1, 2
    """,
)
def evict_delta(spark, sf_dir):
    """DeltaEvictor(20.0, |Δvalue|): keep elements whose value is within 20
    of the window's LAST element before aggregating (reference
    DeltaEvictor.java:44)."""
    ev = _ev(spark, sf_dir)
    return delta_evictor_agg(
        ev,
        ts="ts",
        tie_col="event_id",
        key_cols=["event_type"],
        size_s=3600,
        value_col="value",
        threshold=20.0,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("total_cents"),
        ],
    )
