"""Trigger / evictor semantics over event-time windows (SURVEY §2.5 gap).

Reference: flink-streaming-java/src/main/java/org/apache/flink/streaming/api/
windowing/triggers/ (CountTrigger.java:38, ContinuousEventTimeTrigger.java:42,
PurgingTrigger.java:36, DeltaTrigger.java:44) and .../windowing/evictors/
(CountEvictor.java:40, TimeEvictor.java:42, DeltaEvictor.java:44).

Spark has no trigger/evictor DSL — its streaming emission policy is the output
mode + micro-batch trigger, and window contents are never user-prunable. But
every one of the reference's trigger/evictor behaviors has a DETERMINISTIC
event-time rendition, and those are plain DataFrame plans:

- CountTrigger(n) on a window   → one output row per n-th element of the
  window, carrying aggregates over the elements seen so far (accumulating
  fire): a running-frame over-window + a fire-row filter. No extra shuffle
  beyond the one the over-window pays; everything codegen.
- PurgingTrigger(CountTrigger)  → the fired panes are disjoint: bin elements
  by ``(arrival_rank - 1) div n`` and group-aggregate per bin.
- ContinuousEventTimeTrigger(i) → accumulating fires every ``i`` of event
  time == CUMULATE with step=i, max_size=window (operators/windows.
  cumulate_agg is the slice-shared implementation; ``continuous_fires``
  below is that equivalence spelled out).
- CountEvictor(keep_n)          → the window function sees only the LAST
  keep_n elements: rank-from-end filter before the aggregate.
- TimeEvictor(keep)             → keep elements within ``keep`` of the
  window's max timestamp: windowed max + filter.
- DeltaEvictor(θ, delta)        → keep elements whose delta against the
  window's LAST element is < θ: windowed last_value + filter.

Arrival order is event-time order (ties broken on a caller-named unique
column) — the only deterministic reading of Flink's processing-order
count/evictor semantics, and the one its event-time tests pin down.

At 100 TB: each helper is one shuffle on (key, window) — the same exchange
the plain windowed aggregate pays; evictor filters are codegen'd expressions
on top. The over-window variants keep per-partition state bounded by the
window contents exactly like the reference's pane state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _win_start(ts: str, size_s: int) -> Column:
    return (F.floor(F.unix_timestamp(F.col(ts)) / size_s) * size_s).cast("long")


def count_trigger_fires(
    df: DataFrame,
    ts: str,
    tie_col: str,
    key_cols: list[str],
    size_s: int,
    n: int,
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Accumulating CountTrigger(n): every n-th element of each (key, tumble)
    window emits the aggregates over the window's elements SO FAR, plus a
    final fire at window close (EventTimeTrigger) if elements remain.

    ``aggs``: (out_name, kind, col), kind ∈ sum|count|min|max — running
    renditions exist for exactly the aggregates whose frame extension is
    monotone (same set the reference's incremental pane aggregation handles
    via ReduceFunction).
    Output: key cols, ``w_start`` (epoch s), ``fire_seq`` (1-based fire
    number), ``fired_at`` (epoch s of the firing element), aggregates.
    """
    w = _win_start(ts, size_s)
    order = [F.col(ts), F.col(tie_col)]
    part = Window.partitionBy(F.col("__w"), *[F.col(c) for c in key_cols])
    running = part.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    whole = part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    fns = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    out = df.withColumn("__w", w)
    for name, kind, col in aggs:
        out = out.withColumn(name, fns[kind](col).over(running))
    out = (
        out.withColumn("__rn", F.row_number().over(part.orderBy(*order)))
        .withColumn("__cnt", F.count(F.lit(1)).over(whole))
        # a final fire coinciding with an n-th-element fire is one row, one
        # emission — same as the reference (FIRE, then window GC finds no state)
        .filter((F.col("__rn") % n == 0) | (F.col("__rn") == F.col("__cnt")))
    )
    return out.select(
        *key_cols,
        F.col("__w").alias("w_start"),
        F.ceil(F.col("__rn") / n).cast("long").alias("fire_seq"),
        F.unix_timestamp(F.col(ts)).alias("fired_at"),
        *[F.col(name) for name, _, _ in aggs],
    )


def count_trigger_purging(
    df: DataFrame,
    ts: str,
    tie_col: str,
    key_cols: list[str],
    size_s: int,
    n: int,
    aggs: list[Column],
) -> DataFrame:
    """PurgingTrigger(CountTrigger(n)): each fire PURGES the pane, so fired
    panes partition the window's elements into disjoint n-sized bins (the
    trailing bin may be short — it fires at window close).

    Output: key cols, ``w_start``, ``pane`` (0-based bin), aggregates.
    """
    part = Window.partitionBy(F.col("__w"), *[F.col(c) for c in key_cols]).orderBy(
        F.col(ts), F.col(tie_col)
    )
    return (
        df.withColumn("__w", _win_start(ts, size_s))
        .withColumn("__pane", ((F.row_number().over(part) - 1) / n).cast("long"))
        .groupBy(F.col("__w").alias("w_start"), *key_cols, F.col("__pane").alias("pane"))
        .agg(*aggs)
    )


def continuous_fires(
    df: DataFrame,
    ts: str,
    key_cols: list[str],
    size: str,
    interval: str,
    aggs: dict,
) -> DataFrame:
    """ContinuousEventTimeTrigger(interval) over a ``size`` tumble window ==
    CUMULATE(step=interval, max_size=size): accumulating fires at every
    event-time interval boundary. Delegates to the slice-shared cumulate
    plan (reference ContinuousEventTimeTrigger.java:42 registers exactly
    these boundary timers)."""
    from .windows import cumulate_agg

    return cumulate_agg(df, ts, size, interval, key_cols, aggs)


def count_evictor_agg(
    df: DataFrame,
    ts: str,
    tie_col: str,
    key_cols: list[str],
    size_s: int,
    keep_n: int,
    aggs: list[Column],
) -> DataFrame:
    """CountEvictor(keep_n): the window aggregate sees only the last
    ``keep_n`` elements (event-time order) of each (key, tumble) window."""
    part = Window.partitionBy(F.col("__w"), *[F.col(c) for c in key_cols]).orderBy(
        F.col(ts).desc(), F.col(tie_col).desc()
    )
    return (
        df.withColumn("__w", _win_start(ts, size_s))
        .withColumn("__rev", F.row_number().over(part))
        .filter(F.col("__rev") <= keep_n)
        .groupBy(F.col("__w").alias("w_start"), *key_cols)
        .agg(*aggs)
    )


def time_evictor_agg(
    df: DataFrame,
    ts: str,
    key_cols: list[str],
    size_s: int,
    keep_s: int,
    aggs: list[Column],
) -> DataFrame:
    """TimeEvictor(keep_s): evict elements older than ``max(ts) - keep_s``
    within each (key, tumble) window before aggregating (reference
    TimeEvictor.java:42 computes currentTime - windowSize from the max
    element timestamp the same way)."""
    part = Window.partitionBy(F.col("__w"), *[F.col(c) for c in key_cols])
    sec = F.unix_timestamp(F.col(ts))
    return (
        df.withColumn("__w", _win_start(ts, size_s))
        .withColumn("__mx", F.max(sec).over(part))
        .filter(sec > F.col("__mx") - keep_s)
        .groupBy(F.col("__w").alias("w_start"), *key_cols)
        .agg(*aggs)
    )


def delta_evictor_agg(
    df: DataFrame,
    ts: str,
    tie_col: str,
    key_cols: list[str],
    size_s: int,
    value_col: str,
    threshold: float,
    aggs: list[Column],
) -> DataFrame:
    """DeltaEvictor(threshold, |Δ|): keep elements whose absolute value-delta
    against the window's LAST element (event-time order) is < threshold, then
    aggregate (reference DeltaEvictor.java:44 evaluates the delta function
    against the last buffered element)."""
    part = (
        Window.partitionBy(F.col("__w"), *[F.col(c) for c in key_cols])
        .orderBy(F.col(ts), F.col(tie_col))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        df.withColumn("__w", _win_start(ts, size_s))
        .withColumn("__last", F.last(value_col).over(part))
        .filter(F.abs(F.col(value_col) - F.col("__last")) < threshold)
        .groupBy(F.col("__w").alias("w_start"), *key_cols)
        .agg(*aggs)
    )
