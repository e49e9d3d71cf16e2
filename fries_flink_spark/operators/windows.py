"""Time-window operators: TUMBLE / HOP / SESSION / CUMULATE (SURVEY §2.5).

Reference: window TVFs TUMBLE/HOP/CUMULATE (FlinkSqlOperatorTable.java:1181-1183,
sliced execution at .../window/slicing/SlicingWindowOperator.java:96), legacy
group windows Tumble/Slide/Session (Tumble.java:43 etc.), session windows
(EventTimeSessionWindows.java:46).

Spark-first mapping:
- TUMBLE/HOP → built-in ``F.window(ts, size[, slide])`` (streaming & batch).
- SESSION    → built-in ``F.session_window(ts, gap)``.
- CUMULATE   → no native analog: implemented as an explode over the step
  multiples each row belongs to — row lands in windows [w_start, w_start+k*step)
  for k = ceil((ts - w_start)/step) .. max_size/step. This replicates rows
  ≤ (max_size/step)× like Flink's non-sliced fallback; at 100 TB the
  aggregation should be pushed per-step first (partial agg per tumble(step),
  then re-aggregated) — ``cumulate_agg`` below does exactly that two-level
  plan so the explode happens on pre-aggregated slices, not raw rows (the
  same trick as Flink's slice-sharing SlicingWindowOperator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts: str, size: str) -> DataFrame:
    """Assign tumbling windows; adds window_start/window_end columns."""
    w = F.window(F.col(ts), size)
    return df.withColumn("window_start", w.start).withColumn("window_end", w.end)


def hop(df: DataFrame, ts: str, size: str, slide: str) -> DataFrame:
    """Assign hopping (sliding) windows; one output row per covering window."""
    w = F.window(F.col(ts), size, slide)
    return df.withColumn("window_start", w.start).withColumn("window_end", w.end)


def session(df: DataFrame, ts: str, gap: str) -> Column:
    """Session window column (merge rows separated by < gap)."""
    return F.session_window(F.col(ts), gap)


def cumulate_agg(
    df: DataFrame,
    ts: str,
    max_size: str,
    step: str,
    group_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """CUMULATE window aggregation, two-level (slice-shared) plan.

    Semantics (Flink CUMULATE TVF): windows [w, w+step), [w, w+2*step), …,
    [w, w+max_size) for each max_size-aligned w; a row with timestamp t in
    [w, w+max_size) belongs to every window whose end exceeds t.

    Plan: (1) partial-aggregate rows into `step` tumbles — the slices;
    (2) explode each slice to the cumulate windows it feeds (≤ max/step);
    (3) final-aggregate slices per (window_start, window_end).
    ``aggs`` maps output name → (aggregate Column over the ORIGINAL columns,
    re-agg kind ∈ {"sum","min","max"}) — count partials re-aggregate via sum,
    so pass "sum" for counts. Only decomposable aggregates qualify (same
    restriction as Flink's sliced window path).
    """
    step_s = F.expr(f"INTERVAL {step}")
    # slice = step-tumble window
    sliced = (
        df.groupBy(F.window(F.col(ts), step).alias("__slice"), *group_cols)
        .agg(*[c.alias(n) for n, (c, _) in aggs.items()])
    )
    max_expr = F.unix_timestamp(F.expr(f"timestamp '1970-01-01' + INTERVAL {max_size}"))
    step_expr = F.unix_timestamp(F.expr(f"timestamp '1970-01-01' + INTERVAL {step}"))
    # window_start = floor(slice_start / max_size); slice feeds windows ending
    # at slice_end, slice_end+step, ... up to window_start+max_size
    sliced = sliced.withColumn(
        "__w_start",
        F.timestamp_seconds(
            (F.unix_timestamp(F.col("__slice.start")) / max_expr).cast("long")
            * max_expr
        ).cast("timestamp_ntz"),
    )
    sliced = sliced.withColumn(
        "window_end",
        F.explode(
            F.sequence(
                F.unix_timestamp(F.col("__slice.end")),
                F.unix_timestamp(F.col("__w_start")) + max_expr,
                step_expr,
            )
        ),
    ).withColumn("window_end", F.timestamp_seconds(F.col("window_end")).cast("timestamp_ntz"))
    refns = {"sum": F.sum, "min": F.min, "max": F.max}
    re_aggs = [refns[kind](n).alias(n) for n, (_, kind) in aggs.items()]
    return (
        sliced.groupBy(F.col("__w_start").alias("window_start"), "window_end", *group_cols)
        .agg(*re_aggs)
    )


def hop_agg_sliced(
    df: DataFrame,
    ts: str,
    size_s: int,
    slide_s: int,
    group_cols: list[str],
    aggs: list[tuple[str, str, str]],
) -> DataFrame:
    """Sliced HOP aggregation — the reference's SlicingWindowOperator.java:96
    strategy, which Spark's ``window(ts, size, slide)`` lacks: the built-in
    replicates EVERY ROW into size/slide windows before aggregating, so a
    1-hour window sliding by 1 minute inflates the shuffle 60×. Here rows
    aggregate once into non-overlapping gcd(size, slide)-wide slices
    (partial agg, map-side combined), and only the tiny per-slice partials
    replicate into their covering windows for the final roll-up.

    ``aggs``: (out_name, kind, col) with kind ∈ sum|count|min|max — the
    algebraic aggregates that decompose over slices (avg = sum/count at the
    call site). Window starts are epoch-aligned multiples of ``slide_s``;
    output column ``w_start`` is the window start in epoch seconds.
    """
    import math

    g = math.gcd(size_s, slide_s)
    partials = []
    finals = []
    for name, kind, col in aggs:
        if kind == "count":
            partials.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "sum":
            partials.append(F.sum(col).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(col).alias(f"__p_{name}"))
            finals.append(F.min(f"__p_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(col).alias(f"__p_{name}"))
            finals.append(F.max(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate kind: {kind}")

    slices = df.groupBy(
        F.window(F.col(ts), f"{g} seconds").alias("__slice"), *group_cols
    ).agg(*partials)
    s = F.unix_timestamp(F.col("__slice.start"))
    s_aligned = F.floor(s / slide_s) * slide_s
    n_back = (size_s - g) // slide_s
    w = (s_aligned - F.col("__i") * slide_s).alias("w_start")
    return (
        slices.select(
            "*", F.explode(F.array(*[F.lit(i) for i in range(n_back + 1)])).alias("__i")
        )
        .select(w, s.alias("__s"), *group_cols, *[f"__p_{n}" for n, _, _ in aggs])
        .filter(F.col("w_start") >= F.col("__s") + g - size_s)
        .groupBy("w_start", *group_cols)
        .agg(*finals)
    )


def dynamic_session_agg(
    df: DataFrame,
    ts: str,
    key_cols: list[str],
    gap_s,
    aggs: list[Column],
) -> DataFrame:
    """Session windows with a per-row DYNAMIC gap (reference
    DynamicEventTimeSessionWindows.java — Spark's session_window only takes a
    constant gap... in the DataFrame API; SQL session_window accepts an
    expression, but not one over the previous row, which Flink's dynamic gap
    extractor allows).

    ``gap_s``: a Column of seconds — a row starts a new session when its
    event-time distance to the PREVIOUS row exceeds the previous row's gap.
    Classic two-pass formulation: lag + running sum of session-start flags
    (one shuffle on the key, two window passes, fully codegen'd).
    Emits key cols + session_start/session_end epoch seconds + aggregates.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy(F.col(ts))
    sec = F.unix_timestamp(F.col(ts))
    prev_ts = F.lag(sec).over(w)
    prev_gap = F.lag(gap_s).over(w)
    new_session = F.when(
        prev_ts.isNull() | ((sec - prev_ts) > prev_gap), 1
    ).otherwise(0)
    sessionized = df.withColumn("__new", new_session).withColumn(
        "__sid", F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sessionized.groupBy(*key_cols, "__sid")
        .agg(
            F.min(sec).alias("session_start"),
            F.max(sec).alias("session_end"),
            *aggs,
        )
        .drop("__sid")
    )
