"""Event-time-ordered streaming sort (streaming/sort.py vs reference
RowTimeSortOperator.java): out-of-order replay must emit in rowtime order."""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from fries_flink_spark.streaming.sort import event_time_sorted
from fries_flink_spark.streaming.sources import stream_from_df
from fries_flink_spark.streaming.windows import run_to_completion


def _jit(i):
    # bounded disorder: rowtime = arrival ± 3s, well inside the 10s watermark
    # delay (disorder beyond the delay is dropped as late on both engines —
    # reference RowTimeSortOperator late-row drop; see streaming/sort.py)
    return (i * 7) % 7 - 3


def _mk_events(spark, n=120):
    base = datetime(2024, 1, 1)
    rows = [
        (i // 30, base + timedelta(seconds=i + _jit(i)), float(i))
        for i in range(n)
    ]
    # TWO trailing sentinel chunks (far-future rowtime): Spark's watermark is
    # one batch late, so the first sentinel batch flushes everything up to
    # max(real_ts) - delay and the second flushes the remainder — the
    # bounded-replay analog of Flink's end-of-input MAX_WATERMARK.
    rows.append((4, base + timedelta(hours=2), -1.0))
    rows.append((5, base + timedelta(hours=2, seconds=1), -2.0))
    return spark.createDataFrame(rows, "chunkno long, ts timestamp, value double")


def test_event_time_sorted_emission_order(spark):
    ev = _mk_events(spark)
    sdf, stage = stream_from_df(ev, n_chunks=6, order_col="chunkno")
    try:
        out = event_time_sorted(
            sdf.withWatermark("ts", "10 seconds"),
            ts_col="ts",
            payload_cols=["value"],
        )
        run_to_completion(out, "stream_sorted", "append")
        got = (
            spark.sql("SELECT * FROM stream_sorted WHERE value >= 0")
            .orderBy("emit_idx")
            .collect()
        )
        # every real row emitted exactly once (sentinel may stay buffered)
        assert len(got) == 120
        assert sorted(r.emit_idx for r in got) == list(range(120))
        # emission order IS event-time order, ties resolved stably
        ts_seq = [r.ts_ms for r in got]
        assert ts_seq == sorted(ts_seq)
        # and the values are the right rows: rowtime (i + jitter) sorted,
        # arrival order breaking ties
        want = [float(i) for i in sorted(range(120), key=lambda i: (i + _jit(i), i))]
        assert [r.value for r in got] == want
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_event_time_sorted_keyed(spark):
    base = datetime(2024, 1, 1)
    rows = [
        (i // 20, "ab"[i % 2], base + timedelta(seconds=i + _jit(i)), float(i))
        for i in range(60)
    ]
    rows += [(3, "a", base + timedelta(hours=2), -1.0),
             (3, "b", base + timedelta(hours=2), -1.0),
             (4, "a", base + timedelta(hours=2, seconds=1), -2.0),
             (4, "b", base + timedelta(hours=2, seconds=1), -2.0)]
    ev = spark.createDataFrame(rows, "chunkno long, k string, ts timestamp, value double")
    sdf, stage = stream_from_df(ev, n_chunks=5, order_col="chunkno")
    try:
        out = event_time_sorted(
            sdf.withWatermark("ts", "8 seconds"),
            ts_col="ts",
            payload_cols=["value"],
            key_cols=["k"],
        )
        run_to_completion(out, "stream_sorted_keyed", "append")
        for key in ("a", "b"):
            got = (
                spark.sql(
                    f"SELECT * FROM stream_sorted_keyed WHERE k = '{key}' AND value >= 0"
                )
                .orderBy("emit_idx")
                .collect()
            )
            assert len(got) == 30
            ts_seq = [r.ts_ms for r in got]
            assert ts_seq == sorted(ts_seq)
            assert [r.emit_idx for r in got] == list(range(30))
    finally:
        shutil.rmtree(stage, ignore_errors=True)
