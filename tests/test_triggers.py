"""Trigger/evictor semantics on hand-built frames (operators/triggers.py).

Reference semantics pinned: CountTrigger.java:38 (fire every n elements,
accumulating), PurgingTrigger.java:36 (disjoint panes), CountEvictor.java:40
(keep last n), TimeEvictor.java:42 (keep within Δ of window max),
DeltaEvictor.java:44 (delta against last buffered element).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.operators.triggers import (
    count_evictor_agg,
    count_trigger_fires,
    count_trigger_purging,
    delta_evictor_agg,
    time_evictor_agg,
)


def _events(spark):
    # one 60s window [0, 60): 5 elements; second window [60, 120): 2 elements
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(seconds=1), 10.0),
        (2, base + dt.timedelta(seconds=5), 20.0),
        (3, base + dt.timedelta(seconds=9), 30.0),
        (4, base + dt.timedelta(seconds=20), 40.0),
        (5, base + dt.timedelta(seconds=50), 50.0),
        (6, base + dt.timedelta(seconds=70), 60.0),
        (7, base + dt.timedelta(seconds=80), 70.0),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, value double")


def test_count_trigger_accumulating_fires(spark):
    out = count_trigger_fires(
        _events(spark),
        ts="ts",
        tie_col="id",
        key_cols=[],
        size_s=60,
        n=2,
        aggs=[("n_so_far", "count", "value"), ("total", "sum", "value")],
    ).orderBy("w_start", "fire_seq")
    rows = [r.asDict() for r in out.collect()]
    # window 0: fires at elements 2, 4 (n=2) and final element 5
    # window 1: fires at element 2 (also the final element) — ONE row
    assert [(r["w_start"] - 1704067200, r["fire_seq"], r["n_so_far"], r["total"]) for r in rows] == [
        (0, 1, 2, 30.0),
        (0, 2, 4, 100.0),
        (0, 3, 5, 150.0),
        (60, 1, 2, 130.0),
    ]


def test_count_trigger_purging_panes_are_disjoint(spark):
    out = count_trigger_purging(
        _events(spark),
        ts="ts",
        tie_col="id",
        key_cols=[],
        size_s=60,
        n=2,
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
    ).orderBy("w_start", "pane")
    got = [(r["w_start"] - 1704067200, r["pane"], r["n"], r["total"]) for r in out.collect()]
    assert got == [(0, 0, 2, 30.0), (0, 1, 2, 70.0), (0, 2, 1, 50.0), (60, 0, 2, 130.0)]
    # panes partition the window: total over panes == plain window total
    assert sum(t for _, _, _, t in got) == 280.0


def test_count_evictor_keeps_last_n(spark):
    out = count_evictor_agg(
        _events(spark),
        ts="ts",
        tie_col="id",
        key_cols=[],
        size_s=60,
        keep_n=2,
        aggs=[F.sum("value").alias("total"), F.count(F.lit(1)).alias("n")],
    ).orderBy("w_start")
    got = [(r["w_start"] - 1704067200, r["n"], r["total"]) for r in out.collect()]
    # window 0 keeps elements 4,5 (last two); window 1 has only 2 elements
    assert got == [(0, 2, 90.0), (60, 2, 130.0)]


def test_time_evictor_keeps_recent(spark):
    out = time_evictor_agg(
        _events(spark),
        ts="ts",
        key_cols=[],
        size_s=60,
        keep_s=35,
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
    ).orderBy("w_start")
    got = [(r["w_start"] - 1704067200, r["n"], r["total"]) for r in out.collect()]
    # window 0 max=50 → keep sec > 15: elements at 20, 50
    assert got == [(0, 2, 90.0), (60, 2, 130.0)]


def test_delta_evictor_filters_against_last(spark):
    out = delta_evictor_agg(
        _events(spark),
        ts="ts",
        tie_col="id",
        key_cols=[],
        size_s=60,
        value_col="value",
        threshold=25.0,
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
    ).orderBy("w_start")
    got = [(r["w_start"] - 1704067200, r["n"], r["total"]) for r in out.collect()]
    # window 0 last=50 → keep |v-50|<25: 30, 40, 50
    assert got == [(0, 3, 120.0), (60, 2, 130.0)]


def test_count_trigger_rejects_unknown_kind(spark):
    with pytest.raises(KeyError):
        count_trigger_fires(
            _events(spark), "ts", "id", [], 60, 2, [("a", "avg", "value")]
        )
