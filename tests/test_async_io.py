"""Async I/O / broadcast state / queryable state tests (§2.10 tail)."""

from __future__ import annotations

import asyncio
import time

from pyspark.sql import functions as F

from fries_flink_spark.streaming.async_io import (
    BroadcastState,
    as_queryable_state,
    async_lookup,
)


def test_async_lookup_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "x long")

    async def enrich(row):
        await asyncio.sleep(0.001 * (row["x"] % 3))  # out-of-order completion
        return {"y": row["x"] * 10}

    out = async_lookup(df, enrich, "x long, y long")
    rows = out.collect()
    assert sorted((r.x, r.y) for r in rows) == [(i, i * 10) for i in range(20)]


def test_broadcast_state_refresh(spark):
    bs = BroadcastState(spark)
    assert bs.value == {}
    bs.refresh({"threshold": 5})
    df = spark.createDataFrame([(3,), (7,)], "x long")
    thr = bs.value["threshold"]
    assert df.filter(F.col("x") > thr).count() == 1
    bs.refresh({"threshold": 0})
    assert df.filter(F.col("x") > bs.value["threshold"]).count() == 2


def test_queryable_state(spark):
    src = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
    agg = src.groupBy().agg(F.count(F.lit(1)).alias("n"))
    q = as_queryable_state(agg, "qstate_test", "complete")
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT n FROM qstate_test").collect()
            if rows and rows[0].n > 0:
                n = rows[0].n
                break
            time.sleep(0.3)
        assert n > 0, "queryable state never observed"
    finally:
        q.stop()
