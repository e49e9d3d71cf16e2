"""Temporal join tests (reference TemporalJoinITCase model)."""

from __future__ import annotations

import shutil
import time
from datetime import datetime

from pyspark.sql import functions as F

from fries_flink_spark.streaming.sources import stream_from_df
from fries_flink_spark.streaming.temporal import (
    temporal_join_proctime,
    temporal_join_rowtime,
)


def _ts(h):
    return datetime(2024, 1, 1, h)


def test_rowtime_temporal_join_picks_valid_version(spark):
    facts = spark.createDataFrame(
        [(1, _ts(1), 100.0), (1, _ts(5), 200.0), (2, _ts(3), 50.0)],
        "k long, ts timestamp, amount double",
    )
    versions = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(4), 2.0), (2, _ts(9), 9.0)],
        "k long, vts timestamp, rate double",
    )
    out = temporal_join_rowtime(facts, versions, "k", "ts", "vts")
    got = {(r.k, r.ts.hour): r.rate for r in out.collect()}
    # fact@1h sees version@0h; fact@5h sees version@4h; fact@3h (k=2) has no
    # version valid yet -> NULL (left temporal join, reference semantics)
    assert got == {(1, 1): 1.0, (1, 5): 2.0, (2, 3): None}


def test_rowtime_temporal_join_keeps_duplicate_facts(spark):
    """Two IDENTICAL fact rows must each produce an output row (multiset
    semantics, reference TemporalRowTimeJoinOperator) — a version-picking
    window partitioned by all fact columns would collapse them to one."""
    facts = spark.createDataFrame(
        [(1, _ts(5), 100.0), (1, _ts(5), 100.0), (1, _ts(5), 100.0)],
        "k long, ts timestamp, amount double",
    )
    versions = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(4), 2.0)],
        "k long, vts timestamp, rate double",
    )
    out = temporal_join_rowtime(facts, versions, "k", "ts", "vts").collect()
    assert len(out) == 3
    assert all(r.rate == 2.0 for r in out)


def test_proctime_temporal_join_sees_epoch_snapshot(spark, sf_dir):
    """The dim snapshot changes between epochs; each batch must join against
    the version current at its own epoch."""
    from fries_flink_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").limit(100).select("event_id", "event_type")
    sdf, stage = stream_from_df(ev, n_chunks=3, order_col="event_id")
    seen: list[tuple[int, set]] = []

    def dim_loader(epoch_id: int):
        return spark.createDataFrame(
            [("click", f"v{epoch_id}"), ("purchase", f"v{epoch_id}")],
            "event_type string, dim_version string",
        )

    def sink(df, epoch_id):
        seen.append((epoch_id, {r.dim_version for r in df.collect() if r.dim_version}))

    q = temporal_join_proctime(sdf, dim_loader, ["event_type"], sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(stage, ignore_errors=True)
    assert seen
    for epoch_id, versions in seen:
        assert versions <= {f"v{epoch_id}"}, (epoch_id, versions)
