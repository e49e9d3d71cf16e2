"""Checkpoint recovery / exactly-once file sink (SURVEY §2.10; reference
CheckpointCoordinator.java:96, FileSink exactly-once commit protocol).

The reference's exactly-once story is checkpointed operator state + two-phase
committing sinks. Spark's equivalents are the streaming checkpoint (source
offsets + state store) and the file sink's _spark_metadata commit log. This
test drives a watermarked streaming aggregation into a parquet sink, STOPS
the query mid-stream (half the input processed), restarts a brand-new query
from the same checkpoint, feeds the rest, and asserts the final table equals
the batch rendition with no duplicates and no lost windows — the
kill-and-resume semantics the missing Kafka connector jar would otherwise
exercise end-to-end.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.session import STATE_STORE_PROVIDERS
from fries_flink_spark.streaming.sources import stream_from_table
from fries_flink_spark.streaming.windows import tumble_agg


@pytest.fixture(params=sorted(STATE_STORE_PROVIDERS))
def state_provider(request, spark):
    """Run each recovery test under BOTH state-store providers: RocksDB is
    the documented at-scale choice (session.resolve_state_provider, PERF
    §58), so kill-and-resume must hold under its changelog checkpoint
    format too, not only under HDFSBacked's delta files."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, STATE_STORE_PROVIDERS[request.param])
    yield request.param
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _start(agg, out_dir, ckpt_dir):
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path, state_provider):
    out_dir = str(tmp_path / "sink")
    ckpt_dir = str(tmp_path / "ckpt")
    hold = tmp_path / "held_back"
    hold.mkdir()

    sdf, stage = stream_from_table(spark, sf_dir, "events", n_chunks=6)
    try:
        agg = tumble_agg(
            sdf, "ts", "5 minutes", "10 minutes", ["event_type"],
            [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        )

        # phase 1: only the first half of the input is visible
        parts = sorted(
            f for f in os.listdir(stage)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        held = parts[len(parts) // 2:]
        moved = []
        for f in held:
            shutil.move(os.path.join(stage, f), hold / f)
            moved.append(f)
        q1 = _start(agg, out_dir, ckpt_dir)
        q1.processAllAvailable()
        q1.stop()  # the "kill": query gone, checkpoint + sink log remain
        n_phase1 = (
            spark.read.parquet(out_dir).count() if os.path.isdir(out_dir) else 0
        )

        # phase 2: restore the rest of the input, restart a NEW query from
        # the same checkpoint — offsets and window state must carry over
        for f in moved:
            src = hold / f
            dst = os.path.join(stage, f)
            mt = os.stat(src).st_mtime
            shutil.move(src, dst)
            os.utime(dst, (mt, mt))
        q2 = _start(agg, out_dir, ckpt_dir)
        q2.processAllAvailable()
        q2.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    got_rows = spark.read.parquet(out_dir).collect()
    got = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in got_rows
    }
    # exactly-once: the sink holds no duplicate (window, group) rows even
    # though a second query appended to the same directory
    assert len(got) == len(got_rows), "duplicate rows after restart"
    # progress: the restart continued the stream instead of starting over
    assert len(got_rows) > n_phase1, "resumed query emitted nothing new"

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    # every emitted window must equal batch EXACTLY (state survived the kill:
    # windows spanning the stop point aggregate rows from both phases)
    assert got, "stream produced no closed windows"
    for k, (n, total) in got.items():
        assert want[k][0] == n and abs(want[k][1] - total) < 1e-6
    # append mode withholds only windows the final watermark hasn't closed
    assert len(got) >= len(want) * 0.5


def test_event_time_sorted_state_survives_restart(spark, tmp_path, state_provider):
    """Kill-and-resume for the bucketed event-time sort: rows buffered in
    GroupState before the stop must release (in order, with dense per-key
    emit_idx continuing the pre-stop sequence) after a NEW query resumes
    from the same checkpoint — the RowTimeSortOperator state-checkpoint
    contract under Spark's recovery model."""
    from datetime import datetime, timedelta

    from fries_flink_spark.streaming.sort import event_time_sorted
    from fries_flink_spark.streaming.sources import stream_from_df

    base = datetime(2024, 1, 1)
    jit = lambda i: (i * 7) % 7 - 3  # noqa: E731 - bounded disorder
    rows = [
        (i // 20, "ab"[i % 2], base + timedelta(seconds=i + jit(i)), float(i))
        for i in range(60)
    ]
    rows += [(3, "a", base + timedelta(hours=2), -1.0),
             (3, "b", base + timedelta(hours=2), -1.0),
             (4, "a", base + timedelta(hours=2, seconds=1), -2.0),
             (4, "b", base + timedelta(hours=2, seconds=1), -2.0)]
    ev = spark.createDataFrame(
        rows, "chunkno long, k string, ts timestamp, value double"
    )
    sdf, stage = stream_from_df(ev, n_chunks=5, order_col="chunkno")
    out_dir = str(tmp_path / "sorted_sink")
    ckpt = str(tmp_path / "sorted_ckpt")
    hold = tmp_path / "held"
    hold.mkdir()

    def start():
        res = event_time_sorted(
            sdf.withWatermark("ts", "8 seconds"),
            ts_col="ts",
            payload_cols=["value"],
            key_cols=["k"],
        )
        return (
            res.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    try:
        parts = sorted(
            f for f in os.listdir(stage)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        moved = parts[2:]  # hold back chunks 2..4 (incl. both sentinels)
        for f in moved:
            shutil.move(os.path.join(stage, f), hold / f)
        q1 = start()
        q1.processAllAvailable()
        q1.stop()
        n1 = (
            spark.read.parquet(out_dir).count()
            if os.path.isdir(out_dir) else 0
        )
        for f in moved:
            src, dst = hold / f, os.path.join(stage, f)
            mt = os.stat(src).st_mtime
            shutil.move(src, dst)
            os.utime(dst, (mt, mt))
        q2 = start()
        q2.processAllAvailable()
        q2.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)

    got = spark.read.parquet(out_dir).where("value >= 0").collect()
    assert len(got) > n1, "resumed query emitted nothing new"
    assert len(got) == 60, "rows lost or duplicated across the restart"
    for key in ("a", "b"):
        seq = sorted(
            ((r.emit_idx, r.ts_ms, r.value) for r in got if r.k == key)
        )
        assert [e for e, _, _ in seq] == list(range(30))  # dense, no reset
        assert [t for _, t, _ in seq] == sorted(t for _, t, _ in seq)
        # the right rows in the right global event-time order per key
        want = [
            float(i) for i in sorted(
                (i for i in range(60) if "ab"[i % 2] == key),
                key=lambda i: (i + jit(i), i),
            )
        ]
        assert [v for _, _, v in seq] == want
