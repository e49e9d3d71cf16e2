"""Streaming over-agg + late-data routing + file sink tests."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import Window
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.streaming.over import LateDataRouter, streaming_running_agg
from fries_flink_spark.streaming.sources import stream_from_df
from fries_flink_spark.streaming.windows import run_to_completion


def test_streaming_running_agg_matches_batch(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(300)
        .select("user_id", "event_id", "ts", "value")
        .cache()
    )
    sdf, stage = stream_from_df(ev, n_chunks=3, order_col="ts")
    try:
        out = streaming_running_agg(
            sdf,
            ["user_id"],
            "ts",
            "value",
            "user_id long, event_id long, ts timestamp, value double, "
            "running_sum double, running_count long",
            tiebreak_col="event_id",
        )
        run_to_completion(out, "stream_over", "append")
        got = {
            r.event_id: (round(r.running_sum, 6), r.running_count)
            for r in spark.sql("SELECT * FROM stream_over").collect()
        }
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        batch = ev.select(
            "event_id",
            F.sum("value").over(w).alias("rs"),
            F.count(F.lit(1)).over(w).alias("rc"),
        )
        want = {r.event_id: (round(r.rs, 6), r.rc) for r in batch.collect()}
        assert got == want and len(got) == 300
    finally:
        ev.unpersist()
        shutil.rmtree(stage, ignore_errors=True)


def test_late_data_router(spark):
    """A chunk arriving after the watermark has advanced past it must land in
    the dead-letter sink, not the main one."""
    stage = tempfile.mkdtemp(prefix="late_router_")
    on_time = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 10, i)) for i in range(10)], "id long, ts timestamp"
    )
    late = spark.createDataFrame(
        [(100, datetime(2024, 1, 1, 8, 0)), (101, datetime(2024, 1, 1, 10, 8))],
        "id long, ts timestamp",
    )
    on_time.coalesce(1).write.parquet(stage + "/c0")
    late.coalesce(1).write.parquet(stage + "/c1")
    # flatten into one dir with ordered mtimes
    final = tempfile.mkdtemp(prefix="late_router_final_")
    i = 0
    for sub in ["c0", "c1"]:
        for f in sorted(os.listdir(f"{stage}/{sub}")):
            if f.endswith(".parquet"):
                p = f"{final}/chunk{i}.parquet"
                shutil.copy(f"{stage}/{sub}/{f}", p)
                os.utime(p, (1000 + i, 1000 + i))
                i += 1
    sdf = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(final)
    )
    main_ids, late_ids = [], []
    router = LateDataRouter(
        "ts",
        timedelta(minutes=30),
        main_sink=lambda df, e: main_ids.extend(r.id for r in df.collect()),
        late_sink=lambda df, e: late_ids.extend(r.id for r in df.collect()),
    )
    q = router.start(sdf)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
    assert 100 in late_ids  # 8:00 is > 30min behind the 10:09 max
    assert 101 in main_ids  # 10:08 is within the allowed lateness
    assert set(range(10)) <= set(main_ids)


def test_streaming_file_sink(spark, sf_dir):
    """Rolling file sink with checkpoint (reference StreamingFileSink):
    bounded stream -> parquet directory, all rows present exactly once."""
    ev = load_table(spark, sf_dir, "events").limit(200).select("event_id", "value")
    sdf, stage = stream_from_df(ev, n_chunks=4, order_col="event_id")
    out_dir = tempfile.mkdtemp(prefix="file_sink_out_")
    ckpt = tempfile.mkdtemp(prefix="file_sink_ckpt_")
    try:
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        back = spark.read.parquet(out_dir)
        assert back.count() == 200
        assert back.select("event_id").distinct().count() == 200
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_topn_carries_state(spark, sf_dir):
    """Global streaming Top-N per key (reference AppendOnlyTopNFunction): the
    final emission must equal the batch top-N over ALL chunks."""
    from fries_flink_spark.streaming.state import streaming_topn

    ev = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(300)
        .select("event_type", "event_id", "value")
        .cache()
    )
    sdf, stage = stream_from_df(ev, n_chunks=3, order_col="event_id")
    try:
        out = streaming_topn(
            sdf,
            key_cols=["event_type"],
            order_col="value",
            n=3,
            payload_cols=["event_id"],
            output_schema="event_type string, event_id long, value double",
        )
        run_to_completion(out, "stream_topn", "append")
        # the LAST emission per key reflects all data; reconstruct it by
        # taking the final top-3 values per key from everything emitted
        # each epoch re-emits its current top list -> dedupe before ranking
        emitted = spark.sql("SELECT * FROM stream_topn").distinct()
        w = Window.partitionBy("event_type").orderBy(
            F.desc("value"), F.asc("event_id")
        )
        got = {
            (r.event_type, r.event_id)
            for r in emitted.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .collect()
        }
        want = {
            (r.event_type, r.event_id)
            for r in ev.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .collect()
        }
        assert got == want
    finally:
        ev.unpersist()
        shutil.rmtree(stage, ignore_errors=True)
