"""Streaming decade probe: the three bench streaming pipelines at a scaled
fixture dir under the auto-selected state provider (RocksDB at scale dirs,
session.resolve_state_provider), plus a kill-and-resume proof at that scale.

The bench pipelines (bench.run_streaming_benches) have records only up to the
10x dir; this tool takes them a decade higher and answers the two questions a
real deployment asks before trusting a stateful pipeline at scale:

1. THROUGHPUT: median-of-N end-to-end wall (chunk staging + full drain) per
   pipeline, with checkpoint/state sizes, under RocksDB + state partitions
   sized to key parallelism (the PERF §58 configuration).
2. RECOVERY: stop the event-time sort mid-stream (half the chunks
   processed), restart a NEW query from the same checkpoint with the rest of
   the input, and verify exactly-once + state survival SPARK-SIDE (no driver
   collect at 10M rows): emitted rows == batch rows, per-key emit_idx dense
   and unique, per-key event-time nondecreasing along emit_idx.

Usage: python tools/streaming_scale_probe.py [sf_dir] [repeats]
       (default: /tmp/spark_graft_scale100, 3)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale100"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

# bench reads its SF_DIR at import time; pin it before the import
os.environ["SPARK_GRAFT_SF_DIR"] = SF_DIR
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from fries_flink_spark.catalog import load_table  # noqa: E402
from fries_flink_spark.session import get_spark, resolve_state_provider  # noqa: E402


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def kill_and_resume(spark, out: dict) -> None:
    """Mid-stream stop + restart of the bucketed event-time sort over the
    full scaled events table (the same contract
    tests/test_streaming_recovery.py proves at fixture scale)."""
    from fries_flink_spark.streaming.sort import event_time_sorted
    from fries_flink_spark.streaming.sources import stream_from_df

    ev = load_table(spark, SF_DIR, "events").select(
        F.col("user_id").cast("string").alias("k"), "ts", "value"
    )
    batch_n = ev.count()
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    # one global sentinel row far past max event time: the final watermark
    # must pass every real row so all per-key buffers flush (watermarks are
    # global, so a single row advances every key's emission horizon)
    sentinel = spark.createDataFrame(
        [("__sentinel__", max_ts, -1.0)], "k string, ts timestamp, value double"
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
    sdf, stage = stream_from_df(
        ev.unionByName(sentinel), n_chunks=6, order_col="ts"
    )
    work = tempfile.mkdtemp(prefix="stream_recovery_scale_")
    out_dir, ckpt, hold = f"{work}/sink", f"{work}/ckpt", f"{work}/held"
    os.makedirs(hold)

    def start():
        res = event_time_sorted(
            sdf.withWatermark("ts", "30 minutes"),
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
        moved = parts[len(parts) // 2:]
        for f in moved:
            shutil.move(os.path.join(stage, f), os.path.join(hold, f))
        t0 = time.time()
        q1 = start()
        q1.processAllAvailable()
        q1.stop()  # the kill: query gone, checkpoint + sink commit log remain
        t_phase1 = round(time.time() - t0, 1)
        n1 = (
            spark.read.parquet(out_dir).count()
            if os.path.isdir(out_dir) else 0
        )
        for f in moved:
            src, dst = os.path.join(hold, f), os.path.join(stage, f)
            mt = os.stat(src).st_mtime
            shutil.move(src, dst)
            os.utime(dst, (mt, mt))
        t0 = time.time()
        q2 = start()
        q2.processAllAvailable()
        q2.stop()
        t_phase2 = round(time.time() - t0, 1)

        got = spark.read.parquet(out_dir).where("value >= 0")
        n_total = got.count()
        problems = []
        if n_total != batch_n:
            problems.append(f"emitted {n_total} != batch {batch_n}")
        if n_total <= n1:
            problems.append(f"resume emitted nothing new ({n1} -> {n_total})")
        # dense unique emit_idx per key: max+1 == count == countDistinct
        bad_dense = (
            got.groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("emit_idx").alias("nd"),
                (F.max("emit_idx") + 1).alias("m1"),
            )
            .where("n != nd OR n != m1")
            .count()
        )
        if bad_dense:
            problems.append(f"{bad_dense} keys with non-dense emit_idx")
        # per-key event time nondecreasing along emit order
        from pyspark.sql import Window

        w = Window.partitionBy("k").orderBy("emit_idx")
        bad_order = (
            got.withColumn("prev", F.lag("ts_ms").over(w))
            .where("prev IS NOT NULL AND prev > ts_ms")
            .count()
        )
        if bad_order:
            problems.append(f"{bad_order} out-of-order emissions")
        out["recovery"] = {
            "rows": n_total,
            "phase1_rows": n1,
            "phase1_sec": t_phase1,
            "phase2_sec": t_phase2,
            "ckpt_bytes": _dir_size(ckpt),
            "sink_bytes": _dir_size(out_dir),
            "problems": problems,
            "pass": not problems,
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(app_name="streaming-scale-probe", cpus=cpus)
    provider = resolve_state_provider(SF_DIR)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    print(
        f"sf_dir={SF_DIR} cpus={cpus} provider={provider.rsplit('.', 1)[-1]}",
        file=sys.stderr,
    )
    out: dict = {
        "sf_dir": SF_DIR,
        "cpus": cpus,
        "provider": provider.rsplit(".", 1)[-1],
        "repeats": REPEATS,
    }
    medians, samples = bench.run_streaming_benches(spark, repeats=REPEATS)
    out["streaming"] = medians
    out["streaming_samples"] = samples
    out["streaming_unstable"] = bench.flag_unstable(samples)
    kill_and_resume(spark, out)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
