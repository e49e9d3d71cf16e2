"""Streaming tests: drive bounded file streams to completion and compare with
the batch rendition of the same logic (the driver's documented oracle protocol
for streaming ops, FIXTURES.md)."""

from __future__ import annotations

import shutil
import time

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.streaming.reconfigure import ReconfigurableStream
from fries_flink_spark.streaming.sources import (
    rate_source,
    stream_from_df,
    stream_from_table,
)
from fries_flink_spark.streaming.windows import (
    run_to_completion,
    session_agg,
    streaming_dedup,
    tumble_agg,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    sdf, stage = stream_from_table(spark, sf_dir, "events", n_chunks=4)
    yield sdf
    shutil.rmtree(stage, ignore_errors=True)


def test_streaming_tumble_matches_batch(spark, sf_dir, event_stream):
    agg = tumble_agg(
        event_stream, "ts", "5 minutes", "10 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
    )
    run_to_completion(agg, "stream_tumble", "append")
    got = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM stream_tumble").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    want = {
        (r["w"]["start"], r["event_type"]): (r["n"], r["total"])
        for r in batch.collect()
    }
    # append mode emits only watermark-closed windows; everything emitted must
    # match batch, and coverage must be substantial
    assert got, "stream produced no closed windows"
    for k, v in got.items():
        assert want[k][0] == v[0] and abs(want[k][1] - v[1]) < 1e-6
    assert len(got) >= len(want) * 0.5


def test_streaming_session_matches_batch(spark, sf_dir, event_stream):
    agg = session_agg(
        event_stream, "ts", "30 minutes", "10 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("n")],
    )
    run_to_completion(agg, "stream_session", "append")
    got = {
        (r["user_id"], r["w"]["start"]): r["n"]
        for r in spark.sql("SELECT * FROM stream_session").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["user_id"], r["w"]["start"]): r["n"] for r in batch.collect()}
    assert got
    for k, v in got.items():
        assert want[k] == v


def test_streaming_dedup(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").orderBy("event_id").limit(200).cache()
    n_distinct = ev.select("event_id").distinct().count()
    dup = ev.union(ev)  # every event twice
    sdf, stage = stream_from_df(dup, n_chunks=4)
    out = streaming_dedup(sdf, ["event_id"], "ts", "1 hour")
    run_to_completion(out, "stream_dedup", "append")
    n = spark.sql("SELECT count(*) AS n FROM stream_dedup").first()["n"]
    assert n == n_distinct == 200
    ev.unpersist()
    shutil.rmtree(stage, ignore_errors=True)


def test_reconfigure_applies_at_epoch_boundary(spark, sf_dir):
    """Fries analog: change a filter threshold mid-stream; the new config must
    apply atomically at a micro-batch boundary (no partial batches)."""
    sdf, stage = stream_from_table(spark, sf_dir, "events", n_chunks=8)
    seen: list[tuple[int, float, int]] = []

    def pipeline(df, params):
        return df.filter(F.col("value") >= params["min_value"])

    def sink(df, epoch):
        rows = df.collect()
        mn = min((r["value"] for r in rows), default=None)
        seen.append((epoch, mn, len(rows)))

    rs = ReconfigurableStream(
        source=sdf, pipeline=pipeline, sink=sink, params={"min_value": 0.0}
    )
    q = rs.start(trigger={"processingTime": "200 milliseconds"})
    try:
        deadline = time.time() + 60
        while not seen and time.time() < deadline:
            time.sleep(0.1)
        v = rs.reconfigure(min_value=100.0)
        assert v == 1
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree(stage, ignore_errors=True)

    applied = [e for e in rs.log if e.applied_epoch is not None]
    assert applied, "reconfiguration never applied"
    boundary = applied[0].applied_epoch
    for epoch, mn, n in seen:
        if epoch >= boundary and n > 0:
            assert mn >= 100.0, f"epoch {epoch} ran with stale config"
    assert rs.average_roundtrip_s() is not None


def test_rate_source_smoke(spark):
    q = (
        rate_source(spark, 50)
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .start()
    )
    time.sleep(2)
    q.stop()
    assert spark.sql("SELECT count(*) AS n FROM rate_smoke").first()["n"] >= 0


def test_stream_stream_interval_join(spark, sf_dir):
    """Two watermarked streams joined on key + time range (reference
    TimeIntervalJoin.java:51): every emitted pair must exist in the batch
    rendition of the same join."""
    clicks_sdf, stage_a = stream_from_table(spark, sf_dir, "events", n_chunks=4)
    buys_sdf, stage_b = stream_from_table(spark, sf_dir, "events", n_chunks=4)
    try:
        a = (
            clicks_sdf.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("a_user"),
                F.col("event_id").alias("a_id"),
                F.col("ts").alias("a_ts"),
            )
            .withWatermark("a_ts", "10 minutes")
        )
        b = (
            buys_sdf.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("b_user"),
                F.col("event_id").alias("b_id"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "10 minutes")
        )
        joined = a.join(
            b,
            F.expr(
                "a_user = b_user AND b_ts > a_ts "
                "AND b_ts <= a_ts + INTERVAL 30 MINUTES"
            ),
        ).select("a_user", "a_id", "b_id")
        run_to_completion(joined, "stream_ivjoin", "append")
        got = {
            (r.a_user, r.a_id, r.b_id)
            for r in spark.sql("SELECT * FROM stream_ivjoin").collect()
        }
        ev = load_table(spark, sf_dir, "events")
        ca = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_ts"),
        )
        cb = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
        )
        want = {
            (r.a_user, r.a_id, r.b_id)
            for r in ca.join(
                cb,
                F.expr(
                    "a_user = b_user AND b_ts > a_ts "
                    "AND b_ts <= a_ts + INTERVAL 30 MINUTES"
                ),
            )
            .select("a_user", "a_id", "b_id")
            .collect()
        }
        assert got, "stream join emitted nothing"
        assert got <= want
        assert len(got) >= len(want) * 0.5
    finally:
        shutil.rmtree(stage_a, ignore_errors=True)
        shutil.rmtree(stage_b, ignore_errors=True)


def test_count_window(spark, sf_dir):
    """Keyed tumbling count window: complete n-groups match the batch
    row_number rendition; partial tails are held back."""
    from fries_flink_spark.streaming.state import count_window

    ev = (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(300)
        .select("user_id", "event_id", "value")
        .cache()
    )
    sdf, stage = stream_from_df(ev, n_chunks=3, order_col="event_id")
    try:
        out = count_window(
            sdf.select("user_id", "event_id", "value"),
            key_cols=["user_id"],
            order_col="event_id",
            n=5,
            agg=lambda pdf: {
                "n": len(pdf),
                "total": float(pdf["value"].sum()),
                "first_id": int(pdf["event_id"].min()),
            },
            output_schema="user_id long, n int, total double, first_id long",
        )
        run_to_completion(out, "stream_cw", "append")
        got = {
            (r.user_id, r.first_id): (r.n, round(r.total, 6))
            for r in spark.sql("SELECT * FROM stream_cw").collect()
        }
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("event_id")
        batch = (
            ev.withColumn("rn", F.row_number().over(w))
            .withColumn("grp", F.floor((F.col("rn") - 1) / 5))
            .groupBy("user_id", "grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").alias("total"),
                F.min("event_id").alias("first_id"),
            )
            .filter(F.col("n") == 5)
        )
        want = {
            (r.user_id, r.first_id): (r.n, round(r.total, 6)) for r in batch.collect()
        }
        assert got == want and got
    finally:
        ev.unpersist()
        shutil.rmtree(stage, ignore_errors=True)


def test_stream_stream_left_outer_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER join (reference
    StreamingJoinOperator left-outer path): matched pairs agree with the
    batch join, and clicks with no purchase in the window are emitted
    null-extended once the watermark passes — the state-cleanup semantics
    the reference implements with retraction timers."""
    clicks_sdf, stage_a = stream_from_table(spark, sf_dir, "events", n_chunks=4)
    buys_sdf, stage_b = stream_from_table(spark, sf_dir, "events", n_chunks=4)
    try:
        a = (
            clicks_sdf.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("a_user"),
                F.col("event_id").alias("a_id"),
                F.col("ts").alias("a_ts"),
            )
            .withWatermark("a_ts", "5 minutes")
        )
        b = (
            buys_sdf.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("b_user"),
                F.col("event_id").alias("b_id"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "5 minutes")
        )
        joined = a.join(
            b,
            F.expr(
                "a_user = b_user AND b_ts > a_ts "
                "AND b_ts <= a_ts + INTERVAL 10 MINUTES"
            ),
            "leftOuter",
        ).select("a_user", "a_id", "b_id")
        run_to_completion(joined, "stream_lojoin", "append")
        got = {
            (r.a_user, r.a_id, r.b_id)
            for r in spark.sql("SELECT * FROM stream_lojoin").collect()
        }
        ev = load_table(spark, sf_dir, "events")
        ca = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_ts"),
        )
        cb = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
        )
        want_matched = {
            (r.a_user, r.a_id, r.b_id)
            for r in ca.join(
                cb,
                F.expr(
                    "a_user = b_user AND b_ts > a_ts "
                    "AND b_ts <= a_ts + INTERVAL 10 MINUTES"
                ),
            ).collect()
        }
        got_matched = {t for t in got if t[2] is not None}
        got_unmatched = {t[:2] for t in got if t[2] is None}
        # matched pairs: exactly the batch inner join
        assert got_matched == want_matched
        # null-extended rows: a subset of the batch anti side (rows whose
        # watermark never passed before end-of-stream may be withheld), and
        # never for a click that DID match
        assert got_unmatched.isdisjoint({t[:2] for t in want_matched})
        assert len(got_unmatched) > 0  # the mechanism actually fired
    finally:
        import shutil

        shutil.rmtree(stage_a, ignore_errors=True)
        shutil.rmtree(stage_b, ignore_errors=True)


def test_stream_stream_semi_join(spark, sf_dir):
    """Watermarked stream-stream LEFT SEMI join (reference streaming semi
    join, StreamExecJoin semi mode): emitted clicks = exactly the batch semi
    join (clicks with >=1 purchase in the window)."""
    clicks_sdf, stage_a = stream_from_table(spark, sf_dir, "events", n_chunks=3)
    buys_sdf, stage_b = stream_from_table(spark, sf_dir, "events", n_chunks=3)
    try:
        a = (
            clicks_sdf.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("a_user"),
                F.col("event_id").alias("a_id"),
                F.col("ts").alias("a_ts"),
            )
            .withWatermark("a_ts", "5 minutes")
        )
        b = (
            buys_sdf.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("b_user"),
                F.col("ts").alias("b_ts"),
            )
            .withWatermark("b_ts", "5 minutes")
        )
        joined = a.join(
            b,
            F.expr(
                "a_user = b_user AND b_ts > a_ts "
                "AND b_ts <= a_ts + INTERVAL 10 MINUTES"
            ),
            "leftSemi",
        ).select("a_user", "a_id")
        run_to_completion(joined, "stream_semijoin", "append")
        got = sorted(
            (r.a_user, r.a_id)
            for r in spark.sql("SELECT * FROM stream_semijoin").collect()
        )
        ev = load_table(spark, sf_dir, "events")
        ca = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_ts"),
        )
        cb = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
        )
        want = sorted(
            (r.a_user, r.a_id)
            for r in ca.join(
                cb,
                F.expr(
                    "a_user = b_user AND b_ts > a_ts "
                    "AND b_ts <= a_ts + INTERVAL 10 MINUTES"
                ),
                "leftSemi",
            ).collect()
        )
        assert got == want
    finally:
        import shutil

        shutil.rmtree(stage_a, ignore_errors=True)
        shutil.rmtree(stage_b, ignore_errors=True)
