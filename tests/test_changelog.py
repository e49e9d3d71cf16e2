"""Changelog operator tests (reference RowKind.java, ChangelogNormalize,
DropUpdateBefore)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fries_flink_spark.operators.changelog import (
    DELETE,
    INSERT,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    changelog_normalize,
    drop_update_before,
    to_changelog,
    with_row_kind,
)


def test_to_changelog_classifies(spark):
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    after = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, v string"
    )
    ch = to_changelog(before, after, ["id"])
    kinds = {(r.id, r.row_kind): r.v for r in ch.collect()}
    assert kinds == {
        (1, DELETE): "a",
        (3, UPDATE_BEFORE): "c",
        (3, UPDATE_AFTER): "C",
        (4, INSERT): "d",
    }


def test_changelog_roundtrip_normalize(spark):
    """diff -> changelog -> apply over 'before' reproduces 'after'."""
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    after = spark.createDataFrame(
        [(2, "b2"), (3, "c"), (5, "e")], "id long, v string"
    )
    ch = to_changelog(before, after, ["id"]).withColumn("seq", F.lit(1))
    base = with_row_kind(before).withColumn("seq", F.lit(0))
    # -U rows carry the OLD value at the same seq as their +U partner; for
    # keyed materialization they are redundant — exactly DropUpdateBefore's job.
    merged = drop_update_before(base.unionByName(ch.select(*base.columns)))
    snap = changelog_normalize(merged, ["id"], [F.col("seq")])
    got = {(r.id): r.v for r in snap.collect()}
    want = {(r.id): r.v for r in after.collect()}
    assert got == want


def test_to_changelog_null_keys(spark):
    """NULL-keyed rows must participate: the join is eqNullSafe, so existence
    must be tested via side markers, not keys[0].isNotNull()."""
    before = spark.createDataFrame([(None, "a"), (1, "x")], "id long, v string")
    after = spark.createDataFrame([(None, "A"), (2, "y")], "id long, v string")
    ch = to_changelog(before, after, ["id"])
    kinds = {(r.id, r.row_kind): r.v for r in ch.collect()}
    assert kinds == {
        (None, UPDATE_BEFORE): "a",
        (None, UPDATE_AFTER): "A",
        (1, DELETE): "x",
        (2, INSERT): "y",
    }


def test_drop_update_before(spark):
    df = spark.createDataFrame(
        [(1, UPDATE_BEFORE), (1, UPDATE_AFTER), (2, INSERT)], "id long, row_kind string"
    )
    kinds = {r.row_kind for r in drop_update_before(df).collect()}
    assert UPDATE_BEFORE not in kinds and len(kinds) == 2


def test_streaming_agg_changelog_roundtrip(spark, sf_dir):
    """Reference GroupAggFunction.java:43: a streaming group-agg's update
    stream, diffed into +I/-U/+U batches by to_changelog, accumulated in a
    changelog sink, and normalized back, must reproduce the batch aggregate."""
    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.streaming.sources import stream_from_df

    import shutil

    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "ts")
    sdf, stage = stream_from_df(ev, n_chunks=4)
    agg = sdf.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )

    schema = "event_type string, n long, total double"
    snapshot: dict = {}   # key -> (key, n, total): the sink's current rows
    log: list = []        # accumulated changelog: (seq, row_kind, key, n, total)

    def emit(batch_df, _bid):
        rows = [(r["event_type"], r["n"], r["total"]) for r in batch_df.collect()]
        if not rows:
            return
        touched = [r[0] for r in rows]
        before = spark.createDataFrame(
            [snapshot[k] for k in touched if k in snapshot], schema
        )
        after = spark.createDataFrame(rows, schema)
        ch = to_changelog(before, after, ["event_type"]).collect()
        # -U must precede its +U partner in the changelog stream
        for r in sorted(
            ch, key=lambda r: (r["event_type"], r["row_kind"] != UPDATE_BEFORE)
        ):
            log.append((len(log), r["row_kind"], r["event_type"], r["n"], r["total"]))
        snapshot.update({r[0]: r for r in rows})

    q = agg.writeStream.outputMode("update").foreachBatch(emit).start()
    q.processAllAvailable()
    q.stop()
    shutil.rmtree(stage, ignore_errors=True)

    chdf = spark.createDataFrame(
        log, "seq long, row_kind string, event_type string, n long, total double"
    )
    kinds = {r["row_kind"] for r in chdf.select("row_kind").distinct().collect()}
    assert INSERT in kinds, "no +I rows — keys never materialized"
    assert UPDATE_BEFORE in kinds and UPDATE_AFTER in kinds, (
        "no retractions flowed — multi-batch updates must emit -U/+U pairs"
    )

    snap = changelog_normalize(chdf, ["event_type"], [F.col("seq")])
    got = {r["event_type"]: (r["n"], r["total"]) for r in snap.collect()}
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for k, (n, total) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - total) < 1e-6


def test_apply_changelog_tied_update_pair_keeps_after_image(spark):
    """A -U/+U pair sharing identical order_by values (the shape
    to_changelog/parse_debezium_json emit, where both legs carry the same ts)
    must resolve to the after-image, deterministically, via the row_kind
    priority tie-break."""
    from fries_flink_spark.operators.changelog import apply_changelog

    snap = spark.createDataFrame([(1, "old"), (2, "keep")], "id long, v string")
    # same ts for the -U and +U legs of one update; also a -D tied with a +U
    chg = spark.createDataFrame(
        [
            (UPDATE_BEFORE, 1, "old", 10),
            (UPDATE_AFTER, 1, "new", 10),
        ],
        "row_kind string, id long, v string, ts long",
    )
    out = apply_changelog(snap, chg, keys=["id"], order_by=[F.col("ts")])
    got = {(r.id, r.v) for r in out.collect()}
    assert got == {(1, "new"), (2, "keep")}
