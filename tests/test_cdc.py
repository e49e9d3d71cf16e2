"""CDC JSON format tests (sources/cdc.py): debezium-json and canal-json →
changelog rows, composed with changelog_normalize.

Reference semantics: DebeziumJsonDeserializationSchema.java:142-162,
CanalJsonDeserializationSchema.java:64-67 + FIELD_OLD patching.
"""

from __future__ import annotations

import json

from fries_flink_spark.operators.changelog import changelog_normalize
from fries_flink_spark.sources.cdc import parse_canal_json, parse_debezium_json
from pyspark.sql import functions as F

_SCHEMA = "id BIGINT, name STRING, qty BIGINT"


def _df(spark, messages):
    return spark.createDataFrame([(m,) for m in messages], "value string")


def test_debezium_ops(spark):
    msgs = [
        json.dumps({"before": None, "after": {"id": 1, "name": "a", "qty": 5},
                    "op": "c", "ts_ms": 1}),
        json.dumps({"before": {"id": 1, "name": "a", "qty": 5},
                    "after": {"id": 1, "name": "a", "qty": 7},
                    "op": "u", "ts_ms": 2}),
        json.dumps({"before": {"id": 2, "name": "b", "qty": 1}, "after": None,
                    "op": "d", "ts_ms": 3}),
        json.dumps({"before": None, "after": {"id": 3, "name": "c", "qty": 2},
                    "op": "r", "ts_ms": 4}),  # snapshot read -> +I
    ]
    out = parse_debezium_json(_df(spark, msgs), "value", _SCHEMA).collect()
    kinds = [(r["row_kind"], r["id"], r["qty"]) for r in out]
    assert kinds == [
        ("+I", 1, 5), ("-U", 1, 5), ("+U", 1, 7), ("-D", 2, 1), ("+I", 3, 2),
    ]


def test_canal_update_patches_old_fields(spark):
    msgs = [
        json.dumps({
            "data": [{"id": 1, "name": "a", "qty": 9},
                     {"id": 2, "name": "b", "qty": 4}],
            "old": [{"id": None, "name": None, "qty": 5},
                    {"id": None, "name": "bb", "qty": None}],
            "type": "UPDATE",
        }),
        json.dumps({"data": [{"id": 3, "name": "c", "qty": 1}], "old": None,
                    "type": "INSERT"}),
        json.dumps({"data": [{"id": 1, "name": "a", "qty": 9}], "old": None,
                    "type": "DELETE"}),
    ]
    out = parse_canal_json(_df(spark, msgs), "value", _SCHEMA).collect()
    rows = [(r["row_kind"], r["id"], r["name"], r["qty"]) for r in out]
    # row 1's old qty=5 patches the before-image; row 2's old name='bb'
    assert ("-U", 1, "a", 5) in rows and ("+U", 1, "a", 9) in rows
    assert ("-U", 2, "bb", 4) in rows and ("+U", 2, "b", 4) in rows
    assert ("+I", 3, "c", 1) in rows and ("-D", 1, "a", 9) in rows


def test_debezium_stream_to_snapshot(spark):
    # envelope stream -> parse -> normalize == the table's final state
    msgs = [
        json.dumps({"before": None, "after": {"id": i, "name": f"n{i}", "qty": i},
                    "op": "c", "ts_ms": i}) for i in range(3)
    ] + [
        json.dumps({"before": {"id": 1, "name": "n1", "qty": 1},
                    "after": {"id": 1, "name": "n1", "qty": 100},
                    "op": "u", "ts_ms": 10}),
        json.dumps({"before": {"id": 0, "name": "n0", "qty": 0}, "after": None,
                    "op": "d", "ts_ms": 11}),
    ]
    parsed = parse_debezium_json(_df(spark, msgs), "value", _SCHEMA)
    ordered = parsed.withColumn("seq", F.monotonically_increasing_id())
    snap = changelog_normalize(ordered, ["id"], [F.col("seq")])
    state = {r["id"]: r["qty"] for r in snap.collect()}
    assert state == {1: 100, 2: 2}


def test_maxwell_ops(spark):
    from fries_flink_spark.sources.cdc import parse_maxwell_json

    msgs = [
        json.dumps({"data": {"id": 1, "name": "a", "qty": 5}, "old": None,
                    "type": "insert"}),
        json.dumps({"data": {"id": 1, "name": "a", "qty": 8},
                    "old": {"id": None, "name": None, "qty": 5},
                    "type": "update"}),
        json.dumps({"data": {"id": 1, "name": "a", "qty": 8}, "old": None,
                    "type": "delete"}),
    ]
    out = parse_maxwell_json(_df(spark, msgs), "value", _SCHEMA).collect()
    rows = [(r["row_kind"], r["id"], r["qty"]) for r in out]
    assert rows == [("+I", 1, 5), ("-U", 1, 5), ("+U", 1, 8), ("-D", 1, 8)]


def test_debezium_random_streams_normalize_to_state(spark):
    """Randomized change streams (seeded): envelope -> parse -> normalize
    must equal an independent dict state-machine replay."""
    import random

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        state: dict[int, int] = {}
        msgs = []
        for step in range(120):
            key = rng.randrange(8)
            if key not in state:
                state[key] = rng.randrange(100)
                msgs.append(json.dumps({
                    "before": None,
                    "after": {"id": key, "name": f"k{key}", "qty": state[key]},
                    "op": "c", "ts_ms": step}))
            elif rng.random() < 0.3:
                old = state.pop(key)
                msgs.append(json.dumps({
                    "before": {"id": key, "name": f"k{key}", "qty": old},
                    "after": None, "op": "d", "ts_ms": step}))
            else:
                old, new = state[key], rng.randrange(100)
                state[key] = new
                msgs.append(json.dumps({
                    "before": {"id": key, "name": f"k{key}", "qty": old},
                    "after": {"id": key, "name": f"k{key}", "qty": new},
                    "op": "u", "ts_ms": step}))
        parsed = parse_debezium_json(_df(spark, msgs), "value", _SCHEMA)
        ordered = parsed.withColumn("seq", F.monotonically_increasing_id())
        snap = changelog_normalize(ordered, ["id"], [F.col("seq")])
        got = {r["id"]: r["qty"] for r in snap.collect()}
        assert got == state, f"seed {seed}"


def test_streaming_cdc_snapshot_maintenance(spark, tmp_path):
    """Debezium stream -> foreachBatch parse + apply_changelog: the
    maintained snapshot equals an independent state-machine replay — the
    full CDC ingestion loop (parse -> changelog -> incremental materialized
    view)."""
    import random
    import shutil

    from fries_flink_spark.operators.changelog import apply_changelog
    from fries_flink_spark.streaming.sources import stream_from_df

    rng = random.Random(5)
    state: dict[int, int] = {}
    msgs = []
    for step in range(150):
        key = rng.randrange(10)
        if key not in state:
            state[key] = rng.randrange(50)
            msgs.append((step, json.dumps({
                "before": None,
                "after": {"id": key, "name": f"k{key}", "qty": state[key]},
                "op": "c", "ts_ms": step})))
        elif rng.random() < 0.25:
            old = state.pop(key)
            msgs.append((step, json.dumps({
                "before": {"id": key, "name": f"k{key}", "qty": old},
                "after": None, "op": "d", "ts_ms": step})))
        else:
            old, new = state[key], rng.randrange(50)
            state[key] = new
            msgs.append((step, json.dumps({
                "before": {"id": key, "name": f"k{key}", "qty": old},
                "after": {"id": key, "name": f"k{key}", "qty": new},
                "op": "u", "ts_ms": step})))
    src = spark.createDataFrame(msgs, "ts long, value string")
    sdf, stage = stream_from_df(src, n_chunks=4, order_col="ts")
    holder = {
        "snap": spark.createDataFrame([], "id bigint, name string, qty bigint")
    }

    def ingest(batch_df, _epoch):
        parsed = parse_debezium_json(batch_df.orderBy("ts"), "value", _SCHEMA)
        ordered = parsed.withColumn("seq", F.monotonically_increasing_id())
        holder["snap"] = apply_changelog(
            holder["snap"], ordered, ["id"], [F.col("seq")]
        ).localCheckpoint(eager=True)

    q = (
        sdf.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", stage + "/_ckpt")
        .start()
    )
    q.awaitTermination(120)
    shutil.rmtree(stage, ignore_errors=True)
    got = {r["id"]: r["qty"] for r in holder["snap"].collect()}
    assert got == state
