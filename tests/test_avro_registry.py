"""Schema-registry Avro wire format (sources/avro_registry.py vs
flink-formats/flink-avro-confluent-registry ConfluentSchemaRegistryCoder).

Byte-level golden pinning of the [magic 0x00][4-byte BE id][avro body]
framing in BOTH directions, registry subject semantics, and Spark-job
round-trips through df_to_wire/wire_to_df.
"""

from __future__ import annotations

import pytest

from fries_flink_spark.sources.avro_registry import (
    InMemorySchemaRegistry,
    decode_wire,
    df_to_wire,
    encode_wire,
    wire_to_df,
)

_REC = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
    ],
}

#: Hand-computed golden message: magic 0x00, schema id 7 big-endian
#: (00 00 00 07), body = zigzag(5)=0x0a, union branch 1 = 0x02,
#: len("ok")=2 zigzag = 0x04, utf8 "ok".
_GOLDEN = bytes([0x00, 0x00, 0x00, 0x00, 0x07, 0x0A, 0x02, 0x04]) + b"ok"


def test_encode_golden_bytes():
    assert encode_wire({"id": 5, "name": "ok"}, _REC, 7) == _GOLDEN


def test_decode_golden_bytes():
    sid, row = decode_wire(_GOLDEN, {7: _REC})
    assert sid == 7
    assert row == {"id": 5, "name": "ok"}


def test_decode_null_branch():
    msg = encode_wire({"id": -1, "name": None}, _REC, 1)
    # body: zigzag(-1)=0x01, union branch 0 (null) = 0x00
    assert msg == bytes([0x00, 0x00, 0x00, 0x00, 0x01, 0x01, 0x00])
    assert decode_wire(msg, {1: _REC})[1] == {"id": -1, "name": None}


def test_bad_magic_and_short_message_rejected():
    with pytest.raises(ValueError, match="magic"):
        decode_wire(b"\x01" + _GOLDEN[1:], {7: _REC})
    with pytest.raises(ValueError, match="short"):
        decode_wire(b"\x00\x00\x00", {7: _REC})
    with pytest.raises(ValueError, match="trailing"):
        decode_wire(_GOLDEN + b"x", {7: _REC})


def test_registry_subject_semantics():
    reg = InMemorySchemaRegistry()
    a = reg.register("topic-value", _REC)
    assert reg.register("topic-value", _REC) == a  # same schema -> same id
    evolved = dict(_REC, fields=_REC["fields"][:1])
    b = reg.register("topic-value", evolved)  # new version -> new id
    c = reg.register("other-value", _REC)  # other subject, same schema
    assert len({a, b, c}) == 3
    assert reg.by_id(a) == _REC
    with pytest.raises(KeyError):
        reg.by_id(99)


def test_registry_resolution_forms():
    reg = InMemorySchemaRegistry()
    sid = reg.register("s", _REC)
    msg = encode_wire({"id": 1, "name": "x"}, _REC, sid)
    for resolver in (reg, reg.snapshot(), lambda i: reg.by_id(i)):
        assert decode_wire(msg, resolver)[1] == {"id": 1, "name": "x"}


def test_spark_wire_roundtrip(spark):
    import datetime as dt

    reg = InMemorySchemaRegistry()
    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, dt.date(2024, 3, 1), True),
            (2, None, -0.25, dt.date(1969, 12, 31), False),
            (3, "gamma", 0.0, None, None),
        ],
        "id long, name string, score double, d date, flag boolean",
    )
    wire = df_to_wire(df, reg, "events-value")
    blobs = [bytes(r.value) for r in wire.collect()]
    assert all(b[0] == 0 for b in blobs)  # magic byte on every message
    sid = reg.register(
        "events-value",
        __import__(
            "fries_flink_spark.sources.avro", fromlist=["spark_to_avro_schema"]
        ).spark_to_avro_schema(df.schema, name="row"),
    )  # same schema text -> same id as df_to_wire used
    back = wire_to_df(wire, reg, sid)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_wire_roundtrip_fixture(spark, sf_dir):
    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.sources.avro import spark_to_avro_schema

    reg = InMemorySchemaRegistry()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).limit(50)
    wire = df_to_wire(docs, reg, "documents-value")
    sid = reg.register(
        "documents-value", spark_to_avro_schema(docs.schema, name="row")
    )
    back = wire_to_df(wire, reg, sid)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.collect())
    )
