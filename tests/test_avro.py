"""Pure-Python Avro OCF codec (sources/avro.py vs flink-formats/flink-avro).

Round-trips through real Spark jobs (foreachPartition write, mapInPandas
read) plus byte-level spec pinning: zigzag varints and OCF framing are
asserted against hand-computed expected bytes from the public Avro spec.
"""

from __future__ import annotations

import datetime as dt
import io
import shutil
import tempfile

import pytest

from fries_flink_spark.sources.avro import (
    MAGIC,
    _decode_value,
    _encode_value,
    _read_ocf,
    _write_ocf,
    _zigzag_decode,
    _zigzag_encode,
    read_avro,
    write_avro,
)


def test_zigzag_spec_bytes():
    # expected bytes straight from the Avro spec's varint zigzag examples
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(64) == b"\x80\x01"
    assert _zigzag_encode(-65) == b"\x81\x01"
    for n in (0, 1, -1, 63, -64, 64, 12345, -12345, 2**40, -(2**40), 2**62):
        assert _zigzag_decode(io.BytesIO(_zigzag_encode(n))) == n


def test_primitive_value_spec_bytes():
    out = bytearray()
    _encode_value(out, "foo", "string")
    assert bytes(out) == b"\x06foo"  # length 3 zigzag = 0x06, then utf8
    out = bytearray()
    _encode_value(out, True, "boolean")
    assert bytes(out) == b"\x01"
    out = bytearray()
    _encode_value(out, None, ["null", "long"])
    assert bytes(out) == b"\x00"  # union branch 0 = null
    out = bytearray()
    _encode_value(out, 7, ["null", "long"])
    assert bytes(out) == b"\x02\x0e"  # branch 1, zigzag(7)


def test_ocf_roundtrip_in_memory():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "attrs", "type": {"type": "map", "values": "double"}},
            {"name": "maybe", "type": ["null", "double"]},
        ],
    }
    rows = [
        {"id": 1, "tags": ["a", "b"], "attrs": {"x": 1.5}, "maybe": None},
        {"id": 2, "tags": [], "attrs": {}, "maybe": 2.25},
    ]
    buf = io.BytesIO()
    _write_ocf(buf, iter(rows), schema, seed="t")
    buf.seek(0)
    assert buf.read(4) == MAGIC
    buf.seek(0)
    got = [r for _, r in _read_ocf(buf)]
    assert got == rows


def test_spark_roundtrip_all_types(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, True, bytearray(b"\x00\x01"), dt.date(2024, 3, 1),
             dt.datetime(2024, 3, 1, 12, 30, 15, 123456), [1, 2, 3], None),
            (2, None, -2.25, False, bytearray(b""), None,
             None, [], 9),
        ],
        "id long, s string, d double, b boolean, raw binary, day date, "
        "ts timestamp_ntz, arr array<long>, opt long",
    )
    path = tempfile.mkdtemp(prefix="avro_rt_") + "/t"
    try:
        write_avro(df, path)
        back = read_avro(spark, path)
        assert back.schema.fieldNames() == df.schema.fieldNames()
        a = sorted([tuple(r) for r in df.collect()])
        b = sorted([tuple(r) for r in back.collect()])
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_spark_roundtrip_multi_partition_table(spark, sf_dir):
    from fries_flink_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"
    ).repartition(4)
    path = tempfile.mkdtemp(prefix="avro_orders_") + "/orders"
    try:
        write_avro(orders, path)
        back = read_avro(spark, path)
        # value-exact roundtrip: compare full sorted row sets (a float SUM
        # would differ in ulps from partition summation order, not the codec)
        a = sorted(tuple(r) for r in orders.collect())
        b = sorted(tuple(r) for r in back.collect())
        assert a == b and len(a) == 1500
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_read_rejects_non_avro(tmp_path):
    p = tmp_path / "bad.avro"
    p.write_bytes(b"PAR1not-avro")
    with pytest.raises(AssertionError, match="not an avro"):
        list(_read_ocf(open(p, "rb")))


def test_connectors_avro_fallback_roundtrip(spark):
    """read_file/write_file(fmt='avro') fall back to the pure-Python codec
    when the spark-avro module is absent (this environment)."""
    from fries_flink_spark.sources.connectors import read_file, write_file

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 4) for i in range(10)], "id long, name string, x double"
    )
    path = tempfile.mkdtemp(prefix="avro_conn_") + "/t"
    try:
        write_file(df, path, fmt="avro")
        back = read_file(spark, path, fmt="avro")
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)
