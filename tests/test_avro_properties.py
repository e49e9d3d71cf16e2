"""Hypothesis property tests for the pure-Python Avro codec: any value the
schema admits must round-trip bit-exactly through the OCF encoding
(sources/avro.py; spec: avro.apache.org/docs/current/specification)."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from fries_flink_spark.sources.avro import (
    _decode_value,
    _encode_value,
    _read_ocf,
    _write_ocf,
    _zigzag_decode,
    _zigzag_encode,
)

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(longs)
@settings(max_examples=300, deadline=None)
def test_zigzag_roundtrip_any_long(n):
    assert _zigzag_decode(io.BytesIO(_zigzag_encode(n))) == n


@given(st.lists(longs, max_size=20))
@settings(max_examples=100, deadline=None)
def test_zigzag_stream_roundtrip(ns):
    buf = io.BytesIO(b"".join(_zigzag_encode(n) for n in ns))
    assert [_zigzag_decode(buf) for _ in ns] == ns


record_schema = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "flag", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": ["null", "double"]}},
    ],
}

finite_doubles = st.floats(allow_nan=False)  # inf is fine; NaN != NaN breaks eq

rows = st.fixed_dictionaries(
    {
        "id": longs,
        "s": st.none() | st.text(max_size=40),
        "d": finite_doubles,
        "b": st.binary(max_size=32),
        "flag": st.booleans(),
        "tags": st.lists(longs, max_size=8),
        "attrs": st.dictionaries(st.text(max_size=10), st.none() | finite_doubles, max_size=5),
    }
)


@given(st.lists(rows, max_size=25))
@settings(max_examples=60, deadline=None)
def test_ocf_roundtrip_any_rows(data):
    buf = io.BytesIO()
    _write_ocf(buf, iter(data), record_schema, seed="prop", block_rows=7)
    buf.seek(0)
    got = [r for _, r in _read_ocf(buf)]
    assert got == data


@given(st.lists(rows, min_size=1, max_size=10))
@settings(max_examples=30, deadline=None)
def test_value_codec_roundtrip_without_framing(data):
    out = bytearray()
    for r in data:
        _encode_value(out, r, record_schema)
    buf = io.BytesIO(bytes(out))
    assert [_decode_value(buf, record_schema) for _ in data] == data
    assert not buf.read()  # every byte consumed exactly
