"""Schema-registry Avro wire format (SURVEY §2.1 — flink-avro-confluent-registry).

Reference: flink-formats/flink-avro-confluent-registry
(RegistryAvroDeserializationSchema.java:40,
ConfluentSchemaRegistryCoder.java:55-80) — the Kafka-ecosystem framing for
single Avro records: ``[magic 0x00][schema id, 4-byte big-endian][avro
binary body]``. The body is the PLAIN Avro binary encoding of one record —
no OCF magic, metadata, or sync markers (that framing belongs to container
FILES; registry messages amortize the schema through the id instead).

No registry server exists in this environment (and none is needed for the
codec): ``InMemorySchemaRegistry`` plays the id<->schema directory, exactly
the role the reference's ``SchemaRegistryClient`` plays at this layer. The
encode/decode paths reuse the from-spec Avro binary codec in ``avro.py``,
so every value encoding is covered by that module's byte-level spec tests.

Distribution model: framing is per-record and stateless — encode/decode are
plain row functions usable inside ``mapInPandas`` against a BROADCAST
schema directory (ids resolve against a dict; at scale the registry
contents are dim-sized by construction). ``df_to_wire``/``wire_to_df``
wire that up for binary-payload DataFrames, mirroring how the reference
pairs the coder with Kafka value bytes.
"""

from __future__ import annotations

import io
import json
import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .avro import (
    _decode_value,
    _encode_value,
    avro_to_spark_type,
    spark_to_avro_schema,
)

MAGIC_BYTE = 0


class InMemorySchemaRegistry:
    """Minimal id<->schema directory with Confluent-like subject semantics:
    registering the same schema text under a subject returns the same id;
    a new schema under an existing subject gets a new id (a new version)."""

    def __init__(self):
        self._by_id: dict[int, dict] = {}
        self._ids: dict[tuple[str, str], int] = {}
        self._next = 1

    def register(self, subject: str, schema: dict) -> int:
        key = (subject, json.dumps(schema, sort_keys=True))
        if key not in self._ids:
            self._ids[key] = self._next
            self._by_id[self._next] = schema
            self._next += 1
        return self._ids[key]

    def by_id(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            raise KeyError(f"schema id {schema_id} not registered")
        return self._by_id[schema_id]

    def snapshot(self) -> dict[int, str]:
        """Broadcastable {id: schema-json} directory for executor-side use."""
        return {i: json.dumps(s) for i, s in self._by_id.items()}


def encode_wire(row: dict, schema: dict, schema_id: int) -> bytes:
    """One record -> magic byte + big-endian schema id + Avro binary body
    (ConfluentSchemaRegistryCoder.writeSchema + the record body)."""
    out = bytearray()
    out.append(MAGIC_BYTE)
    out += struct.pack(">I", schema_id)
    _encode_value(out, row, schema)
    return bytes(out)


def decode_wire(blob: bytes, schema_by_id) -> tuple[int, dict]:
    """Wire message -> (schema id, record dict). ``schema_by_id`` is a
    registry, a plain {id: schema} / {id: schema-json} mapping, or a
    callable — whatever the caller can ship to executors."""
    if len(blob) < 5:
        raise ValueError(f"wire message too short: {len(blob)} bytes")
    if blob[0] != MAGIC_BYTE:
        # ConfluentSchemaRegistryCoder.readSchema raises on a bad magic byte
        raise ValueError(f"bad magic byte {blob[0]!r} (want {MAGIC_BYTE})")
    (schema_id,) = struct.unpack(">I", blob[1:5])
    if callable(getattr(schema_by_id, "by_id", None)):
        schema = schema_by_id.by_id(schema_id)
    elif callable(schema_by_id):
        schema = schema_by_id(schema_id)
    else:
        schema = schema_by_id[schema_id]
    if isinstance(schema, str):
        schema = json.loads(schema)
    buf = io.BytesIO(blob[5:])
    row = _decode_value(buf, schema)
    rest = buf.read(1)
    if rest:
        raise ValueError("trailing bytes after avro body")
    return schema_id, row


def df_to_wire(df: DataFrame, registry: InMemorySchemaRegistry,
               subject: str) -> DataFrame:
    """Encode every row of ``df`` into one wire message; returns a
    one-column (``value`` binary) DataFrame — the shape a Kafka value sink
    consumes. Schema id resolves ONCE driver-side; executors see only the
    (id, schema-json) pair."""
    avro_schema = spark_to_avro_schema(df.schema, name="row")
    schema_id = registry.register(subject, avro_schema)
    schema_json = json.dumps(avro_schema)
    field_names = [f.name for f in df.schema.fields]

    def encode_batches(batches):
        import pandas as pd

        schema = json.loads(schema_json)
        for pdf in batches:
            # object-cast + where: keeps nulls as None (pandas would other-
            # wise coerce nullable numerics to float NaN) — same row shape
            # write_avro gets from Row objects
            pdf = pdf[field_names].astype(object).where(pdf.notna(), None)
            vals = [
                encode_wire(r, schema, schema_id)
                for r in pdf.to_dict("records")
            ]
            yield pd.DataFrame({"value": pd.Series(vals, dtype=object)})

    return df.mapInPandas(encode_batches, schema="value binary")


def wire_to_df(df: DataFrame, registry: InMemorySchemaRegistry,
               schema_id: int, value_col: str = "value") -> DataFrame:
    """Decode a binary-payload DataFrame of wire messages back into typed
    columns. ``schema_id`` pins the READER schema (wire messages carry their
    writer id; here both must match — schema evolution is out of scope, as
    in the reference's non-evolving deserializer path). The id->schema
    directory ships to executors as a broadcast-sized dict snapshot."""
    directory = registry.snapshot()
    schema = json.loads(directory[schema_id])
    spark_type = avro_to_spark_type(schema)
    if not isinstance(spark_type, T.StructType):
        raise TypeError("wire_to_df needs a record schema")
    out_names = [f.name for f in spark_type.fields]

    def decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = [decode_wire(bytes(b), directory)[1]
                    for b in pdf[value_col]]
            yield pd.DataFrame(
                {n: pd.Series([r[n] for r in rows], dtype=object)
                 for n in out_names}
            )

    return df.mapInPandas(decode_batches, schema=spark_type)
