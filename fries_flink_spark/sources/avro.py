"""Avro Object Container File format, pure Python (SURVEY §2.1 — flink-avro).

Reference: flink-formats/flink-avro (AvroRowDataDeserializationSchema.java:63,
AvroFileFormatFactory.java) gives the reference Avro tables. Spark's own
spark-avro module is not on the classpath in this environment, so this is a
from-spec implementation of the Avro 1.x binary encoding + OCF framing
(public spec: avro.apache.org/docs/current/specification — varint zigzag
longs, length-prefixed bytes/strings, arrays/maps as counted blocks, union
by branch index; OCF = Obj\\x01 magic, metadata map with avro.schema JSON,
16-byte sync marker, then [row-count, byte-count, payload, sync] blocks).

Distribution model (how this scales, since the codec itself is Python):
- write: one OCF file per Spark partition via ``foreachPartition`` — the
  same file-per-task layout every Spark file sink uses; no driver data.
- read: one task per file (``spark.read.format("binaryFile")``-style listing
  done driver-side on file NAMES only, then parallelized); rows decode
  inside ``mapInPandas`` executor-side. OCF is block-splittable on its sync
  markers, so a finer split-per-block scan is possible at scale; file
  granularity is the simplest correct unit and matches the writer's output
  (many medium files), which is how the reference's bulk Avro format is
  consumed too.
- Python-speed trade-off: Avro decode is per-value branchy (varint lengths,
  union branches) and has no vectorizable layout — there is no Arrow fast
  path to ride without the JVM module; convert long-lived Avro data to
  parquet once and query that (documented guidance, not a silent slowdown).

Supported Spark types: boolean, int, long, float, double, string, binary,
date (logical int date), timestamp/timestamp_ntz (logical long
timestamp-micros), decimal → string (documented), array<T>, map<string,T>,
struct (named record), all nullable via ["null", T] unions.
"""

from __future__ import annotations

import io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: bytearray, b: bytes) -> None:
    out += _zigzag_encode(len(b))
    out += b


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_zigzag_decode(buf))


# ------------------------------------------------------- schema translation


def spark_to_avro_schema(dt: T.DataType, name: str = "row", nullable: bool = False):
    """Spark DataType → Avro schema (JSON-able dict). Nullable fields become
    ``["null", T]`` unions, Avro's idiom for optional values."""
    if isinstance(dt, T.BooleanType):
        s = "boolean"
    elif isinstance(dt, T.IntegerType) or isinstance(dt, T.ShortType) or isinstance(dt, T.ByteType):
        s = "int"
    elif isinstance(dt, T.LongType):
        s = "long"
    elif isinstance(dt, T.FloatType):
        s = "float"
    elif isinstance(dt, T.DoubleType):
        s = "double"
    elif isinstance(dt, T.StringType):
        s = "string"
    elif isinstance(dt, T.BinaryType):
        s = "bytes"
    elif isinstance(dt, T.DateType):
        s = {"type": "int", "logicalType": "date"}
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        s = {"type": "long", "logicalType": "timestamp-micros"}
    elif isinstance(dt, T.DecimalType):
        s = "string"  # decimal-as-string: exact, engine-portable
    elif isinstance(dt, T.ArrayType):
        s = {
            "type": "array",
            "items": spark_to_avro_schema(dt.elementType, f"{name}_item", dt.containsNull),
        }
    elif isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise TypeError("avro maps require string keys")
        s = {
            "type": "map",
            "values": spark_to_avro_schema(dt.valueType, f"{name}_value", dt.valueContainsNull),
        }
    elif isinstance(dt, T.StructType):
        s = {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": spark_to_avro_schema(f.dataType, f"{name}_{f.name}", f.nullable),
                }
                for f in dt.fields
            ],
        }
    else:
        raise TypeError(f"unsupported Spark type for avro: {dt}")
    return ["null", s] if nullable else s


def avro_to_spark_type(s) -> T.DataType:
    """Avro schema (parsed JSON) → Spark DataType; returns (type, nullable)
    folded: unions with null map to their non-null branch."""
    if isinstance(s, list):  # union — only ["null", T] / [T, "null"] supported
        branches = [b for b in s if b != "null"]
        if len(branches) != 1:
            raise TypeError(f"unsupported avro union: {s}")
        return avro_to_spark_type(branches[0])
    if isinstance(s, dict):
        lt = s.get("logicalType")
        if lt == "date":
            return T.DateType()
        if lt == "timestamp-micros" or lt == "timestamp-millis":
            return T.TimestampNTZType()
        t = s["type"]
        if t == "array":
            return T.ArrayType(avro_to_spark_type(s["items"]))
        if t == "map":
            return T.MapType(T.StringType(), avro_to_spark_type(s["values"]))
        if t == "record":
            return T.StructType(
                [
                    T.StructField(f["name"], avro_to_spark_type(f["type"]), _is_nullable(f["type"]))
                    for f in s["fields"]
                ]
            )
        return avro_to_spark_type(t)
    return {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
    }[s]


def _is_nullable(s) -> bool:
    return isinstance(s, list) and "null" in s


# ------------------------------------------------------------ value codec


def _encode_value(out: bytearray, v, schema) -> None:
    if isinstance(schema, list):  # union
        if v is None:
            out += _zigzag_encode(schema.index("null"))
            return
        branch = next(i for i, b in enumerate(schema) if b != "null")
        out += _zigzag_encode(branch)
        _encode_value(out, v, schema[branch])
        return
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            import datetime as dt

            out += _zigzag_encode((v - dt.date(1970, 1, 1)).days)
            return
        if lt == "timestamp-micros":
            import pandas as pd

            out += _zigzag_encode(int(pd.Timestamp(v).value // 1000))
            return
        t = schema["type"]
        if t == "array":
            if len(v):
                out += _zigzag_encode(len(v))
                for item in v:
                    _encode_value(out, item, schema["items"])
            out += _zigzag_encode(0)
            return
        if t == "map":
            if len(v):
                out += _zigzag_encode(len(v))
                for k, val in v.items():
                    _write_bytes(out, k.encode())
                    _encode_value(out, val, schema["values"])
            out += _zigzag_encode(0)
            return
        if t == "record":
            for f in schema["fields"]:
                _encode_value(out, v[f["name"]], f["type"])
            return
        return _encode_value(out, v, t)
    if schema == "boolean":
        out.append(1 if v else 0)
    elif schema in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif schema == "float":
        out += struct.pack("<f", float(v))
    elif schema == "double":
        out += struct.pack("<d", float(v))
    elif schema == "string":
        _write_bytes(out, str(v).encode())
    elif schema == "bytes":
        _write_bytes(out, bytes(v))
    else:
        raise TypeError(f"unsupported avro schema: {schema}")


def _decode_value(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        branch = schema[_zigzag_decode(buf)]
        return None if branch == "null" else _decode_value(buf, branch)
    if isinstance(schema, dict):
        lt = schema.get("logicalType")
        if lt == "date":
            import datetime as dt

            return dt.date(1970, 1, 1) + dt.timedelta(days=_zigzag_decode(buf))
        if lt in ("timestamp-micros", "timestamp-millis"):
            import datetime as dt

            n = _zigzag_decode(buf)
            us = n if lt == "timestamp-micros" else n * 1000
            return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        t = schema["type"]
        if t == "array":
            out = []
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (spec-permitted)
                    _zigzag_decode(buf)
                    n = -n
                for _ in range(n):
                    out.append(_decode_value(buf, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = _zigzag_decode(buf)
                if n == 0:
                    return out
                if n < 0:
                    _zigzag_decode(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode()
                    out[k] = _decode_value(buf, schema["values"])
        if t == "record":
            return {f["name"]: _decode_value(buf, f["type"]) for f in schema["fields"]}
        return _decode_value(buf, t)
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _zigzag_decode(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "string":
        return _read_bytes(buf).decode()
    if schema == "bytes":
        return _read_bytes(buf)
    raise TypeError(f"unsupported avro schema: {schema}")


# ---------------------------------------------------------------- OCF files


def _sync_marker(seed: str) -> bytes:
    import hashlib

    return hashlib.md5(seed.encode()).digest()


def _write_ocf(fh, rows, schema: dict, seed: str, block_rows: int = 4096) -> None:
    sync = _sync_marker(seed)
    fh.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    head = bytearray()
    head += _zigzag_encode(len(meta))
    for k, v in meta.items():
        _write_bytes(head, k.encode())
        _write_bytes(head, v)
    head += _zigzag_encode(0)
    fh.write(head)
    fh.write(sync)
    block = bytearray()
    n = 0
    for row in rows:
        _encode_value(block, row, schema)
        n += 1
        if n >= block_rows:
            _flush_block(fh, block, n, sync)
            block, n = bytearray(), 0
    if n:
        _flush_block(fh, block, n, sync)


def _flush_block(fh, block: bytearray, n: int, sync: bytes) -> None:
    fh.write(_zigzag_encode(n))
    fh.write(_zigzag_encode(len(block)))
    fh.write(bytes(block))
    fh.write(sync)


def _read_ocf(fh):
    """Yield (schema, row) pairs from one OCF stream."""
    assert fh.read(4) == MAGIC, "not an avro object container file"
    buf = io.BytesIO(fh.read())
    meta = {}
    while True:
        n = _zigzag_decode(buf)
        if n == 0:
            break
        if n < 0:
            _zigzag_decode(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise NotImplementedError(f"avro codec {codec!r} (only null codec)")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    while True:
        first = buf.read(1)
        if not first:
            return
        buf.seek(-1, 1)
        n_rows = _zigzag_decode(buf)
        _zigzag_decode(buf)  # byte length (null codec: payload is inline)
        for _ in range(n_rows):
            yield schema, _decode_value(buf, schema)
        assert buf.read(16) == sync, "sync marker mismatch — corrupt block"


# ------------------------------------------------------------ Spark surface


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as a directory of Avro OCF files, one per partition
    (the standard Spark file-sink layout). Null codec; see module docstring
    for the scale contract."""
    if mode == "overwrite" and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    schema = spark_to_avro_schema(df.schema, name="spark_row")
    names = [f.name for f in df.schema.fields]

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # no empty files
        import itertools

        with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as fh:
            _write_ocf(
                fh,
                ({n: r[n] for n in names} for r in itertools.chain([first], it)),
                schema,
                seed=f"{path}:{pid}",
            )

    df.rdd.foreachPartition(write_partition)
    open(os.path.join(path, "_SUCCESS"), "wb").close()


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Avro OCF files (or one file) as a DataFrame.

    The Spark schema comes from the first file's embedded writer schema
    (driver reads HEADER bytes only, not data). Decode runs executor-side,
    one task per file."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        schema, _ = next(_read_ocf(fh))
    spark_schema = avro_to_spark_type(schema)
    names = [f.name for f in spark_schema.fields]

    def decode(pdfs):
        import pandas as pd

        for pdf in pdfs:
            for fname in pdf["path"]:
                with open(fname, "rb") as fh:
                    rows = [r for _, r in _read_ocf(fh)]
                yield pd.DataFrame(
                    {n: [r[n] for r in rows] for n in names}
                    if rows
                    else {n: [] for n in names}
                )

    file_df = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        len(files)
    )
    return file_df.mapInPandas(decode, schema=spark_schema)
