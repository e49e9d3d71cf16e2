"""CDC JSON formats: debezium-json and canal-json parsing into changelog rows.

Reference: flink-formats/flink-json/.../debezium/DebeziumJsonDeserializationSchema.java:60-162,
maxwell/MaxwellJsonDeserializationSchema.java:100-128
(op c/r → +I(after), u → -U(before) +U(after), d → -D(before); null-before on
u/d is a corrupt message) and .../canal/CanalJsonDeserializationSchema.java:64-67
(type INSERT/UPDATE/DELETE over a ``data`` row array, UPDATE's ``old`` array
holding only the changed fields — the before-row is data patched with old).

Spark-first lowering: ``from_json`` with an explicit envelope schema, then a
CONSTRUCT-ARRAY-AND-EXPLODE of (row_kind, payload) structs — one codegen'd
projection per message, no UDFs, composable with ``operators/changelog``
(normalize/drop_update_before) exactly like the reference's
ChangelogNormalize consumes its DecodingFormat.

Scale: parsing is per-row narrow work fused into the scan; the only shuffle
anywhere downstream is whatever the consumer (normalize) keys by.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.changelog import DELETE, INSERT, UPDATE_AFTER, UPDATE_BEFORE

__all__ = ["parse_debezium_json", "parse_canal_json", "parse_maxwell_json"]


def _emit(kind: str, payload: Column) -> Column:
    return F.struct(F.lit(kind).alias("row_kind"), payload.alias("row"))


def parse_debezium_json(
    df: DataFrame, value_col: str, row_schema: str
) -> DataFrame:
    """Parse a debezium-json message column into changelog rows.

    Returns one output row per emitted change with ``row_kind`` plus the
    payload fields flattened. ``row_schema`` is the physical row type DDL
    (e.g. ``"id BIGINT, name STRING"``).
    """
    env = F.from_json(
        F.col(value_col),
        f"struct<before: struct<{row_schema}>, after: struct<{row_schema}>, "
        "op: string, ts_ms: bigint>",
    ).alias("e")
    parsed = df.select(env)
    op = F.col("e.op")
    before = F.col("e.before")
    after = F.col("e.after")
    # unknown ops are filtered BEFORE exploding so the CASE's array branches
    # stay homogeneous (the reference throws on them; dropping keeps the
    # parse total — callers wanting strictness can pre-assert)
    out = (
        parsed.filter(op.isin("c", "r", "u", "d"))
        .select(
            F.explode(
                F.when(op.isin("c", "r"), F.array(_emit(INSERT, after)))
                .when(
                    op == "u",
                    F.array(
                        _emit(UPDATE_BEFORE, before), _emit(UPDATE_AFTER, after)
                    ),
                )
                .otherwise(F.array(_emit(DELETE, before)))
            ).alias("c")
        )
        .select(F.col("c.row_kind").alias("row_kind"), F.col("c.row.*"))
    )
    return out


def parse_canal_json(df: DataFrame, value_col: str, row_schema: str) -> DataFrame:
    """Parse a canal-json message column into changelog rows.

    Canal batches rows: ``data`` is an array; UPDATE's ``old[i]`` holds only
    the changed fields of ``data[i]`` — the UPDATE_BEFORE row is ``data[i]``
    with ``old[i]``'s non-null fields patched over it (reference
    CanalJsonDeserializationSchema FIELD_OLD handling).
    """
    field_names = [
        f.split()[0].strip() for f in row_schema.split(",") if f.strip()
    ]
    env = F.from_json(
        F.col(value_col),
        f"struct<data: array<struct<{row_schema}>>, "
        f"old: array<struct<{row_schema}>>, type: string>",
    ).alias("e")
    parsed = df.select(env).filter(
        F.col("e.type").isin("INSERT", "UPDATE", "DELETE")
    )
    typ = F.col("e.type")
    zipped = parsed.select(
        typ.alias("__t"),
        F.posexplode("e.data").alias("__i", "__row"),
        F.col("e.old").alias("__old"),
    ).select(
        "__t",
        "__row",
        F.element_at(F.col("__old"), F.col("__i") + 1).alias("__o"),
    )
    patched = F.struct(
        *[
            F.coalesce(F.col(f"__o.{n}"), F.col(f"__row.{n}")).alias(n)
            for n in field_names
        ]
    )
    out = zipped.select(
        F.explode(
            F.when(F.col("__t") == "INSERT", F.array(_emit(INSERT, F.col("__row"))))
            .when(
                F.col("__t") == "UPDATE",
                F.array(
                    _emit(UPDATE_BEFORE, patched),
                    _emit(UPDATE_AFTER, F.col("__row")),
                ),
            )
            .otherwise(F.array(_emit(DELETE, F.col("__row"))))
        ).alias("c")
    ).select(F.col("c.row_kind").alias("row_kind"), F.col("c.row.*"))
    return out


def parse_maxwell_json(df: DataFrame, value_col: str, row_schema: str) -> DataFrame:
    """Parse a maxwell-json message column into changelog rows.

    Maxwell envelopes a SINGLE row: ``data`` is the row (after-image for
    insert/update, deleted row for delete); update's ``old`` holds only the
    changed fields and the before-image is data patched with old
    (MaxwellJsonDeserializationSchema.java:100-128).
    """
    field_names = [
        f.split()[0].strip() for f in row_schema.split(",") if f.strip()
    ]
    env = F.from_json(
        F.col(value_col),
        f"struct<data: struct<{row_schema}>, old: struct<{row_schema}>, "
        "type: string>",
    ).alias("e")
    parsed = df.select(env).filter(
        F.col("e.type").isin("insert", "update", "delete")
    )
    typ = F.col("e.type")
    data = F.col("e.data")
    before = F.struct(
        *[
            F.coalesce(F.col(f"e.old.{n}"), F.col(f"e.data.{n}")).alias(n)
            for n in field_names
        ]
    )
    return parsed.select(
        F.explode(
            F.when(typ == "insert", F.array(_emit(INSERT, data)))
            .when(
                typ == "update",
                F.array(_emit(UPDATE_BEFORE, before), _emit(UPDATE_AFTER, data)),
            )
            .otherwise(F.array(_emit(DELETE, data)))
        ).alias("c")
    ).select(F.col("c.row_kind").alias("row_kind"), F.col("c.row.*"))
