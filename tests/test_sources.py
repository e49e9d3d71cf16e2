"""Round-trip tests for sources/connectors (reference test model: the
flink-formats modules' read/write ITCases)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fries_flink_spark.sources.connectors import (
    from_values,
    read_file,
    read_text,
    write_file,
)

ROWS = [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)]
SCHEMA = "id long, tag string, score double"


@pytest.fixture()
def df(spark):
    return from_values(spark, ROWS, SCHEMA)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip_formats(spark, df, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_file(df, path, fmt=fmt)
    back = read_file(spark, path, fmt=fmt, schema=SCHEMA)
    assert sorted(tuple(r) for r in back.collect()) == ROWS


def test_text_roundtrip(spark, df, tmp_path):
    path = str(tmp_path / "txt")
    write_file(df.select(F.concat_ws("|", "id", "tag").alias("value")), path, fmt="text")
    back = read_text(spark, path)
    assert sorted(r.value for r in back.collect()) == ["1|a", "2|b", "3|a"] != []


def test_partitioned_write_prunes(spark, df, tmp_path):
    path = str(tmp_path / "part")
    write_file(df, path, fmt="parquet", partition_by=["tag"])
    back = read_file(spark, path, fmt="parquet").filter(F.col("tag") == "a")
    assert back.count() == 2
    # partition pruning: only the tag=a directory is scanned
    plan = back.queryExecution if False else back._jdf.queryExecution().executedPlan().toString()
    assert "tag=b" not in plan


def test_values_source(spark):
    out = from_values(spark, [(1,), (2,)], "x long").agg(F.sum("x")).collect()
    assert out[0][0] == 3
