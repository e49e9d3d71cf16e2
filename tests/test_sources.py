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


# --------------------------------------------------------------------------- #
# Kafka / JDBC construction-level wiring (no connector jars in this image —
# these assert the options our wrappers configure and the documented
# env-gated failure mode; reference KafkaDynamicSource.java:67,
# JdbcDynamicTableSource.java:44).
# --------------------------------------------------------------------------- #


def _capture_reader(monkeypatch, cls):
    calls = {}

    real_option = cls.option

    def option(self, k, v):
        calls[k] = v
        return real_option(self, k, v)

    monkeypatch.setattr(cls, "option", option)
    monkeypatch.setattr(cls, "load", lambda self, *a, **kw: calls)
    return calls


def test_kafka_source_option_wiring(spark, monkeypatch):
    from pyspark.sql.streaming.readwriter import DataStreamReader

    from fries_flink_spark.streaming.sources import kafka_source

    calls = _capture_reader(monkeypatch, DataStreamReader)
    kafka_source(spark, "b1:9092,b2:9092", "events", starting_offsets="earliest")
    assert calls["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert calls["subscribe"] == "events"
    assert calls["startingOffsets"] == "earliest"


def test_kafka_source_env_gated(spark):
    import pytest as _pytest

    from fries_flink_spark.streaming.sources import kafka_source

    with _pytest.raises(Exception, match="kafka"):
        kafka_source(spark, "localhost:9092", "t")


def test_read_jdbc_partitioned_option_wiring(spark, monkeypatch):
    from pyspark.sql.readwriter import DataFrameReader

    from fries_flink_spark.sources.connectors import read_jdbc

    calls = _capture_reader(monkeypatch, DataFrameReader)
    read_jdbc(
        spark,
        "jdbc:postgresql://h/db",
        "orders",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
        fetchsize="10000",
    )
    assert calls["url"] == "jdbc:postgresql://h/db"
    assert calls["dbtable"] == "orders"
    assert calls["partitionColumn"] == "o_orderkey"
    assert (calls["lowerBound"], calls["upperBound"]) == ("0", "1000000")
    assert calls["numPartitions"] == "16"
    assert calls["fetchsize"] == "10000"


def test_read_jdbc_env_gated(spark):
    import pytest as _pytest

    from fries_flink_spark.sources.connectors import read_jdbc

    with _pytest.raises(Exception, match="[Dd]river"):
        read_jdbc(spark, "jdbc:postgresql://h/db", "orders")


def test_catalog_managed_table_sql_surface(spark, tmp_path):
    """Catalog-table smoke test (reference HiveCatalog / catalog DDL surface,
    SURVEY §2.1): Spark's session catalog provides the same CREATE TABLE /
    INSERT / SELECT / partition DDL path without a metastore service — the
    Hive metastore is a deployment choice (enableHiveSupport), not an
    operator; the SQL surface below is identical under either catalog."""
    spark.sql("DROP TABLE IF EXISTS cat_smoke")
    spark.sql(
        f"""
        CREATE TABLE cat_smoke (k INT, part STRING, v DOUBLE)
        USING parquet PARTITIONED BY (part)
        LOCATION '{tmp_path}/cat_smoke'
        """
    )
    try:
        # partition columns move to the end of the table schema: (k, v, part)
        spark.sql(
            "INSERT INTO cat_smoke VALUES (1, 1.5, 'a'), (2, 2.5, 'a'), (3, 9.0, 'b')"
        )
        assert spark.sql("SELECT sum(v) AS s FROM cat_smoke").collect()[0]["s"] == 13.0
        # partition pruning is visible in the catalog: one partition dropped
        parts = {r[0] for r in spark.sql("SHOW PARTITIONS cat_smoke").collect()}
        assert parts == {"part=a", "part=b"}
        spark.sql("ALTER TABLE cat_smoke DROP PARTITION (part='b')")
        assert spark.sql("SELECT count(*) AS n FROM cat_smoke").collect()[0]["n"] == 2
        assert "cat_smoke" in [t.name for t in spark.catalog.listTables()]
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_smoke")
