"""Batch sources & sinks (SURVEY §2.1): the reference's connector/format
surface re-expressed over ``spark.read`` / ``DataFrameWriter``.

Reference mapping:
- FileSystem source/sink with formats + partitioned layout:
  flink-table/flink-table-runtime-blink/.../filesystem/FileSystemTableSource.java,
  FileSystemTableSink.java; formats under flink-formats/ (csv, json, avro,
  parquet, orc, raw text, compress).
- Values (inline rows): .../operators/values/ValuesInputFormat.java.
- JDBC: flink-connectors/flink-connector-jdbc/.../JdbcDynamicTableSource.java:44.
- Print sink: DataStream.print (DataStream.java:935).
- DataStream file sources: readTextFile (StreamExecutionEnvironment.java:1215).

Spark-first notes (these matter at 100 TB):
- Reads are plain ``spark.read.format(...)`` so Catalyst keeps predicate
  pushdown, column pruning, and partition pruning at the scan. Never collect
  and re-parallelize.
- Partitioned writes (``partitionBy``) are the reference's partitioned
  filesystem sink AND the mechanism for partition pruning on re-read.
- Bucketed writes (``bucketBy`` + saveAsTable) pre-shuffle on the bucket key
  so later equi-joins/aggregations on that key skip their exchange — the
  Spark analog of co-located/pre-partitioned inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Formats supported natively by the Spark distribution in this environment.
FORMATS = ("parquet", "csv", "json", "orc", "text", "avro")


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """FileSystemTableSource analog. For csv/json, pass an explicit schema in
    production — schema inference is an extra full scan of the data."""
    if fmt not in FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    try:
        return reader.options(**options).load(path)
    except Exception as e:
        if fmt == "avro" and "avro" in str(e).lower():
            # spark-avro module absent → from-spec pure-Python OCF reader
            # (sources/avro.py; flink-avro parity, null codec)
            from .avro import read_avro

            return read_avro(spark, path)
        raise


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """StreamExecutionEnvironment.readTextFile analog (one string column
    ``value`` per line)."""
    return spark.read.text(path)


def write_file(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    **options,
) -> None:
    """FileSystemTableSink analog with partitioned layout.

    ``partition_by`` creates the hive-style ``col=value/`` directory tree the
    reference's partitioned filesystem sink writes, and is what enables
    partition pruning when the output is read back.
    """
    if fmt not in FORMATS:
        raise ValueError(f"format {fmt!r} not in {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if compression is not None:
        options["compression"] = compression
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.options(**options).save(path)
    except Exception as e:
        if fmt == "avro" and "avro" in str(e).lower():
            # spark-avro module absent → from-spec pure-Python OCF writer
            # (sources/avro.py; null codec, one file per partition). The
            # partition_by directory layout needs the JVM module — reject
            # rather than silently flattening.
            if partition_by:
                raise NotImplementedError(
                    "partitioned avro layout requires the spark-avro module"
                ) from e
            from .avro import write_avro

            write_avro(df, path, mode=mode)
            return
        raise


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles rows into ``n_buckets`` files by
    hash of ``bucket_cols`` so equi-joins / aggregations on those keys read
    co-located data with NO exchange. The Spark answer to Flink's
    pre-partitioned inputs / reinterpretAsKeyedStream."""
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def from_values(
    spark: SparkSession, rows, schema: StructType | str | None = None
) -> DataFrame:
    """ValuesInputFormat analog — inline literal rows."""
    return spark.createDataFrame(rows, schema=schema)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    **options,
) -> DataFrame:
    """JdbcDynamicTableSource analog.

    Parallel read strategies (pick one, as the reference's scan options do):
    ``partition_column``+bounds+``num_partitions`` generates range predicates,
    or explicit ``predicates`` one per partition. Requires the JDBC driver jar
    on the classpath — none is bundled in this environment, so this is the
    wiring, exercised against in-memory DBs when available.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def print_sink(df: DataFrame, n: int = 20, truncate: bool = True) -> None:
    """DataStream.print analog."""
    df.show(n=n, truncate=truncate)
