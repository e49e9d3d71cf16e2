"""Streaming sources (SURVEY §2.1 DataStream/Table sources → readStream).

Reference: StreamExecutionEnvironment sources (fromCollection:1056,
readTextFile:1215, readFile:1272, socketTextStream:1540, addSource:1674),
KafkaDynamicSource.java:67, FileSystemTableSource.java, rate-limited test
sources. Spark: ``spark.readStream.format(...)`` — file, kafka, socket, rate.

For tests/local runs, ``stream_from_table`` replays a batch table as a
file-backed stream with ``maxFilesPerTrigger`` so a bounded input drives a
real incremental streaming query to completion.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP: Spark watermarks/windows on
    streams require TimestampType, and the session timezone is pinned to UTC
    (session.RUNTIME_CONFS) so the cast is value-stable."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Monotonic (timestamp, value) test stream — Flink's datagen connector."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Line stream from a socket (Flink socketTextStream)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def file_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet", **options
) -> DataFrame:
    """Directory-watching file source (Flink FileSystemTableSource /
    StreamingFileSink reader side)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def kafka_source(
    spark: SparkSession, brokers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Kafka source (reference KafkaDynamicSource.java:67). The kafka
    connector jar isn't in this image — constructing the reader works;
    starting the query requires the package on the classpath."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def stream_from_df(
    df: DataFrame,
    n_chunks: int = 4,
    files_per_trigger: int = 1,
    work_dir: str | None = None,
    order_col: str | None = "ts",
) -> tuple[DataFrame, str]:
    """Replay a batch DataFrame as a bounded stream of ``n_chunks`` micro-batch
    files. Returns (streaming df, staging dir).

    When ``order_col`` is present, chunks are range-partitioned on it and file
    mtimes are stamped in chunk order, so the file source replays the data
    roughly chronologically (rows within a chunk stay unordered — exactly the
    bounded out-of-orderness a watermark must absorb). Without this,
    cross-chunk disorder is unbounded and watermarked stateful ops silently
    drop late rows, which no real watermarked pipeline would tolerate."""
    spark = df.sparkSession
    stage = work_dir or tempfile.mkdtemp(prefix="stream_replay_")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        if order_col and order_col in df.columns:
            chunked = df.repartitionByRange(n_chunks, order_col)
        else:
            chunked = df.repartition(n_chunks)
        chunked.write.mode("overwrite").parquet(stage)
        # part-NNNNN index == range-partition index == time order; stamp
        # strictly increasing mtimes so FileStreamSource picks them up in order.
        parts = sorted(
            f for f in os.listdir(stage)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        base = os.stat(stage).st_mtime
        for i, f in enumerate(parts):
            os.utime(os.path.join(stage, f), (base + i, base + i))
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("latestFirst", "false")
        .parquet(stage)
    )
    return _tz_normalize(sdf), stage


def stream_from_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    n_chunks: int = 4,
    files_per_trigger: int = 1,
    work_dir: str | None = None,
    order_col: str | None = "ts",
) -> tuple[DataFrame, str]:
    """Replay a benchmark table as a bounded stream (see stream_from_df)."""
    return stream_from_df(
        load_table(spark, sf_dir, name),
        n_chunks=n_chunks,
        files_per_trigger=files_per_trigger,
        work_dir=work_dir,
        order_col=order_col,
    )
