"""Streaming window aggregation + watermarks (SURVEY §2.5, §2.10).

Reference: WatermarkStrategy.java:154-169 (bounded out-of-orderness),
WatermarkAssignerOperator.java, SlicingWindowOperator.java:96 (TUMBLE/HOP/
CUMULATE slicing), EventTimeSessionWindows.java:46, allowedLateness
(WindowedStream.java:108).

Spark: ``withWatermark`` + ``groupBy(window(...))``. Bounded-out-of-orderness
is the only watermark strategy Spark offers — the same default the reference
recommends; idleness handling is unnecessary under micro-batch global
watermarks (SURVEY §2.10). Lateness: Spark's watermark delay plays both the
out-of-orderness bound and allowedLateness roles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_bounded_out_of_orderness(df: DataFrame, ts: str, delay: str) -> DataFrame:
    """WatermarkStrategy.forBoundedOutOfOrderness → withWatermark."""
    return df.withWatermark(ts, delay)


def tumble_agg(
    df: DataFrame,
    ts: str,
    size: str,
    delay: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Streaming TUMBLE aggregation (append-mode-capable once the watermark
    passes window end)."""
    return (
        df.withWatermark(ts, delay)
        .groupBy(F.window(F.col(ts), size).alias("w"), *group_cols)
        .agg(*aggs)
    )


def hop_agg(
    df: DataFrame,
    ts: str,
    size: str,
    slide: str,
    delay: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Streaming HOP aggregation."""
    return (
        df.withWatermark(ts, delay)
        .groupBy(F.window(F.col(ts), size, slide).alias("w"), *group_cols)
        .agg(*aggs)
    )


def session_agg(
    df: DataFrame,
    ts: str,
    gap: str,
    delay: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Streaming SESSION aggregation (merging windows, reference
    EventTimeSessionWindows + WindowOperator merge path)."""
    return (
        df.withWatermark(ts, delay)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), *group_cols)
        .agg(*aggs)
    )


def streaming_dedup(
    df: DataFrame, keys: list[str], ts: str, delay: str
) -> DataFrame:
    """Streaming deduplicate within the watermark horizon (reference
    deduplicate/ operator family; state TTL ≈ watermark eviction)."""
    return df.withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)


def run_to_completion(stream_df: DataFrame, query_name: str, output_mode: str):
    """Drive a bounded stream to completion into an in-memory table; returns
    the SparkSession for SELECTs against ``query_name``. Test/dev helper —
    production sinks are files/kafka via writeStream."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession
