"""Runtime join-filter pruning: cut the probe-side shuffle with a broadcast
hash-bucket filter built from the (filtered) build side.

The scale problem: in ``bigfact JOIN selective_dim``, Spark shuffles the
ENTIRE fact table even when the dim's predicate keeps 1% of keys — the
equi-join shuffle happens before any key pruning. Engines solve this with
runtime filters (bloom / in-list) pushed to the probe scan; Spark has such
an optimizer rule (``spark.sql.optimizer.runtime.bloomFilter.enabled``) but
its ``bloom_filter_agg`` expression is optimizer-internal, unavailable to
SQL/DataFrame code, and injection depends on size thresholds and stats.

This module provides the pattern explicitly, with only public operators:

1. Aggregate the build side's join keys into DISTINCT HASH BUCKETS —
   ``xxhash64(key) % n_buckets`` — a DataFrame of at most ``n_buckets``
   longs (a bloom filter with k=1, stored exactly).
2. Broadcast it and LEFT SEMI join the probe on bucket equality. This is a
   map-side filter: the probe is pruned IN ITS SCAN STAGE, before any
   exchange, at false-positive rate ~ |build keys| / n_buckets.
3. Run the real join on the surviving rows. Because step 2 only ever drops
   rows that cannot join (hash inequality implies key inequality), the
   final result is EXACTLY the plain join's result — which is what makes
   the operator oracle-checkable against a plain SQL join.

At 100 TB: the bucket table for n_buckets = 4M is ~32 MB — broadcastable;
the fact shuffle shrinks by the build side's selectivity. For a 1%-selective
dim that is a 100x reduction of the dominant exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_buckets(build: DataFrame, key: str, n_buckets: int) -> DataFrame:
    """Distinct hash buckets of the build side's join keys (<= n_buckets
    rows; two-phase distinct, map-side partials)."""
    return build.select(
        F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).alias("__bucket")
    ).distinct()


def prune_probe(
    probe: DataFrame, probe_key: str, buckets: DataFrame, n_buckets: int
) -> DataFrame:
    """Drop probe rows whose key hashes to a bucket absent from the build
    side. Broadcast left-semi: evaluated map-side in the probe's scan stage,
    no probe shuffle."""
    return probe.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(F.col(probe_key)), F.lit(n_buckets)) == F.col("__bucket"),
        "left_semi",
    )


def runtime_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    how: str = "inner",
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """``probe JOIN build`` with the probe pre-pruned by a broadcast
    hash-bucket runtime filter. Result is identical to the plain join.

    Only join types where dropping non-matching PROBE rows is
    semantics-preserving are accepted: inner / left_semi / right /
    cross. A left/full/left_anti join must keep (null-extend) probe rows
    without a build match, which the pre-filter would silently drop.
    """
    allowed = {"inner", "left_semi", "semi", "leftsemi", "right", "right_outer", "cross"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"runtime_filtered_join: how={how!r} would drop probe rows the "
            "join must retain; use a plain join or runtime-filter the build side"
        )
    buckets = key_buckets(build, build_key, n_buckets)
    pruned = prune_probe(probe, probe_key, buckets, n_buckets)
    return pruned.join(build, pruned[probe_key] == build[build_key], how)


def runtime_filtered_semi(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """LEFT SEMI variant: probe rows with a build match, bucket-pruned
    map-side first."""
    buckets = key_buckets(build, build_key, n_buckets)
    pruned = prune_probe(probe, probe_key, buckets, n_buckets)
    return pruned.join(
        build, pruned[probe_key] == build[build_key], "left_semi"
    )
