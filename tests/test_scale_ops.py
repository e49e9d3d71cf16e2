"""Scale-path operators: sliced HOP equals the row-replicating built-in;
salted join/agg equal their unsalted renditions."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.operators.skew import salted_agg, salted_join
from fries_flink_spark.operators.windows import hop_agg_sliced

SF = "/root/testdata/sf0.001"


def test_sliced_hop_matches_builtin(spark):
    ev = load_table(spark, SF, "events")
    sliced = hop_agg_sliced(
        ev, "ts", size_s=600, slide_s=300, group_cols=[],
        aggs=[("n", "count", ""), ("total", "sum", "value"), ("mx", "max", "value")],
    )
    builtin = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"),
             F.max("value").alias("mx"))
        .select(F.unix_timestamp("w.start").alias("w_start"), "n", "total", "mx")
    )
    got = {r.w_start: (r.n, round(r.total, 6), r.mx) for r in sliced.collect()}
    want = {r.w_start: (r.n, round(r.total, 6), r.mx) for r in builtin.collect()}
    assert got == want and got


def test_sliced_hop_uneven_ratio(spark):
    """size=900 slide=600 -> gcd 300: three slices per window, windows share
    slices — the general (non-divisible) case."""
    ev = load_table(spark, SF, "events")
    sliced = hop_agg_sliced(
        ev, "ts", size_s=900, slide_s=600, group_cols=["event_type"],
        aggs=[("n", "count", "")],
    )
    builtin = (
        ev.groupBy(F.window("ts", "900 seconds", "600 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("w_start"), "event_type", "n")
    )
    got = {(r.w_start, r.event_type): r.n for r in sliced.collect()}
    want = {(r.w_start, r.event_type): r.n for r in builtin.collect()}
    assert got == want and got


def test_salted_join_matches_plain(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    plain = li.join(orders.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"])
    salted = salted_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"], n_salts=4
    )
    assert salted.count() == plain.count()
    a = salted.groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("s"))
    b = plain.groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("s"))
    got = {r.o_orderpriority: round(r.s, 6) for r in a.collect()}
    want = {r.o_orderpriority: round(r.s, 6) for r in b.collect()}
    assert got == want


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    right = spark.createDataFrame([(1, 10.0)], "k long, w double")
    out = salted_join(left, right, ["k"], n_salts=4, how="left").collect()
    got = {(r.k): r.w for r in out}
    assert got == {1: 10.0, 99: None}


def test_salted_agg_matches_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"),
        F.min("value").alias("mn"), F.max("value").alias("mx"),
    )
    salted = salted_agg(
        ev, ["event_type"],
        [("n", "count", ""), ("s", "sum", "value"),
         ("mn", "min", "value"), ("mx", "max", "value")],
        n_salts=4,
    )
    got = {r.event_type: (r.n, round(r.s, 6), r.mn, r.mx) for r in salted.collect()}
    want = {r.event_type: (r.n, round(r.s, 6), r.mn, r.mx) for r in plain.collect()}
    assert got == want


# --------------------------------------------------------------------------- #
# Connected-components cluster resolution (dedup/clusters.py)
# --------------------------------------------------------------------------- #


def test_connected_components_chain_and_triangle(spark):
    from fries_flink_spark.dedup.clusters import connected_components

    # chain 1-2-3-4 (diameter 3, exercises multi-round propagation),
    # triangle 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_keep_canonical_keeps_singletons(spark):
    from fries_flink_spark.dedup.clusters import connected_components, keep_canonical

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 99)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    cc = connected_components(edges)
    kept = sorted(r["doc_id"] for r in keep_canonical(docs, cc).collect())
    assert kept == [1, 99]


def test_interval_join_binned_equals_plain_on_hot_key(spark):
    """One mega-key (every row same user): the binned variant must return
    exactly the plain variant's pairs while only generating band-local
    candidates (the plain plan emits all n*m key-equal pairs first)."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from fries_flink_spark.operators.joins import interval_join, interval_join_binned

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, i, base + timedelta(seconds=i * 60)) for i in range(300)],
        "k long, lid long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(1, j, base + timedelta(seconds=j * 45 + 7)) for j in range(300)],
        "k long, rid long, rt timestamp",
    )
    plain = interval_join(
        left, right.withColumnRenamed("k", "k2"),
        key=F.col("k") == F.col("k2"),
        left_time="lt", right_time="rt", lower="0 SECOND", upper="5 MINUTE",
    ).select("lid", "rid")
    binned = interval_join_binned(
        left, right, key="k", left_time="lt", right_time="rt",
        lower_s=0, upper_s=300,
    ).select("lid", "rid")
    a = sorted((r.lid, r.rid) for r in plain.collect())
    b = sorted((r.lid, r.rid) for r in binned.collect())
    assert a == b and len(a) > 500  # non-trivial match set


def test_incremental_dedup_batch_vs_index(spark):
    from fries_flink_spark.dedup.minhash import (
        band_table,
        incremental_dedup,
        minhash_table,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "an entirely different corpus document about spark engines")],
        "doc_id int, text string",
    )
    batch = spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
         (12, "a genuinely novel batch document mentioning nothing similar what"),
         (13, "a genuinely novel batch document mentioning nothing similar what"),  # dup of 12
         (14, "completely unrelated text regarding distributed aggregation")],
        "doc_id int, text string",
    )
    index = band_table(minhash_table(corpus, "text", "doc_id"), "doc_id")
    survivors, new_entries = incremental_dedup(batch, index, "text", "doc_id")
    ids = sorted(r["doc_id"] for r in survivors.collect())
    assert ids == [12, 14]  # 11 collides with corpus, 13 with earlier 12
    # The appended index covers exactly the survivors.
    assert sorted(set(r["doc_id"] for r in new_entries.collect())) == [12, 14]
    # Ingest closure: re-running the SAME batch against the grown index
    # drops everything (idempotent ingest).
    grown = index.unionByName(new_entries)
    again, _ = incremental_dedup(batch, grown, "text", "doc_id")
    assert again.count() == 0


def test_aqe_skew_join_engages_and_partitioning_reuse_disables_it(spark):
    """Prove the session's AQE skew-join config actually splits a hot
    partition at runtime (skew=true in the final adaptive plan), AND pin the
    known boundary: when a downstream agg is keyed on the join key, AQE
    declines to split (it would break the reusable hash partitioning) — the
    case operators/skew.salted_join exists for."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(400_000).select(
            F.when(F.col("id") < 300_000, 0)
            .otherwise((F.col("id") % 99) + 1)
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        # global agg downstream: AQE is free to split the hot partition
        j = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )
        row = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert row["n"] == 400_000
        # keyed agg downstream: splitting would break partitioning reuse, so
        # AQE must NOT split — documents why salted_join is still needed
        g = fact.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        counts = {r["k"]: r["n"] for r in g.collect()}
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in gplan
        assert counts[0] == 300_000 and counts[5] == 1_010
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
