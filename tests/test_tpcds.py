"""TPC-DS-lite tests: schema derivation invariants + query-level properties
(reference flink-tpcds-test answer-set matching; here the DuckDB oracle is
the answer set, so these tests check internal consistency instead)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.queries.tpcds import register_tpcds
from fries_flink_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def test_channels_partition_lineitem(spark, sf_dir):
    register_tpcds(spark, sf_dir)
    n_li = spark.table("lineitem").count()
    n_ch = sum(
        spark.table(t).count()
        for t in ("store_sales", "catalog_sales", "web_sales")
    )
    assert n_ch == n_li


def test_date_dim_invariants(spark, sf_dir):
    register_tpcds(spark, sf_dir)
    dd = spark.table("date_dim")
    assert dd.count() == dd.select("d_date_sk").distinct().count()
    bad = dd.filter(
        (F.col("d_dow") < 0)
        | (F.col("d_dow") > 6)
        | (F.col("d_moy") < 1)
        | (F.col("d_moy") > 12)
        | (F.col("d_qoy") < 1)
        | (F.col("d_qoy") > 4)
        | (F.col("d_week_seq") * 7 > F.col("d_date_sk"))
        | (F.col("d_week_seq") * 7 + 6 < F.col("d_date_sk"))
    ).count()
    assert bad == 0


def test_returns_are_channel_subsets(spark, sf_dir):
    register_tpcds(spark, sf_dir)
    sr = spark.table("store_returns")
    assert sr.count() > 0
    not_in_ss = sr.join(
        spark.table("store_sales"),
        ["ticket", "l_linenumber"],
        "left_anti",
    ).count()
    assert not_in_ss == 0


def test_q1_threshold_property(spark, sf_dir, reg):
    """Every q1 row's return total exceeds 1.2x its store average (recomputed
    independently with DataFrame ops, no SQL)."""
    register_tpcds(spark, sf_dir)
    out = reg["tpcds_q1"](spark, sf_dir)
    ctr = (
        spark.table("store_returns")
        .join(
            spark.table("date_dim").filter(F.col("d_year") == 1998),
            F.col("sold_date_sk") == F.col("d_date_sk"),
        )
        .groupBy("customer_sk", "store_sk")
        .agg(F.sum("paid_cents").alias("total"))
    )
    avg_by_store = ctr.groupBy("store_sk").agg(
        (F.avg("total") * 1.2).alias("thr")
    )
    checked = (
        out.join(avg_by_store, "store_sk")
        .filter(F.col("total_return_cents") <= F.col("thr"))
        .count()
    )
    assert checked == 0


def test_q88_bands_bounded(spark, sf_dir, reg):
    register_tpcds(spark, sf_dir)
    row = reg["tpcds_q88"](spark, sf_dir).collect()[0]
    n_ss = spark.table("store_sales").count()
    vals = list(row.asDict().values())
    assert len(vals) == 8
    assert all(0 <= v <= n_ss for v in vals)


def test_q14_rollup_shape(spark, sf_dir, reg):
    """ROLLUP emits channel-level and grand-total rows; every channel row's
    sales are <= the grand total."""
    rows = reg["tpcds_q14"](spark, sf_dir).collect()
    grand = [r for r in rows if r.channel is None]
    chans = [r for r in rows if r.channel is not None and r.brand is None]
    if grand:
        gt = grand[0].sales_cents
        assert all(c.sales_cents <= gt for c in chans)
    leaf_total = sum(
        r.sales_cents for r in rows if r.brand is not None and r.cat is not None
    )
    assert leaf_total >= 0


def test_q4_growth_predicate(spark, sf_dir, reg):
    """q4 rows are customers, unique, capped at 100."""
    out = reg["tpcds_q4"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) <= 100
    keys = [r.customer_sk for r in rows]
    assert len(set(keys)) == len(keys)


def test_register_tpcds_sf_switch(spark):
    """Switching sf_dir within one session re-registers the lite views
    (regression: a (session, sf) memo previously served stale views)."""
    from fries_flink_spark.queries.tpcds import register_tpcds

    register_tpcds(spark, "/root/testdata/sf0.001")
    n1 = spark.table("store_sales").count()
    register_tpcds(spark, "/root/testdata/sf0.01")
    n2 = spark.table("store_sales").count()
    register_tpcds(spark, "/root/testdata/sf0.001")
    n3 = spark.table("store_sales").count()
    assert n1 == n3 and n2 > n1
