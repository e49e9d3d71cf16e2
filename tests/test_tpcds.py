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


def test_item_color_vocabulary(spark, sf_dir):
    """i_color is the first word of p_name: non-empty, no space, and a
    strict prefix of the product name."""
    register_tpcds(spark, sf_dir)
    bad = (
        spark.table("item")
        .filter(
            (F.length("i_color") == 0)
            | F.col("i_color").contains(" ")
            | ~F.col("i_product_name").startswith(F.col("i_color"))
        )
        .count()
    )
    assert bad == 0


def test_q49_rank_bounds(spark, sf_dir, reg):
    """Every q49 row survived the top-10-by-either filter and carries a
    known channel tag."""
    rows = reg["tpcds_q49"](spark, sf_dir).collect()
    assert rows, "q49 empty at this sf"
    for r in rows:
        assert r.channel in ("web", "catalog", "store")
        assert r.return_rank <= 10 or r.currency_rank <= 10
        assert r.return_rank >= 1 and r.currency_rank >= 1


def test_q58_band_and_dev_sum(spark, sf_dir, reg):
    """q58 output rows satisfy the mutual revenue band, and the three
    deviation shares sum to 100/3 percent (in micro-units, +/- rounding)."""
    rows = reg["tpcds_q58"](spark, sf_dir).collect()
    for r in rows:
        revs = (r.ss_item_rev, r.cs_item_rev, r.ws_item_rev)
        for a in revs:
            for b in revs:
                assert 5 * b <= 10 * a <= 15 * b
        dev_sum = r.ss_dev_micro + r.cs_dev_micro + r.ws_dev_micro
        assert abs(dev_sum - 333333) <= 3


def test_q86_lattice_levels(spark, sf_dir, reg):
    """lochierarchy levels are 0/1/2; the grand-total row ranks first in its
    (single-row) partition."""
    rows = reg["tpcds_q86"](spark, sf_dir).collect()
    assert rows
    levels = {r.lochierarchy for r in rows}
    assert levels <= {0, 1, 2}
    for r in rows:
        if r.lochierarchy == 2:
            assert r.rank_within_parent == 1
        assert r.rank_within_parent >= 1


def test_q76_colname_all_null(spark, sf_dir, reg):
    """The missing-dimension-key column is NULL on every surviving row by
    construction of the IS NULL filter."""
    rows = reg["tpcds_q76"](spark, sf_dir).collect()
    assert rows
    assert all(r.col_name is None for r in rows)
    assert all(r.sales_cnt >= 1 for r in rows)


def test_cbo_substrate_value_identity(spark, sf_dir, reg, monkeypatch):
    """SPARK_GRAFT_CBO=1 swaps the temp-view substrate for ANALYZEd catalog
    tables + cost-based join reordering (reference parity: the TPC-DS e2e
    run feeds Flink per-table/column stats, TpcdsStatsProvider.java:37).
    Stats change PLANS, never values — the join-heaviest ports must return
    bit-identical rows on both substrates, and the CBO session must really
    be on catalog tables with cbo enabled."""
    from fries_flink_spark.queries import tpcds as T

    names = ["tpcds_q17", "tpcds_q64", "tpcds_q14b", "tpcds_q95"]
    register_tpcds(spark, sf_dir)
    baseline = {
        n: sorted(tuple(r) for r in reg[n].fn(spark, sf_dir).collect())
        for n in names
    }
    T._REGISTERED.pop(id(spark), None)
    T._Q14_SHARED.pop(id(spark), None)
    monkeypatch.setenv("SPARK_GRAFT_CBO", "1")
    try:
        register_tpcds(spark, sf_dir)
        assert spark.conf.get("spark.sql.cbo.enabled") == "true"
        assert spark.catalog.currentDatabase().startswith("tpcds_cbo_")
        # q17's fact-fact-fact chain must now carry catalog stats: its
        # optimized plan rows come from ANALYZE, not defaults
        assert not any(
            t.isTemporary
            for t in spark.catalog.listTables()
            if t.name == "store_sales"
        )
        for n in names:
            got = sorted(
                tuple(r) for r in reg[n].fn(spark, sf_dir).collect()
            )
            assert got == baseline[n], n
    finally:
        # restore the default substrate for the rest of the session
        spark.sql("USE default")
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        monkeypatch.delenv("SPARK_GRAFT_CBO")
        T._REGISTERED.pop(id(spark), None)
        T._Q14_SHARED.pop(id(spark), None)
        register_tpcds(spark, sf_dir)


def test_decomp_oracles_equal_direct_oracles():
    """The decomposed scale oracles (DECOMP_ORACLES, used above the 10x dir
    where the direct 3-fact fan-out plan exhausts single-box disk) must
    return exactly the direct oracles' rows — pure DuckDB at sf0.001, no
    Spark: this is an ORACLE-vs-ORACLE algebra check, independent of the
    engine compare the checker performs."""
    import duckdb

    from fries_flink_spark.queries.tpcds import DECOMP_ORACLES
    from fries_flink_spark.registry import load_all

    reg = load_all()
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, decomp_sql in sorted(DECOMP_ORACLES.items()):
        direct = con.execute(reg[name].oracle).fetchall()
        decomp = con.execute(decomp_sql).fetchall()
        assert decomp == direct, f"{name}: decomposed oracle diverges"
        assert direct, f"{name}: empty result proves nothing"


def test_key_slice_builder_exact_subset(tmp_path):
    """build_key_slice: the sliced events table is exactly the residue
    class, other tables are shared unchanged (symlinks)."""
    import os

    import duckdb

    from tools.build_key_slice import build

    dst = str(tmp_path / "slice")
    build("/root/testdata/sf0.001", dst, k=7, r=2)
    con = duckdb.connect()
    n_slice, n_bad = con.execute(
        f"SELECT count(*), count(*) FILTER (user_id % 7 != 2) "
        f"FROM '{dst}/events.parquet'"
    ).fetchone()
    n_want = con.execute(
        "SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet' "
        "WHERE user_id % 7 = 2"
    ).fetchone()[0]
    assert n_bad == 0 and n_slice == n_want > 0
    assert os.path.islink(f"{dst}/lineitem.parquet")
    li = con.execute(f"SELECT count(*) FROM '{dst}/lineitem.parquet'").fetchone()[0]
    li_src = con.execute(
        "SELECT count(*) FROM '/root/testdata/sf0.001/lineitem.parquet'"
    ).fetchone()[0]
    assert li == li_src
