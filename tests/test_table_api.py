"""Fluent Table API tests (reference model: flink-table Table.java ITCases,
e.g. .../runtime/stream/table/ and .../batch/table/ suites)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fries_flink_spark.table import (
    Over,
    SessionWindow,
    SlideWindow,
    Table,
    TumbleWindow,
)


def _t(spark, rows, schema):
    return Table(spark.createDataFrame(rows, schema))


def test_select_filter_rename_drop(spark):
    t = _t(spark, [(1, "a"), (2, "b"), (3, "a")], "id long, tag string")
    out = (
        t.filter("id > 1")
        .add_columns(double_id=F.col("id") * 2)
        .rename_columns(tag="label")
        .drop_columns("id")
        .select("label", "double_id")
        .to_df()
    )
    assert sorted(tuple(r) for r in out.collect()) == [("a", 6), ("b", 4)]


def test_group_by_select(spark):
    t = _t(spark, [(1, "a"), (2, "b"), (3, "a")], "id long, tag string")
    out = t.group_by("tag").select(F.sum("id").alias("s")).order_by("s").to_df()
    assert [r.s for r in out.collect()] == [2, 4]


def test_joins_and_setops(spark):
    a = _t(spark, [(1, "x"), (2, "y")], "id long, v string")
    b = _t(spark, [(2, "Y"), (3, "Z")], "id long, w string")
    j = a.join(b.rename_columns(id="rid"), F.col("id") == F.col("rid"))
    assert j.to_df().count() == 1
    u = a.select("id").union_all(b.select("id"))
    assert u.to_df().count() == 4
    assert a.select("id").union(b.select("id")).to_df().count() == 3
    assert a.select("id").intersect(b.select("id")).to_df().count() == 1
    assert a.select("id").minus(b.select("id")).to_df().count() == 1


def test_minus_multiset_semantics(spark):
    """SQL EXCEPT removes ALL left occurrences of any row present on the
    right — left {1,1,2} EXCEPT right {1} is {2}, not {1,2}."""
    a = _t(spark, [(1,), (1,), (2,)], "id long")
    b = _t(spark, [(1,)], "id long")
    got = sorted(r.id for r in a.minus(b).to_df().collect())
    assert got == [2]
    # minus_all keeps the surplus duplicate: {1,1,2} EXCEPT ALL {1} = {1,2}
    got_all = sorted(r.id for r in a.minus_all(b).to_df().collect())
    assert got_all == [1, 2]


def test_offset_fetch(spark):
    t = _t(spark, [(i,) for i in range(10)], "id long")
    out = t.order_by("id").offset(3).fetch(2).to_df()
    assert [r.id for r in out.collect()] == [3, 4]


def test_lateral_join_explode(spark):
    t = _t(spark, [(1, ["a", "b"])], "id long, xs array<string>")
    out = t.join_lateral(F.col("xs"), "x").select("id", "x").to_df()
    assert out.count() == 2


def test_tumble_window_group(spark):
    rows = [
        (datetime(2024, 1, 1, 0, 1), 1.0),
        (datetime(2024, 1, 1, 0, 2), 2.0),
        (datetime(2024, 1, 1, 0, 11), 5.0),
    ]
    t = _t(spark, rows, "ts timestamp, v double")
    out = (
        t.window(TumbleWindow("10 minutes", "ts"))
        .group_by()
        .select(F.sum("v").alias("s"))
        .order_by("s")
        .to_df()
    )
    assert [r.s for r in out.collect()] == [3.0, 5.0]


def test_slide_and_session_windows(spark):
    rows = [(datetime(2024, 1, 1, 0, 1), 1.0), (datetime(2024, 1, 1, 0, 30), 2.0)]
    t = _t(spark, rows, "ts timestamp, v double")
    slide = (
        t.window(SlideWindow("20 minutes", "10 minutes", "ts"))
        .group_by()
        .select(F.count("v").alias("c"))
        .to_df()
    )
    assert slide.count() >= 3  # each event lands in 2 sliding windows
    sess = (
        t.window(SessionWindow("5 minutes", "ts"))
        .group_by()
        .select(F.count("v").alias("c"))
        .to_df()
    )
    assert sess.count() == 2  # 29-minute gap splits the session


def test_over_window(spark):
    t = _t(spark, [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)], "id long, k string, v double")
    spec = Over.partition_by("k").order_by("id").unbounded().as_spec()
    out = t.over_select("id", F.sum("v").over(spec).alias("run")).to_df()
    got = {r.id: r.run for r in out.collect()}
    assert got == {1: 10.0, 2: 30.0, 3: 5.0}


def test_hint_passthrough_changes_join_strategy(spark, sf_dir):
    """Table.hint (reference DataSet.java:793-995 join hints) forwards to
    Catalyst hints: a merge hint must surface SortMergeJoin where the
    optimizer would otherwise broadcast the small side."""
    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.table import Table

    orders = Table(load_table(spark, sf_dir, "orders"))
    cust = Table(load_table(spark, sf_dir, "customer")).hint("merge")
    joined = orders.join(
        cust, orders.to_df()["o_custkey"] == cust.to_df()["c_custkey"]
    )
    plan = joined.to_df()._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan


def test_positional_project(spark):
    from fries_flink_spark.table import Table

    t = Table(spark.createDataFrame([(1, "a", 2.0)], "x int, s string, v double"))
    out = t.project(2, 0).to_df()
    assert out.columns == ["v", "x"]
    assert out.first()["v"] == 2.0


def test_pyflink_program_shape(spark):
    """A pyflink-shaped program runs unchanged: EnvironmentSettings ->
    TableEnvironment.create -> executeSql DDL -> sql_query -> execute()
    -> collect/print."""
    import pandas as pd

    from fries_flink_spark.catalog import TableEnvironment
    from fries_flink_spark.table import EnvironmentSettings, Table

    settings = EnvironmentSettings.in_batch_mode()
    assert settings.streaming is False
    env = TableEnvironment(spark)  # create(settings) spins a new session
    df = env.from_pandas(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    env.create_temporary_view("pf_t", df)
    result = Table(env.sql_query("SELECT k, v FROM pf_t ORDER BY k")).execute()
    rows = list(result.collect())
    assert [(r["k"], r["v"]) for r in rows] == [(1, "a"), (2, "b")]
    result.wait()  # idempotent
    assert Table(df).to_pandas().shape == (2, 2)
