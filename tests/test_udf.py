"""UDF surface tests (reference model: pyflink udf.py general/pandas split,
UserDefinedScalarFunctionITCase / TableAggregateITCase)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from fries_flink_spark.functions.udf import (
    aggregate_function,
    apply_table_aggregate,
    apply_table_function,
    scalar_function,
    table_function,
)


def test_scalar_pandas_and_general_agree(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "x long")
    fast = scalar_function(lambda s: s * 2, "long", "pandas")
    slow = scalar_function(lambda x: x * 2, "long", "general")
    a = sorted(r[0] for r in df.select(fast("x")).collect())
    b = sorted(r[0] for r in df.select(slow("x")).collect())
    assert a == b == [2, 4, 6]


def test_table_function_explode(spark):
    df = spark.createDataFrame([("a b",), ("c",)], "s string")
    udtf = table_function(lambda s: s.split(" "), "string")
    out = apply_table_function(df, udtf, "tok", "s")
    assert sorted(r.tok for r in out.collect()) == ["a", "b", "c"]


def test_table_function_outer_keeps_empty(spark):
    df = spark.createDataFrame([("",), ("x",)], "s string")
    udtf = table_function(lambda s: [w for w in s.split(" ") if w], "string")
    inner = apply_table_function(df, udtf, "tok", "s")
    outer = apply_table_function(df, udtf, "tok", "s", outer=True)
    assert inner.count() == 1 and outer.count() == 2


def test_aggregate_function_grouped(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 10.0)], "k long, v double")
    geo_mean_ish = aggregate_function(lambda s: float(s.prod() ** (1 / len(s))), "double")
    out = {r.k: r.g for r in df.groupBy("k").agg(geo_mean_ish("v").alias("g")).collect()}
    assert abs(out[1] - (8.0 ** 0.5)) < 1e-9 and out[2] == 10.0


def test_table_aggregate_top2(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (1, 9.0), (1, 7.0), (2, 1.0)], "k long, v double"
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.nlargest(2, "v")[["k", "v"]]

    out = apply_table_aggregate(df, ["k"], top2, "k long, v double")
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(1, 7.0), (1, 9.0), (2, 1.0)]


def test_cogroup(spark):
    """DataSet.coGroup / DataStream.coGroup (reference DataSet.java:1033) —
    Spark's grouped cogroup + applyInPandas."""
    a = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, v string")
    b = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k long, w double")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        k = left["k"].iloc[0] if len(left) else right["k"].iloc[0]
        return pd.DataFrame(
            [{"k": int(k), "n_left": len(left), "n_right": len(right)}]
        )

    out = (
        a.groupBy("k")
        .cogroup(b.groupBy("k"))
        .applyInPandas(merge, schema="k long, n_left long, n_right long")
    )
    got = {(r.k): (r.n_left, r.n_right) for r in out.collect()}
    assert got == {1: (2, 1), 2: (1, 0), 3: (0, 1)}


def test_native_udtf(spark):
    """Spark-4 class-based UDTF: one row fans out to multi-column rows
    (reference TableFunction.collect multi-field emission)."""
    from fries_flink_spark.functions.udf import native_table_function

    class SplitWithPos:
        def eval(self, s: str):
            for i, tok in enumerate(s.split(" ")):
                yield i, tok, len(tok)

    split_udtf = native_table_function(SplitWithPos, "pos int, tok string, n int")
    spark.udtf.register("split_with_pos", split_udtf)
    out = spark.sql(
        "SELECT * FROM split_with_pos('alpha beta gamma')"
    ).collect()
    assert [(r.pos, r.tok, r.n) for r in out] == [
        (0, "alpha", 5), (1, "beta", 4), (2, "gamma", 5)
    ]


def test_single_value_aggregate(spark):
    import pytest as _pt

    from fries_flink_spark.functions.scalar import single_value
    from pyspark.sql import functions as F

    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    got = {
        r["k"]: r["sv"]
        for r in ok.groupBy("k").agg(single_value("v").alias("sv")).collect()
    }
    assert got == {1: "a", 2: "b"}
    # Flink SingleValueAggFunction: a 2-row group is a runtime error.
    bad = spark.createDataFrame([(1, "a"), (1, "b")], "k int, v string")
    with _pt.raises(Exception, match="SINGLE_VALUE|ASSERT"):
        bad.groupBy("k").agg(single_value("v").alias("sv")).collect()
