"""User-defined function surface (SURVEY §2.11): the reference's four UDF
kinds, each on its idiomatic Spark execution path.

Reference: ScalarFunction.java:92, TableFunction.java:135,
AggregateFunction.java:192, TableAggregateFunction.java:156; the Python
bridge pyflink/table/udf.py:310-553 distinguishes func_type "general"
(row-at-a-time over Beam) from "pandas" (Arrow-vectorized) — Spark's Python
worker has the same split natively: ``F.udf`` (pickled, row-at-a-time) vs
``pandas_udf`` (Arrow batches).

Scale guidance encoded here: the pandas path is the default; the general path
exists for parity but is the documented slow path (SURVEY §2.9: "UDFs are the
slow path"; 10-100× gap on the hot loop).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def scalar_function(fn: Callable, result_type: str, func_type: str = "pandas"):
    """ScalarFunction factory.

    func_type="pandas": ``fn`` maps pandas.Series -> pandas.Series (Arrow
    batches — the fast path). func_type="general": ``fn`` maps scalars
    (pyflink's default; row-at-a-time, for logic that can't vectorize).
    """
    if func_type == "pandas":
        return pandas_udf(fn, result_type)
    if func_type == "general":
        return F.udf(fn, result_type)
    raise ValueError("func_type must be 'pandas' or 'general'")


def table_function(fn: Callable, element_type: str):
    """TableFunction (UDTF): ``fn(row values) -> list`` of output elements;
    apply with :func:`apply_table_function` — the UDF returns an array, the
    join-lateral is an ``explode`` (SURVEY §2.11 'UDTF via explode')."""
    return F.udf(fn, f"array<{element_type}>")


def apply_table_function(
    df: DataFrame, udtf, out_name: str, *args: Column | str, outer: bool = False
) -> DataFrame:
    """Table.joinLateral(udtf) — correlate each row with the UDTF's rows."""
    exploder = F.explode_outer if outer else F.explode
    return df.select("*", exploder(udtf(*args)).alias(out_name))


def native_table_function(cls: type, returnType: str):
    """True multi-column/multi-row UDTF (Spark 4 ``F.udtf``): the closest
    analog of the reference's TableFunction.collect() — a class with
    ``eval(self, *args)`` yielding output tuples. Prefer this over the
    array-explode path when one input row fans out to rows with several
    columns; use in SQL via ``spark.udtf.register`` or laterally with
    ``udtf_obj(col)`` in select."""
    from pyspark.sql.functions import udtf

    return udtf(cls, returnType=returnType)


def aggregate_function(fn: Callable, result_type: str):
    """AggregateFunction (UDAF): ``fn(pandas.Series) -> scalar``, executed as
    a grouped-agg pandas UDF — partial aggregation does NOT apply (state is
    the whole group), so at scale keep group cardinality high and payload
    columns narrow; for algebraic aggregates prefer built-ins."""
    return pandas_udf(fn, result_type, functionType=F.PandasUDFType.GROUPED_AGG)


def apply_table_aggregate(
    df: DataFrame,
    key_cols: list[str],
    fn: Callable,
    output_schema: str,
) -> DataFrame:
    """TableAggregateFunction (emits MULTIPLE rows per group, e.g. top2):
    ``fn(key_tuple, pandas.DataFrame) -> pandas.DataFrame`` over
    ``applyInPandas`` (Table.flatAggregate:1278)."""
    return df.groupBy(*key_cols).applyInPandas(fn, schema=output_schema)
