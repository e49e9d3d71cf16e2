"""Iteration operator tests (reference model: DataSet.iterate /
iterateDelta ITCases, e.g. flink-tests .../iterative/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fries_flink_spark.operators.iterate import iterate, iterate_delta


def test_bulk_iteration_converges(spark):
    # x -> x/2 from 64: after 6 steps = 1
    df = spark.createDataFrame([(64.0,)], "x double")
    out = iterate(df, lambda d, i: d.select((F.col("x") / 2).alias("x")), 6)
    assert out.collect()[0].x == 1.0


def test_bulk_iteration_early_stop(spark):
    df = spark.createDataFrame([(10.0,)], "x double")
    calls = []

    def step(d, i):
        calls.append(i)
        return d.select(F.greatest(F.col("x") - 4, F.lit(0.0)).alias("x"))

    def converged(prev, cur):
        return cur.filter(F.col("x") > 0).count() == 0

    out = iterate(df, step, max_iterations=100, converged=converged)
    assert out.collect()[0].x == 0.0
    assert len(calls) == 3  # 10 -> 6 -> 2 -> 0, stop


def test_delta_iteration_connected_components(spark):
    # path graph 1-2-3-4 plus isolated 5: min-label propagation
    edges_rows = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        edges_rows + [(b, a) for a, b in edges_rows], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i, i) for i in range(1, 6)], "id long, comp long")

    def step(solution, workset, _i):
        cand = (
            workset.join(edges, workset.id == edges.src)
            .select(F.col("dst").alias("id"), F.col("comp"))
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        improved = (
            cand.alias("c")
            .join(solution.alias("s"), "id")
            .filter(F.col("c.comp") < F.col("s.comp"))
            .select("id", F.col("c.comp").alias("comp"))
        )
        return improved, improved

    out = iterate_delta(nodes, nodes, step, max_iterations=10, key_cols=["id"])
    got = {r.id: r.comp for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5}
