"""Physical-plan inspection (SURVEY §5.2 golden-plan testing, §4 optimizer).

The reference asserts optimized plans as 197 golden XML files
(flink-table-planner-blink/src/test/resources/**/*.xml). We adopt the light
version SURVEY §5 recommends: programmatic assertions over ``df.explain``
output for the properties that decide 100 TB viability —

- filters/column pruning reach the parquet scan (PushedFilters / ReadSchema),
- small dimensions broadcast instead of shuffling,
- aggregations run partial (map-side combine) before the exchange,
- operator pipelines stay inside WholeStageCodegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (df.explain prints; this returns)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the file scan (empty = full scan)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — narrow = column pruning worked."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan_string(df))


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of each physical join operator in the plan."""
    plan = plan_string(df)
    return {
        name: len(re.findall(name, plan))
        for name in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
        if re.search(name, plan)
    }


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when a map-side partial aggregate runs before the exchange —
    Flink's two-phase local/global agg (EnforceLocalHashAggRule), automatic
    in Spark."""
    return bool(re.search(r"partial_|PartialAggregate|partial aggregation",
                          plan_string(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer, wider spans = better fusion).
    AQE inserts codegen inside runtime query stages, invisible in the static
    explain; re-plan the same logical plan with AQE off to read the spans."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        replanned = df.where(F.lit(True))  # new QueryExecution under new conf
        return len(set(re.findall(r"\*\((\d+)\)", plan_string(replanned, "simple"))))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — the dominant cost at 100 TB; every one
    should be justified by a key change."""
    return len(
        re.findall(
            r"Exchange (?:hash|range|Single)", plan_string(df, "simple"), re.I
        )
    )
