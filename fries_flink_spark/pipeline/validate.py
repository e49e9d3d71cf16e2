"""Declarative data-quality validation (beyond-reference: the expectations
stage every production training pipeline runs before compute — null/range/
set/uniqueness checks with per-rule violation accounting; cf. Deequ /
Great Expectations in the public literature, re-expressed as plain
aggregates).

A rule is just a boolean Column ("the row is VALID"). Everything else is
derived:

- ``annotate``   adds one boolean column per rule (codegen, zero shuffle) —
  the quarantine-routing form: downstream splits valid/invalid with a
  filter, no second scan.
- ``summarize``  folds the whole table into one row per rule (count +
  violations + rate) — a single aggregate with map-side partials; at
  100 TB this is the same cost as any global count.
- ``uniqueness`` is the one rule shape that can't be a row-local Column —
  it needs a groupBy on the key; exposed separately so callers see the
  shuffle they're paying.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..portable import round_portable


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add one ``ok_<name>`` boolean per rule plus ``all_ok`` (codegen,
    no shuffle). NULL rule results count as violations (SQL three-valued
    logic would otherwise let NULLs pass every check silently)."""
    out = df
    oks = []
    for name, cond in rules.items():
        col = F.coalesce(cond, F.lit(False))
        out = out.withColumn(f"ok_{name}", col)
        oks.append(F.col(f"ok_{name}"))
    agg_ok = oks[0]
    for c in oks[1:]:
        agg_ok = agg_ok & c
    return out.withColumn("all_ok", agg_ok)


def summarize(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_rate).
    Single pass, single (tiny) aggregate; rate uses engine-portable
    rounding so oracles compare exactly."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    row = df.agg(*aggs)
    # ONE aggregate job: the per-rule rows explode out of the single result
    # row (a union of selects would re-run the full-table agg per rule)
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__v_{name}").alias("n_violations"),
                        round_portable(
                            F.col(f"__v_{name}") / F.col("__n"), 6
                        ).alias("violation_rate"),
                    )
                    for name in rules
                ]
            )
        ).alias("r")
    ).select("r.*")


def uniqueness_violations(
    df: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Keys appearing more than once, with their multiplicity — the one
    check that pays a shuffle (on the key; map-side partial counts)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
