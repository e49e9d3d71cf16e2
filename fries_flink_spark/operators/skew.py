"""Skew mitigation: salted joins and two-phase salted aggregation.

The reference handles skew with its two-phase local/global aggregation
(EnforceLocalHashAggRule, SURVEY §2.4) and leaves join skew to the user;
Spark adds AQE skew-join splitting (enabled in session.RUNTIME_CONFS), which
covers moderate skew automatically. These operators are the explicit salting
escape hatch for PATHOLOGICAL keys — the single viral document, the null-ish
default key — where one shuffle partition would otherwise receive a large
fraction of 100 TB and AQE's splits still land on one executor at a time.

- ``salted_join``: left rows scatter across n salt buckets; the (small) right
  side replicates n×. Correct for any salt assignment, so the salt is just
  uniform noise. Cost: right side × n — use for skewed-fact ⋈ modest-dim.
- ``salted_agg``: aggregate (key, salt) first — map-side + n-way spread of
  each hot key — then merge per key. For algebraic aggregates this is exactly
  Spark's partial/final split with an extra intermediate level, worth it only
  when one key dominates a partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted and the right side replicated
    n_salts×. Result is identical to ``left.join(right, keys, how)`` for
    inner/left joins; the hot key's rows spread over n_salts partitions."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right side is replicated)")
    salt = F.pmod((F.rand(seed=42) * 1_000_000).cast("long"), F.lit(n_salts))
    l_salted = left.withColumn("__salt", salt)
    r_replicated = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return l_salted.join(r_replicated, [*keys, "__salt"], how).drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation through a salt level: (keys, salt) → keys.

    ``aggs``: (out_name, kind, col) with kind ∈ sum|count|min|max (algebraic,
    decomposable). avg = sum/count at the call site.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for name, kind, col in aggs:
        if kind == "count":
            partials.append(F.count(F.lit(1)).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "sum":
            partials.append(F.sum(col).alias(f"__p_{name}"))
            finals.append(F.sum(f"__p_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(col).alias(f"__p_{name}"))
            finals.append(F.min(f"__p_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(col).alias(f"__p_{name}"))
            finals.append(F.max(f"__p_{name}").alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate kind: {kind}")
    salt = F.pmod((F.rand(seed=42) * 1_000_000).cast("long"), F.lit(n_salts))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )
