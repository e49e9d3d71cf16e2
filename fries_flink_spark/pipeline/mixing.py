"""Deterministic data mixing: resample sources to target mixture rates.

Training mixtures specify how many epochs of each source to consume (e.g.
wiki x2.5, web x0.3). A rate r for a source means: every row appears
floor(r) times, plus once more with probability frac(r) — decided by the
same content-hash Bernoulli trick as pipeline/sampling.py, so the mixture
is exactly reproducible across runs, partitionings, and engines.

Mechanism per row with rate r:
    for rep in 1..ceil(r):
        keep if rep <= floor(r) or md5(key # rep) prefix < hex(frac(r))

Upsampling (r > 1) replicates via an unnested integer sequence — a narrow
rowwise explode, no shuffle; downsampling (r < 1) is a pure filter. The
replica index ``rep`` rides along so downstream shuffles spread replicas of
a hot document across partitions instead of colocating them.

Scale design: zero exchanges — scan → explode(<= ceil(r) rows) → filter,
all whole-stage codegen. At 100 TB the cost is proportional to the OUTPUT
mixture size, which is the floor for any mixer.

Reference scope: not a reference-engine operator; part of the added
training-data pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import frac_to_hex


def mix_weighted(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Resample each stratum to its mixture rate (epochs); adds ``rep``.

    ``rates`` maps stratum value -> epochs (may exceed 1.0 for upsampling).
    Strata not listed use ``default_rate``. Output keeps every input column
    plus the 1-based replica index ``rep``.
    """
    for value, r in rates.items():
        if r < 0:
            raise ValueError(f"rate for {value!r} must be >= 0, got {r}")
    if "rep" in df.columns:
        raise ValueError(
            "mix_weighted adds a 'rep' replica-index column; the input already "
            "has one — rename it first (withColumnRenamed) to avoid silently "
            "overwriting it and skewing the per-(key, rep) hash decision"
        )

    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == F.lit(value), F.lit(float(r))).otherwise(
            rate
        )

    ceil_rate = F.greatest(F.ceil(rate), F.lit(1)).cast("int")
    out = df.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), ceil_rate))
    )
    whole = F.floor(rate)
    frac_thr = _frac_hex_expr(rates, default_rate, stratum_col)
    keep = (F.col("rep") <= whole) | (
        F.substring(
            F.md5(F.concat_ws("#", F.col(key_col).cast("string"), F.col("rep"))),
            1,
            8,
        )
        < frac_thr
    )
    return out.filter(keep)


def _frac_hex_expr(rates: dict[str, float], default_rate: float, stratum_col: str):
    """CASE expression of hex thresholds for the fractional part of each rate."""
    def fhex(r: float) -> str:
        return frac_to_hex(r - math.floor(r))

    thr = F.lit(fhex(default_rate))
    for value, r in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == F.lit(value), F.lit(fhex(r))).otherwise(thr)
    return thr


def mixture_stats(mixed: DataFrame, stratum_col: str) -> DataFrame:
    """Achieved mixture: rows and share per stratum.

    One aggregation for the per-stratum counts plus a broadcast join against
    the grand total (re-aggregated from the tiny per-stratum result, not the
    input) — avoids the single-partition global window a naive
    ``sum() over ()`` would force on the stats rows.
    """
    per = mixed.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_rows"))
    total = per.agg(F.sum("n_rows").alias("__total"))
    # raw quotient — rounding is presentation, and count/count ratios can land
    # exactly on decimal ties where engine round() modes disagree (portable.py)
    return per.crossJoin(F.broadcast(total)).select(
        stratum_col,
        "n_rows",
        (F.col("n_rows") / F.col("__total")).alias("share"),
    )
