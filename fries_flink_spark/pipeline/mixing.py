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


def mix_temperature(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    temperature: float = 0.5,
    max_rate: float = 10.0,
) -> DataFrame:
    """Temperature-smoothed stratum rebalancing (XLM-R-style multinomial
    mixing): every stratum is up-sampled toward the largest one with rate
    ``min((n_max / n_s)^temperature, max_rate)``, so rare strata gain
    representation without exactly flattening the distribution.

    Unlike :func:`mix_weighted` the rates are **computed from the data**: one
    tiny per-stratum count aggregate, its max broadcast back — no driver
    collect, no configured dict. Replication then uses the same
    content-hash Bernoulli machinery, with the hex threshold derived
    *columnar* from the rate.

    Determinism contract: with ``temperature=0.5`` the rate is
    ``sqrt(n_max/n_s)`` — integer counts, one exact double division, and an
    IEEE-754 correctly-rounded ``sqrt`` — bit-identical on every engine.
    Other temperatures go through ``pow``, which is only ~1-ulp accurate and
    may disagree across libm implementations in the last bit (threshold
    flips need a row's hash to sit exactly on the moved boundary: ~2^-32).

    ``max_rate`` bounds the replication fan-out: an adversarial 2-row
    stratum next to a billion-row one would otherwise explode each row
    ~sqrt(5e8)× — the cap keeps output ≤ ``max_rate × |stratum|`` and is
    applied identically in the oracle.

    Scale design: counts are a two-phase aggregate on the stratum key; the
    rate join is a broadcast of |strata| rows; the replicate-filter is the
    zero-exchange explode of mix_weighted. Total: one small shuffle + one
    output-proportional scan.
    """
    if "rep" in df.columns:
        raise ValueError(
            "mix_temperature adds a 'rep' replica-index column; the input "
            "already has one — rename it first"
        )
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")

    from pyspark.sql import Window

    cnt = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    # max-over-all as a window on the |strata|-sized counts frame: keeps the
    # count aggregate a single plan subtree (a separate .agg(max) branch
    # makes Catalyst re-scan + re-aggregate the input once per branch).
    nmax = F.max("__n").over(Window.partitionBy())
    ratio = nmax.cast("double") / F.col("__n")
    powed = F.sqrt(ratio) if temperature == 0.5 else F.pow(ratio, F.lit(temperature))
    rates = cnt.select(
        stratum_col, F.least(powed, F.lit(float(max_rate))).alias("__rate")
    )
    out = df.join(F.broadcast(rates), stratum_col)

    rate = F.col("__rate")
    ceil_rate = F.greatest(F.ceil(rate), F.lit(1)).cast("int")
    out = out.withColumn("rep", F.explode(F.sequence(F.lit(1), ceil_rate)))
    frac = rate - F.floor(rate)
    # Columnar analog of sampling.frac_to_hex: fraction -> 8-hex threshold.
    # floor(x + 0.5) instead of round(): pure IEEE ops, identical on every
    # engine version; the cap at 2^32-1 avoids the 9-char "100000000" that
    # would sort before any hex.
    v = F.least(
        F.floor(frac * F.lit(float(16**8)) + F.lit(0.5)), F.lit(16**8 - 1)
    ).cast("long")
    thr = F.format_string("%08x", v)
    keep = (F.col("rep") <= F.floor(rate)) | (
        F.substring(
            F.md5(F.concat_ws("#", F.col(key_col).cast("string"), F.col("rep"))),
            1,
            8,
        )
        < thr
    )
    return out.filter(keep).drop("__rate")


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
