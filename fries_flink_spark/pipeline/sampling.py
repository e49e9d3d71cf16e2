"""Deterministic sampling operators for training-data pipelines.

Training pipelines need samples that are (a) reproducible across runs and
engines, (b) cheap at 100 TB, and (c) stratifiable. Spark's native
``DataFrame.sample`` is seeded per-partition, so its output changes whenever
partitioning changes — useless for lineage-stable pipelines. These operators
instead derive the sampling decision from a content hash of a key column:
the same row is kept or dropped regardless of partitioning, cluster size, or
engine.

Mechanism: ``md5(key)`` is uniform over hex strings; comparing its 8-char
prefix against a driver-computed hex threshold implements Bernoulli(p)
exactly, as a pure codegen string comparison — no RNG state, no shuffle, and
the identical predicate runs in any SQL engine (the DuckDB oracles use the
same expression verbatim).

Scale design:
- ``sample_bernoulli`` / ``sample_stratified``: narrow per-row filters; no
  exchange anywhere, whole-stage codegen, combine with any downstream plan.
- ``sample_reservoir`` (fixed-size per stratum): rank-by-hash, one shuffle on
  the stratum key. Spark >= 3.5 rewrites the ``row_number() <= n`` filter
  into WindowGroupLimit, so each map task keeps only its local top-n before
  the exchange — the distributed analog of a per-stratum reservoir.

Reference scope: the reference engine exposes only TABLESAMPLE-style random
sampling (Flink does not ship stratified/reservoir operators); these are the
pipeline-grade versions the 100 TB use case needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 16**8  # we compare the first 8 hex chars of md5


def frac_to_hex(fraction: float) -> str:
    """Map a fraction in [0, 1] to the hex-string threshold such that
    P[md5_prefix < threshold] == fraction (up to 1/2^32 granularity).

    Fraction 1.0 must keep EVERY row, but 16^8 formats as the 9-char
    "100000000", which compares LESS than any hash prefix starting with
    "1".."f" under lexicographic string order — so it is special-cased to
    "g", which sorts after every hex string in every engine.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    v = int(round(fraction * HASH_SPACE))
    if v >= HASH_SPACE:
        return "g"
    return f"{v:08x}"


def hash_prefix(key: Column) -> Column:
    """8-hex-char uniform hash of a key column (engine-portable)."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def sample_bernoulli(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``."""
    return df.filter(hash_prefix(F.col(key_col)) < F.lit(frac_to_hex(fraction)))


def sample_stratified(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample.

    ``fractions`` maps stratum value -> keep fraction; strata not listed use
    ``default_fraction``. One CASE expression, zero exchanges.
    """
    thr = F.lit(frac_to_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(frac_to_hex(frac))
        ).otherwise(thr)
    return df.filter(hash_prefix(F.col(key_col)) < thr)


def sample_reservoir(
    df: DataFrame, key_col: str, stratum_col: str, n: int
) -> DataFrame:
    """Fixed-size-``n`` deterministic sample per stratum (reservoir analog).

    Ranks rows within each stratum by content hash (ties broken by the key
    itself) and keeps the first ``n``. The hash order is a uniform random
    permutation that every engine reproduces.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash_prefix(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__rk")
    )


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float
) -> tuple[DataFrame, DataFrame]:
    """Disjoint deterministic train/holdout split on the same hash key.

    The split is stable under re-runs and data reshuffling, and the two sides
    partition the input exactly (same predicate, negated).
    """
    thr = F.lit(frac_to_hex(holdout_fraction))
    pfx = hash_prefix(F.col(key_col))
    return df.filter(pfx >= thr), df.filter(pfx < thr)


def split_by_group(
    df: DataFrame, group_col: str, holdout_fraction: float
) -> DataFrame:
    """Leakage-safe holdout: the SPLIT DECISION hashes the GROUP key (domain,
    source, dedup-cluster id, ...), so every row of a group lands on the same
    side — near-duplicates within a group can never straddle the train/eval
    boundary (the contamination mode a per-document split invites). Adds
    ``split`` ('train' | 'holdout'); zero exchanges, same content-hash
    determinism contract as the other samplers."""
    return df.withColumn(
        "split",
        F.when(
            hash_prefix(F.col(group_col)) < F.lit(frac_to_hex(holdout_fraction)),
            F.lit("holdout"),
        ).otherwise(F.lit("train")),
    )


def take_token_budget(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    part_col: str | None = None,
) -> DataFrame:
    """Deterministic exact-budget subset: order documents by the content hash
    of their id (an unbiased deterministic shuffle), keep the prefix whose
    cumulative token count stays within ``budget`` (per ``part_col`` stratum
    when given — the same per-shard window contract as pack_sequences; the
    un-stratified form serializes one window partition and is for small
    tables only). The first document exceeding the budget is excluded."""
    keys = [part_col] if part_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(hash_prefix(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", F.sum(token_col).over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )
