"""DSIR-style data selection via importance resampling.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", arXiv:2302.03169): fit two bag-of-hashed-n-gram
models — one on a small TARGET corpus (the domain you want more of), one on
the RAW pool — weight every raw document by the log-likelihood ratio of its
hashed n-grams under the two models, then sample without replacement with
probability ∝ exp(weight) via the Gumbel top-k trick.

Engine mapping (all DataFrame-native, no UDFs):

1. ``hashed_grams``: unigrams + bigrams of the whitespace tokens, each
   hashed to one of 256 buckets by its md5 hex prefix. Hex-string bucket
   keys make the hash portable to any engine with md5 (the DuckDB oracles
   restate it verbatim).
2. ``bucket_log_ratio``: per-bucket Laplace-smoothed log ratio
   ``ln((t+1)/(T+B)) − ln((r+1)/(R+B))`` in integer MICRO-NATS — the same
   order-independent fixed-point discipline as text/lm.py (float sums over
   shuffled rows are summation-order dependent; integer sums are exact).
3. ``doc_importance``: explode a doc's gram instances, broadcast-join the
   256-row ratio table, integer-sum per doc. One shuffle (the per-doc agg)
   with map-side partials; the model join never shuffles.
4. ``gumbel_topk``: selection key = weight_micro + Gumbel(0,1) noise in
   micro-nats, noise derived from md5(seed|doc_id) so the draw is
   deterministic and reproducible across engines/partitionings; top-k by
   (key, id) is a sort-limit (TakeOrdered — no global sort).

Scale: the model is B=256 rows regardless of corpus size (broadcast); the
per-doc weight is one explode + one partial-agg shuffle keyed by doc id;
top-k never materializes a global sort. At 100 TB the explode dominates and
is embarrassingly parallel.

Reference scope note: the Fries/Flink reference has no data-selection
library; this module is part of the beyond-reference training-data surface
(SURVEY.md "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens

__all__ = [
    "hashed_grams",
    "bucket_counts",
    "bucket_log_ratio",
    "doc_importance",
    "gumbel_topk",
]

N_BUCKETS = 256  # md5 hex prefix length 2 -> 16^2 buckets


def hashed_grams(
    df: DataFrame, text_col: str, id_col: str, carry: list[str] | None = None
) -> DataFrame:
    """(id, [carry...,] bucket) one row per unigram/bigram INSTANCE (with
    multiplicity). Bucket = first two hex chars of md5(gram); bigrams join
    their two tokens with a single space. Single-token docs emit no bigrams.

    ``carry`` columns ride through the explode — cheaper than joining
    per-doc attributes back onto the (much larger) gram table afterwards.
    """
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in (carry or [])],
        tokens(F.lower(F.col(text_col))).alias(_T),
    )
    tc = F.col(_T)
    big = F.when(
        F.size(tc) >= 2,
        F.expr(
            f"transform(sequence(1, size({_T}) - 1),"
            f" i -> concat({_T}[i-1], ' ', {_T}[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    keep = [F.col(id_col)] + [F.col(c) for c in (carry or [])]
    out = base.select(*keep, F.explode(F.concat(tc, big)).alias("gram"))
    return out.select(
        *keep, F.substring(F.md5(F.col("gram")), 1, 2).alias("bucket")
    )


_T = "__dsir_toks"


def bucket_counts(grams: DataFrame) -> DataFrame:
    """(bucket, cnt) histogram of hashed-gram instances."""
    return grams.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def bucket_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    target_total: int,
    raw_total: int,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """(bucket, lr_micro): Laplace-smoothed log-likelihood ratio per bucket
    in integer micro-nats. Output is at most ``n_buckets`` rows — broadcast
    it into :func:`doc_importance`."""
    t = target_counts.withColumnRenamed("cnt", "t_cnt")
    r = raw_counts.withColumnRenamed("cnt", "r_cnt")
    joined = t.join(r, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )
    lr = F.log((F.col("t_cnt") + 1) / F.lit(float(target_total + n_buckets))) - F.log(
        (F.col("r_cnt") + 1) / F.lit(float(raw_total + n_buckets))
    )
    return joined.select(
        "bucket", F.floor(lr * 1e6 + F.lit(0.5)).cast("bigint").alias("lr_micro")
    )


def doc_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    log_ratio: DataFrame,
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, n_grams, weight_micro): per-document importance weight = integer
    sum of its gram instances' bucket log-ratios (micro-nats).

    Pass ``grams`` when the caller already materialized the hashed-gram
    table (e.g. to fit the bucket models) — the explode is the dominant cost
    and need not run twice."""
    if grams is None:
        grams = hashed_grams(df, text_col, id_col)
    joined = grams.join(F.broadcast(log_ratio), "bucket", "left")
    return (
        joined.select(
            F.col(id_col),
            F.coalesce("lr_micro", F.lit(0)).alias("__lr"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("__lr").alias("weight_micro"),
        )
    )


def gumbel_topk(
    weights: DataFrame, id_col: str, k: int, seed: str = "dsir"
) -> DataFrame:
    """Gumbel top-k sampling without replacement ∝ exp(weight).

    Deterministic: u ∈ (0,1) from the md5 of (seed | id), Gumbel noise
    g = −ln(−ln u) added in micro-nats; ties broken by id. Returns the k
    selected rows with their selection key (``key_micro``)."""
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    g_micro = F.floor(-F.log(-F.log(u)) * 1e6 + F.lit(0.5)).cast("bigint")
    keyed = weights.withColumn(
        "key_micro", (F.col("weight_micro") + g_micro).cast("bigint")
    )
    return keyed.orderBy(F.col("key_micro").desc(), F.col(id_col)).limit(k)
