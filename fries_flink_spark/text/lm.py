"""Unigram language-model scoring: the perplexity-filter primitive.

CCNet (Wenzek et al. 2019, arXiv:1911.00359) buckets web documents by LM
perplexity and keeps the head; the real pipeline scores with a KenLM 5-gram,
which is environment-gated here (no kenlm in the container) — but the
machinery (train token statistics on the corpus, broadcast the model, score
every document, bucket on the score) is identical for a unigram model, and
the unigram model itself is trainable in-engine:

1. ``unigram_model``: one word-count shuffle → (word, freq) + the scalar
   corpus total (vocabulary-sized output, Heaps' law).
2. ``doc_logcost``: explode doc tokens, broadcast-join the vocab-sized
   model, per-doc aggregate of token costs ``ln(total) − ln(freq)``
   (= −ln p(w), in nats).

Exactness design: float sums over shuffled rows are summation-order
dependent, so per-token costs are rounded to integer MICRO-NATS
(``floor(cost·1e6 + 0.5)``) before aggregation — integer sums are
order-independent and engine-exact; the per-doc mean uses integer division.
The only residual cross-engine hazard is an ln() last-ulp landing exactly on
a micro-nat rounding boundary (same accepted residual as the repo's other
ln-based oracles, e.g. Adamic–Adar).

Scale: one corpus shuffle for the model, one for the per-doc aggregate; the
model joins broadcast (vocabulary ≪ executor memory). OOV tokens (scoring a
NEW corpus against a trained model) cost ``ln(total) − ln(oov_freq)`` with
``oov_freq = 1`` — add-one smoothing's unseen-word cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import tokens

__all__ = ["unigram_model", "doc_logcost", "doc_logppl"]


def unigram_model(df: DataFrame, text_col: str) -> tuple[DataFrame, int]:
    """((word, freq) vocabulary table, total token count) over the corpus."""
    words = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = words.agg(F.sum("freq")).first()[0] or 0
    return words, int(total)


def doc_logcost(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: DataFrame,
    total: int,
) -> DataFrame:
    """(id, n_tokens, cost_micro, mean_cost_micro): per-document unigram
    negative log likelihood in integer micro-nats (see module docstring)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
    )
    ln_total = F.log(F.lit(float(total)))
    joined = toks.join(F.broadcast(model), "word", "left")
    cost = F.floor(
        (ln_total - F.log(F.coalesce(F.col("freq"), F.lit(1)).cast("double")))
        * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return (
        joined.select(F.col(id_col), cost.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__c").alias("cost_micro"),
        )
        .withColumn(
            "mean_cost_micro",
            F.floor(F.col("cost_micro") / F.col("n_tokens")).cast("bigint"),
        )
    )


def doc_logppl(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Train-and-score in ONE job: identical output to
    ``doc_logcost(df, …, *unigram_model(df, …))`` when model and scored
    corpus are the same ``df``, at a third of the corpus passes.

    Plan shape: one explode feeds a per-(doc, word) count aggregate; the
    vocabulary and the corpus total both derive from THAT aggregate (AQE
    reuses the exchange — the explode physically runs once), the total joins
    in as a broadcast scalar instead of an eager ``.first()`` job, and
    scoring runs over distinct (doc, word) pairs with the per-pair count as
    a multiplier — typically 2-5× fewer rows into the cost join than token
    instances. Integer micro-nat arithmetic is unchanged:
    ``Σ_instances c(w) == Σ_pairs c(w)·cnt`` exactly.
    """
    # Aggregate/join on xxhash64 of the word, not the word string: the output
    # carries no words, so the 8-byte fixed key replaces a variable-length
    # UTF8 payload in BOTH corpus-sized exchanges (the (doc, word) pair agg
    # and the vocabulary agg) and in the broadcast hash relation — the same
    # hashed-key discipline as text_decontaminate/jaccard_pairs, with the
    # same accepted residual: a 64-bit collision would merge two words'
    # frequencies (odds ~|vocab|²/2⁶⁵; the string-keyed DuckDB oracle
    # doubles as a collision check at every tested SF).
    pairs = (
        df.select(
            F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .select(F.col(id_col), F.xxhash64("word").alias("__wh"))
        .groupBy(id_col, "__wh")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = pairs.groupBy("__wh").agg(F.sum("cnt").alias("freq"))
    total = vocab.agg(F.sum("freq").cast("double").alias("__total"))
    cost = F.floor(
        (F.log(F.col("__total")) - F.log(F.col("freq").cast("double"))) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return (
        pairs.join(F.broadcast(vocab), "__wh")
        .join(F.broadcast(total))
        .select(F.col(id_col), F.col("cnt"), (cost * F.col("cnt")).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum("__c").alias("cost_micro"),
        )
        .withColumn(
            "mean_cost_micro",
            F.floor(F.col("cost_micro") / F.col("n_tokens")).cast("bigint"),
        )
    )
