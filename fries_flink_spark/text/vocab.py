"""Vocabulary construction over text columns (corpus token statistics).

Tokenizer-training and corpus-analysis pipelines need global token
frequencies and document frequencies over the whole corpus — at 100 TB this
is the classic two-phase aggregation: explode tokens, then groupBy(token)
with map-side partial counts, so the shuffle carries one row per DISTINCT
token per map task, not one row per token occurrence.

- :func:`vocab_counts` — global occurrence count per token.
- :func:`vocab_topk` — the top-k head of the vocabulary; ``orderBy + limit``
  compiles to TakeOrderedAndProject (per-partition top-k, no full sort).
- :func:`doc_frequency` — per-token document frequency and IDF. The naive
  ``count_distinct(doc_id)`` would shuffle every (token, doc) occurrence;
  instead tokens are deduped PER ROW with ``array_distinct`` before the
  explode, which makes a plain ``count`` exact and keeps the pre-shuffle
  volume at one row per distinct token per document.

Reference scope: not a reference-engine operator (Flink ships no corpus
statistics); part of the training-data pipeline surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..portable import round_portable
from .analysis import tokens


def _norm_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (the vocabulary normalization)."""
    return tokens(F.lower(text))


def vocab_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Global token -> occurrence count (two-phase hash aggregation)."""
    return (
        df.select(F.explode(_norm_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def vocab_topk(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Top-``k`` vocabulary head by occurrence count (ties: token asc)."""
    return (
        vocab_counts(df, text_col)
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )


def doc_frequency(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token -> document frequency + IDF (ln((N+1)/(df+1)) + 1, the
    smoothed scikit-style variant so IDF stays finite and positive).

    ``array_distinct`` dedupes within each document BEFORE the explode, so
    the aggregation is a plain count with map-side partials — no
    ``count_distinct`` shuffle of raw occurrences.
    """
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    per_doc = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(_norm_tokens(F.col(text_col)))).alias("token"),
    )
    dfreq = per_doc.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    return dfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "doc_freq",
        (
            F.log((F.col("__n") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0
        ).alias("idf"),
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of word ``n``-grams (space-joined) from the normalized tokens.

    Pure array expressions: transform over a start-index sequence + slice —
    per-row, zero-shuffle, codegen. Rows with fewer than ``n`` tokens yield
    an empty array.
    """
    toks = _norm_tokens(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_counts(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Global n-gram -> occurrence count (two-phase hash aggregation)."""
    return (
        df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Per-document top-``k`` terms by tf·idf (ties: token asc).

    Term frequencies aggregate once per (doc, token); the document-frequency
    table is orders of magnitude smaller than the corpus (one row per
    distinct token), so it joins back via broadcast-style hash join on the
    token — no fact-sized shuffle beyond the tf aggregation itself. The
    top-k filter is a WindowGroupLimit (per-task top-k before the exchange).
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col), F.explode(_norm_tokens(F.col(text_col))).alias("token")
        )
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = doc_frequency(df, text_col, id_col).select("token", "idf")
    scored = tf.join(idf, "token").withColumn(
        "tfidf", F.col("tf") * F.col("idf")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(id_col, "token", "tf", "tfidf", F.col("__rk").alias("rank"))
    )


def contaminated_docs(
    benchmark: DataFrame,
    train: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark documents sharing at least one word ``n``-gram with the
    training corpus (eval decontamination).

    Both sides reduce to DISTINCT n-gram sets before the join — the train
    side one row per distinct n-gram (vocabulary-sized, not corpus-sized) —
    then a semi join on the n-gram followed by a distinct on the benchmark
    doc id. Two shuffles total, both on deduplicated keys.
    """
    # Join key: xxhash64 of the n-gram, not the string — 8-byte fixed keys
    # shrink the distinct-aggregation state and the broadcast/shuffle bytes
    # ~3x (same discipline as dedup.minhash.jaccard_pairs; collision odds
    # ~|grams|^2/2^65 are the accepted repo-wide residual).
    def hashed_grams(text: Column) -> Column:
        return F.explode(
            F.transform(
                F.array_distinct(word_ngrams(text, n)), lambda g: F.xxhash64(g)
            )
        )

    bench_grams = benchmark.select(
        F.col(id_col), hashed_grams(F.col(text_col)).alias("g")
    )
    train_grams = train.select(
        hashed_grams(F.col(text_col)).alias("g")
    ).distinct()
    return (
        bench_grams.join(train_grams, "g", "left_semi")
        .select(id_col)
        .distinct()
    )


def distinct_tokens_in_order(text: Column) -> Column:
    """Order-preserving first-occurrence token sequence (within-document
    repetition removal, the array analog of Gopher-style line dedup).

    Pure array expressions: the indexed filter keeps token i iff it does not
    appear in the prefix before i. Quadratic in DOCUMENT length only —
    per-row compute that fuses into the scan stage, never a shuffle.
    """
    toks = _norm_tokens(text)
    return F.filter(
        toks,
        lambda x, i: F.array_position(F.slice(toks, F.lit(1), i), x) == 0,
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Within-document repetition metrics (Gopher-style quality signals):
    duplicate-token ratio and the occurrence count of the most repeated
    bigram per document.

    The token ratio is linear array arithmetic in the scan stage. The
    per-doc bigram max is DELIBERATELY an explode + (doc, gram) aggregation
    + (doc) max — linear with map-side partials — rather than the tempting
    per-row ``transform(grams, g -> size(filter(grams, = g)))``, which is
    quadratic in document length in Spark's interpreted HOF evaluator
    (measured ~50x slower on the documents table at sf0.01).
    """
    toks = _norm_tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    base = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.when(n_tok > 0, round_portable(1.0 - n_distinct / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_token_ratio"),
    )
    gram_max = (
        df.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("g"),
        )
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("max_bigram_count"))
    )
    return base.join(gram_max, id_col, "left").withColumn(
        "max_bigram_count", F.coalesce("max_bigram_count", F.lit(0))
    )
