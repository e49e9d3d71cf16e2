"""Text-analysis queries over the documents table (LLM-pipeline operators).

Each Spark implementation is a pure column-expression pipeline from
text/analysis.py; the oracle re-states the same arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from ..text.analysis import (
    EN_STOPWORDS,
    detect_language,
    digit_ratio,
    fingerprint,
    mean_word_len,
    punct_ratio,
    token_count,
)

_SW = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           w -> w <> ''))                       AS n_tokens,
           length(text)                                          AS n_chars_measured,
           n_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           round(length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                 * 1.0 / length(text), 6)                        AS punct_ratio,
           round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                 * 1.0 / length(text), 6)                        AS digit_ratio,
           round(list_sum(list_transform(
                   list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''),
                   w -> length(w))) * 1.0
                 / len(list_filter(string_split_regex(trim(text), '\\s+'),
                                   w -> w <> '')), 6)            AS mean_word_len,
           round(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                 w -> list_contains([{_SW}], w))) * 1.0
                 / len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                   w -> w <> '')), 6)            AS stopword_ratio
    FROM documents ORDER BY doc_id
    """,
)
def text_quality(spark, sf_dir):
    """Quality-signal ratios (punct/digit/word-length/stopword) — rounded to 6
    decimals on both sides for a stable hash."""
    docs = load_table(spark, sf_dir, "documents")
    from ..text.analysis import stopword_ratio, tokens

    return docs.select(
        "doc_id",
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(digit_ratio(F.col("text")), 6).alias("digit_ratio"),
        F.round(mean_word_len(F.col("text")), 6).alias("mean_word_len"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
    ).orderBy("doc_id")


@query(
    "text_langid",
    oracle="""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), scored AS (
      SELECT doc_id, text,
             len(list_filter(t, w -> list_contains(['und','der','nicht','das'], w))) AS de,
             len(list_filter(t, w -> list_contains(['el','la','los','que'], w)))     AS es,
             len(list_filter(t, w -> list_contains(['le','et','les','une'], w)))     AS fr
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN greatest(de, es, fr) = 0 THEN 'en'
                WHEN de = greatest(de, es, fr) THEN 'de'
                WHEN es = greatest(de, es, fr) THEN 'es'
                ELSE 'fr' END AS predicted_lang
    FROM scored ORDER BY doc_id
    """,
)
def text_langid(spark, sf_dir):
    """Marker-based language ID (text/analysis.detect_language)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_language(F.col("text")).alias("predicted_lang")
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(
                 list_sort(list_distinct(
                   list_filter(
                     string_split_regex(
                       trim(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g')),
                       '\\s+'),
                     w -> w <> ''))), ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark, sf_dir):
    """Sorted-token-set md5 fingerprint (text/analysis.fingerprint)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy(
        "doc_id"
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           sum(n_chars) AS total_chars, avg(n_chars) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.avg("n_chars").alias("avg_chars"),
    )


@query(
    "text_vocab_topk",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                w -> w <> '')) AS token
      FROM documents
    )
    SELECT token, count(*) AS n_occurrences
    FROM toks GROUP BY token
    ORDER BY n_occurrences DESC, token LIMIT 50
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Vocabulary head: top-50 tokens by global occurrence count
    (text/vocab.py — explode + two-phase agg + TakeOrderedAndProject)."""
    from ..text.vocab import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    return vocab_topk(docs, "text", 50)


@query(
    "text_doc_freq",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           w -> w <> ''))) AS token
      FROM documents
    ), df AS (
      SELECT token, count(*) AS doc_freq FROM toks GROUP BY token
    )
    SELECT token, doc_freq,
           round(ln(((SELECT count(*) FROM documents) + 1.0) / (doc_freq + 1.0))
                 + 1.0, 6) AS idf_r
    FROM df
    WHERE doc_freq >= 50
    ORDER BY doc_freq DESC, token
    """,
)
def text_doc_freq(spark, sf_dir):
    """Document frequency + smoothed IDF for common tokens (text/vocab.py —
    per-row array_distinct dedup before the explode, so the aggregation is a
    plain count, not a count_distinct shuffle)."""
    from ..text.vocab import doc_frequency

    docs = load_table(spark, sf_dir, "documents")
    return (
        doc_frequency(docs, "text", "doc_id")
        .filter(F.col("doc_freq") >= 50)
        .select("token", "doc_freq", F.round("idf", 6).alias("idf_r"))
        .orderBy(F.desc("doc_freq"), "token")
    )
