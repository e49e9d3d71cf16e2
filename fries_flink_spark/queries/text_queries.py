"""Text-analysis queries over the documents table (LLM-pipeline operators).

Each Spark implementation is a pure column-expression pipeline from
text/analysis.py; the oracle re-states the same arithmetic in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..portable import round_portable, round_portable_sql
from ..registry import micro, query, sorted_result
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


_PUNCT_RATIO_R = round_portable_sql(
    "length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / length(text)", 6
)
_DIGIT_RATIO_R = round_portable_sql(
    "length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)", 6
)
_MEAN_WLEN_R = round_portable_sql(
    "list_sum(list_transform("
    " list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''),"
    " w -> length(w))) * 1.0"
    " / len(list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> ''))",
    6,
)
_STOPWORD_RATIO_R = round_portable_sql(
    "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    f"               w -> list_contains([{_SW}], w))) * 1.0"
    " / len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
    "                   w -> w <> ''))",
    6,
)


@query(
    "text_quality",
    oracle=f"""
    SELECT doc_id,
           {_PUNCT_RATIO_R}    AS punct_ratio,
           {_DIGIT_RATIO_R}    AS digit_ratio,
           {_MEAN_WLEN_R}      AS mean_word_len,
           {_STOPWORD_RATIO_R} AS stopword_ratio
    FROM documents ORDER BY doc_id
    """,
)
def text_quality(spark, sf_dir):
    """Quality-signal ratios (punct/digit/word-length/stopword) — rounded to 6
    decimals on both sides with the tie-safe portable HALF_UP (portable.py:
    count/count quotients can land exactly on decimal ties)."""
    docs = load_table(spark, sf_dir, "documents")
    from ..text.analysis import stopword_ratio, tokens

    return docs.select(
        "doc_id",
        round_portable(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        round_portable(digit_ratio(F.col("text")), 6).alias("digit_ratio"),
        round_portable(mean_word_len(F.col("text")), 6).alias("mean_word_len"),
        round_portable(stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
    ).transform(sorted_result, "doc_id")


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
    ).transform(sorted_result, "doc_id")


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
           CAST(sum(n_chars) AS BIGINT) AS total_chars, avg(n_chars) AS avg_chars
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
           CAST(floor((ln(((SELECT count(*) FROM documents) + 1.0)
                          / (doc_freq + 1.0)) + 1.0) * 1e6 + 0.5)
                AS BIGINT) AS idf_r
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
        .select("token", "doc_freq", micro(F.col("idf")).alias("idf_r"))
        .orderBy(F.desc("doc_freq"), "token")
    )


_NGRAM_LIST_SQL = (
    r"list_filter(string_split_regex(trim(lower(text)), '\s+'), w -> w <> '')"
)


def _ngram_unnest_sql(n: int) -> str:
    """DuckDB rendition of text/vocab.word_ngrams: slice+join over a start
    index sequence (empty below n tokens)."""
    return f"""
      CASE WHEN len({_NGRAM_LIST_SQL}) >= {n}
           THEN list_transform(generate_series(1, len({_NGRAM_LIST_SQL}) - {n - 1}),
                               i -> array_to_string({_NGRAM_LIST_SQL}[i:i+{n - 1}], ' '))
           ELSE [] END
    """


@query(
    "text_ngram_topk",
    oracle=f"""
    WITH grams AS (
      SELECT unnest({_ngram_unnest_sql(2)}) AS ngram FROM documents
    )
    SELECT ngram, count(*) AS n_occurrences
    FROM grams GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram LIMIT 50
    """,
)
def text_ngram_topk(spark, sf_dir):
    """Top-50 word bigrams by global count (text/vocab.ngram_counts —
    per-row slice/join array expressions, two-phase agg, TakeOrdered)."""
    from ..text.vocab import ngram_counts

    docs = load_table(spark, sf_dir, "documents")
    return (
        ngram_counts(docs, "text", 2)
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(50)
    )


@query(
    "text_tfidf_topterms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                w -> w <> '')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
    ), idf AS (
      SELECT token,
             ln(((SELECT count(*) FROM documents) + 1.0) / (count(*) + 1.0)) + 1.0
               AS idf
      FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, tf.tf * idf.idf AS tfidf
      FROM tf JOIN idf USING (token)
    )
    SELECT doc_id, token, tf,
           CAST(floor(tfidf * 1e6 + 0.5) AS BIGINT) AS tfidf_r, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, token) AS rank
      FROM scored
    ) WHERE rank <= 3 AND doc_id < 100
    ORDER BY doc_id, rank
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """Per-document top-3 tf-idf terms (text/vocab.tfidf_top_terms), for the
    first 100 docs to keep the driver compare small."""
    from ..text.vocab import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, "text", "doc_id", 3)
    return (
        out.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            "token",
            "tf",
            micro(F.col("tfidf")).alias("tfidf_r"),
            "rank",
        )
        .orderBy("doc_id", "rank")
    )


@query(
    "text_decontaminate",
    oracle=f"""
    WITH bench AS (
      SELECT doc_id, unnest(list_distinct({_ngram_unnest_sql(3)})) AS g
      FROM documents WHERE source = 'src2'
    ), train AS (
      SELECT DISTINCT unnest(list_distinct({_ngram_unnest_sql(3)})) AS g
      FROM documents WHERE source = 'src0'
    )
    SELECT DISTINCT doc_id FROM bench WHERE g IN (SELECT g FROM train)
    ORDER BY doc_id
    """,
)
def text_decontaminate(spark, sf_dir):
    """Eval decontamination: src2 docs sharing any word trigram with the
    src0 'training' corpus (text/vocab.contaminated_docs — distinct-gram
    semi join, both shuffles on deduplicated keys)."""
    from ..text.vocab import contaminated_docs

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src2")
    train = docs.filter(F.col("source") == "src0")
    return contaminated_docs(bench, train, "text", "doc_id", 3).transform(sorted_result, "doc_id")


@query(
    "text_repetition",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_NGRAM_LIST_SQL} AS toks FROM documents
    ), grams AS (
      SELECT doc_id, unnest({_ngram_unnest_sql(2)}) AS g FROM documents
    ), gmax AS (
      SELECT doc_id, max(c) AS max_bigram_count FROM (
        SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
      ) GROUP BY doc_id
    )
    SELECT b.doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           CASE WHEN len(toks) > 0
                THEN {round_portable_sql('1.0 - len(list_distinct(toks)) * 1.0 / len(toks)', 6)}
                ELSE 0.0 END AS dup_token_ratio,
           coalesce(gmax.max_bigram_count, 0) AS max_bigram_count
    FROM base b LEFT JOIN gmax ON b.doc_id = gmax.doc_id
    ORDER BY b.doc_id
    """,
)
def text_repetition(spark, sf_dir):
    """Within-document repetition metrics (text/vocab.repetition_stats —
    Gopher-style quality signals; linear formulation, see module docstring)."""
    from ..text.vocab import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "text", "doc_id").orderBy("doc_id")


_CHUNK_LINES_SQL = """
    WITH __words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    __chunks AS (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS line_no, w
      FROM __words
    ),
    lines AS (
      SELECT doc_id, line_no,
             array_to_string(w[(line_no * 10 + 1):(line_no * 10 + 10)], ' ') AS line
      FROM __chunks
    )
"""


@query(
    "text_line_dedup",
    oracle=_CHUNK_LINES_SQL
    + """
    SELECT min_by(doc_id, doc_id * 1000000 + line_no) AS doc_id,
           min_by(line_no, doc_id * 1000000 + line_no) AS line_no,
           line
    FROM lines GROUP BY line
    """,
)
def text_line_dedup(spark, sf_dir):
    """C4-style exact line dedup, keep-first (text/lines.line_dedup_keep_first):
    10-word pseudo-lines (the synthetic docs are single-line), one hash
    shuffle on the line value, struct-min instead of a window sort."""
    from ..text.lines import chunk_lines, line_dedup_keep_first

    docs = load_table(spark, sf_dir, "documents")
    lines = chunk_lines(docs, "text", "doc_id", words_per_line=10)
    return line_dedup_keep_first(lines).select("doc_id", "line_no", "line")


@query(
    "text_boilerplate_strip",
    oracle=_CHUNK_LINES_SQL
    + """
    , bp AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
      ) WHERE nd >= 3
    )
    SELECT l.doc_id,
           CAST(sum(CASE WHEN bp.line IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bp.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           coalesce(string_agg(CASE WHEN bp.line IS NULL THEN l.line END, ' '
                               ORDER BY l.line_no), '') AS cleaned
    FROM lines l LEFT JOIN bp ON l.line = bp.line
    GROUP BY l.doc_id
    """,
)
def text_boilerplate_strip(spark, sf_dir):
    """Boilerplate removal (text/lines.strip_boilerplate): pseudo-lines in
    >= 3 distinct docs are stripped from every doc, which is re-assembled
    from its surviving lines in order. Broadcast anti-join against the
    vocabulary-sized boilerplate set; one doc-id shuffle to re-assemble."""
    from ..text.lines import strip_boilerplate

    docs = load_table(spark, sf_dir, "documents")
    return strip_boilerplate(docs, "text", "doc_id", min_docs=3, words_per_line=10)


@query(
    "text_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'), w -> w <> '') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, len(toks) - 1, 24)) AS s
      FROM t),
    c AS (SELECT doc_id, toks, s, CAST(s // 24 AS INTEGER) AS chunk_id FROM s)
    SELECT doc_id, chunk_id,
           len(list_slice(toks, s + 1, s + 32)) AS n_tokens,
           array_to_string(list_slice(toks, s + 1, s + 32), ' ') AS chunk_text
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def text_chunks(spark, sf_dir):
    """Overlapping-window document chunking (text/chunking.chunk_documents,
    size=32, stride=24 → 8-token overlap): zero-shuffle posexplode projection,
    the RAG / pretraining-window corpus prep step."""
    from ..text.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", size=32, stride=24).orderBy(
        "doc_id", "chunk_id"
    )


_BPE_TRAIN_MEMO: dict = {}


def _trained_merges(spark, sf_dir):
    """Run (or reuse) the Spark BPE training for this fixture dir.

    text_bpe_merges and text_bpe_encode share one deterministic training
    run; memoizing the merge list (plain Python data, session-independent)
    avoids paying the 24 vocab-sized merge jobs twice per sweep. At scaled
    fixture dirs the vocab is 200k+ words, so the duplicate run is minutes.
    """
    import os as _os

    from . import golden as _g
    from ..text.bpe import train_bpe, word_histogram

    # Keyed by (path, fixture fingerprint): a fixture rebuilt at the same
    # path within one process invalidates the memo (ADVICE r9).
    key = (_os.path.normpath(sf_dir), _g.fixture_fingerprint(sf_dir))
    if key not in _BPE_TRAIN_MEMO:
        docs = load_table(spark, sf_dir, "documents")
        _BPE_TRAIN_MEMO[key] = train_bpe(
            word_histogram(docs, "text"),
            num_merges=_g._BPE_MERGES,
            min_freq=_g._BPE_MIN_FREQ,
        )
    return _BPE_TRAIN_MEMO[key]


@query(
    "text_bpe_merges",
    # Golden-parquet oracle: independent pure-Python BPE replay
    # (queries/golden.py:_bpe_replay — no Spark, no import of text/bpe.py).
    # Integer pair counts and ASCII symbols: engine-exact.
    oracle=None,  # set below after golden import (path is static)
)
def text_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (text/bpe.py): one corpus word-count shuffle,
    then 24 vocabulary-sized merge iterations; ties (freq desc, left asc,
    right asc). Returns the learned merge table in rank order."""
    from . import golden as _g

    _g.ensure_bpe_merges(sf_dir)
    merges = _trained_merges(spark, sf_dir)
    return spark.createDataFrame(
        [(i, l, r, n) for i, (l, r, n) in enumerate(merges)],
        "rank long, lhs string, rhs string, n long",
    ).orderBy("rank")


@query(
    "text_bpe_encode",
    oracle=None,  # set below
)
def text_bpe_encode(spark, sf_dir):
    """BPE corpus encoding (text/bpe.encode_bpe): mapInPandas with broadcast
    merge ranks + per-batch word cache; per-doc token count and the first 12
    tokens, verified against the independent golden replay."""
    from . import golden as _g
    from ..text.bpe import encode_bpe

    _g.ensure_bpe_encode(sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    merges = _trained_merges(spark, sf_dir)
    enc = encode_bpe(docs.select("doc_id", "text"), "text", merges)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join(F.slice("tokens", 1, 12), "|").alias("head_tokens"),
    ).orderBy("doc_id")


def _set_bpe_oracles() -> None:
    from . import golden as _g
    from ..registry import REGISTRY

    REGISTRY["text_bpe_merges"].oracle = f"""
    SELECT rank, lhs, rhs, n
    FROM read_parquet('{_g.golden_path("text_bpe_merges", _g.DRIVER_SF_DIR)}')
    ORDER BY rank
    """
    REGISTRY["text_bpe_encode"].oracle = f"""
    SELECT doc_id, n_tokens, head_tokens
    FROM read_parquet('{_g.golden_path("text_bpe_encode", _g.DRIVER_SF_DIR)}')
    ORDER BY doc_id
    """


_set_bpe_oracles()


@query(
    "text_gopher_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '') AS toks,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> w <> '') AS ltoks
      FROM documents
    ), r AS (
      SELECT doc_id,
             len(toks) BETWEEN 20 AND 100000 AS words_in_range,
             coalesce(list_sum(list_transform(toks, w -> length(w))), 0)
               BETWEEN 3 * len(toks) AND 10 * len(toks) AS mean_word_len_ok,
             5 * len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
               >= 4 * len(toks) AS alpha_ratio_ok,
             len(list_filter(list_distinct(ltoks),
                             w -> list_contains([{_SW}], w))) >= 2 AS has_stopwords,
             10 * length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
               < length(text) AS symbol_ratio_ok
      FROM t
    )
    SELECT doc_id, words_in_range, mean_word_len_ok, alpha_ratio_ok,
           has_stopwords, symbol_ratio_ok,
           words_in_range AND mean_word_len_ok AND alpha_ratio_ok
             AND has_stopwords AND symbol_ratio_ok AS passes
    FROM r ORDER BY doc_id
    """,
)
def text_gopher_filter(spark, sf_dir):
    """Gopher quality-rule filter (text/analysis.gopher_rules): five named
    integer-arithmetic rules + the conjunction, scan-fused column
    expressions — the standard pre-training quality gate."""
    from ..text.analysis import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    rules = gopher_rules(F.col("text"))
    cols = [rules[k].alias(k) for k in rules]
    passes = None
    for k in rules:
        passes = rules[k] if passes is None else (passes & rules[k])
    return docs.select("doc_id", *cols, passes.alias("passes")).transform(sorted_result, "doc_id")


@query(
    "text_unigram_logppl",
    oracle="""
    WITH w AS (
      SELECT lower(u.word) AS word
      FROM documents,
           unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              x -> x <> '')) AS u(word)
    ), vocab AS (
      SELECT word, count(*) AS freq FROM w GROUP BY word
    ), tot AS (SELECT sum(freq) AS total FROM vocab),
    toks AS (
      SELECT d.doc_id, u.word
      FROM documents d,
           unnest(list_filter(string_split_regex(trim(lower(d.text)), '\\s+'),
                              x -> x <> '')) AS u(word)
    ), costed AS (
      SELECT t.doc_id,
             CAST(floor((ln(CAST(tot.total AS DOUBLE))
                         - ln(CAST(coalesce(v.freq, 1) AS DOUBLE))) * 1000000
                        + 0.5) AS BIGINT) AS c
      FROM toks t LEFT JOIN vocab v ON v.word = t.word, tot
    )
    SELECT doc_id, count(*) AS n_tokens, CAST(sum(c) AS BIGINT) AS cost_micro,
           CAST(floor(sum(c) * 1.0 / count(*)) AS BIGINT) AS mean_cost_micro
    FROM costed GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_unigram_logppl(spark, sf_dir):
    """Unigram LM negative log likelihood per document in integer micro-nats
    (text/lm.py — the CCNet perplexity-filter primitive with an in-engine
    unigram model): one model shuffle, broadcast vocab join, order-invariant
    integer cost sums."""
    from ..text.lm import doc_logppl

    docs = load_table(spark, sf_dir, "documents")
    return doc_logppl(docs, "text", "doc_id").select(
        "doc_id", "n_tokens", "cost_micro", "mean_cost_micro"
    ).transform(sorted_result, "doc_id")


@query(
    "text_repeated_spans",
    oracle="""
    WITH grams AS (
      SELECT doc_id, u.pos AS start, u.pos + 31 AS "end",
             substr(md5(substr(text, u.pos, 32)), 1, 16) AS h
      FROM documents,
           unnest(CASE WHEN length(text) >= 32
                       THEN generate_series(1, length(text) - 31, 4)
                       ELSE [] END) AS u(pos)
    ), hot AS (
      SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
    ), spans AS (
      SELECT g.doc_id, g.start, g."end"
      FROM grams g WHERE EXISTS (SELECT 1 FROM hot WHERE hot.h = g.h)
    ), flagged AS (
      SELECT doc_id, start, "end",
             CASE WHEN max("end") OVER (PARTITION BY doc_id ORDER BY start, "end"
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR start > max("end") OVER (PARTITION BY doc_id
                        ORDER BY start, "end"
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                  THEN 1 ELSE 0 END AS newi
      FROM spans
    ), isl AS (
      SELECT doc_id, start, "end",
             sum(newi) OVER (PARTITION BY doc_id ORDER BY start, "end"
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
      FROM flagged
    ), per_isl AS (
      SELECT doc_id, g, max("end") - min(start) + 1 AS len, count(*) AS n
      FROM isl GROUP BY doc_id, g
    ), per_doc AS (
      SELECT doc_id, sum(n) AS n_spans, sum(len) AS chars_covered
      FROM per_isl GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.chars_covered, 0) AS BIGINT) AS chars_covered
    FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_repeated_spans(spark, sf_dir):
    """Repeated-substring span detection (text/spans.py — the Lee et al.
    exact-substring dedup signal, k=32 stride=4 fingerprinting): per-doc
    repeated-span count and union coverage, gaps-and-islands windows,
    integer-exact."""
    from ..text.spans import repeated_span_stats, repeated_spans

    docs = load_table(spark, sf_dir, "documents")
    spans = repeated_spans(docs, "text", "doc_id", k=32, stride=4)
    return repeated_span_stats(docs, spans, "doc_id").orderBy("doc_id")


@query(
    "corpus_report",
    oracle=f"""
    WITH t AS (
      SELECT source, lang, n_chars,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             w -> w <> '')) AS n_words,
             CASE WHEN 10 * length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
                       < length(text) THEN 1 ELSE 0 END AS sym_ok
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(sym_ok) AS BIGINT) AS n_symbol_ok,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM t GROUP BY source ORDER BY source
    """,
)
def corpus_report(spark, sf_dir):
    """Corpus data-card report: one scan-fused aggregate per source stratum
    (doc/char/word totals, language count, symbol-rule pass count, length
    range) — the health dashboard every ingest run emits. Integer-exact."""
    from ..text.analysis import token_count

    docs = load_table(spark, sf_dir, "documents")
    sym_ok = (
        F.length(F.regexp_replace(F.col("text"), r"[^\p{Punct}]", "")) * 10
        < F.length("text")
    ).cast("int")
    return (
        docs.select(
            "source", "lang", "n_chars",
            token_count(F.col("text")).alias("n_words"),
            sym_ok.alias("sym_ok"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("sym_ok").cast("long").alias("n_symbol_ok"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


def _url_synth_sql(cast: str) -> str:
    """Deterministic messy-URL column from doc_id (documents carry no URL,
    so both engines synthesize identical recrawl-style variants: mixed-case
    scheme/host, www., default ports, tracking params, fragments, trailing
    slashes). ``cast`` = the engine's int->string cast keyword."""
    c = lambda e: f"CAST({e} AS {cast})"  # noqa: E731
    return (
        "concat('HTTP', CASE WHEN doc_id % 3 = 0 THEN 'S' ELSE '' END, '://',"
        " CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END,"
        f" 'Site', {c('doc_id % 10')}, '.Example.COM',"
        " CASE WHEN doc_id % 3 = 0 THEN ':443'"
        "      WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END,"
        f" '/Path/', {c('doc_id % 8')},"
        " CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,"
        f" '?utm_source=x&id=', {c('doc_id % 5')}, '&utm_campaign=y',"
        " CASE WHEN doc_id % 7 = 0 THEN '&fbclid=abc' ELSE '' END,"
        f" '#frag', {c('doc_id % 10')})"
    )


def _url_dedup_oracle() -> str:
    from ..text.urls import normalize_url_sql

    return f"""
    WITH u AS (
      SELECT doc_id, {_url_synth_sql('VARCHAR')} AS url FROM documents
    ), n AS (
      SELECT doc_id, {normalize_url_sql('url')} AS norm_url FROM u
    )
    SELECT norm_url, min(doc_id) AS keeper,
           CAST(count(*) - 1 AS BIGINT) AS n_dups
    FROM n GROUP BY norm_url
    ORDER BY norm_url
    """


@query("url_dedup_normalized", oracle=_url_dedup_oracle())
def q_url_dedup_normalized(spark, sf_dir):
    """URL-level dedup after normalization (text/urls.py — the CCNet/
    RefinedWeb/C4 first dedup stage): strip fragments + tracking params,
    lowercase scheme/host, drop www./default ports/trailing slash, keep the
    minimum doc_id per normalized URL. Pure codegen string expressions; one
    hash-aggregated exchange on norm_url."""
    from ..text.urls import dedup_by_url

    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", F.expr(_url_synth_sql("STRING")).alias("url")
    )
    return dedup_by_url(urls, "url", "doc_id").select(
        "norm_url",
        "keeper",
        F.col("n_dups").cast("bigint").alias("n_dups"),
    ).transform(sorted_result, "norm_url")
