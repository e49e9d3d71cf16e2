"""Text analysis operators for large-scale training-data pipelines.

Beyond-reference surface (the brief's LLM-data-pipeline operators): language
identification, quality scoring, token counting, document fingerprinting.
All pure JVM-side column expressions — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with no shuffle (per-row map only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the n-gram/marker language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["und", "der", "nicht", "das"],
    "es": ["el", "la", "los", "que"],
    "fr": ["le", "et", "les", "une"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty-safe."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    via a GPT-style pre-tokenizer regex (public pattern family)."""
    pieces = F.split(text, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])")
    return F.size(F.filter(pieces, lambda p: (p != "") & (p != " ")))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    np = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return F.when(n > 0, np / n).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    nd = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    return F.when(n > 0, nd / n).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = tokens(text)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or EN_STOPWORDS)])
    toks = tokens(F.lower(text))
    return F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda w: F.array_contains(sw, w))).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document quality in [0,1]: rewards moderate length, prose-like
    punctuation/digit ratios, and presence of stopwords (heuristics from the
    public C4/Gopher-rules family)."""
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4)
    digit_pen = F.greatest(F.lit(0.0), F.lit(1.0) - digit_ratio(text) * 4)
    sw_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return (len_score + punct_pen + digit_pen + sw_score) / 4


def detect_language(text: Column) -> Column:
    """Marker-based language ID: CJK codepoints → zh; else the language with
    the most marker-word hits; ties/none → en. Deterministic by construction."""
    toks = tokens(F.lower(text))

    def hits(words: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))

    de, es, fr = (hits(LANG_MARKERS[k]) for k in ("de", "es", "fr"))
    best = F.greatest(de, es, fr)
    return (
        F.when(text.rlike(r"[一-鿿]"), "zh")
        .when(best == 0, "en")
        .when(de == best, "de")
        .when(es == best, "es")
        .otherwise("fr")
    )


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct lowercase
    alphanumeric token set (the classic "fingerprint" clustering key)."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " ")
    toks = F.array_sort(F.array_distinct(tokens(norm)))
    return F.md5(F.array_join(toks, " "))


def gopher_rules(text: Column) -> dict[str, Column]:
    """Named Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1 "quality filtering" heuristics, public rule
    family) as boolean Columns — composable with ``pipeline/validate``
    (annotate/summarize) like any other expectation set.

    Every rule is INTEGER arithmetic (3n <= Σlen <= 10n instead of
    3 <= mean <= 10, 5·alpha >= 4·n instead of ratio >= 0.8), so the
    booleans are engine-exact with no float-boundary hazard:

    - ``words_in_range``:   20 <= word count <= 100000
    - ``mean_word_len_ok``: mean word length in [3, 10]
    - ``alpha_ratio_ok``:   >= 80% of words contain an alphabetic char
    - ``has_stopwords``:    >= 2 distinct English stopwords present
    - ``symbol_ratio_ok``:  punctuation chars < 10% of all chars

    Pure narrow column expressions — scan-fused, zero shuffles, linear at
    any corpus size.
    """
    toks = tokens(text)
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.array_intersect(F.array_distinct(tokens(F.lower(text))), sw))
    n_punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    return {
        "words_in_range": (n >= 20) & (n <= 100000),
        "mean_word_len_ok": (total >= 3 * n) & (total <= 10 * n),
        "alpha_ratio_ok": n_alpha * 5 >= n * 4,
        "has_stopwords": n_sw >= 2,
        "symbol_ratio_ok": n_punct * 10 < F.length(text),
    }
