"""URL normalization + URL-level dedup: the first dedup stage of web-corpus
pipelines (CCNet, RefinedWeb, C4 all dedupe by normalized URL before any
content hashing — it removes the bulk of recrawl duplicates at string cost,
no shingles).

Normalization = an ordered, engine-portable regexp chain (the same
discipline as text/pii.PII_PATTERNS — every pattern is RE2-safe and runs
verbatim in Spark and DuckDB):

1. strip the #fragment,
2. lowercase the scheme://host[:port] prefix (path and query keep case —
   paths are case-sensitive on real servers),
3. drop a leading ``www.``,
4. drop default ports (``:80`` for http, ``:443`` for https),
5. drop tracking parameters (utm_*, fbclid, gclid, ref) wherever they sit
   in the query string, then repair dangling ``?``/``&`` separators,
6. strip a trailing ``/`` (``…/Path/`` ≡ ``…/Path``, ``host/`` ≡ ``host``).

URL-level dedup then keeps the minimum id per normalized URL — a plain
(norm_url) groupBy, one shuffle on the normalized string (hash it first at
scale: the group key can be md5(norm) — 16 bytes — instead of the full URL).

Scale: pure string expressions inside whole-stage codegen; the dedup is one
hash-partition exchange. No UDFs, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["URL_RULES", "normalize_url", "normalize_url_sql", "url_host", "dedup_by_url"]

# ordered (pattern, replacement) chain, applied AFTER the prefix-lowercase
# step; identical regex text for Spark (Java regex) and DuckDB (RE2)
URL_RULES: list[tuple[str, str]] = [
    (r"#.*$", ""),                                   # fragment
    (r"^(https?://)www\.", r"$1"),                   # leading www.
    (r"^(http://[^/:]+):80(/|$)", r"$1$2"),          # http default port
    (r"^(https://[^/:]+):443(/|$)", r"$1$2"),        # https default port
    (r"[?&](?:utm_[A-Za-z]+|fbclid|gclid|ref)=[^&#]*", ""),  # tracking params
    (r"^([^?&]*)&", r"$1?"),                         # '&rest' left with no '?'
    (r"\?&", "?"),                                   # repair '?&rest'
    (r"/\?", "?"),                                   # path-final slash before query
    (r"\?$", ""),                                    # dangling '?'
    (r"(.)/$", r"$1"),                               # trailing slash
]


def _lower_prefix(col: Column) -> Column:
    """Lowercase the scheme://host[:port] prefix, keep the rest as-is."""
    prefix = F.regexp_extract(col, r"(?i)^(https?://[^/?#]*)", 1)
    rest = F.regexp_replace(col, r"(?i)^https?://[^/?#]*", "")
    return F.concat(F.lower(prefix), rest)


def normalize_url(col: Column) -> Column:
    """Normalized URL as a Column (see module docstring for the steps)."""
    # fragment first (rule 0) so the prefix regex never sees one
    out = F.regexp_replace(col, URL_RULES[0][0], URL_RULES[0][1])
    out = _lower_prefix(out)
    for pat, repl in URL_RULES[1:]:
        out = F.regexp_replace(out, pat, repl)
    return out


def normalize_url_sql(expr: str) -> str:
    """The identical chain as DuckDB SQL over ``expr`` (RE2 'g' flag; DuckDB
    backreferences are written \\1 where Spark writes $1)."""
    def dd(repl: str) -> str:
        return repl.replace("$1", "\\1").replace("$2", "\\2")

    out = f"regexp_replace({expr}, '{URL_RULES[0][0]}', '', 'g')"
    out = (
        f"concat(lower(regexp_extract({out}, '(?i)^(https?://[^/?#]*)', 1)),"
        f" regexp_replace({out}, '(?i)^https?://[^/?#]*', '', 'g'))"
    )
    for pat, repl in URL_RULES[1:]:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{dd(repl)}', 'g')"
    return out


def url_host(col: Column) -> Column:
    """Host (no port) of a normalized URL."""
    return F.regexp_extract(col, r"^https?://([^/:?#]*)", 1)


def dedup_by_url(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """One keeper per normalized URL: (norm_url, keeper=min(id), n_dups).

    Groups directly on the normalized URL: string GROUP KEYS hash-aggregate
    fine — it is string AGGREGATION BUFFERS that HashAggregateExec rejects,
    and the previous md5-keyed form carried one (``min(norm_url)`` to
    recover the output column), silently planning as SortAggregate — a full
    per-partition sort on the 32-char hex key. Keying on the URL itself
    leaves only fixed-width buffers (min/count) and ships strictly fewer
    bytes: the URL once as the key, no md5 alongside it."""
    norm = normalize_url(F.col(url_col)).alias("norm_url")
    return (
        df.select(norm, F.col(id_col))
        .groupBy("norm_url")
        .agg(
            F.min(id_col).alias("keeper"),
            (F.count(F.lit(1)) - 1).alias("n_dups"),
        )
    )
