"""URL normalization + URL-level dedup (text/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fries_flink_spark.text.urls import dedup_by_url, normalize_url, url_host


CASES = [
    # (raw, normalized)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x#frag",
     "http://example.com/Path"),
    ("https://Site.Example.com:443/a/b?id=3&utm_campaign=y&fbclid=z",
     "https://site.example.com/a/b?id=3"),
    ("http://example.com/?utm_source=a&id=1", "http://example.com?id=1"),
    ("https://example.com/", "https://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
    ("http://example.com/CaseSensitive/Path", "http://example.com/CaseSensitive/Path"),
    ("http://www.example.com?ref=nav", "http://example.com"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(CASES)], "i int, u string")
    got = {r["i"]: r["n"] for r in df.select("i", normalize_url(F.col("u")).alias("n")).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i], want)


def test_url_host_and_dedup(spark):
    rows = [
        (1, "http://www.a.com/x/"),
        (2, "HTTP://A.COM:80/x"),      # same as 1 after normalization
        (3, "http://a.com/x?utm_source=s"),  # same again
        (4, "https://a.com/x"),        # different scheme -> distinct
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string")
    out = {r["norm_url"]: (r["keeper"], r["n_dups"]) for r in dedup_by_url(df, "url", "doc_id").collect()}
    assert out["http://a.com/x"] == (1, 2)
    assert out["https://a.com/x"] == (4, 0)
    hosts = df.select(url_host(normalize_url(F.col("url"))).alias("h")).distinct().collect()
    assert {r["h"] for r in hosts} == {"a.com"}
