"""Tests for data-layout clustering (sources/layout.py), runtime join
filters (operators/runtime_filter.py), and vocabulary ops (text/vocab.py)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.operators.runtime_filter import (
    key_buckets,
    runtime_filtered_join,
    runtime_filtered_semi,
)
from fries_flink_spark.sources.layout import write_clustered, zorder_key
from fries_flink_spark.text.vocab import doc_frequency, vocab_counts, vocab_topk


# --------------------------------------------------------------------- zorder
def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 0), (0, 3), (3, 3)], "x int, y int")
    rows = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(["x", "y"], 4).alias("z")
        ).collect()
    }
    # x occupies even bits, y odd bits
    assert rows[(1, 0)] == 0b01
    assert rows[(0, 1)] == 0b10
    assert rows[(3, 0)] == 0b0101
    assert rows[(0, 3)] == 0b1010
    assert rows[(3, 3)] == 0b1111


def test_zorder_key_validates_width():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], 16)  # 64 bits > signed long
    with pytest.raises(ValueError):
        zorder_key([], 8)


def test_write_clustered_range_disjoint_files(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_clustered")
    write_clustered(orders, path, ["o_custkey", "o_orderkey"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # each output file holds a disjoint z-key range (footer stats prunable)
    files = [f for f in glob.glob(os.path.join(path, "*.parquet"))]
    assert len(files) >= 2
    ranges = []
    for f in files:
        zf = spark.read.parquet(f).select(
            zorder_key(["o_custkey", "o_orderkey"]).alias("z")
        )
        lo, hi = zf.agg(F.min("z"), F.max("z")).collect()[0]
        if lo is not None:
            ranges.append((lo, hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint


# ------------------------------------------------------------- runtime filter
def test_runtime_filter_semi_matches_plain_semi(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    expected = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "left_semi"
    ).count()
    # tiny bucket space -> many false positives; result must STILL be exact
    for n_buckets in (8, 1 << 16):
        got = runtime_filtered_semi(
            lineitem, orders, "l_orderkey", "o_orderkey", n_buckets=n_buckets
        ).count()
        assert got == expected


def test_runtime_filter_inner_join_matches_plain(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    )
    plain = lineitem.join(
        orders, lineitem["l_orderkey"] == orders["o_orderkey"], "inner"
    )
    filtered = runtime_filtered_join(
        lineitem, orders, "l_orderkey", "o_orderkey", n_buckets=1 << 12
    )
    assert filtered.count() == plain.count()
    s1 = plain.agg(F.sum("l_extendedprice")).collect()[0][0]
    s2 = filtered.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert abs(float(s1) - float(s2)) < 1e-6


def test_runtime_filter_prunes_probe(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    one_order = load_table(spark, sf_dir, "orders").limit(1)
    buckets = key_buckets(one_order, "o_orderkey", 1 << 20)
    assert buckets.count() == 1
    pruned = lineitem.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64(F.col("l_orderkey")), F.lit(1 << 20))
        == F.col("__bucket"),
        "left_semi",
    )
    # the bucket filter leaves only rows hashing into the single kept bucket
    assert pruned.count() < lineitem.count() / 100
    # and the pruning is a broadcast semi join (map-side, no probe shuffle)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# -------------------------------------------------------------------- vocab
def test_vocab_counts_and_topk(spark):
    df = spark.createDataFrame(
        [("a b b c",), ("B c  c",), ("",)], "text string"
    )
    counts = {r["token"]: r["n_occurrences"] for r in vocab_counts(df, "text").collect()}
    assert counts == {"a": 1, "b": 3, "c": 3}
    top = vocab_topk(df, "text", 2).collect()
    # ties broken by token asc
    assert [(r["token"], r["n_occurrences"]) for r in top] == [("b", 3), ("c", 3)]


def test_doc_frequency_dedupes_within_doc(spark):
    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x z"), (3, "z")], "doc_id int, text string"
    )
    rows = {r["token"]: r for r in doc_frequency(df, "text", "doc_id").collect()}
    assert rows["x"]["doc_freq"] == 2  # not 4: per-doc dedup
    assert rows["y"]["doc_freq"] == 1
    assert rows["z"]["doc_freq"] == 2
    # smoothed IDF: rarer token has strictly higher idf
    assert rows["y"]["idf"] > rows["x"]["idf"] > 0


def test_word_ngrams_and_counts(spark):
    from fries_flink_spark.text.vocab import ngram_counts, word_ngrams

    df = spark.createDataFrame([("a b c",), ("b c",), ("x",)], "text string")
    grams = df.select(word_ngrams(F.col("text"), 2).alias("g")).collect()
    assert sorted(map(list, (r["g"] for r in grams))) == [[], ["a b", "b c"], ["b c"]]
    counts = {r["ngram"]: r["n_occurrences"] for r in ngram_counts(df, "text", 2).collect()}
    assert counts == {"a b": 1, "b c": 2}


def test_tfidf_top_terms_ranks(spark):
    from fries_flink_spark.text.vocab import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "rare common common"), (2, "common"), (3, "common other")],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(df, "text", "doc_id", 1).collect()
    top = {r["doc_id"]: r["token"] for r in out}
    # 'rare' appears in 1/3 docs -> higher idf; tf 1 * idf(rare) > tf 2 * idf(common)?
    # idf(common)=ln(4/4)+1=1, tf=2 -> 2.0 ; idf(rare)=ln(4/2)+1~1.693, tf=1 -> 1.693
    assert top[1] == "common"  # tf dominates here
    assert top[3] == "other"  # rarer term wins at equal tf


def test_contaminated_docs(spark):
    from fries_flink_spark.text.vocab import contaminated_docs

    train = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id int, text string"
    )
    bench = spark.createDataFrame(
        [(1, "a quick brown fox here"), (2, "totally different words entirely")],
        "doc_id int, text string",
    )
    hit = contaminated_docs(bench, train, "text", "doc_id", 3).collect()
    assert [r["doc_id"] for r in hit] == [1]


def test_repetition_stats_and_order_preserving_dedup(spark):
    from fries_flink_spark.text.vocab import (
        distinct_tokens_in_order,
        repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z"), (3, "")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, "text", "doc_id").collect()}
    assert rows[1]["n_tokens"] == 6 and rows[1]["n_distinct"] == 2
    assert abs(rows[1]["dup_token_ratio"] - (1 - 2 / 6)) < 1e-6
    assert rows[1]["max_bigram_count"] == 3  # "a b" x3
    assert rows[2]["dup_token_ratio"] == 0.0
    assert rows[2]["max_bigram_count"] == 1
    assert rows[3]["n_tokens"] == 0 and rows[3]["max_bigram_count"] == 0
    deduped = df.select(
        "doc_id", distinct_tokens_in_order(F.col("text")).alias("d")
    ).collect()
    got = {r["doc_id"]: list(r["d"]) for r in deduped}
    assert got[1] == ["a", "b"]  # first occurrences, original order
    assert got[2] == ["x", "y", "z"]
    assert got[3] == []
