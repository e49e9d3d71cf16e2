"""Unit tests for custom operators — the ITCase pattern from the reference's
test strategy (SURVEY §5: tiny in-memory tables, exact result assertions)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from fries_flink_spark.operators.joins import asof_join, interval_join
from fries_flink_spark.operators.topn import deduplicate, top_n
from fries_flink_spark.operators.windows import cumulate_agg


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:03"), "AAPL"), (2, ts("2024-01-01 10:00:07"), "AAPL"),
         (3, ts("2024-01-01 10:00:01"), "MSFT")],
        "trade_id long, t timestamp_ntz, sym string",
    )
    quotes = spark.createDataFrame(
        [("AAPL", ts("2024-01-01 10:00:00"), 100.0),
         ("AAPL", ts("2024-01-01 10:00:05"), 101.0),
         ("MSFT", ts("2024-01-01 10:00:02"), 50.0)],
        "sym string, qt timestamp_ntz, px double",
    )
    out = asof_join(trades, quotes, on="sym", left_time="t", right_time="qt",
                    right_payload=["px"]).orderBy("trade_id").collect()
    assert [r["px"] for r in out] == [100.0, 101.0, None]


def test_asof_join_tie_is_inclusive(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 00:00:05"), "k")],
                                 "id long, t timestamp_ntz, k string")
    right = spark.createDataFrame([("k", ts("2024-01-01 00:00:05"), 9.0)],
                                  "k string, qt timestamp_ntz, v double")
    out = asof_join(left, right, on="k", left_time="t", right_time="qt",
                    right_payload=["v"]).collect()
    assert out[0]["v"] == 9.0


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 00:00:01"), "k")],
                                 "id long, t timestamp_ntz, k string")
    right = spark.createDataFrame([("k", ts("2024-01-01 00:00:05"), 9.0)],
                                  "k string, qt timestamp_ntz, v double")
    assert asof_join(left, right, on="k", left_time="t", right_time="qt",
                     right_payload=["v"], how="inner").count() == 0


def test_interval_join_bounds(spark):
    a = spark.createDataFrame([(1, 10, ts("2024-01-01 00:00:00"))],
                              "id long, k long, t timestamp_ntz")
    b = spark.createDataFrame(
        [(100, 10, ts("2024-01-01 00:00:30")),   # inside [0, 60s]
         (101, 10, ts("2024-01-01 00:02:00")),   # outside
         (102, 99, ts("2024-01-01 00:00:30"))],  # wrong key
        "id long, k long, t timestamp_ntz",
    )
    al = a.select(F.col("k").alias("ak"), F.col("t").alias("at"), F.col("id").alias("aid"))
    bl = b.select(F.col("k").alias("bk"), F.col("t").alias("bt"), F.col("id").alias("bid"))
    out = interval_join(al, bl, key=F.col("ak") == F.col("bk"),
                        left_time="at", right_time="bt",
                        lower="0 SECOND", upper="60 SECOND").collect()
    assert [r["bid"] for r in out] == [100]


def test_top_n_rank_types(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 3), ("a", 1), ("b", 5)], "k string, v int"
    )
    rn = top_n(df, ["k"], [F.desc("v")], 1)
    assert rn.filter(F.col("k") == "a").count() == 1
    rk = top_n(df, ["k"], [F.desc("v")], 1, rank_type="rank")
    assert rk.filter(F.col("k") == "a").count() == 2  # ties both rank 1


def test_deduplicate_keep_last(spark):
    df = spark.createDataFrame(
        [("u1", 1, "old"), ("u1", 2, "new")], "k string, seq int, val string"
    )
    out = deduplicate(df, ["k"], [F.col("seq")], keep="last").collect()
    assert out[0]["val"] == "new"


def test_cumulate_agg_semantics(spark):
    # events at :05, :20 with max 1h / step 15m from epoch-aligned hour
    df = spark.createDataFrame(
        [(ts("2024-01-01 00:05:00"), 1.0), (ts("2024-01-01 00:20:00"), 10.0)],
        "t timestamp_ntz, v double",
    )
    out = cumulate_agg(df, "t", "1 HOUR", "15 MINUTE", [],
                       {"n": (F.count(F.lit(1)), "sum"), "s": (F.sum("v"), "sum")})
    rows = {(r["window_start"].minute, r["window_end"].minute % 60): (r["n"], r["s"])
            for r in out.collect()}
    # window [00:00, 00:15) → only first event; [00:00, 00:30)..[00:00,1:00) → both
    assert rows[(0, 15)] == (1, 1.0)
    assert rows[(0, 30)] == (2, 11.0)
    assert rows[(0, 45)] == (2, 11.0)
    assert rows[(0, 0)] == (2, 11.0)
    assert len(rows) == 4
