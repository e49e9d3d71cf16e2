"""CEP engine-selection crossover probe (round-8, VERDICT r7 ask #3).

Measures the NFA sweep vs the vectorized JVM branch plan vs the 'auto'
choice on the SAME branch-enumeration workload at three key-cardinality
points (total rows held ~constant, so events-per-key sweeps across the
AUTO_VECTORIZE_RUN_LEN boundary). Prints a table; the acceptance bar is
auto <= 1.3x the better engine at every point.

Usage: python tools/cep_crossover_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fries_flink_spark.operators.cep import Pattern, match_pattern
from fries_flink_spark.session import get_spark

TOTAL_ROWS = 240_000
POINTS = [  # (n_keys, run_len) with n_keys * run_len ~= TOTAL_ROWS
    (40, 6000),      # few keys, very long runs: NFA's serial worst case
    (3000, 80),      # near the boundary
    (60_000, 4),     # many keys, short runs: JVM plan overhead dominates
]


def make_df(spark, n_keys: int, run_len: int):
    """Per key: one click then (run_len-1) errors, minute-spaced stamps —
    the branch-enumeration shape. Deterministic (no rand())."""
    n = n_keys * run_len
    return (
        spark.range(n)
        .select(
            (F.col("id") / run_len).cast("long").alias("user_id"),
            F.col("id").alias("event_id"),
            F.pmod(F.col("id"), run_len).alias("pos"),
        )
        .select(
            "user_id",
            "event_id",
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("pos") * 60
            ).alias("ts"),
            F.when(F.col("pos") == 0, F.lit("click"))
            .otherwise(F.lit("error"))
            .alias("event_type"),
        )
    )


def pattern():
    return (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .followed_by_any("b")
        .where_mask(lambda d: d["event_type"] == "error")
        .one_or_more(16)
    )


SELECT = {
    "user_id": ("key", "user_id"),
    "b_id": ("first", "b", "event_id"),
    "n_err": ("count", "b"),
}


def run(df, mode, pat=None):
    out = match_pattern(
        df,
        pat or pattern(),
        key_cols=["user_id"],
        time_col="ts",
        select=None,
        select_expr=SELECT,
        vectorized=mode,
        output_schema="user_id long, b_id long, n_err long",
        order_tiebreak=["event_id"],
        emit="all",
    )
    t0 = time.time()
    out.write.mode("overwrite").format("noop").save()
    return time.time() - t0


def events_case(spark):
    """The real events fixture: sparse masks (20% clicks / 20% errors) plus a
    30-minute within() window — the emitted-branch count is ~10^2, the NFA's
    floor-win regime."""
    from datetime import timedelta

    from fries_flink_spark.catalog import load_table

    df = load_table(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "events")
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .followed_by_any("b")
        .where_mask(lambda d: d["event_type"] == "error")
        .one_or_more(64)
        .within(timedelta(minutes=30))
    )
    return df, pat


def main():
    spark = get_spark(app_name="cep-crossover", cpus=16, shuffle_partitions=16)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"{'case':>16} {'keys':>8} {'run_len':>8} {'nfa':>8} {'jvm':>8} "
          f"{'auto':>8} {'auto/best':>10}")
    worst = 0.0
    cases = [
        (f"{nk}x{rl}", make_df(spark, nk, rl).localCheckpoint(eager=True),
         pattern(), nk, rl)
        for nk, rl in POINTS
    ]
    ev_df, ev_pat = events_case(spark)
    cases.append(("events_sf", ev_df, ev_pat, 1500, 67))
    for label, df, pat, n_keys, run_len in cases:
        times = {}
        for mode in (False, True, "auto"):
            run(df, mode, pat)  # warmup
            times[mode] = min(run(df, mode, pat), run(df, mode, pat))
        best = min(times[False], times[True])
        ratio = times["auto"] / best
        worst = max(worst, ratio)
        print(f"{label:>16} {n_keys:>8} {run_len:>8} {times[False]:>8.2f} "
              f"{times[True]:>8.2f} {times['auto']:>8.2f} {ratio:>10.2f}")
    print(f"worst auto/best ratio: {worst:.2f} (bar: 1.30)")
    spark.stop()


if __name__ == "__main__":
    main()
