"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Queries are forced with the noop sink (full computation, no driver transfer),
after a warm-up pass of the session. Run: python bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fries_flink_spark.registry import load_all
from fries_flink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: the operator families that dominate 100 TB pipelines —
# scan→agg, multi-way joins, window aggs, top-n, sessionization, LSH dedup,
# text metrics, vector search.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q18",
    "tpch_q21",
    "sql_exists_subquery",
    "join_inner",
    "join_asof",
    "agg_cube",
    "over_running_sum",
    "topn_per_group",
    "win_tumble",
    "win_session",
    "win_session_dynamic",
    "win_hop",
    "win_cumulate",
    "changelog_snapshot",
    "iter_pagerank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "text_quality",
    "text_langid",
    "sim_topk_bruteforce",
    "mm_image_features",
    "sample_stratified",
    "mix_weighted",
    "pack_sequences",
    "emb_quantize_int8",
    "pii_scrub",
    "text_vocab_topk",
    "text_decontaminate",
    "join_runtime_filter",
    "cep_branchy_any",
    "sql_mr_all_rows",
    # round-5 additions: quality gating, LM scoring, incremental-corpus
    # dedup, semantic dedup, balanced sharding, graph analytics
    "text_gopher_filter",
    "text_unigram_logppl",
    "dedup_incremental",
    "pipeline_shard_balance",
    "graph_triadic_census_directed",
    # round-6 additions: the TPC-DS slice's heaviest planner shapes
    "tpcds_q4",
    "tpcds_q14",
    "tpcds_q47",
]


WARMUP_SF_DIR = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.01")


#: Fixed CPU-bound probe timed before and after the query sweep. Its solo
#: steady-state time on this box is ~0.20 s (32 threads); a contaminated run
#: (concurrent build/test load) shows up as a sentinel 2x+ above that, so
#: BENCH json files are self-identifying — the round-5 lesson, where a run
#: under machine load fabricated two phantom regressions.
SENTINEL_SOLO_SEC = 0.21


def _sentinel(spark) -> float:
    t0 = time.time()
    spark.range(400_000_000).selectExpr(
        "count(if(pmod(id, 97) = 3, 1, null)) AS c"
    ).collect()
    return round(time.time() - t0, 3)


def main() -> None:
    registry = load_all()
    spark = get_spark(app_name="fries-bench", cpus=CPUS, shuffle_partitions=CPUS)
    # JMH-style warmup: run every headline query once at the smallest SF so
    # C2-JIT compiles the codegen'd stages (md5/digest paths especially) before
    # timing. On a long-lived cluster this cost amortizes to zero; without it a
    # local micro-bench measures JVM warmup, not operator throughput — e.g.
    # minhash LSH is 12.7s cold vs ~4s steady-state for identical work.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _sentinel(spark)  # JIT the sentinel path itself
    sentinel_pre = _sentinel(spark)
    for name in HEADLINE:
        try:
            registry[name].fn(spark, WARMUP_SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # warmup must never fail the bench
            print(f"  warmup {name} failed: {e}", file=sys.stderr)

    # Median of REPEATS runs per query: single sf0.1 wall times carry ±2-4×
    # noise on the heavy queries (GC/page-cache/scheduling), so one sample can
    # misstate a query by an order of magnitude in either direction.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            df = spec.fn(spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.time() - t0)
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"  {name}: {timings[name]:.2f}s  {[round(s, 2) for s in samples]}",
              file=sys.stderr)

    sentinel_post = _sentinel(spark)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sentinel = max(sentinel_pre, sentinel_post)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "sentinel_sec": {"pre": sentinel_pre, "post": sentinel_post},
                "sentinel_solo_sec": SENTINEL_SOLO_SEC,
                "load_state": (
                    "quiesced"
                    if sentinel <= SENTINEL_SOLO_SEC * 2.0
                    else "CONTAMINATED"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
