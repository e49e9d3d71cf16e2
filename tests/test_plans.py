"""Plan-property tests: the scale assertions SURVEY §4/§7 promise — pushdown,
pruning, broadcast joins, partial aggregation (reference model: the golden
plan XMLs of flink-table-planner-blink, asserted programmatically)."""

from __future__ import annotations

import pytest

from fries_flink_spark.plans.inspect import (
    codegen_stage_count,
    exchange_count,
    has_partial_aggregation,
    join_strategies,
    pushed_filters,
    read_schemas,
)
from fries_flink_spark.registry import load_all

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_q6_filters_reach_scan(spark, registry):
    """TPC-H q6 is scan→filter→agg: every predicate must be pushed."""
    df = registry["tpch_q6"](spark, SF)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf), pf
    assert any("l_discount" in f for f in pf), pf
    assert any("l_quantity" in f for f in pf), pf


def test_q6_column_pruning(spark, registry):
    df = registry["tpch_q6"](spark, SF)
    schemas = read_schemas(df)
    assert schemas, "no file scan found"
    # q6 needs only 4 of lineitem's 16 columns
    assert all(s.count(",") <= 4 for s in schemas), schemas


def test_q3_broadcasts_dimensions(spark, registry):
    """customer/orders are small relative to lineitem: at least one join must
    be broadcast, and no cartesian product may appear."""
    df = registry["tpch_q3"](spark, SF)
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert "CartesianProduct" not in js, js


def test_q1_partial_aggregation(spark, registry):
    df = registry["tpch_q1"](spark, SF)
    assert has_partial_aggregation(df)


def test_q1_single_exchange(spark, registry):
    """q1 groups on 2 low-cardinality keys: exactly one shuffle for the agg
    (plus one range exchange for the final order-by)."""
    df = registry["tpch_q1"](spark, SF)
    assert exchange_count(df) <= 2


def test_codegen_spans_exist(spark, registry):
    df = registry["tpch_q1"](spark, SF)
    assert codegen_stage_count(df) >= 1


def test_exact_dedup_is_single_shuffle(spark, registry):
    df = registry["dedup_exact"](spark, SF)
    assert exchange_count(df) == 1
    assert has_partial_aggregation(df)


def test_q21_single_fact_pass(spark, registry):
    """q21 must scan lineitem once (single-pass conditional aggregation), not
    the naive three-scan per_order/late_po plan, and broadcast supplier."""
    df = registry["tpch_q21"](spark, SF)
    schemas = read_schemas(df)
    fact_scans = [s for s in schemas if "l_suppkey" in s]
    assert len(fact_scans) == 1, schemas
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert has_partial_aggregation(df)


def test_sampling_is_zero_exchange(spark, registry):
    """Bernoulli/stratified sampling must fuse into the scan stage — a pure
    filter, no exchange anywhere before the final order-by."""
    df = registry["sample_stratified"](spark, SF)
    # the only allowed exchange is the rangepartitioning of the orderBy;
    # the md5 predicate can't push to parquet but must stay in codegen
    assert exchange_count(df) <= 1
    assert codegen_stage_count(df) >= 1


def test_mix_weighted_zero_exchange(spark, registry):
    """Mixture resampling is scan → explode → filter: no shuffle at all
    before the result ordering."""
    df = registry["mix_weighted"](spark, SF)
    assert exchange_count(df) <= 1


def test_vocab_two_phase_aggregation(spark, registry):
    """Token counting must partial-aggregate map-side: the shuffle carries
    distinct tokens per task, not raw occurrences."""
    df = registry["text_vocab_topk"](spark, SF)
    assert has_partial_aggregation(df)


def test_runtime_filter_broadcasts_buckets(spark, registry):
    """The bucket pre-filter must reach the probe as a broadcast semi join —
    never a shuffled join of the fact table against the bucket list."""
    df = registry["join_runtime_filter"](spark, SF)
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js


def test_zorder_key_is_pure_projection(spark, registry):
    """The Morton key is shift/mask arithmetic in the scan's project — the
    only exchange is the final order-by."""
    df = registry["layout_zorder_key"](spark, SF)
    assert exchange_count(df) <= 1
    assert codegen_stage_count(df) >= 1


def test_quantize_zero_exchange(spark, registry):
    df = registry["emb_quantize_int8"](spark, SF)
    assert exchange_count(df) <= 1


def test_line_dedup_single_exchange(spark, registry):
    """text_line_dedup: explode is narrow; the ONLY exchange is the hash
    shuffle on the line value for the struct-min aggregate."""
    df = registry["text_line_dedup"](spark, SF)
    assert exchange_count(df) == 1
    assert has_partial_aggregation(df)


def test_boilerplate_strip_broadcasts_bp_set(spark, registry):
    """text_boilerplate_strip: the boilerplate line set joins broadcast —
    the corpus must not shuffle for the strip."""
    df = registry["text_boilerplate_strip"](spark, SF)
    assert "broadcast" in " ".join(join_strategies(df)).lower()


def test_trigger_fires_single_exchange(spark, registry):
    """trig_count_fires: over-window running aggs + fire filter pay exactly
    the one (window, key) hash exchange a plain windowed agg pays."""
    df = registry["trig_count_fires"](spark, SF)
    assert exchange_count(df) == 1


def test_evictor_aggs_single_exchange(spark, registry):
    """count/time/delta evictors: rank/max/last filters ride the same
    exchange as the final aggregate (AQE may reuse it; never more than 2)."""
    for name in ("evict_count", "evict_time", "evict_delta"):
        df = registry[name](spark, SF)
        assert exchange_count(df) <= 2, name


def test_pq_encode_zero_exchange(spark, registry):
    """PQ encoding (the scan-side of pq_codes before its output sort) is a
    pure projection: scan -> pandas_udf -> project, no exchange."""
    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.similarity.pq import pq_encode
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    books = np.zeros((8, 16, 8))
    assert exchange_count(pq_encode(emb, "embedding", "vec_id", books)) == 0


def test_graph_triangles_no_cartesian(spark, registry):
    """Degree-ordered triangle listing: every join is keyed (wedge apex /
    closing edge) — a cartesian product would be the O(n^3) naive plan."""
    df = registry["graph_triangles"](spark, SF)
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js
    assert "BroadcastNestedLoopJoin" not in js, js


def test_graph_degrees_partial_aggregation(spark, registry):
    """Degree counts must map-side combine: per-vertex messages collapse
    before the shuffle, the difference between |E| and |V| exchange volume."""
    df = registry["graph_degrees"](spark, SF)
    assert has_partial_aggregation(df)


def test_graph_jaccard_no_cartesian(spark, registry):
    """Similarity is a wedge join on the shared-neighbor key, never the
    all-pairs product."""
    df = registry["graph_jaccard"](spark, SF)
    js = join_strategies(df)
    assert "CartesianProduct" not in js, js


def test_text_chunks_zero_exchange(spark, registry):
    """Chunking is a pure per-row projection + posexplode: the only exchange
    allowed is the presentation order-by's range exchange."""
    df = registry["text_chunks"](spark, SF)
    assert exchange_count(df) <= 1


def test_mix_temperature_single_count_shuffle(spark, registry):
    """Temperature mixing adds exactly one small aggregation shuffle (the
    stratum counts); rate join is broadcast; replication is exchange-free."""
    df = registry["mix_temperature"](spark, SF)
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert "CartesianProduct" not in js, js
    # exchanges: stratum-count agg (map-side combined) + two |strata|-sized
    # ones (window max, broadcast prep) + presentation sort
    assert exchange_count(df) <= 4, exchange_count(df)


def test_gopher_filter_scan_fused(spark, registry):
    """The Gopher rules are narrow column expressions: no joins, only the
    presentation sort's range exchange."""
    df = registry["text_gopher_filter"](spark, SF)
    assert join_strategies(df) == {}, join_strategies(df)
    assert exchange_count(df) <= 1


def test_incremental_dedup_broadcasts_batch(spark, registry):
    """The new-batch band table is tiny next to the corpus index: every join
    in the probe must broadcast (never shuffle the index for a small batch),
    and nothing may be cartesian."""
    df = registry["dedup_incremental"](spark, SF)
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    assert "CartesianProduct" not in js, js


def test_shard_balance_single_window_shuffle(spark, registry):
    """Serpentine sharding = one hash exchange on the stratum key for the
    rank window + the tiny stats agg + presentation sort."""
    df = registry["pipeline_shard_balance"](spark, SF)
    assert join_strategies(df) == {}, join_strategies(df)
    assert exchange_count(df) <= 3, exchange_count(df)


def test_triadic_census_no_triple_scan(spark, registry):
    """The census is degrees + triangle count — closed form, no O(n^3)
    triple enumeration (no cartesian product anywhere)."""
    df = registry["graph_triadic_census"](spark, SF)
    js = join_strategies(df)
    assert "CartesianProduct" not in {k: v for k, v in js.items() if k != "BroadcastNestedLoopJoin"}, js


def test_bucketed_join_is_exchange_free(spark):
    """Two tables bucketed on the same key and count join WITHOUT any
    exchange — the co-located-join contract write_bucketed_table promises
    for 100 TB fact-fact joins (Flink pre-partitioned inputs analog)."""
    from fries_flink_spark.sources.connectors import write_bucketed_table

    try:
        spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(0, 10000).selectExpr("id AS k", "id * 3 AS vb")
        write_bucketed_table(a, "bt_a", ["k"], 8, sort_cols=["k"])
        write_bucketed_table(b, "bt_b", ["k"], 8, sort_cols=["k"])
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        assert exchange_count(joined) == 0, joined._jdf.queryExecution().toString()[:500]
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_codegen_class_cache_sized_for_plan_heavy_queries(spark):
    """The session must raise spark.sql.codegen.cache.maxEntries above the
    100-entry default: a single plan-heavy query (tpcds_q14 emits ~250
    codegen units) LRU-wraps the default cache by itself, recompiling every
    generated class on EVERY re-run (measured: 222-225 janino compiles/run,
    2-3x wall inflation — PERF.md §35). Static conf, so it can only be set
    at session creation; this guards against the builder losing it."""
    assert int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 1024


def test_dsir_weights_model_broadcasts_and_partial_agg(spark, registry):
    """DSIR scoring: the 256-row log-ratio model must broadcast into the
    gram join (never shuffle the corpus on the bucket key), and the per-doc
    integer sum must run with map-side partials."""
    df = registry["dsir_importance_weights"](spark, SF)
    js = join_strategies(df)
    assert js.get("BroadcastHashJoin", 0) >= 1, js
    # the only permitted SMJ is the 256-row full-outer merging the two
    # bucket histograms (bounded by bucket count, never by corpus size);
    # the target flag rides through the explode instead of joining back.
    # formatted explain names each operator twice (tree + detail), so one
    # physical SMJ == count 2
    assert js.get("SortMergeJoin", 0) <= 2, js
    assert has_partial_aggregation(df)
