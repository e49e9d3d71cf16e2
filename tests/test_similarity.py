"""ANN / similarity-search operator tests (similarity/ann.py).

Covers the scale-path promises the module's docstrings make: LSH and IVF
recall vs the exact baseline, block-tiled cosine_pairs equivalence across
tilings (no driver collect), zero-exchange probe plans, and no interpreted
higher-order-function lambdas on the hot paths.
"""

from __future__ import annotations

import pytest

from fries_flink_spark.catalog import load_table
from fries_flink_spark.plans.inspect import exchange_count, plan_string
from fries_flink_spark.similarity.ann import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_bucket_topk,
)

SF = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").filter("vec_id != 0")


@pytest.fixture(scope="module")
def qv(spark):
    full = load_table(spark, SF, "embeddings")
    return [float(x) for x in full.filter("vec_id = 0").first()["embedding"]]


@pytest.fixture(scope="module")
def exact_ids(emb, qv):
    return {r["vec_id"] for r in cosine_topk(emb, "embedding", "vec_id", qv, k=K).collect()}


def test_lsh_recall(emb, qv, exact_ids):
    """The synthetic embeddings are near-orthogonal (top cosine ≈ 0.33), so
    SRP recall is bounded by the angle collision probability — 4 planes with
    Hamming-1 probing measures 0.4 deterministic recall here."""
    got = {
        r["vec_id"]
        for r in lsh_bucket_topk(emb, "embedding", "vec_id", qv, k=K, n_planes=4).collect()
    }
    assert len(got) == K
    assert len(got & exact_ids) / K >= 0.3


def test_ivf_recall_monotone_in_nprobe(emb, qv, exact_ids):
    """Trained centroids: nprobe=4/16 cells measures 0.5 recall, nprobe=8
    measures 0.9 — probing more cells must recover more of the exact top-k."""
    low = {r["vec_id"] for r in ivf_topk(emb, "embedding", "vec_id", qv, k=K).collect()}
    high = {
        r["vec_id"]
        for r in ivf_topk(emb, "embedding", "vec_id", qv, k=K, nprobe=8).collect()
    }
    assert len(low) == K and len(high) == K
    assert len(low & exact_ids) / K >= 0.4
    assert len(high & exact_ids) / K >= 0.7
    assert len(high & exact_ids) >= len(low & exact_ids)


def test_kmeans_improves_over_seeds(emb, qv):
    """Lloyd steps must move the centroids (the old first-n-by-id 'quantizer'
    was the seed set verbatim)."""
    seeds = kmeans_centroids(emb, "embedding", "vec_id", 8, len(qv), n_iter=0)
    trained = kmeans_centroids(emb, "embedding", "vec_id", 8, len(qv), n_iter=2)
    moved = sum(
        1
        for s, t in zip(seeds, trained)
        if max(abs(a - b) for a, b in zip(s, t)) > 1e-9
    )
    assert moved >= 6


def test_brute_force_plan_zero_exchange_no_hof(emb, qv):
    df = cosine_topk(emb, "embedding", "vec_id", qv, k=K)
    assert exchange_count(df) == 0
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "lambdafunction" not in plan.lower()


def test_ivf_probe_plan_zero_exchange(emb, qv):
    df = ivf_topk(emb, "embedding", "vec_id", qv, k=K)
    assert exchange_count(df) == 0
    assert "lambdafunction" not in plan_string(df).lower()


def test_lsh_plan_zero_exchange_no_hof(emb, qv):
    df = lsh_bucket_topk(emb, "embedding", "vec_id", qv, k=K)
    assert exchange_count(df) == 0
    assert "lambdafunction" not in plan_string(df).lower()


@pytest.fixture()
def force_tiled(spark):
    """Disable the broadcast small-input path (mirrors a 100 TB input where
    no side fits spark.sql.autoBroadcastJoinThreshold)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cosine_pairs_tiled_matches_single_block(emb, force_tiled):
    """Multi-block tiling is pure execution strategy: results must be
    identical to the single-block rendition, each unordered pair once."""
    single = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in cosine_pairs(emb, "embedding", "vec_id", 0.4).collect()
    }
    tiled = {
        (r["a"], r["b"], round(r["cos"], 9))
        for r in cosine_pairs(
            emb, "embedding", "vec_id", 0.4, rows_per_block=37
        ).collect()
    }
    assert single == tiled
    assert all(a < b for a, b, _ in single)


def test_cosine_pairs_no_driver_collect(emb, force_tiled, monkeypatch):
    """The tiled path must never materialize the table on the driver."""
    import pyspark.sql.dataframe as df_mod

    def boom(self):  # pragma: no cover - trips only on regression
        raise AssertionError("cosine_pairs called toPandas() on the driver")

    monkeypatch.setattr(df_mod.DataFrame, "toPandas", boom)
    out = cosine_pairs(emb, "embedding", "vec_id", 0.4, rows_per_block=64)
    assert out.count() > 0


def test_cosine_pairs_broadcast_path_small_input(spark, emb):
    """Below the broadcast threshold the GEMM runs as ONE mapInPandas pass:
    no cogroup, no exchange — and the pair set matches the tiled path."""
    small = cosine_pairs(emb, "embedding", "vec_id", 0.4)
    plan = plan_string(small)
    assert "MapInPandas" in plan
    assert "FlatMapCoGroupsInPandas" not in plan
    assert exchange_count(small) == 0
    got = {(r["a"], r["b"], round(r["cos"], 9)) for r in small.collect()}
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tiled = {
            (r["a"], r["b"], round(r["cos"], 9))
            for r in cosine_pairs(emb, "embedding", "vec_id", 0.4).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert got == tiled


def test_cosine_pairs_tiled_engages_above_threshold(emb, force_tiled):
    """At scale (input larger than the broadcast bound — simulated here by
    disabling the threshold) the cogrouped tiling MUST engage; the
    broadcast shortcut is for small inputs only."""
    df = cosine_pairs(emb, "embedding", "vec_id", 0.4)
    plan = plan_string(df)
    assert "FlatMapCoGroupsInPandas" in plan
    assert "MapInPandas" not in plan


def test_semantic_dedup_greedy_keep(spark):
    from fries_flink_spark.dedup.semantic import semantic_dedup

    # Two well-separated directions; ids 1,2 are near-identical (cos≈1),
    # id 3 is orthogonal-ish; id 4 duplicates 3.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.998, 0.02]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.9, n_clusters=2
        ).collect()
    }
    assert out[1] is True and out[3] is True  # first of each dup group kept
    assert out[2] is False and out[4] is False


def test_semantic_dedup_dropped_item_never_disqualifies(spark):
    from fries_flink_spark.dedup.semantic import semantic_dedup

    # Chain A~B, B~C, A!~C (paper's sequential semantics): B dropped by A,
    # but C is only compared against KEPT items -> C survives.
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    # cos(0,25deg)=0.906>0.9; cos(25,50)=0.906>0.9; cos(0,50)=0.64<0.9
    rows = [(1, unit(0.0)), (2, unit(0.43)), (3, unit(0.86))]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {
        r["id"]: r["keep"]
        for r in semantic_dedup(
            df, "embedding", "vec_id", threshold=0.9, n_clusters=1
        ).collect()
    }
    assert out == {1: True, 2: False, 3: True}
