"""Duplicate-cluster resolution: candidate pairs → connected components →
canonical representative per cluster.

This is the final stage of the large-scale dedup pipeline (shingle → MinHash →
LSH banding → verify → **cluster → keep one per cluster**). The reference ships
the building blocks (DataSet delta iterations, DataSet.java:1208
``iterateDelta``; Gelly's ConnectedComponents runs on them) — here the whole
stage is DataFrame-native.

Scale design (100 TB):
- Min-label propagation as a **delta iteration** (operators/iterate.
  iterate_delta): per round, only nodes whose label changed (the frontier)
  send messages — one shuffle of frontier×degree edges per round, NOT the
  full graph. Rounds are bounded by component diameter; near-dup clusters
  are small and dense (diameter ≤ 3-4 in practice), so this converges in a
  handful of rounds. For adversarial long-path graphs, the alternating
  star-contraction family (Kiveris et al., "Connected Components in
  MapReduce and Beyond") trades per-round cost for O(log n) rounds — not
  needed for dedup-shaped graphs and not implemented.
- Lineage truncation per round via iterate_delta's localCheckpoint, so the
  plan stays O(1) deep regardless of round count.
- Output (node, cluster_id) is partitioned by node — joining it back against
  the corpus to drop non-canonical members is one co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.iterate import iterate_delta

__all__ = ["connected_components", "keep_canonical"]


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list → ``(node,
    cluster_id)`` with ``cluster_id = min(node id in component)``.

    Only nodes that appear in ``edges`` are emitted (isolated corpus
    documents are trivially their own cluster — join-side concern).
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    # Adjacency is loop-invariant: materialize once, reuse every round.
    sym = sym.distinct().persist()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    def step(solution: DataFrame, workset: DataFrame, i: int):
        # Frontier nodes push their (possibly new) minimum label to their
        # neighbors; a neighbor adopts it only if it beats its current label.
        msgs = (
            sym.join(workset, sym["u"] == workset["node"])
            .select(F.col("v").alias("node"), F.col("label"))
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        improved = (
            msgs.alias("m")
            .join(solution.alias("s"), F.col("m.node") == F.col("s.node"))
            .filter(F.col("m.label") < F.col("s.label"))
            .select(F.col("m.node").alias("node"), F.col("m.label").alias("label"))
        )
        return improved, improved

    out = iterate_delta(
        solution=labels,
        workset=labels,
        step=step,
        max_iterations=max_iterations,
        key_cols=["node"],
    )
    sym.unpersist()
    return out.select("node", F.col("label").alias("cluster_id"))


def keep_canonical(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every clustered document except its cluster's canonical
    representative (the minimum id). Documents absent from ``clusters``
    (singletons — never in any candidate pair) are kept.

    One broadcast-or-shuffle join on the id: ``clusters`` is the (small)
    set of near-dup members, so Catalyst broadcasts it at any realistic
    dup rate."""
    losers = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, on=id_col, how="left_anti")
