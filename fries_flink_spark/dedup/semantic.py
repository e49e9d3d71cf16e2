"""SemDeDup: semantic deduplication via k-means clustering + within-cluster
cosine pruning (Abbas et al. 2023, arXiv:2303.09540).

Exact all-pairs cosine over a 100 TB corpus is infeasible (n² work); SemDeDup
bounds it by first clustering the embeddings (k-means) and comparing only
WITHIN clusters — the quadratic term drops from n² to k·(n/k)², a factor-k
saving, at the price of missing near-dups that straddle a cluster boundary
(the paper's accepted trade-off).

Pipeline:

1. Spherical k-means (``similarity/ann.kmeans_centroids``): Lloyd steps as
   DataFrame aggregations; only the k×d centroid matrix reaches the driver.
2. Zero-exchange cluster assignment (one GEMM-argmax pandas_udf pass).
3. Per-cluster greedy keep: iterate members by ascending id; keep a member
   iff its max cosine against the already-KEPT members is below the
   threshold (the paper's sequential semantics — a dropped item never
   disqualifies later items). One ``applyInPandas`` per cluster; the inner
   loop is an incremental numpy matvec against the kept matrix, O(c²·d)
   flops for cluster size c.

Scale contract: the only shuffle is the cluster-key exchange before
``applyInPandas``; per-task memory is one cluster's matrix (c×d doubles).
Cluster size c ≈ n/k is the knob — the paper runs k ≈ n/1000. Skewed hot
clusters are bounded by ``max_cluster``: members beyond the cap (in id
order) are kept unexamined rather than silently exploding a task, the same
documented-cap pattern as LSH's ``max_bucket`` and the graph hub caps.

Determinism: seeds are the first-k vectors by id, assignment ties go to the
lowest centroid index (numpy argmax), and the greedy order is ascending id —
so results are exactly replayable by the independent golden oracle
(queries/golden.ensure_semantic_dedup).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..similarity.ann import _nearest_centroid, kmeans_centroids

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_clusters: int = 16,
    dim: int | None = None,
    kmeans_iter: int = 2,
    max_cluster: int | None = None,
) -> DataFrame:
    """(id, cluster, keep) for every row: ``keep`` is false iff the row's
    cosine against an earlier-id KEPT member of its cluster ≥ ``threshold``.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    cents = kmeans_centroids(df, vec_col, id_col, n_clusters, dim, kmeans_iter)
    id_type = [
        f.dataType.simpleString() for f in df.schema.fields if f.name == id_col
    ][0]
    assigned = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        _nearest_centroid(F.col(vec_col), cents).alias("__cid"),
    )
    thr = float(threshold)
    cap = max_cluster

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        x = np.stack(pdf["__v"].to_numpy()).astype("float64")
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        x = x / norms
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        limit = n if cap is None else min(n, cap)
        # Blocked greedy keep, output-identical to the element-at-a-time
        # form (same dot products, same ascending-id decision order) but
        # O(c²·d/B) memory traffic instead of O(c²·d): the 1000x gate found
        # the naive loop's per-iteration fancy-index COPY of the kept matrix
        # (x[kept_rows], a fresh (m×d) allocation per element) thrashing at
        # 125k-member clusters — 16 concurrent tasks sat at 75% kernel time
        # moving pages instead of computing. The kept set now lives packed
        # in a preallocated buffer streamed ONCE per block (one GEMM), and
        # within-block decisions resolve against a precomputed b×b inner
        # matrix.
        buf = np.empty((limit, x.shape[1]), dtype="float64")
        m = 0
        block = 2048
        for s in range(0, limit, block):
            e = min(s + block, limit)
            blk = x[s:e]
            prior = (buf[:m] @ blk.T).max(axis=0) if m else None
            inner = blk @ blk.T
            loc: list[int] = []
            for j in range(e - s):
                hit = prior is not None and prior[j] >= thr
                if not hit and loc:
                    hit = float(np.max(inner[loc, j])) >= thr
                if hit:
                    keep[s + j] = False
                else:
                    loc.append(j)
            if loc:
                buf[m : m + len(loc)] = blk[loc]
                m += len(loc)
        # Rows beyond the hot-cluster cap are kept unexamined (documented).
        return pd.DataFrame(
            {"id": ids, "cluster": pdf["__cid"].to_numpy(), "keep": keep}
        )

    # Pin the exchange width: per-task cost is GEMM flops, not shuffle bytes
    # (see PERF.md §13) — don't let byte-based AQE coalescing fold clusters.
    spark = df.sparkSession
    n_parts = min(n_clusters, spark.sparkContext.defaultParallelism)
    return (
        assigned.repartition(n_parts, "__cid")
        .groupBy("__cid")
        .applyInPandas(prune, schema=f"id {id_type}, cluster int, keep boolean")
    )
