"""Distributed PCA over an embedding column: exact second-moment
accumulation + driver-side eigendecomposition + broadcast projection.

The preprocessing step semantic-dedup/ANN pipelines run before clustering
(SemDeDup projects embeddings before cosine comparison; IVF/PQ train on
whitened vectors). The Spark shape:

1. **Fixed-point second moments.** Each vector is scaled to integers
   (``floor(x·2^20 + 0.5)``); per Arrow batch one numpy int64 Gram matrix
   (d×d) + sum vector + count is emitted, and the per-batch partials are
   reduced by an element-wise integer aggregation (posexplode → sum — a
   d²-row shuffle, trivially small). Integer sums are ASSOCIATIVE AND
   EXACT, so the accumulated moments are identical under any partitioning —
   the property that lets an independent single-machine replay match
   bit-for-bit. (At n·scale² ≈ 2^63 the int64 partials would overflow —
   ~10⁹ rows at this scale; switch the partial dtype to object/decimal or
   shard the reduction first. Documented, not silently wrong: the operator
   raises if the bound is exceeded.)
2. **Driver eigendecomposition.** Covariance = Gram/n − μμᵀ (d×d doubles —
   driver-sized at any corpus size); ``numpy.linalg.eigh`` gives the
   principal axes. Deterministic for identical input on one platform —
   and the input IS identical by construction (step 1).
3. **Broadcast projection.** Per row, ``(v − μ)ᵀ·V_k`` — evaluated as
   per-row dots (matching the replay's loop exactly, so BLAS shape-dependent
   blocking can't introduce ulp drift), emitted in integer micro-units.

Reference scope: no reference-engine analog (Flink ML's PCA lives outside
the reference tree); part of the training-data pipeline surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["second_moments", "pca_components", "project_pca"]

SCALE_BITS = 20
_SCALE = float(1 << SCALE_BITS)


def _to_int(vec: np.ndarray) -> np.ndarray:
    return np.floor(vec * _SCALE + 0.5).astype(np.int64)


def second_moments(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_vec int64[d], gram int64[d,d]) — exact fixed-point moments."""

    import pandas as pd

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xi = _to_int(x)
            # Pre-sum overflow guard in exact Python ints: int64 wraps
            # silently, so checking the aggregated Gram after the fact is
            # unreliable — bound n_batch * max|xi|^2 BEFORE the matmul.
            max_abs = int(np.abs(xi).max()) if len(xi) else 0
            if len(xi) * max_abs * max_abs > (1 << 62):
                raise OverflowError(
                    "fixed-point Gram batch would exceed int64 — lower "
                    "SCALE_BITS or shard the reduction"
                )
            gram = (xi.T @ xi).reshape(-1)  # int64 exact (bounded above)
            yield pd.DataFrame(
                {
                    "n": [len(xi)],
                    "m": [max_abs],
                    "s": [xi.sum(axis=0).tolist()],
                    "g": [gram.tolist()],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, schema="n long, m long, s array<long>, g array<long>"
    )
    # Element-wise integer reduction: posexplode to (pos, val), sum per pos.
    agg = parts.select(
        F.sum("n").alias("n"),
        F.max("m").alias("m"),
        F.aggregate(
            F.collect_list("s"),
            F.array([F.lit(0).cast("long")] * dim),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("s"),
        F.aggregate(
            F.collect_list("g"),
            F.array([F.lit(0).cast("long")] * (dim * dim)),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("g"),
    ).first()
    n = int(agg["n"])
    s = np.array(agg["s"], dtype=np.int64)
    g = np.array(agg["g"], dtype=np.int64).reshape(dim, dim)
    # Cross-batch guard, exact Python-int arithmetic: every Gram cell is a
    # sum of n products each bounded by max|xi|^2, so n * max^2 < 2^62
    # guarantees no bigint partial wrapped anywhere in the reduction.
    max_abs = int(agg["m"] or 0)
    if n and n * max_abs * max_abs > (1 << 62):
        raise OverflowError(
            "fixed-point Gram total n*max|x_int|^2 exceeds int64 — shard "
            "the reduction or lower SCALE_BITS"
        )
    return n, s, g


def pca_components(
    n: int, s: np.ndarray, g: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(mean float[d], components float[d,k]) from exact moments; components
    are the top-k eigenvectors by descending eigenvalue, sign-normalized so
    each column's largest-|.|. entry is positive (eigh's sign is arbitrary)."""
    mu = (s / _SCALE) / n
    cov = (g / (_SCALE * _SCALE)) / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comp = v[:, order]
    for j in range(comp.shape[1]):
        i = int(np.argmax(np.abs(comp[:, j])))
        if comp[i, j] < 0:
            comp[:, j] = -comp[:, j]
    return mu, comp


def project_pca(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    mu: np.ndarray,
    comp: np.ndarray,
    micro: int = 10_000,
) -> DataFrame:
    """(id, pc array<long>): per-row (v−μ)ᵀ·comp in integer micro-units.

    Per-row dot products (not a batch GEMM): the independent replay loops
    rows the same way, so identical IEEE operation order → identical
    doubles → identical micro-unit integers.
    """
    import pandas as pd

    mu_l = mu.tolist()
    comp_l = comp.tolist()  # d rows of k
    m = float(micro)

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mu_a = np.array(mu_l)
        comp_a = np.array(comp_l)
        k = comp_a.shape[1]
        for pdf in batches:
            ids, pcs = [], []
            for rid, vec in zip(pdf[id_col], pdf[vec_col]):
                c = np.asarray(vec, dtype=np.float64) - mu_a
                row = []
                for j in range(k):
                    acc = 0.0
                    col = comp_a[:, j]
                    for t in range(len(c)):
                        acc += c[t] * col[t]
                    row.append(int(math.floor(acc * m + 0.5)))
                ids.append(rid)
                pcs.append(row)
            yield pd.DataFrame({id_col: ids, "pc": pcs})

    return df.select(id_col, vec_col).mapInPandas(
        proj, schema=f"{id_col} long, pc array<long>"
    )
