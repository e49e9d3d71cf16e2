"""Product quantization for embedding columns (beyond-reference: the memory
side of large-scale ANN, complementing similarity/ann.py's IVF cell pruning).

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011 — public literature) splits each d-dim vector into ``m``
subvectors of d/m dims and vector-quantizes each subspace against its own
``ksub``-entry codebook, so a vector stores as m small integers (here
m bytes at ksub<=256) instead of d floats — a 32×+ compression that is what
makes billion-vector ANN fit a cluster's RAM. Queries score compressed
codes with an asymmetric distance computation (ADC): one (m, ksub) lookup
table of query-to-centroid inner products per query, then score(x) =
Σ_s LUT[s, code_s(x)] — no decompression.

Spark execution shape (100 TB contract):
- **train**: Lloyd iterations where the assignment+explode pass runs in ONE
  ``mapInPandas`` over the data (each row emits its m (subspace, code,
  subvector) partials) and the centroid update is a (m·ksub)-group
  aggregate with map-side partials; the driver only ever holds the m×ksub×
  (d/m) = k×d codebook — the same driver-traffic bound as ann.kmeans.
- **encode**: a single vectorized pandas_udf (einsum argmin per subspace),
  zero exchange; codes are an ``array<int>`` column, 4·m bytes vs 4·d —
  the shuffle/storage volume drop is the point.
- **ADC top-k**: LUT built driver-side from the k×d codebook, scores via
  one pandas_udf + ``TakeOrderedAndProject`` — no exchange, no all-pairs.

Determinism (for the golden-parquet oracle): seeds are the first ksub
vectors by id; Lloyd updates use plain means with empty clusters keeping
their previous centroid; assignment ties resolve to the LOWEST code index
(np.argmin) — all exactly replayable in an independent numpy path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _codes_for(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) argmin codes for X (n, d) against books (m, ksub, dsub)."""
    m, ksub, dsub = books.shape
    Xs = X.reshape(len(X), m, dsub)
    # ||x - c||^2 ranks identically to -2 x·c + ||c||^2 (||x||^2 constant per x)
    dots = np.einsum("nmd,mkd->nmk", Xs, books)
    cnorm = (books**2).sum(axis=2)  # (m, ksub)
    return np.argmin(cnorm[None, :, :] - 2.0 * dots, axis=2)


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 2,
) -> np.ndarray:
    """Train per-subspace codebooks; returns (m, ksub, d/m) float64.

    Seeds: subvectors of the first ``ksub`` vectors by ``id_col``
    (deterministic, no RNG). Each Lloyd step is one mapInPandas
    assignment+explode pass plus one tiny (m·ksub)-group mean aggregate.
    """
    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    seed_rows = df.orderBy(id_col).limit(ksub).select(vec_col).collect()
    seeds = np.array([[float(x) for x in r[0]] for r in seed_rows], dtype="float64")
    books = np.ascontiguousarray(
        seeds.reshape(ksub, m, dsub).transpose(1, 0, 2)
    )  # (m, ksub, dsub)

    part_schema = "s int, code int, " + ", ".join(f"d{i} double" for i in range(dsub))

    for _ in range(n_iter):
        b = books.copy()

        def assign_explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                codes = _codes_for(X, b)  # (n, m)
                Xs = X.reshape(len(X), m, dsub)
                n = len(X)
                out = pd.DataFrame(
                    {
                        "s": np.repeat(np.arange(m, dtype="int32")[None, :], n, 0).ravel(),
                        "code": codes.astype("int32").ravel(),
                    }
                )
                flat = Xs.reshape(n * m, dsub)
                for i in range(dsub):
                    out[f"d{i}"] = flat[:, i]
                yield out

        agg = (
            df.select(vec_col)
            .mapInPandas(assign_explode, schema=part_schema)
            .groupBy("s", "code")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(dsub)])
            .collect()
        )
        new = books.copy()  # empty clusters keep their previous centroid
        for r in agg:
            new[r["s"], r["code"]] = [r[f"d{i}"] for i in range(dsub)]
        books = new
    return books


def pq_encode(
    df: DataFrame, vec_col: str, id_col: str, books: np.ndarray
) -> DataFrame:
    """Encode vectors to (id, codes array<int>): one vectorized pandas_udf,
    zero exchange."""
    b = books

    @F.pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype("float64")
        return pd.Series(list(_codes_for(X, b).astype("int32")))

    return df.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    codes_df: DataFrame,
    id_col: str,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Approximate inner-product top-k over PQ codes via ADC: the (m, ksub)
    LUT is built on the driver from the codebook; each row costs m lookups.
    Plan: Scan → Project(pandas_udf) → TakeOrderedAndProject, no exchange."""
    m, ksub, dsub = books.shape
    q = np.asarray(query_vec, dtype="float64").reshape(m, dsub)
    lut = np.einsum("md,mkd->mk", q, books)  # (m, ksub)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        C = np.stack(codes.to_numpy()).astype("int64")  # (n, m)
        return pd.Series(np.take_along_axis(lut, C.T, axis=1).sum(axis=0))

    return (
        codes_df.select(F.col(id_col), adc(F.col("codes")).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def l2_normalize(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Unit-normalize the vector column (codegen higher-order funcs, no
    Python): makes PQ inner-product ADC rank by cosine."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    return df.select(
        F.col(id_col), F.transform(v, lambda x: x / norm).alias(vec_col)
    )


def pq_shortlist_rerank(
    df: DataFrame,
    codes_df: DataFrame,
    vec_col: str,
    id_col: str,
    books: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
) -> DataFrame:
    """The production PQ pattern: ADC scores the WHOLE corpus in compressed
    domain (cheap, approximate) to cut it to a ``shortlist``, then only the
    shortlist's full vectors are fetched and re-ranked exactly. Quantization
    error then only costs recall if a true neighbor falls outside the
    shortlist — recall@k rises steeply with shortlist/k (tests pin the
    band). The shortlist is driver-sized, so the exact pass is a broadcast
    semi-join + the zero-exchange cosine chain of similarity/ann."""
    from .ann import cosine_lit

    short = pq_adc_topk(codes_df, id_col, books, query_vec, k=shortlist).select(id_col)
    return (
        df.join(F.broadcast(short), id_col)
        .select(F.col(id_col), cosine_lit(F.col(vec_col), query_vec).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
