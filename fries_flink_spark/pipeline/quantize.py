"""Embedding quantization: symmetric int8 compression of vector columns.

Embedding stores at 100 TB scale keep vectors int8-quantized (4x smaller
than float32, 8x smaller than float64); search and dedup recall over the
quantized vectors is within noise for well-scaled data. This module
implements the standard symmetric per-vector scheme:

    scale = max_i |x_i| / 127
    q_i   = clamp(round_half_up(x_i / scale), -127, 127)
    x̂_i  = q_i * scale

entirely as JVM array expressions (transform / array_max — no Python, no
shuffle; one narrow codegen stage per row). Rounding is spelled
``floor(x + 0.5)`` rather than ``round()`` so every engine computes the
identical integer (SQL round() half-away vs half-even varies by engine).

Scale design: per-row transform, zero exchanges; the quantized array is
``array<tinyint>`` so a 768-dim fp32 embedding shrinks 4x before it ever
hits a shuffle or sink. Error metrics aggregate with map-side partials.

Reference scope: not a reference-engine operator; part of the added
training-data pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def vec_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max|x_i| / 127 (0-vectors get scale 1)."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(mx == 0.0, F.lit(1.0)).otherwise(mx / F.lit(127.0))


def _round_half_up(x: Column) -> Column:
    # engine-portable round-half-away-from-zero for symmetric inputs
    return F.when(x >= 0, F.floor(x + 0.5)).otherwise(-F.floor(-x + 0.5))


def quantize_int8(df: DataFrame, vec_col: str, out_col: str = "q") -> DataFrame:
    """Add ``{out_col}`` (array<tinyint>) and ``{out_col}_scale`` (double)."""
    scale = vec_scale(F.col(vec_col))
    df = df.withColumn(f"{out_col}_scale", scale)
    q = F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), _round_half_up(x / F.col(f"{out_col}_scale"))),
        ).cast("tinyint"),
    )
    return df.withColumn(out_col, q)


def dequant_error(
    df: DataFrame, vec_col: str, q_col: str = "q"
) -> DataFrame:
    """Add per-vector reconstruction error columns ``max_err`` and ``mse``."""
    xhat = F.zip_with(
        _as_double(F.col(vec_col)),
        F.col(q_col),
        lambda x, q: x - q.cast("double") * F.col(f"{q_col}_scale"),
    )
    abs_err = F.transform(xhat, F.abs)
    return df.withColumn("max_err", F.array_max(abs_err)).withColumn(
        "mse",
        F.aggregate(xhat, F.lit(0.0), lambda s, e: s + e * e) / F.size(F.col(vec_col)),
    )
