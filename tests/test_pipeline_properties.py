"""Property tests for the deterministic-sampling predicate semantics.

The engine-side predicate is ``substr(md5(key), 1, 8) < threshold`` — a pure
string comparison identical in Spark, DuckDB, and Python. These tests drive
the SAME predicate in Python (hashlib) so hypothesis can sweep hundreds of
keys/fractions without a SparkSession; the Spark-side equivalence is pinned
separately by tests/test_pipeline.py and the DuckDB oracles.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from fries_flink_spark.pipeline.sampling import HASH_SPACE, frac_to_hex


def _prefix(key) -> str:
    return hashlib.md5(str(key).encode()).hexdigest()[:8]


def _kept(key, fraction: float) -> bool:
    return _prefix(key) < frac_to_hex(fraction)


fractions = st.floats(min_value=0.0, max_value=1.0, allow_nan=False)


@given(f1=fractions, f2=fractions)
def test_frac_to_hex_monotone_under_string_order(f1, f2):
    """Larger fractions must never produce a smaller-sorting threshold —
    the property the original 9-char '100000000' endpoint bug violated."""
    lo, hi = sorted([f1, f2])
    assert frac_to_hex(lo) <= frac_to_hex(hi)


@given(key=st.integers(min_value=0, max_value=10**12), f1=fractions, f2=fractions)
def test_samples_nest_monotonically(key, f1, f2):
    """A row kept at fraction p stays kept at every p' >= p (nested samples:
    growing a sample never churns previously selected rows)."""
    lo, hi = sorted([f1, f2])
    if _kept(key, lo):
        assert _kept(key, hi)


@given(key=st.integers(min_value=0, max_value=10**12))
def test_endpoints_exact(key):
    assert not _kept(key, 0.0)  # fraction 0 keeps nothing
    assert _kept(key, 1.0)  # fraction 1 keeps everything


@given(fraction=st.floats(min_value=0.001, max_value=0.999))
@settings(max_examples=30)
def test_calibration_over_fixed_universe(fraction):
    """Over a fixed 4000-key universe the achieved rate tracks the target
    (md5 prefixes are uniform; tolerance ~4 sigma of binomial noise)."""
    n = 4000
    kept = sum(_kept(k, fraction) for k in range(n))
    sigma = math.sqrt(fraction * (1 - fraction) / n)
    assert abs(kept / n - fraction) < max(4 * sigma, 0.02)


@given(fraction=st.floats(min_value=0.0, max_value=1.0))
def test_threshold_granularity(fraction):
    """The hex threshold quantizes the fraction to 1/2^32 — round-tripping
    the threshold back to a fraction stays within one quantum."""
    t = frac_to_hex(fraction)
    back = (HASH_SPACE if t == "g" else int(t, 16)) / HASH_SPACE
    assert abs(back - fraction) <= 1.0 / HASH_SPACE + 1e-12
