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


def _mix_kept_reps(key, rate: float) -> list[int]:
    """Python mirror of the mix_weighted keep rule (same md5 predicate)."""
    whole = math.floor(rate)
    reps = []
    for rep in range(1, max(math.ceil(rate), 1) + 1):
        frac_thr = frac_to_hex(rate - whole)
        h = hashlib.md5(f"{key}#{rep}".encode()).hexdigest()[:8]
        if rep <= whole or h < frac_thr:
            reps.append(rep)
    return reps


@given(key=st.integers(min_value=0, max_value=10**9),
       rate=st.floats(min_value=0.0, max_value=4.0, allow_nan=False))
def test_mix_rep_count_within_floor_ceil(key, rate):
    """Every row yields floor(rate) or ceil(rate) replicas; integer rates
    replicate exactly rate times."""
    kept = _mix_kept_reps(key, rate)
    assert math.floor(rate) <= len(kept) <= max(math.ceil(rate), 0) or (
        rate == 0 and kept == []
    )
    if float(rate).is_integer():
        assert len(kept) == int(rate)
    # whole replicas always survive, in order
    assert kept[: math.floor(rate)] == list(range(1, math.floor(rate) + 1))


@given(rate=st.floats(min_value=0.0, max_value=3.0, allow_nan=False))
@settings(max_examples=25)
def test_mix_achieved_rate_calibrated(rate):
    """Over a fixed key universe the mean replica count tracks the rate."""
    n = 2000
    total = sum(len(_mix_kept_reps(k, rate)) for k in range(n))
    sigma = math.sqrt(max(rate % 1.0 * (1 - rate % 1.0), 1e-12) / n)
    assert abs(total / n - rate) < max(4 * sigma, 0.03)
