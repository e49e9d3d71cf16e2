"""Property-based tests for the as-of join (the union+window formulation is
the least-obvious operator in operators/joins.py — verify it against a brute
force over random version histories)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import SparkSession

from fries_flink_spark.operators.joins import asof_join

KEYS = st.integers(1, 3)
TIMES = st.integers(0, 20)

LEFT = st.lists(st.tuples(KEYS, TIMES), min_size=1, max_size=8, unique=True)
RIGHT = st.lists(st.tuples(KEYS, TIMES), min_size=0, max_size=8, unique=True)


@pytest.fixture(scope="module")
def sess(spark) -> SparkSession:
    return spark


@given(LEFT, RIGHT)
@settings(max_examples=25, deadline=None)
def test_asof_matches_bruteforce(sess, left_rows, right_rows):
    left = sess.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k long, lt long, lid long"
    )
    right = sess.createDataFrame(
        [(k, t, float(k * 100 + t)) for (k, t) in right_rows] or [],
        "k long, rt long, payload double",
    )
    out = asof_join(left, right, "k", "lt", "rt", ["payload", "rt"])
    got = {r.lid: (r.payload, r.rt) for r in out.collect()}
    want = {}
    for i, (k, t) in enumerate(left_rows):
        versions = [(rk, rt) for (rk, rt) in right_rows if rk == k and rt <= t]
        if versions:
            best = max(versions, key=lambda v: v[1])
            want[i] = (float(k * 100 + best[1]), best[1])
        else:
            want[i] = (None, None)
    assert got == want
