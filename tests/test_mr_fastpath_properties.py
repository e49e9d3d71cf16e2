"""Randomized equivalence: the windowed MATCH_RECOGNIZE fast path vs the NFA.

The single-variable fast path (sqlext._try_single_var_runs) re-derives the
NFA's greedy bounded-repeat + SKIP PAST LAST ROW semantics as gaps-and-
islands SQL; this suite drives hundreds of random sequences through BOTH
engines in one pass (each random sequence is a partition key, so one Spark
query covers them all) and requires identical rows. The NFA is forced by
appending a tautological match-state navigation (``LAST(D.v, 0) = D.v`` —
the candidate row is tentatively mapped, so it always holds) to the DEFINE,
which routes the query down the ctx/NFA path without changing semantics.
"""

from __future__ import annotations

import random

import pytest

from fries_flink_spark.sqlext import sql as fsql

N_SEQS = 200
MAX_LEN = 12


@pytest.fixture(scope="module")
def random_runs_df(spark):
    rng = random.Random(0xF21E5)
    rows = []
    for k in range(N_SEQS):
        n = rng.randint(0, MAX_LEN)
        for seq in range(n):
            # small value range forces ties (the PREV comparison's edge)
            rows.append((k, seq, float(rng.randint(0, 4))))
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    df.createOrReplaceTempView("mr_prop")
    return df


def _q(pattern: str, define: str, measures: str, mode: str) -> str:
    return f"""
        SELECT * FROM mr_prop MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES {measures}
          {mode}
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN ({pattern})
          DEFINE D AS {define}
        )
    """


_FORCE_NFA = " AND LAST(D.v, 0) = D.v"

CASES = [
    ("D+", "D.v < PREV(D.v)"),
    ("D{2}", "D.v < PREV(D.v)"),
    ("D{2,4}", "D.v <= PREV(D.v)"),
    ("D", "D.v < PREV(D.v, 2)"),  # offset-2 physical predecessor
    ("D+", "D.v <= PREV(D.v) OR D.v = 0.0"),  # OR group + literal
]

ONE_ROW_MEASURES = (
    "FIRST(D.seq) AS fs, LAST(D.seq) AS ls, COUNT(D.*) AS n, "
    "SUM(D.v) AS sv, MIN(D.v) AS mv, MATCH_NUMBER() AS mn"
)
ALL_ROWS_MEASURES = "CLASSIFIER() AS cls, COUNT(D.*) AS n, MATCH_NUMBER() AS mn"


@pytest.mark.parametrize("pattern,define", CASES)
def test_one_row_fast_equals_nfa(spark, random_runs_df, pattern, define):
    q_fast = _q(pattern, define, ONE_ROW_MEASURES, "ONE ROW PER MATCH")
    q_nfa = _q(pattern, define + _FORCE_NFA, ONE_ROW_MEASURES, "ONE ROW PER MATCH")
    fast_df = fsql(spark, q_fast)
    assert "InPandas" not in fast_df._jdf.queryExecution().executedPlan().toString()
    fast = sorted(tuple(r) for r in fast_df.collect())
    nfa = sorted(tuple(r) for r in fsql(spark, q_nfa).collect())
    assert fast == nfa
    assert len(fast) > 0  # the random data must actually exercise matches


@pytest.mark.parametrize("pattern,define", CASES[:3])
def test_all_rows_fast_equals_nfa(spark, random_runs_df, pattern, define):
    q_fast = _q(pattern, define, ALL_ROWS_MEASURES, "ALL ROWS PER MATCH")
    q_nfa = _q(pattern, define + _FORCE_NFA, ALL_ROWS_MEASURES, "ALL ROWS PER MATCH")
    fast = sorted(tuple(r) for r in fsql(spark, q_fast).collect())
    nfa = sorted(tuple(r) for r in fsql(spark, q_nfa).collect())
    assert fast == nfa
    assert len(fast) > 0
