"""SQL-string extension surface (sqlext.py): window TVFs, FOR SYSTEM_TIME AS
OF, MATCH_RECOGNIZE — each lowering checked against the equivalent DataFrame
operator it compiles to, plus documented-unsupported clause errors.

Reference behavior: flink-table/flink-sql-parser parserImpls.ftl (grammar),
StreamExecMatch.java / StreamExecTemporalJoin.java (lowerings),
MatchRecognizeITCase.scala (test model).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

from fries_flink_spark.catalog import register_tables
from fries_flink_spark.operators.cep import Pattern, match_pattern, SKIP_TO_NEXT
from fries_flink_spark.operators.joins import asof_join
from fries_flink_spark.sqlext import sql as fsql


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumble_tvf_matches_native_window(spark, sf_dir):
    register_tables(spark, sf_dir)
    got = fsql(
        spark,
        """
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws,
               count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '600' SECOND))
        GROUP BY window_start
        """,
    )
    want = (
        spark.table("events")
        .groupBy(F.window("ts", "600 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("ws"), "n")
    )
    assert _rows(got, "ws", "n") == _rows(want, "ws", "n")


def test_hop_tvf_flink_arg_order(spark, sf_dir):
    # HOP(TABLE t, DESCRIPTOR(ts), slide, size) — slide FIRST, per Flink.
    register_tables(spark, sf_dir)
    got = fsql(
        spark,
        """
        SELECT count(*) AS n
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '300' SECOND, INTERVAL '600' SECOND))
        """,
    ).collect()[0]["n"]
    # every row lands in exactly size/slide = 2 windows
    n_events = spark.table("events").count()
    assert got == 2 * n_events


def test_session_tvf_microsecond_gap(spark):
    # Two events 1800.5s apart: a whole-second implementation would merge
    # them (truncated diff 1800 is not > 1800); true precision splits them.
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base),
            (1, base + timedelta(seconds=1800, microseconds=500_000)),
        ],
        "k int, ts timestamp",
    )
    df.createOrReplaceTempView("sess_edge")
    out = fsql(
        spark,
        """
        SELECT k, window_start, count(*) AS n
        FROM TABLE(SESSION(TABLE sess_edge PARTITION BY k, DESCRIPTOR(ts),
                           INTERVAL '1800' SECOND))
        GROUP BY k, window_start
        """,
    ).collect()
    assert len(out) == 2 and all(r["n"] == 1 for r in out)


def test_cumulate_tvf_window_counts(spark):
    # One event 10 min into the hour → member of windows ending :15 .. :60
    # (4 windows with 15-min steps, 1-hour max).
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 10))], "k int, ts timestamp"
    )
    df.createOrReplaceTempView("cum_edge")
    out = fsql(
        spark,
        """
        SELECT CAST(unix_timestamp(window_end) AS BIGINT) AS we
        FROM TABLE(CUMULATE(TABLE cum_edge, DESCRIPTOR(ts),
                            INTERVAL '900' SECOND, INTERVAL '3600' SECOND))
        """,
    ).collect()
    base = int(datetime(2024, 1, 1).timestamp())
    assert sorted(r["we"] for r in out) == [base + 900 * k for k in (1, 2, 3, 4)]


def test_temporal_join_matches_asof_join(spark, sf_dir):
    register_tables(spark, sf_dir)
    spark.sql(
        "SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'"
    ).createOrReplaceTempView("tj_probe")
    spark.sql(
        "SELECT user_id, ts, event_id AS rate_id FROM events "
        "WHERE event_type = 'signup'"
    ).createOrReplaceTempView("tj_build")
    got = fsql(
        spark,
        """
        SELECT p.event_id, p.rate_id
        FROM tj_probe p LEFT JOIN tj_build FOR SYSTEM_TIME AS OF p.ts AS b
          ON p.user_id = b.user_id
        """,
    )
    want = asof_join(
        spark.table("tj_probe"),
        spark.table("tj_build"),
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["rate_id"],
        how="left",
    )
    assert _rows(got, "event_id", "rate_id") == _rows(want, "event_id", "rate_id")


def test_match_recognize_matches_cep_operator(spark, sf_dir):
    register_tables(spark, sf_dir)
    got = fsql(
        spark,
        """
        SELECT user_id, a_id, b_id
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS a_id, B.event_id AS b_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B) WITHIN INTERVAL '1800' SECOND
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'purchase'
        )
        """,
    )
    pat = (
        Pattern.begin("A")
        .where_mask(lambda d: d["event_type"] == "click")
        .next("B")
        .where_mask(lambda d: d["event_type"] == "purchase")
        .within(timedelta(seconds=1800))
    )
    want = match_pattern(
        spark.table("events"),
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["A"][0]["event_id"],
            "b_id": m["B"][0]["event_id"],
        },
        output_schema="user_id long, a_id long, b_id long",
        order_tiebreak=["event_id"],
        skip_strategy=SKIP_TO_NEXT,
    )
    assert _rows(got, "user_id", "a_id", "b_id") == _rows(
        want, "user_id", "a_id", "b_id"
    )


def test_match_recognize_measure_aggregates(spark):
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 0, m), "error", float(m))
            for m in (0, 1, 2)
        ]
        + [(1, datetime(2024, 1, 1, 0, 3), "ok", 9.0)],
        "k int, ts timestamp, et string, v double",
    )
    df.createOrReplaceTempView("mr_agg")
    out = fsql(
        spark,
        """
        SELECT k, n, total, lo, hi, mean
        FROM mr_agg MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES COUNT(E.*) AS n, SUM(E.v) AS total,
                   MIN(E.v) AS lo, MAX(E.v) AS hi, AVG(E.v) AS mean
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (E{3})
          DEFINE E AS E.et = 'error'
        )
        """,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["total"], r["lo"], r["hi"], r["mean"]) == (3, 3.0, 0.0, 2.0, 1.0)


def test_ansi_passthrough(spark, sf_dir):
    register_tables(spark, sf_dir)
    got = fsql(spark, "SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert got == spark.table("events").count()


def _mk_prices(spark, prices, name="mr_px"):
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, m), float(p)) for m, p in enumerate(prices)],
        "k int, ts timestamp, price double",
    )
    df.createOrReplaceTempView(name)
    return df


def test_define_prev_price_drop(spark):
    """price < PREV(price) — the canonical MATCH_RECOGNIZE idiom (reference
    MatchRecognizeITCase V-pattern); PREV stays on the vectorized mask path."""
    _mk_prices(spark, [10, 9, 8, 9, 7, 6, 8])
    out = fsql(
        spark,
        """
        SELECT k, first_p, last_p, n_down
        FROM mr_px MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES FIRST(D.price) AS first_p, LAST(D.price) AS last_p,
                   COUNT(D.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.price < PREV(D.price)
        )
        ORDER BY first_p DESC
        """,
    ).collect()
    # falling runs (greedy +): [9,8] from 10, [7,6] after the rise, [8]? no —
    # 8 > 6 is a rise, so exactly two runs
    assert [(r["first_p"], r["last_p"], r["n_down"]) for r in out] == [
        (9.0, 8.0, 2),
        (7.0, 6.0, 2),
    ]


def test_define_cross_variable_last(spark):
    """DEFINE referencing another pattern variable (B.price > A.price means
    LAST(A.price)) — the reference's IterativeCondition context path."""
    _mk_prices(spark, [5, 3, 4, 9, 2])
    out = fsql(
        spark,
        """
        SELECT k, a_p, b_p
        FROM mr_px MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES A.price AS a_p, B.price AS b_p
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B)
          DEFINE A AS A.price < 6,
                 B AS B.price > A.price + 1
        )
        ORDER BY a_p
        """,
    ).collect()
    # strict adjacency: (5,3)x (3,4)x? 4 > 3+1 is false... 4 > 4 false;
    # (4,9): 9 > 5 true -> match; next attempt starts at 2 (last row, no B)
    assert [(r["a_p"], r["b_p"]) for r in out] == [(4.0, 9.0)]


def test_all_rows_per_match_running_measures(spark):
    _mk_prices(spark, [10, 9, 8, 9, 7])
    out = fsql(
        spark,
        """
        SELECT k, ts, price, cls, nd
        FROM mr_px MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY ts
          MEASURES CLASSIFIER() AS cls, COUNT(D.*) AS nd
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S D+)
          DEFINE D AS D.price < PREV(D.price)
        )
        ORDER BY ts
        """,
    ).collect()
    got = [(r["price"], r["cls"], r["nd"]) for r in out]
    # match 1: rows 10(S),9(D),8(D); match 2: rows 9(S),7(D) — running counts
    assert got == [
        (10.0, "S", 0),
        (9.0, "D", 1),
        (8.0, "D", 2),
        (9.0, "S", 0),
        (7.0, "D", 1),
    ]


def test_mr_skip_to_first_var(spark):
    """AFTER MATCH SKIP TO FIRST C resumes at the matched C event —
    overlapping triples (0,1,2),(2,3,4),... (SkipToFirstStrategy.java)."""
    from datetime import datetime, timedelta

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=i), 1, "e")
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).createOrReplaceTempView("sk_events")
    got = fsql(
        spark,
        """
        SELECT user_id, a_id
        FROM sk_events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS a_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO FIRST C
          PATTERN (A B C)
          DEFINE A AS A.event_id >= 0,
                 B AS B.event_id >= 0,
                 C AS C.event_id >= 0
        )
        """,
    )
    assert sorted(r["a_id"] for r in got.collect()) == [0, 2]


def test_legacy_group_window_rewrite_text():
    from fries_flink_spark.sqlext import _rewrite_group_windows

    q = _rewrite_group_windows(
        "SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE), count(*) "
        "FROM t GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)"
    )
    assert "window.start" in q and "window(ts, '600 seconds')" in q
    # HOP flips Flink's slide-then-size into Spark's size-then-slide
    q2 = _rewrite_group_windows(
        "GROUP BY HOP(ts, INTERVAL '1' MINUTE, INTERVAL '5' MINUTE)"
    )
    assert "window(ts, '300 seconds', '60 seconds')" in q2
    q3 = _rewrite_group_windows(
        "SELECT SESSION_END(ts, INTERVAL '30' SECOND) "
        "FROM t GROUP BY SESSION(ts, INTERVAL '30' SECOND)"
    )
    assert "session_window.end" in q3 and "session_window(ts, '30 seconds')" in q3
    # ANSI text without group windows passes through untouched
    assert _rewrite_group_windows("SELECT a FROM t") == "SELECT a FROM t"


def test_legacy_session_group_window_executes(spark):
    import datetime

    from fries_flink_spark.sqlext import sql as fsql

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, s)) for s in (0, 10, 20)
    ] + [(1, datetime.datetime(2024, 1, 1, 0, 5, 0))]
    spark.createDataFrame(rows, "k int, ts timestamp").createOrReplaceTempView(
        "sess_ev"
    )
    out = fsql(
        spark,
        """
        SELECT k, unix_timestamp(SESSION_START(ts, INTERVAL '1' MINUTE)) AS s,
               count(*) AS n
        FROM sess_ev
        GROUP BY k, SESSION(ts, INTERVAL '1' MINUTE)
        ORDER BY s
        """,
    ).collect()
    assert [r["n"] for r in out] == [3, 1]  # 3 clustered events, 1 lone


def test_window_three_formulations_equivalent(spark):
    """Legacy GROUP BY TUMBLE, the TUMBLE TVF, and the native DataFrame
    window() must agree row-for-row — the property that makes the grammar
    shims safe to mix in one codebase."""
    import datetime

    from pyspark.sql import functions as F

    from fries_flink_spark.sqlext import sql as fsql

    rows = [
        (i % 3, datetime.datetime(2024, 1, 1, 0, i // 3, (i * 7) % 60), float(i))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    df.createOrReplaceTempView("eq_ev")

    legacy = fsql(
        spark,
        """
        SELECT k, unix_timestamp(TUMBLE_START(ts, INTERVAL '5' MINUTE)) AS ws,
               count(*) AS n, sum(v) AS total
        FROM eq_ev GROUP BY k, TUMBLE(ts, INTERVAL '5' MINUTE)
        """,
    )
    tvf = fsql(
        spark,
        """
        SELECT k, unix_timestamp(window_start) AS ws, count(*) AS n,
               sum(v) AS total
        FROM TABLE(TUMBLE(TABLE eq_ev, DESCRIPTOR(ts), INTERVAL '5' MINUTE))
        GROUP BY k, window_start
        """,
    )
    native = (
        df.groupBy("k", F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .select("k", F.unix_timestamp("w.start").alias("ws"), "n", "total")
    )

    def canon(frame):
        return sorted(tuple(r) for r in frame.collect())

    assert canon(legacy) == canon(tvf) == canon(native)


def test_extension_composition_tvf_then_match_recognize(spark, sf_dir):
    """The grammar extensions compose across statements: a window-TVF
    aggregate registered as a view, then MATCH_RECOGNIZE over it — the
    rising-then-falling turning-point pattern on windowed counts."""
    from fries_flink_spark.catalog import register_tables
    from fries_flink_spark.sqlext import sql as fsql

    register_tables(spark, sf_dir)
    agg = fsql(
        spark,
        """
        SELECT window_start AS ws, count(*) AS n
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY window_start
        """,
    )
    agg.createOrReplaceTempView("win_counts")
    spark.sql(
        "SELECT ws, n, 0 AS grp FROM win_counts"
    ).createOrReplaceTempView("win_counts_k")
    peaks = fsql(
        spark,
        """
        SELECT grp, peak_n FROM win_counts_k MATCH_RECOGNIZE (
          PARTITION BY grp
          ORDER BY ws
          MEASURES LAST(UP.n) AS peak_n
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (UP+ DOWN)
          DEFINE UP AS UP.n >= PREV(UP.n),
                 DOWN AS DOWN.n < PREV(DOWN.n)
        )
        """,
    ).collect()
    # sanity: every reported peak is a real local maximum of the series
    series = [r["n"] for r in spark.table("win_counts_k").orderBy("ws").collect()]
    local_max = {series[i] for i in range(1, len(series) - 1)
                 if series[i] >= series[i - 1] and series[i] > series[i + 1]}
    assert peaks and all(r["peak_n"] in local_max for r in peaks)


def test_mr_single_var_fast_path_plan_and_parity(spark, sf_dir):
    """PATTERN (D+) with a PREV-only DEFINE routes to the windowed-SQL fast
    path (no Python stage in the plan) and emits the same rows as the NFA
    rendition of the same query on a pattern the fast path declines."""
    from fries_flink_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    q = """
        SELECT user_id, first_id, n_down
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(D.event_id) AS first_id, COUNT(D.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
    """
    out = fsql(spark, q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan  # vectorized: no Python stage
    fast_rows = {tuple(r) for r in out.collect()}

    # NFA path on the same semantics: D{1,64} with a cross-variable-free but
    # nav-style DEFINE (LAST forces the ctx/NFA route)
    q_nfa = q.replace("D.value < PREV(D.value)",
                      "LAST(D.value, 0) < PREV(D.value)")
    nfa_rows = {tuple(r) for r in fsql(spark, q_nfa).collect()}
    assert fast_rows == nfa_rows and len(fast_rows) > 0


def test_mr_fast_path_exact_quantifier_chunks(spark):
    """D{2} splits a 5-long falling run into two matches (greedy + SKIP PAST
    LAST ROW), dropping the 1-row remainder — identical to the NFA."""
    rows = [(1, i, float(100 - i)) for i in range(1, 7)]  # strictly falling
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    df.createOrReplaceTempView("mr_chunks")
    q = """
        SELECT k, first_seq, n
        FROM mr_chunks MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES FIRST(D.seq) AS first_seq, COUNT(D.*) AS n
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D{2})
          DEFINE D AS D.v < PREV(D.v)
        )
    """
    got = sorted(tuple(r) for r in fsql(spark, q).collect())
    # falling rows are seq 2..6 (5 rows): chunks (2,3), (4,5); 6 dropped
    assert got == [(1, 2, 2), (1, 4, 2)]


def test_mr_expression_measures_all_rows_running(spark):
    """Running semantics for expression measures under ALL ROWS PER MATCH."""
    rows = [(1, 1, 10.0), (1, 2, 8.0), (1, 3, 5.0), (1, 4, 9.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    df.createOrReplaceTempView("mr_exprm")
    q = """
        SELECT k, seq, span, wsum
        FROM mr_exprm MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES FIRST(D.v) - LAST(D.v) AS span,
                   SUM(D.v * 2) AS wsum
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.v < PREV(D.v)
        )
        ORDER BY seq
    """
    got = [tuple(r) for r in fsql(spark, q).collect()]
    # falling run = seq 2 (8.0), seq 3 (5.0); running: at seq2 span=0,
    # wsum=16; at seq3 span=3, wsum=26
    assert got == [(1, 2, 0.0, 16.0), (1, 3, 3.0, 26.0)]


def test_mr_subset_and_final_semantics(spark):
    """SUBSET merges member rows in order; FINAL shows whole-match values on
    every output row while RUNNING (default) grows."""
    rows = [
        (1, 1, "c", 5.0),
        (1, 2, "e", 3.0),
        (1, 3, "e", 7.0),
        (1, 4, "x", 1.0),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, t string, v double")
    df.createOrReplaceTempView("mr_subset")
    q = """
        SELECT k, seq, n_all, run_sum, fin_sum
        FROM mr_subset MATCH_RECOGNIZE (
          PARTITION BY k
          ORDER BY seq
          MEASURES COUNT(U.*) AS n_all,
                   RUNNING SUM(B.v) AS run_sum,
                   FINAL SUM(B.v) AS fin_sum
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          SUBSET U = (A, B)
          DEFINE A AS A.t = 'c',
                 B AS B.t = 'e'
        )
        ORDER BY seq
    """
    got = [tuple(r) for r in fsql(spark, q).collect()]
    # match = rows 1(A),2(B),3(B): n_all runs 1,2,3; running sum of B.v
    # None,3,10; final 10 everywhere
    assert got == [
        (1, 1, 1, None, 10.0),
        (1, 2, 2, 3.0, 10.0),
        (1, 3, 3, 10.0, 10.0),
    ]


def test_mr_measure_parse_rejections():
    """Malformed measure expressions raise instead of silently truncating
    (code-review findings: trailing tokens, FIRST-in-aggregate, FINAL
    CLASSIFIER)."""
    import pytest as _pytest

    from fries_flink_spark.sqlext import _parse_measures

    # round-7 grammar upgrade: aggregate calls are expression TERMS, so
    # arithmetic around (and between) them parses as one EXPR measure
    # instead of silently truncating to the bare aggregate
    ok_arith = _parse_measures("SUM(A.p) * 2 AS x, SUM(A.p) + SUM(A.q) AS y")
    assert [(m[0], m[-1]) for m in ok_arith] == [("EXPR", "x"), ("EXPR", "y")]
    with _pytest.raises(NotImplementedError):
        _parse_measures("SUM(A.q * FIRST(A.p)) AS x")  # nav inside agg
    with _pytest.raises(NotImplementedError):
        _parse_measures("FINAL CLASSIFIER() AS c")
    with _pytest.raises(NotImplementedError):
        _parse_measures("FINAL MATCH_NUMBER() AS n")
    # valid forms still parse
    ok = _parse_measures(
        "SUM(A.p * 2 + 1) AS a, LAST(A.p) - FIRST(A.p) AS b, RUNNING COUNT(A.*) AS c"
    )
    assert [m[-1] for m in ok] == ["a", "b", "c"]


def test_mr_bare_measure_is_last_and_zero_quant_routes_nfa(spark):
    """Bare V.col == LAST(V.col) in ONE ROW PER MATCH (identical on the
    windowed fast path and the NFA), and V{0,n} declines the fast path."""
    rows = [(1, 1, 9.0), (1, 2, 7.0), (1, 3, 4.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    df.createOrReplaceTempView("mr_bare")
    q = """
        SELECT k, lastv
        FROM mr_bare MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES D.v AS lastv
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.v < PREV(D.v)
        )
    """
    # fast path (PREV-only define): last value of the falling run = 4.0
    fast = [tuple(r) for r in fsql(spark, q).collect()]
    assert fast == [(1, 4.0)]
    # force the NFA (nav define) — identical result
    nfa = [
        tuple(r)
        for r in fsql(
            spark, q.replace("D.v < PREV(D.v)", "LAST(D.v, 0) < PREV(D.v)")
        ).collect()
    ]
    assert nfa == fast

    from fries_flink_spark.sqlext import _quant_bounds

    assert _quant_bounds("{0}") is None
    assert _quant_bounds("{0,3}") is None
    assert _quant_bounds("{2,5}") == (2, 5)


def test_mr_subset_in_define(spark):
    """SUBSET union variables resolve inside DEFINE (round-7 grammar close):
    LAST(U.v, 1) under running semantics reads the union's previous mapped
    row (the candidate itself is LAST(U.v, 0)), so the B run extends only
    while values ascend across the WHOLE match, not just within B."""
    rows = [
        (1, 1, "c", 1.0), (1, 2, "b", 2.0), (1, 3, "b", 3.0), (1, 4, "b", 2.5),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, t string, v double")
    df.createOrReplaceTempView("mr_subset_def")
    out = fsql(
        spark,
        """
        SELECT k, n, s FROM mr_subset_def MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES COUNT(U.*) AS n, SUM(U.v) AS s
          ONE ROW PER MATCH
          PATTERN (A B+)
          SUBSET U = (A, B)
          DEFINE A AS A.t = 'c',
                 B AS B.t = 'b' AND B.v > LAST(U.v, 1)
        )
        """,
    ).collect()
    assert [(r.k, r.n, r.s) for r in out] == [(1, 3, 6.0)]


def test_mr_define_between_in_modulo(spark):
    """BETWEEN / IN / % in DEFINE desugar correctly, take the windowed fast
    path, and % follows SQL sign-of-dividend semantics on both engines."""
    rows = [(1, 1, 9.0, 10), (1, 2, 7.0, 3), (1, 3, 5.0, 6), (1, 4, 3.0, 7)]
    df = spark.createDataFrame(rows, "k long, seq long, v double, m long")
    df.createOrReplaceTempView("mr_grammar")
    q = """
        SELECT k, fs, n FROM mr_grammar MATCH_RECOGNIZE (
          PARTITION BY k ORDER BY seq
          MEASURES FIRST(D.seq) AS fs, COUNT(D.*) AS n
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.v < PREV(D.v) AND D.v BETWEEN 4 AND 8
                      AND D.m % 3 IN (0, 1)
        )
    """
    out = fsql(spark, q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan  # still fully vectorized
    # rows 2 (v=7, m%3=0), 3 (v=5, m%3=0) qualify; row 4 fails BETWEEN
    assert [tuple(r) for r in out.collect()] == [(1, 2, 2)]
    # NFA path agrees
    nfa = fsql(spark, q.replace("D.v < PREV(D.v)",
                                "LAST(D.v, 0) < PREV(D.v)"))
    assert [tuple(r) for r in nfa.collect()] == [(1, 2, 2)]

    from fries_flink_spark.sqlext import _sql_mod

    assert _sql_mod(-7, 3) == -1  # sign of dividend (SQL), not Python's 2
    assert _sql_mod(7, -3) == 1
