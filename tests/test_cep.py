"""NFA semantics tests for operators/cep (reference: flink-cep Pattern API,
test model .../cep/nfa/NFAITCase.java)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from fries_flink_spark.operators.cep import Pattern, match_pattern


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1) + timedelta(minutes=m), k, t) for i, (m, k, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def _run(df, pat, select_stages):
    out = match_pattern(
        df,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            **{
                f"{name}_{pos}": m[name][pos]["event_id"]
                for name, pos in select_stages
            },
        },
        output_schema="user_id long, "
        + ", ".join(f"{n}_{p} long" for n, p in select_stages),
        order_tiebreak=["event_id"],
    )
    return sorted(tuple(r) for r in out.collect())


def test_strict_vs_relaxed(spark):
    # user 1: A x B   (x breaks strict contiguity, not relaxed)
    df = _events(spark, [(0, 1, "A"), (1, 1, "x"), (2, 1, "B")])
    strict = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .next("b").where(lambda r: r["event_type"] == "B")
    )
    relaxed = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .followed_by("b").where(lambda r: r["event_type"] == "B")
    )
    assert _run(df, strict, [("a", 0), ("b", 0)]) == []
    assert _run(df, relaxed, [("a", 0), ("b", 0)]) == [(1, 0, 2)]


def test_within_bounds_match(spark):
    df = _events(spark, [(0, 1, "A"), (90, 1, "B")])
    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .followed_by("b").where(lambda r: r["event_type"] == "B")
        .within(timedelta(hours=1))
    )
    assert _run(df, pat, [("a", 0), ("b", 0)]) == []


def test_times_exact_no_skip(spark):
    # 4 consecutive A's -> times(3) matches at starts 0 and 1 (noSkip)
    df = _events(spark, [(0, 1, "A"), (1, 1, "A"), (2, 1, "A"), (3, 1, "A")])
    pat = Pattern.begin("a").where(lambda r: r["event_type"] == "A").times(3)
    assert _run(df, pat, [("a", 0), ("a", 2)]) == [(1, 0, 2), (1, 1, 3)]


def test_one_or_more_non_greedy_vs_greedy(spark):
    df = _events(spark, [(0, 1, "A"), (1, 1, "A"), (2, 1, "B")])
    base = lambda: (  # noqa: E731
        Pattern.begin("a").where(lambda r: r["event_type"] == "A").one_or_more()
    )
    lazy = base().followed_by("b").where(lambda r: r["event_type"] == "B")
    # non-greedy: shortest run first -> match at 0 takes a=[0] then b=2
    assert (1, 0, 2) in _run(df, lazy, [("a", 0), ("b", 0)])
    greedy = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .one_or_more().greedy()
        .followed_by("b").where(lambda r: r["event_type"] == "B")
    )
    # greedy: match at 0 consumes both A's
    rows = _run(df, greedy, [("a", 0), ("b", 0)])
    assert (1, 0, 2) in rows


def test_optional_stage(spark):
    df = _events(spark, [(0, 1, "A"), (1, 1, "C")])
    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .followed_by("b").where(lambda r: r["event_type"] == "B").optional()
        .followed_by("c").where(lambda r: r["event_type"] == "C")
    )
    assert _run(df, pat, [("a", 0), ("c", 0)]) == [(1, 0, 1)]


def test_keys_are_independent(spark):
    df = _events(spark, [(0, 1, "A"), (1, 2, "B")])
    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .followed_by("b").where(lambda r: r["event_type"] == "B")
    )
    # A and B belong to different users -> no match
    assert _run(df, pat, [("a", 0), ("b", 0)]) == []

def test_skip_past_last_event(spark):
    """4 consecutive A's, times(2): noSkip yields overlapping starts 0,1,2;
    skipPastLastEvent yields non-overlapping [0,1] and [2,3] only."""
    from fries_flink_spark.operators.cep import SKIP_PAST_LAST_EVENT

    df = _events(spark, [(0, 1, "A"), (1, 1, "A"), (2, 1, "A"), (3, 1, "A")])
    pat = Pattern.begin("a").where(lambda r: r["event_type"] == "A").times(2)
    no_skip = _run(df, pat, [("a", 0), ("a", 1)])
    assert no_skip == [(1, 0, 1), (1, 1, 2), (1, 2, 3)]
    out = match_pattern(
        df,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_0": m["a"][0]["event_id"],
            "a_1": m["a"][1]["event_id"],
        },
        output_schema="user_id long, a_0 long, a_1 long",
        order_tiebreak=["event_id"],
        skip_strategy=SKIP_PAST_LAST_EVENT,
    )
    assert sorted(tuple(r) for r in out.collect()) == [(1, 0, 1), (1, 2, 3)]


def test_not_followed_by_requires_within_when_terminal(spark):
    pat = (
        Pattern.begin("a").where(lambda r: r["event_type"] == "A")
        .not_followed_by("nb").where(lambda r: r["event_type"] == "B")
    )
    with pytest.raises(ValueError, match="within"):
        match_pattern(
            _events(spark, [(0, 1, "A")]),
            pat,
            key_cols=["user_id"],
            time_col="ts",
            select=lambda key, m: {"user_id": key["user_id"]},
            output_schema="user_id long",
        )


def test_followed_by_any_emit_all(spark):
    """followedByAny + emit='all': one match per (A, later B) pair."""
    df = _events(spark, [(0, 1, "A"), (1, 1, "B"), (2, 1, "B")])
    pat = (
        Pattern.begin("a").where_mask(lambda d: d["event_type"] == "A")
        .followed_by_any("b").where_mask(lambda d: d["event_type"] == "B")
    )
    out = match_pattern(
        df,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_0": m["a"][0]["event_id"],
            "b_0": m["b"][0]["event_id"],
        },
        output_schema="user_id long, a_0 long, b_0 long",
        order_tiebreak=["event_id"],
        emit="all",
    )
    assert sorted(tuple(r) for r in out.collect()) == [(1, 0, 1), (1, 0, 2)]


class TestSkipToVariable:
    """AFTER MATCH SKIP TO [FIRST|LAST] var (reference:
    flink-cep .../nfa/aftermatch/{SkipToFirst,SkipToLast}Strategy.java)."""

    def _df(self, spark, n=6):
        # one key, n any-type events: PATTERN (A B C) matches at every start
        return _events(spark, [(i, 1, "e") for i in range(n)])

    def _pat(self):
        return (
            Pattern.begin("A").where_mask(lambda d: d["event_type"] == "e")
            .next("B").where_mask(lambda d: d["event_type"] == "e")
            .next("C").where_mask(lambda d: d["event_type"] == "e")
        )

    def _starts(self, spark, **kw):
        from fries_flink_spark.operators.cep import match_pattern

        out = match_pattern(
            self._df(spark),
            self._pat(),
            key_cols=["user_id"],
            time_col="ts",
            select=lambda key, m: {"a_id": m["A"][0]["event_id"]},
            output_schema="a_id long",
            order_tiebreak=["event_id"],
            **kw,
        )
        return sorted(r["a_id"] for r in out.collect())

    def test_skip_to_first_var_resumes_at_var(self, spark):
        from fries_flink_spark.operators.cep import SKIP_TO_FIRST

        # (0,1,2) -> resume at C=2 -> (2,3,4) -> resume at 4: (4,5,-) fails
        assert self._starts(
            spark, skip_strategy=SKIP_TO_FIRST, skip_var="C"
        ) == [0, 2]

    def test_skip_to_last_var_resumes_at_var(self, spark):
        from fries_flink_spark.operators.cep import SKIP_TO_LAST

        # barrier = B of previous match: starts 0,1,2,3 (overlapping allowed)
        assert self._starts(
            spark, skip_strategy=SKIP_TO_LAST, skip_var="B"
        ) == [0, 1, 2, 3]

    def test_differs_from_skip_past_last(self, spark):
        from fries_flink_spark.operators.cep import SKIP_PAST_LAST_EVENT

        assert self._starts(spark, skip_strategy=SKIP_PAST_LAST_EVENT) == [0, 3]

    def test_skip_to_first_of_start_raises(self, spark):
        from fries_flink_spark.operators.cep import SKIP_TO_FIRST

        with pytest.raises(Exception, match="advance|loop"):
            self._starts(spark, skip_strategy=SKIP_TO_FIRST, skip_var="A")

    def test_unknown_skip_var_rejected(self, spark):
        from fries_flink_spark.operators.cep import SKIP_TO_LAST

        with pytest.raises(ValueError, match="skip_var"):
            self._starts(spark, skip_strategy=SKIP_TO_LAST, skip_var="Z")


def test_branchy_vectorized_equals_nfa(spark, sf_dir):
    """The JVM-side branch-enumeration plan (_branchy_fast_path) and the NFA
    emit identical rows for the same pattern + declarative select."""
    from datetime import timedelta

    from fries_flink_spark.catalog import load_table

    events = load_table(spark, sf_dir, "events")

    def build(vectorized):
        pat = (
            Pattern.begin("a")
            .where_mask(lambda d: d["event_type"] == "click")
            .followed_by_any("b")
            .where_mask(lambda d: d["event_type"] == "error")
            .one_or_more(64)
            .within(timedelta(minutes=45))
        )
        return match_pattern(
            events,
            pat,
            key_cols=["user_id"],
            time_col="ts",
            select=None,
            select_expr={
                "user_id": ("key", "user_id"),
                "a_id": ("first", "a", "event_id"),
                "b_id": ("first", "b", "event_id"),
                "n_err": ("count", "b"),
            },
            vectorized=vectorized,
            output_schema="user_id long, a_id long, b_id long, n_err long",
            order_tiebreak=["event_id"],
            emit="all",
        )

    fast = {tuple(r) for r in build(True).collect()}
    nfa = {tuple(r) for r in build(False).collect()}
    assert fast == nfa and len(fast) > 0


def test_branchy_vectorized_small_cap_and_unbounded(spark):
    """max_times cap + no WITHIN window, on a handcrafted sequence with a
    broken run: prefixes must stop at the break and at the cap."""
    from fries_flink_spark.operators.cep import match_pattern as mp

    rows = [
        # key, ts-second, id, type   (errors at 2,3,4 then gap then 6,7)
        (1, 1, 10, "click"),
        (1, 2, 11, "error"),
        (1, 3, 12, "error"),
        (1, 4, 13, "error"),
        (1, 5, 14, "view"),
        (1, 6, 15, "error"),
        (1, 7, 16, "error"),
    ]
    df = spark.createDataFrame(
        [(k, f"2024-01-01 00:00:{s:02d}", i, t) for k, s, i, t in rows],
        "user_id long, ts_s string, event_id long, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id", "event_type")

    def build(vectorized):
        pat = (
            Pattern.begin("a")
            .where_mask(lambda d: d["event_type"] == "click")
            .followed_by_any("b")
            .where_mask(lambda d: d["event_type"] == "error")
            .one_or_more(2)  # cap runs at 2
        )
        return mp(
            df,
            pat,
            key_cols=["user_id"],
            time_col="ts",
            select=None,
            select_expr={
                "b_id": ("first", "b", "event_id"),
                "n_err": ("count", "b"),
            },
            vectorized=vectorized,
            output_schema="b_id long, n_err long",
            order_tiebreak=["event_id"],
            emit="all",
        )

    fast = sorted(tuple(r) for r in build(True).collect())
    nfa = sorted(tuple(r) for r in build(False).collect())
    assert fast == nfa
    # runs from 11: (11,1),(11,2) capped at 2; from 12: (12,1),(12,2);
    # 13 run of 1; 15: (15,1),(15,2); 16: 1
    assert fast == sorted(
        [(11, 1), (11, 2), (12, 1), (12, 2), (13, 1), (15, 1), (15, 2), (16, 1)]
    )


class TestAutoVectorizeSelection:
    """vectorized='auto' (the default) picks NFA vs the JVM branch plan from
    observed key-count x run-length stats (VERDICT r7 ask: selection should
    not be caller choice)."""

    _SELECT = {
        "b_id": ("first", "b", "event_id"),
        "n_err": ("count", "b"),
    }

    @staticmethod
    def _pattern():
        return (
            Pattern.begin("a")
            .where_mask(lambda d: d["event_type"] == "click")
            .followed_by_any("b")
            .where_mask(lambda d: d["event_type"] == "error")
            .one_or_more(8)
        )

    def _df(self, spark, n_keys, run_len):
        rows = []
        eid = 0
        for k in range(n_keys):
            rows.append((k, eid, "click")); eid += 1
            for _ in range(run_len - 1):
                rows.append((k, eid, "error")); eid += 1
        return spark.createDataFrame(
            [
                (k, f"2024-01-01 00:{i % 60:02d}:{(i // 60) % 60:02d}", i, t)
                for k, i, t in rows
            ],
            "user_id long, ts_s string, event_id long, event_type string",
        ).selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_id", "event_type"
        )

    def test_shape_ok(self):
        from fries_flink_spark.operators.cep import _branchy_shape_ok

        assert _branchy_shape_ok(self._pattern(), ["user_id"], self._SELECT)
        # 3-stage pattern: outside the covered shape
        three = (
            self._pattern()
            .followed_by("c")
            .where_mask(lambda d: d["event_type"] == "view")
        )
        assert not _branchy_shape_ok(three, ["user_id"], self._SELECT)
        # last() reference: NFA-only select spec
        bad_sel = dict(self._SELECT, last_b=("last", "b", "event_id"))
        assert not _branchy_shape_ok(self._pattern(), ["user_id"], bad_sel)

    def test_stats_choice(self, spark):
        from fries_flink_spark.operators.cep import _choose_vectorized

        # dense masks, 100 keys x 100 events: E ~ 10000 * 1.0 * cap(8) = 80k
        many = self._df(spark, n_keys=100, run_len=100)
        # 200 keys x 4 events: E ~ 800 * ~0.75 * 3 ~ 1.8k
        few = self._df(spark, n_keys=200, run_len=4)
        pat = self._pattern()
        assert _choose_vectorized(many, ["user_id"], pat, "ts") is True
        assert _choose_vectorized(few, ["user_id"], pat, "ts") is False

    def _run_auto(self, spark, df, monkeypatch):
        """Run with vectorized='auto'; report which engine was taken."""
        import fries_flink_spark.operators.cep as cep

        taken = {"fast": False}
        real = cep._branchy_fast_path

        def spy(*a, **kw):
            out = real(*a, **kw)
            taken["fast"] = out is not None
            return out

        monkeypatch.setattr(cep, "_branchy_fast_path", spy)
        out = match_pattern(
            df,
            self._pattern(),
            key_cols=["user_id"],
            time_col="ts",
            select=None,
            select_expr=self._SELECT,
            output_schema="b_id long, n_err long",
            order_tiebreak=["event_id"],
            emit="all",
        )
        rows = sorted(tuple(r) for r in out.collect())
        return taken["fast"], rows

    def test_auto_picks_per_stats_and_results_agree(self, spark, monkeypatch):
        for df, expect_fast in (
            (self._df(spark, 100, 100), True),
            (self._df(spark, 60, 4), False),
        ):
            used_fast, rows = self._run_auto(spark, df, monkeypatch)
            assert used_fast is expect_fast
            # both engines must agree regardless of the auto choice
            forced = match_pattern(
                df,
                self._pattern(),
                key_cols=["user_id"],
                time_col="ts",
                select=None,
                select_expr=self._SELECT,
                vectorized=not expect_fast,
                output_schema="b_id long, n_err long",
                order_tiebreak=["event_id"],
                emit="all",
            )
            assert rows == sorted(tuple(r) for r in forced.collect())

    def test_auto_choice_memoized(self, spark, monkeypatch):
        """A repeat of the same (input plan, pattern) must hit the decision
        memo — zero stats jobs on the second call. The pattern is REBUILT
        (fresh lambda objects): the memo keys mask bytecode, not identity."""
        import fries_flink_spark.operators.cep as cep
        from pyspark.sql import DataFrame

        df = self._df(spark, n_keys=100, run_len=100)
        cep._AUTO_CACHE.clear()
        assert cep._choose_vectorized(df, ["user_id"], self._pattern(), "ts") is True
        assert len(cep._AUTO_CACHE) == 1

        calls: list[int] = []
        orig = DataFrame.agg

        def spy(self, *a, **kw):
            calls.append(1)
            return orig(self, *a, **kw)

        monkeypatch.setattr(DataFrame, "agg", spy)
        assert cep._choose_vectorized(df, ["user_id"], self._pattern(), "ts") is True
        assert calls == []
