"""CEP / MATCH_RECOGNIZE: event-pattern matching over keyed, time-ordered
streams (SURVEY §2.10 — the reference's biggest non-relational operator).

Reference surface: flink-libraries/flink-cep/src/main/java/org/apache/flink/
cep/CEP.java:38 (CEP.pattern entry point), .../pattern/Pattern.java:128-543
(begin/where/or/next/followedBy/notNext/oneOrMore/times/greedy/within),
.../nfa/NFA.java (the state machine), CepOperator.java:81 (keyed runtime);
SQL MATCH_RECOGNIZE lowers onto the same NFA (StreamExecMatch.java,
MatchCodeGenerator.scala).

Spark design: there is no native CEP, so the NFA runs as data-parallel Python
inside ``applyInPandas`` — one NFA sweep per key group over its time-sorted
events. This is the right Spark shape for it:

- The shuffle is ``groupBy(key)`` — exactly the keyBy the reference requires
  before ``CEP.pattern`` — so parallelism scales with distinct keys, and each
  group's sweep is O(events × pattern_length) locally.
- Batch = one sweep. Streaming = the same operator inside ``foreachBatch``
  with carry-over state (the partial-match frontier) via
  ``applyInPandasWithState`` — see streaming/state.keyed_process.
- Matching semantics follow Flink defaults: AfterMatchSkipStrategy.noSkip
  (a match attempt starts at EVERY event), relaxed contiguity for
  ``followed_by`` (non-matching events are skipped), strict for ``next``,
  earliest-first (non-greedy) branch resolution, ``within`` bounding
  first→last event time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame


@dataclass
class _Stage:
    name: str
    contiguity: str  # 'begin' | 'strict' | 'relaxed'
    predicates: list[Callable[[dict], bool]] = field(default_factory=list)
    min_times: int = 1
    max_times: int = 1
    greedy: bool = False

    def accepts(self, row: dict) -> bool:
        return all(p(row) for p in self.predicates)


class Pattern:
    """Fluent pattern builder mirroring Flink's (Pattern.java:128-543).

    >>> p = (Pattern.begin("a").where(lambda r: r["event_type"] == "click")
    ...      .followed_by("b").where(lambda r: r["event_type"] == "purchase")
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

    def where(self, pred: Callable[[dict], bool]) -> "Pattern":
        """AND-combined predicate on the current stage (Pattern.where:209)."""
        self.stages[-1].predicates.append(pred)
        return self

    def next(self, name: str) -> "Pattern":
        """Strict contiguity — the very next event must match (Pattern.next:334)."""
        self.stages.append(_Stage(name, "strict"))
        return self

    def followed_by(self, name: str) -> "Pattern":
        """Relaxed contiguity — skip non-matching events (Pattern.followedBy:373)."""
        self.stages.append(_Stage(name, "relaxed"))
        return self

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
        self.stages[-1].min_times = 0
        return self

    def within(self, duration: timedelta) -> "Pattern":
        """Max first→last event time span (Pattern.within:543)."""
        self.window = duration
        return self


def _accept_index(rows: list[dict], pattern: Pattern) -> list[list[int]]:
    """Per-stage sorted positions of accepting events — evaluated ONCE per
    group so each relaxed-contiguity step is a binary search instead of a
    linear rescan (turns the noSkip sweep from O(n²) to O(n log n) per key
    for fixed pattern length)."""
    return [
        [i for i, r in enumerate(rows) if st.accepts(r)] for st in pattern.stages
    ]


def _match_from(
    rows: list[dict],
    start: int,
    pattern: Pattern,
    time_col: str,
    accept_idx: list[list[int]] | None = None,
) -> dict[str, list[dict]] | None:
    """Try to complete one match whose first event is rows[start].

    Backtracking NFA sweep, earliest-first unless a stage is greedy. Returns
    {stage_name: [events]} or None.
    """
    from bisect import bisect_left

    if accept_idx is None:
        accept_idx = _accept_index(rows, pattern)
    deadline = None
    if pattern.window is not None:
        deadline = rows[start][time_col] + pattern.window

    def advance(si: int, pos: int) -> dict[str, list[dict]] | None:
        if si == len(pattern.stages):
            return {}
        stage = pattern.stages[si]
        # candidate positions for this stage's FIRST event
        if si == 0:
            starts = [start] if stage.accepts(rows[start]) else []
        elif stage.contiguity == "strict":
            starts = [pos] if pos < len(rows) and stage.accepts(rows[pos]) else []
        else:  # relaxed: first acceptable event at or after pos (binary search)
            idx = accept_idx[si]
            j = bisect_left(idx, pos)
            starts = (
                [idx[j]]
                if j < len(idx)
                and (deadline is None or rows[idx[j]][time_col] <= deadline)
                else []
            )
        if stage.min_times == 0:
            rest = advance(si + 1, pos)
            if rest is not None:
                return {stage.name: [], **rest}
        for s0 in starts:
            if deadline is not None and rows[s0][time_col] > deadline:
                continue
            # extend the repetition run (contiguous for strict, contiguous
            # run of matching events for relaxed — Flink's default internal
            # contiguity for looping states is relaxed-same semantics; we use
            # contiguous matching runs, the common case)
            run = [s0]
            while (
                len(run) < stage.max_times
                and run[-1] + 1 < len(rows)
                and stage.accepts(rows[run[-1] + 1])
                and (deadline is None or rows[run[-1] + 1][time_col] <= deadline)
            ):
                run.append(run[-1] + 1)
            lengths = range(len(run), stage.min_times - 1, -1) if stage.greedy else range(
                stage.min_times, len(run) + 1
            )
            for ln in lengths:
                if ln == 0:
                    continue
                taken = run[:ln]
                rest = advance(si + 1, taken[-1] + 1)
                if rest is not None:
                    return {stage.name: [rows[i] for i in taken], **rest}
        return None

    return advance(0, start)


def match_pattern(
    df: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    time_col: str,
    select: Callable[[dict[str, Any], dict[str, list[dict]]], dict[str, Any]],
    output_schema: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """CEP.pattern(stream.keyBy(...), pattern).select(...) analog.

    ``select(key_dict, {stage: [event dicts]}) -> output dict`` — the
    reference's PatternSelectFunction (flink-cep .../PatternSelectFunction.java).
    One output row per match; noSkip semantics (attempts start at every event).
    """
    tiebreak = order_tiebreak or []
    out_cols = [c.strip().split()[0] for c in output_schema.split(",")]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([time_col, *tiebreak], kind="mergesort")
        rows = pdf.to_dict("records")
        key = {k: rows[0][k] for k in key_cols} if rows else {}
        accept_idx = _accept_index(rows, pattern)
        out = []
        # noSkip attempts start only at events the begin stage accepts
        for start in accept_idx[0] if accept_idx else []:
            m = _match_from(rows, start, pattern, time_col, accept_idx)
            if m is not None:
                out.append(select(key, m))
        return pd.DataFrame(out, columns=out_cols)

    return df.groupBy(*key_cols).applyInPandas(
        lambda pdf: run(pdf), schema=output_schema
    )
