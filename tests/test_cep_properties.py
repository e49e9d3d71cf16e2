"""Property-based tests for the CEP NFA core (beyond the reference's test
strategy — SURVEY §5.5 notes it has no randomized testing).

``_match_from`` runs on plain dicts, so hypothesis drives hundreds of random
event sequences through the NFA and checks against independent brute-force
oracles per pattern shape.
"""

from __future__ import annotations

from datetime import timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from fries_flink_spark.operators.cep import Pattern, _match_from

# events: (time, type) with small alphabets to force collisions
EVENTS = st.lists(
    st.tuples(st.integers(0, 50), st.sampled_from("AB")), min_size=0, max_size=12
)


def _rows(events):
    return [
        {"t": t, "y": y, "i": i}
        for i, (t, y) in enumerate(sorted(events, key=lambda e: e[0]))
    ]


def _all_matches(rows, pattern):
    out = []
    for s in range(len(rows)):
        m = _match_from(rows, s, pattern, "t")
        if m is not None:
            out.append({k: [r["i"] for r in v] for k, v in m.items()})
    return out


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_strict_next_matches_bruteforce(events):
    rows = _rows(events)
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .next("b").where(lambda r: r["y"] == "B")
    )
    got = _all_matches(rows, pat)
    want = [
        {"a": [rows[i]["i"]], "b": [rows[i + 1]["i"]]}
        for i in range(len(rows) - 1)
        if rows[i]["y"] == "A" and rows[i + 1]["y"] == "B"
    ]
    assert got == want


@given(EVENTS, st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_followed_by_within_matches_bruteforce(events, window):
    rows = _rows(events)
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .followed_by("b").where(lambda r: r["y"] == "B")
        .within(window)  # plain number: same units as the "t" column
    )
    got = _all_matches(rows, pat)
    want = []
    for i, r in enumerate(rows):
        if r["y"] != "A":
            continue
        nxt = [
            q
            for q in rows[i + 1 :]
            if q["y"] == "B" and q["t"] <= r["t"] + window
        ]
        if nxt:
            want.append({"a": [r["i"]], "b": [nxt[0]["i"]]})
    assert got == want


@given(EVENTS, st.integers(1, 4))
@settings(max_examples=200, deadline=None)
def test_times_matches_bruteforce(events, n):
    rows = _rows(events)
    pat = Pattern.begin("a").where(lambda r: r["y"] == "A").times(n)
    got = _all_matches(rows, pat)
    want = []
    for i in range(len(rows)):
        run = rows[i : i + n]
        if len(run) == n and all(r["y"] == "A" for r in run):
            want.append({"a": [r["i"] for r in run]})
    assert got == want


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_optional_stage_never_blocks(events):
    """A fully-optional middle stage must make the pattern equivalent to the
    two-stage version when no middle events exist."""
    rows = [r for r in _rows(events) if r["y"] in "AB"]
    with_opt = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .followed_by("m").where(lambda r: r["y"] == "Z").optional()
        .followed_by("b").where(lambda r: r["y"] == "B")
    )
    plain = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .followed_by("b").where(lambda r: r["y"] == "B")
    )
    got = [
        {k: v for k, v in m.items() if k != "m"}
        for m in _all_matches(rows, with_opt)
    ]
    assert got == _all_matches(rows, plain)
