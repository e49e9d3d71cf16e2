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
def test_not_next_matches_bruteforce(events):
    """A notNext(B): match at every A whose immediately following event is
    not B (or that is last)."""
    rows = _rows(events)
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .not_next("nb").where(lambda r: r["y"] == "B")
    )
    got = _all_matches(rows, pat)
    want = [
        {"a": [rows[i]["i"]], "nb": []}
        for i in range(len(rows))
        if rows[i]["y"] == "A"
        and (i + 1 >= len(rows) or rows[i + 1]["y"] != "B")
    ]
    assert got == want


@given(EVENTS, st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_not_followed_by_terminal_matches_bruteforce(events, window):
    """A notFollowedBy(B) within w: match at every A with no B in (A, A+w]."""
    rows = _rows(events)
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .not_followed_by("nb").where(lambda r: r["y"] == "B")
        .within(window)
    )
    got = _all_matches(rows, pat)
    want = []
    for i, r in enumerate(rows):
        if r["y"] != "A":
            continue
        blocked = any(
            q["y"] == "B" and q["t"] <= r["t"] + window for q in rows[i + 1 :]
        )
        if not blocked:
            want.append({"a": [r["i"]], "nb": []})
    assert got == want


@given(EVENTS, st.integers(1, 10))
@settings(max_examples=200, deadline=None)
def test_not_followed_by_middle_matches_bruteforce(events, window):
    """A notFollowedBy(B) followedBy(C): no B strictly between A and the
    first C after A."""
    rows = [
        {"t": t, "y": y, "i": i}
        for i, (t, y) in enumerate(
            sorted(events, key=lambda e: e[0])
        )
    ]
    # third symbol: map every even index to C to get three letters from {A,B}
    for r in rows:
        if r["i"] % 3 == 2:
            r["y"] = "C"
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .not_followed_by("nb").where(lambda r: r["y"] == "B")
        .followed_by("c").where(lambda r: r["y"] == "C")
        .within(window)
    )
    got = _all_matches(rows, pat)
    want = []
    for i, r in enumerate(rows):
        if r["y"] != "A":
            continue
        cs = [
            q for q in rows[i + 1 :] if q["y"] == "C" and q["t"] <= r["t"] + window
        ]
        if not cs:
            continue
        c = cs[0]
        gap_has_b = any(
            q["y"] == "B" for q in rows[i + 1 : c["i"]]
        )
        if not gap_has_b:
            want.append({"a": [r["i"]], "nb": [], "c": [c["i"]]})
    assert got == want


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_or_where_is_union(events):
    """where(A).or_where(B) accepts exactly the union of A-rows and B-rows."""
    rows = _rows(events)
    pat_or = (
        Pattern.begin("x")
        .where(lambda r: r["y"] == "A")
        .or_where(lambda r: r["y"] == "B")
    )
    got = _all_matches(rows, pat_or)
    want = [{"x": [r["i"]]} for r in rows if r["y"] in ("A", "B")]
    assert got == want


@given(EVENTS)
@settings(max_examples=200, deadline=None)
def test_followed_by_any_enumerates_all_branches(events):
    """followedByAny must find a match for every (A, later B) pair when
    branches are enumerated."""
    rows = _rows(events)
    pat = (
        Pattern.begin("a").where(lambda r: r["y"] == "A")
        .followed_by_any("b").where(lambda r: r["y"] == "B")
    )
    from fries_flink_spark.operators.cep import _build_masks, _solutions
    import pandas as pd

    if not rows:
        return
    pdf = pd.DataFrame(rows)
    masks, idx, _ctxs = _build_masks(pat, pdf)
    ts = [r["t"] for r in rows]
    got = []
    for s in range(len(rows)):
        for m in _solutions(ts, masks, idx, s, pat):
            got.append({k: v for k, v in m.items()})
    want = [
        {"a": [i], "b": [j]}
        for i in range(len(rows))
        if rows[i]["y"] == "A"
        for j in range(i + 1, len(rows))
        if rows[j]["y"] == "B"
    ]
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
