"""CEP / MATCH_RECOGNIZE queries over the events table.

Reference: flink-libraries/flink-cep (Pattern.java, CepOperator.java) and SQL
MATCH_RECOGNIZE (StreamExecMatch.java); test model MatchRecognizeITCase.scala.

The oracles express the same pattern relationally (lead() for strict
contiguity, first-following-event join for relaxed contiguity) — exactly how
one would hand-lower simple MATCH_RECOGNIZE programs; the NFA operator covers
the general case (quantifiers, alternation) the SQL can't.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.cep import Pattern, match_pattern
from ..registry import query, sorted_result


def _cep_events(spark, sf_dir):
    """Events projected to the columns every pattern in this module touches
    (keys, time, tiebreak, the masked ``event_type``). ``match_pattern`` is
    opaque to Catalyst — without the explicit select, ``value`` and the
    ``props`` JSON string would be shuffled by key and shipped through the
    Arrow boundary on every query here (guide §4.1: pass only the columns
    the function needs)."""
    return load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )


@query(
    "cep_next",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type, ts,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS n_type,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS n_id,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n_ts
      FROM events)
    SELECT user_id, event_id AS a_id, n_id AS b_id
    FROM w
    WHERE event_type = 'click' AND n_type = 'purchase'
      AND n_ts <= ts + INTERVAL 30 MINUTE
    ORDER BY user_id, a_id
    """,
)
def cep_next(spark, sf_dir):
    """Strict contiguity: click IMMEDIATELY followed by purchase within 30
    minutes, per user (Flink Pattern.begin().next(); one NFA sweep per key)."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .next("b")
        .where_mask(lambda d: d["event_type"] == "purchase")
        .within(timedelta(minutes=30))
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["a"][0]["event_id"],
            "b_id": m["b"][0]["event_id"],
        },
        output_schema="user_id long, a_id long, b_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "a_id")


@query(
    "cep_followed_by",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'),
    j AS (
      SELECT c.user_id, c.event_id AS a_id, p.event_id AS b_id,
             row_number() OVER (PARTITION BY c.user_id, c.event_id
                                ORDER BY p.ts, p.event_id) AS rn
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
       AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    SELECT user_id, a_id, b_id FROM j WHERE rn = 1
    ORDER BY user_id, a_id
    """,
)
def cep_followed_by(spark, sf_dir):
    """Relaxed contiguity: click followed (skipping other events) by the first
    purchase within 30 minutes, per user (Flink Pattern.followedBy)."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .followed_by("b")
        .where_mask(lambda d: d["event_type"] == "purchase")
        .within(timedelta(minutes=30))
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["a"][0]["event_id"],
            "b_id": m["b"][0]["event_id"],
        },
        output_schema="user_id long, a_id long, b_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "a_id")


@query(
    "cep_error_burst",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type, ts,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
             lead(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS id2,
             lead(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts2
      FROM events)
    SELECT user_id, event_id AS first_id, id2 AS last_id
    FROM w
    WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'
      AND ts2 <= ts + INTERVAL 2 HOUR
    ORDER BY user_id, first_id
    """,
)
def cep_error_burst(spark, sf_dir):
    """Quantifier: three consecutive errors within 2 hours per user
    (Pattern.times(3) — the times/oneOrMore looping-state machinery)."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("e")
        .where_mask(lambda d: d["event_type"] == "error")
        .times(3)
        .within(timedelta(hours=2))
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "first_id": m["e"][0]["event_id"],
            "last_id": m["e"][-1]["event_id"],
        },
        output_schema="user_id long, first_id long, last_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "first_id")

@query(
    "cep_no_purchase",
    oracle="""
    SELECT c.user_id, c.event_id AS a_id
    FROM events c
    WHERE c.event_type = 'click'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.user_id = c.user_id
          AND p.event_type = 'purchase'
          AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
          AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    ORDER BY user_id, a_id
    """,
)
def cep_no_purchase(spark, sf_dir):
    """Absence pattern: click NOT followed by a purchase within 30 minutes
    (Flink Pattern.notFollowedBy:304 as terminal stage + within — the
    abandoned-cart shape, a top CEP use case)."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .not_followed_by("nb")
        .where_mask(lambda d: d["event_type"] == "purchase")
        .within(timedelta(minutes=30))
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["a"][0]["event_id"],
        },
        output_schema="user_id long, a_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "a_id")


@query(
    "cep_not_next",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS n_type
      FROM events)
    SELECT user_id, event_id AS a_id
    FROM w
    WHERE event_type = 'error' AND (n_type IS NULL OR n_type <> 'error')
    ORDER BY user_id, a_id
    """,
)
def cep_not_next(spark, sf_dir):
    """Absence with strict contiguity: an error whose IMMEDIATELY following
    event is not another error (Flink Pattern.notNext:273) — isolated-failure
    detection."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "error")
        .not_next("nb")
        .where_mask(lambda d: d["event_type"] == "error")
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["a"][0]["event_id"],
        },
        output_schema="user_id long, a_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "a_id")


@query(
    "cep_or_where",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type IN ('click', 'view')),
    p AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'),
    j AS (
      SELECT c.user_id, c.event_id AS a_id, p.event_id AS b_id,
             row_number() OVER (PARTITION BY c.user_id, c.event_id
                                ORDER BY p.ts, p.event_id) AS rn
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id > c.event_id))
       AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    SELECT user_id, a_id, b_id FROM j WHERE rn = 1
    ORDER BY user_id, a_id
    """,
)
def cep_or_where(spark, sf_dir):
    """OR-combined stage conditions (Flink Pattern.or:175): (click OR view)
    followed by the first purchase within 30 minutes."""
    events = _cep_events(spark, sf_dir)
    pat = (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .or_where_mask(lambda d: d["event_type"] == "view")
        .followed_by("b")
        .where_mask(lambda d: d["event_type"] == "purchase")
        .within(timedelta(minutes=30))
    )
    out = match_pattern(
        events,
        pat,
        key_cols=["user_id"],
        time_col="ts",
        select=lambda key, m: {
            "user_id": key["user_id"],
            "a_id": m["a"][0]["event_id"],
            "b_id": m["b"][0]["event_id"],
        },
        output_schema="user_id long, a_id long, b_id long",
        order_tiebreak=["event_id"],
    )
    return out.orderBy("user_id", "a_id")


_BRANCHY_ORACLE = """
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ), err AS (
      SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
      FROM o WHERE event_type = 'error'
    ), err2 AS (
      SELECT user_id, event_id, ts, rn, isl,
             row_number() OVER (PARTITION BY user_id, isl ORDER BY rn) AS pos
      FROM err
    ), clicks AS (
      SELECT user_id, event_id AS a_id, ts AS a_ts, rn AS a_rn
      FROM o WHERE event_type = 'click'
    ), pairs AS (
      SELECT c.user_id, c.a_id, c.a_ts, e.event_id AS b_id, e.isl, e.pos
      FROM clicks c JOIN err2 e
        ON e.user_id = c.user_id AND e.rn > c.a_rn
       AND e.ts <= c.a_ts + INTERVAL 30 MINUTE
    ), capped AS (
      SELECT p.user_id, p.a_id, p.b_id,
             (SELECT count(*) FROM err2 x
              WHERE x.user_id = p.user_id AND x.isl = p.isl
                AND x.pos >= p.pos
                AND x.ts <= p.a_ts + INTERVAL 30 MINUTE) AS k_max
      FROM pairs p
    )
    SELECT user_id, a_id, b_id, CAST(g.k AS BIGINT) AS n_err
    FROM capped CROSS JOIN generate_series(1, 64) AS g(k)
    WHERE g.k <= k_max
    ORDER BY user_id, a_id, b_id, n_err
    """

_BRANCHY_SELECT = {
    "user_id": ("key", "user_id"),
    "a_id": ("first", "a", "event_id"),
    "b_id": ("first", "b", "event_id"),
    "n_err": ("count", "b"),
}


def _branchy_pattern():
    return (
        Pattern.begin("a")
        .where_mask(lambda d: d["event_type"] == "click")
        .followed_by_any("b")
        .where_mask(lambda d: d["event_type"] == "error")
        .one_or_more(64)
        .within(timedelta(minutes=30))
    )


@query("cep_branchy_any", oracle=_BRANCHY_ORACLE)
def cep_branchy_any(spark, sf_dir):
    """ADVERSARIAL branch enumeration: click followed-by-ANY error run, every
    branch emitted (Pattern.followedByAny + oneOrMore + NO_SKIP + all
    branches) — each later in-window error is a branch start and every run
    prefix is a distinct match. This is the worst case for the NFA's Python
    match expansion (the engine's documented throughput ceiling, PERF.md);
    the oracle restates it as gaps-and-islands + correlated run caps."""
    events = _cep_events(spark, sf_dir)
    out = match_pattern(
        events,
        _branchy_pattern(),
        key_cols=["user_id"],
        time_col="ts",
        select=None,
        select_expr=_BRANCHY_SELECT,
        output_schema="user_id long, a_id long, b_id long, n_err long",
        order_tiebreak=["event_id"],
        emit="all",
    )
    return out.transform(sorted_result, "user_id", "a_id", "b_id", "n_err")


@query("cep_branchy_vectorized", oracle=_BRANCHY_ORACLE)
def cep_branchy_vectorized(spark, sf_dir):
    """The SAME branch-enumeration pattern routed through the JVM-side
    vectorized plan (cep._branchy_fast_path: range-frame click arrays +
    bounded run-prefix lookahead + explode — Python only for the one
    per-batch mask pass). Measured crossover on local[32] at sf0.1: the NFA
    wins below ~10^5 emitted branches (one shuffle + one Python stage beats
    the window/explode stage chain), the vectorized plan is the scale path —
    per-key work is JVM-parallel within a key, where the NFA sweep is serial
    per key. Both engines are oracled against the identical SQL."""
    events = _cep_events(spark, sf_dir)
    out = match_pattern(
        events,
        _branchy_pattern(),
        key_cols=["user_id"],
        time_col="ts",
        select=None,
        select_expr=_BRANCHY_SELECT,
        vectorized=True,
        output_schema="user_id long, a_id long, b_id long, n_err long",
        order_tiebreak=["event_id"],
        emit="all",
    )
    # dim-sized output: one-partition local sort, not a range exchange
    # (sorted_result docstring) — the NFA twin above already does this
    return out.transform(sorted_result, "user_id", "a_id", "b_id", "n_err")
