"""SQL-string queries (SURVEY §3.1): the reference's primary entry point —
``TableEnvironment.sqlQuery`` (TableEnvironmentImpl.java:703) — exercised
through ``spark.sql`` over registered views. Everything below rides Catalyst's
parse → analyze → optimize → codegen pipeline; the rewrites involved
(grouping-sets decomposition, subquery decorrelation, window grouping) are the
ones SURVEY §4.1 maps from the Blink planner.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import register_tables
from ..registry import query
from ..sqlext import sql as fsql


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(floor(sum(l_quantity) * 1e4 + 0.5) AS BIGINT) AS sum_qty,
           count(*) AS n,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def sql_grouping_sets(spark, sf_dir):
    """GROUPING SETS + grouping() via SQL string (reference
    DecomposeGroupingSetsRule.scala:205 → Catalyst Expand, automatic)."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(floor(sum(l_quantity) * 1e4 + 0.5) AS BIGINT) AS sum_qty,
               count(*) AS n,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "sql_exists_subquery",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
)
def sql_exists_subquery(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS — decorrelated to semi/anti joins by
    Catalyst (reference FlinkSubQueryRemoveRule, SURVEY §4.1)."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey
        """
    )


@query(
    "sql_window_tvf",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS w_start, event_type,
           count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def sql_window_tvf(spark, sf_dir):
    """TUMBLE window via SQL (reference window TVFs,
    FlinkSqlOperatorTable.java:1181): Spark's window() grouping expression."""
    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT window.start AS w_start, event_type,
               count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM events
        GROUP BY window(ts, '15 minutes'), event_type
        ORDER BY w_start, event_type
        """
    )


@query(
    "sql_tumble_tvf",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS w_start,
           event_type, count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def sql_tumble_tvf(spark, sf_dir):
    """TUMBLE window TVF through the Flink grammar (reference
    FlinkSqlOperatorTable.java:1181, parserImpls.ftl) — sqlext lowers the TVF
    to Spark's native window() expression, codegen end to end."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS w_start,
               event_type, count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '900' SECOND))
        GROUP BY window_start, event_type
        ORDER BY w_start, event_type
        """,
    )


@query(
    "sql_hop_tvf",
    oracle="""
    SELECT CAST((floor(epoch(ts) / 300) - g.k) * 300 AS BIGINT) AS w_start,
           count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM events, generate_series(0, 1) AS g(k)
    GROUP BY 1
    ORDER BY w_start
    """,
)
def sql_hop_tvf(spark, sf_dir):
    """HOP window TVF (Flink arg order: slide, size) through the grammar —
    lowered to native window(size, slide). For heavy sliding aggregations the
    sliced operator (win_hop) replicates per-slice partials instead of rows;
    the SQL surface keeps the native lowering for fidelity."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS w_start,
               count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '300' SECOND, INTERVAL '600' SECOND))
        GROUP BY window_start
        ORDER BY w_start
        """,
    )


@query(
    "sql_cumulate_tvf",
    oracle="""
    WITH slices AS (
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS w_start,
             CAST(floor(epoch(ts) / 900) * 900 + 900 AS BIGINT) AS slice_end,
             value
      FROM events
    )
    SELECT w_start, w_start + g.k * 900 AS w_end,
           count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM slices, generate_series(1, 4) AS g(k)
    WHERE slice_end <= w_start + g.k * 900
    GROUP BY 1, 2
    ORDER BY w_start, w_end
    """,
)
def sql_cumulate_tvf(spark, sf_dir):
    """CUMULATE window TVF (reference CumulativeSliceAssigner; VERDICT missing
    #3) — sqlext lowers to an explode over <= max/step window-ends."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS w_start,
               CAST(unix_timestamp(window_end) AS BIGINT) AS w_end,
               count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                            INTERVAL '900' SECOND, INTERVAL '3600' SECOND))
        GROUP BY window_start, window_end
        ORDER BY w_start, w_end
        """,
    )


@query(
    "sql_session_tvf",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def sql_session_tvf(spark, sf_dir):
    """SESSION window TVF with PARTITION BY (Flink session TVF grammar) —
    sqlext lowers to lag/cumsum sessionization at microsecond precision, one
    shuffle on the partition keys."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id,
               CAST(unix_timestamp(window_start) AS BIGINT) AS session_start,
               count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts),
                           INTERVAL '1800' SECOND))
        GROUP BY user_id, window_start
        ORDER BY user_id, session_start
        """,
    )


@query(
    "sql_temporal_join",
    oracle="""
    SELECT p.event_id, p.user_id, s.signup_event AS last_signup_event
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, event_id AS signup_event FROM events
                    WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def sql_temporal_join(spark, sf_dir):
    """FOR SYSTEM_TIME AS OF through the SQL string (reference grammar
    parserImpls.ftl:518, StreamExecTemporalJoin.java; VERDICT missing #3) —
    sqlext lowers onto asof_join's union + last_value window: one shuffle on
    the key, no pairwise explosion."""
    register_tables(spark, sf_dir)
    spark.sql(
        "SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'"
    ).createOrReplaceTempView("purchases_v")
    spark.sql(
        "SELECT user_id, ts, event_id AS signup_event FROM events "
        "WHERE event_type = 'signup'"
    ).createOrReplaceTempView("signups_v")
    return fsql(
        spark,
        """
        SELECT p.event_id, p.user_id, p.signup_event AS last_signup_event
        FROM purchases_v p LEFT JOIN signups_v
          FOR SYSTEM_TIME AS OF p.ts AS s
          ON p.user_id = s.user_id
        ORDER BY p.event_id
        """,
    )


@query(
    "sql_match_recognize",
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
def sql_match_recognize(spark, sf_dir):
    """MATCH_RECOGNIZE through the SQL string (reference parserImpls.ftl,
    StreamExecMatch.java, MatchCodeGenerator.scala; VERDICT missing #3) —
    sqlext compiles DEFINE into vectorized numpy masks feeding the NFA in
    operators/cep.py, one shuffle on PARTITION BY."""
    register_tables(spark, sf_dir)
    return fsql(
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
        ORDER BY user_id, a_id
        """,
    )


@query(
    "sql_mr_quantifier",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type, ts, value,
             lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
             lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
             lead(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS id2,
             lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
             lead(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2,
             lead(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts2
      FROM events)
    SELECT user_id, event_id AS first_id, id2 AS last_id,
           CAST(3 AS BIGINT) AS n_errors,
           CAST(floor((value + v1 + v2) * 1e4 + 0.5) AS BIGINT) AS total_value
    FROM w
    WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'
      AND ts2 <= ts + INTERVAL 2 HOUR
    ORDER BY user_id, first_id
    """,
)
def sql_mr_quantifier(spark, sf_dir):
    """MATCH_RECOGNIZE with a {3} quantifier and FIRST/LAST/COUNT/SUM measures
    (reference MatchRecognizeITCase.scala quantifier cases)."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, first_id, last_id, n_errors,
               CAST(floor(total_value * 1e4 + 0.5) AS BIGINT) AS total_value
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(E.event_id) AS first_id,
                   LAST(E.event_id) AS last_id,
                   COUNT(E.*) AS n_errors,
                   SUM(E.value) AS total_value
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (E{3}) WITHIN INTERVAL '7200' SECOND
          DEFINE E AS E.event_type = 'error'
        )
        ORDER BY user_id, first_id
        """,
    )


@query(
    "sql_mr_prev_down",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    ), runs AS (
      SELECT user_id, grp, value, event_id,
             row_number() OVER
               (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, grp) AS n
      FROM g WHERE dn = 1
    )
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN event_id END) AS first_id,
           max(CASE WHEN rn = 1 THEN value END)    AS first_v,
           max(CASE WHEN rn = n THEN value END)    AS last_v,
           count(*) AS n_down
    FROM runs GROUP BY user_id, grp
    ORDER BY user_id, first_id
    """,
)
def sql_mr_prev_down(spark, sf_dir):
    """MATCH_RECOGNIZE with a PREV() DEFINE — the canonical falling-run
    pattern (value < PREV(value)), greedy D+ and SKIP PAST LAST ROW, so each
    match is a MAXIMAL falling run (reference MatchCodeGenerator.scala PREV
    navigation, MatchRecognizeITCase V-shape cases). The PREV comparison
    compiles to a vectorized batch shift — no per-row Python. The oracle
    restates the runs via gaps-and-islands window SQL."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, first_id, first_v, last_v, n_down
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(D.event_id) AS first_id,
                   FIRST(D.value)    AS first_v,
                   LAST(D.value)     AS last_v,
                   COUNT(D.*)        AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
        ORDER BY user_id, first_id
        """,
    )


@query(
    "sql_mr_all_rows",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    )
    SELECT user_id, event_id, value, 'D' AS cls,
           row_number() OVER
             (PARTITION BY user_id, grp ORDER BY ts, event_id) AS nd
    FROM g WHERE dn = 1
    ORDER BY user_id, event_id
    """,
)
def sql_mr_all_rows(spark, sf_dir):
    """ALL ROWS PER MATCH: one output row per MAPPED row with running
    measures (CLASSIFIER, running COUNT) — reference StreamExecMatch allRows
    path. Same falling-run pattern as sql_mr_prev_down, so the oracle is the
    per-row rendition of the same gaps-and-islands SQL."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, event_id, value, cls, nd
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES CLASSIFIER() AS cls, COUNT(D.*) AS nd
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
        ORDER BY user_id, event_id
        """,
    )


@query(
    "sql_mr_cross_var",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, event_type, value,
             lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS id1
      FROM events)
    SELECT user_id, event_id AS a_id, id1 AS b_id,
           value AS a_v, v1 AS b_v
    FROM w
    WHERE event_type = 'click' AND v1 > value * 2
    ORDER BY user_id, a_id
    """,
)
def sql_mr_cross_var(spark, sf_dir):
    """DEFINE condition referencing ANOTHER pattern variable (B.value >
    A.value * 2, i.e. LAST(A.value)) — the reference's cross-variable
    IterativeCondition path (MatchCodeGenerator.scala); compiles to an exact
    match-state test threaded through the NFA walk. SKIP TO NEXT ROW makes
    every qualifying adjacent pair a match, which the lead() oracle restates."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, a_id, b_id, a_v, b_v
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS a_id, B.event_id AS b_id,
                   A.value AS a_v, B.value AS b_v
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (A B)
          DEFINE A AS A.event_type = 'click',
                 B AS B.value > A.value * 2
        )
        ORDER BY user_id, a_id
        """,
    )


@query(
    "sql_session_dynamic",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'error' THEN 600 ELSE 1800 END AS gap_s
      FROM events),
    flagged AS (
      SELECT user_id, ts, value, gap_s,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w)
                       > lag(gap_s) OVER w
                  THEN 1 ELSE 0 END AS new_session
      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def sql_session_dynamic(spark, sf_dir):
    """SESSION window TVF with a DYNAMIC per-row gap expression (reference
    DynamicEventTimeSessionWindows / Flink's session gap extractor): error
    events shorten the gap to 10 minutes. The sqlext lowering sessionizes
    with lag+cumsum where the PREVIOUS row's gap decides the session extent
    — same operator as win_session_dynamic, driven from SQL."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id,
               CAST(unix_timestamp(window_start) AS BIGINT) AS session_start,
               count(*) AS n, CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id, DESCRIPTOR(ts),
                           CASE WHEN event_type = 'error' THEN 600 ELSE 1800 END))
        GROUP BY user_id, window_start
        ORDER BY user_id, session_start
        """,
    )


@query(
    "sql_mr_skip_to_last",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id,
             lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b_id
      FROM events)
    SELECT user_id, event_id AS a_id, b_id
    FROM w WHERE b_id IS NOT NULL
    ORDER BY user_id, a_id
    """,
)
def sql_mr_skip_to_last(spark, sf_dir):
    """AFTER MATCH SKIP TO <var> (bare = LAST, SQL:2016; reference
    SkipToLastStrategy.java): resuming AT the previous match's B yields every
    consecutive (A,B) pair — overlapping matches the SKIP PAST LAST ROW
    default would drop. Oracle: the lead() rendition of all adjacent pairs."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, a_id, b_id
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES A.event_id AS a_id, B.event_id AS b_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO B
          PATTERN (A B)
          DEFINE A AS A.event_id >= 0,
                 B AS B.event_id >= 0
        )
        ORDER BY user_id, a_id
        """,
    )


@query(
    "sql_mr_match_number",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    ), runs AS (
      SELECT user_id, grp, event_id,
             row_number() OVER
               (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn
      FROM g WHERE dn = 1
    ), m AS (
      SELECT user_id, grp,
             max(CASE WHEN rn = 1 THEN event_id END) AS first_id,
             count(*) AS n_down
      FROM runs GROUP BY user_id, grp
    )
    SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY grp) AS match_no,
           first_id, n_down
    FROM m ORDER BY user_id, match_no
    """,
)
def sql_mr_match_number(spark, sf_dir):
    """MATCH_NUMBER() measure: the 1-based per-partition sequential match
    index (SQL:2016; reference MatchCodeGenerator MATCH_NUMBER navigation).
    Matches emit in start order under SKIP PAST LAST ROW, so the oracle's
    row_number over the gaps-and-islands run id reproduces it exactly."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, match_no, first_id, n_down
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES MATCH_NUMBER()    AS match_no,
                   FIRST(D.event_id) AS first_id,
                   COUNT(D.*)        AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
        ORDER BY user_id, match_no
        """,
    )


@query(
    "sql_tumble_group_legacy",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS w_start,
           event_type, count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM events GROUP BY 1, 2 ORDER BY w_start, event_type
    """,
)
def sql_tumble_group_legacy(spark, sf_dir):
    """Pre-1.13 Flink group-window grammar: GROUP BY TUMBLE(ts, INTERVAL) +
    TUMBLE_START auxiliary (FlinkSqlOperatorTable TUMBLE/TUMBLE_START,
    GroupWindowITCase) — lowered textually onto Spark's native window()
    expression, fully inside Catalyst."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT unix_timestamp(TUMBLE_START(ts, INTERVAL '10' MINUTE)) AS w_start,
               event_type, count(*) AS n,
               CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE), event_type
        ORDER BY w_start, event_type
        """,
    )


@query(
    "sql_hop_group_legacy",
    oracle="""
    WITH slides AS (SELECT unnest(generate_series(0, 1)) AS k),
    assigned AS (
      SELECT CAST((floor((epoch(ts) - k.k * 300) / 600) * 600 + k.k * 300)
                  AS BIGINT) AS w_start,
             value
      FROM events, slides k
      WHERE epoch(ts) >= floor((epoch(ts) - k.k * 300) / 600) * 600 + k.k * 300
    )
    SELECT w_start, count(*) AS n,
           CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
    FROM assigned GROUP BY w_start ORDER BY w_start
    """,
)
def sql_hop_group_legacy(spark, sf_dir):
    """Legacy HOP group window (slide 5 min, size 10 min — Flink's
    slide-then-size argument order, flipped to Spark's size-then-slide by the
    rewriter)."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT unix_timestamp(HOP_START(ts, INTERVAL '5' MINUTE,
                                        INTERVAL '10' MINUTE)) AS w_start,
               count(*) AS n,
               CAST(floor(sum(value) * 1e4 + 0.5) AS BIGINT) AS total
        FROM events
        GROUP BY HOP(ts, INTERVAL '5' MINUTE, INTERVAL '10' MINUTE)
        ORDER BY w_start
        """,
    )


@query(
    "sql_window_join_tvf",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS ws
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS ws
      FROM events WHERE event_type = 'purchase')
    SELECT c.ws, c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM c JOIN p ON c.user_id = p.user_id AND c.ws = p.ws
    ORDER BY c.ws, c.user_id, click_id, purchase_id
    """,
)
def sql_window_join_tvf(spark, sf_dir):
    """Flink 1.13 WINDOW JOIN in SQL-TVF form (StreamPhysicalWindowJoin /
    window-join docs grammar): two TUMBLE TVFs joined on key +
    window_start — the rewriter lowers BOTH TVF occurrences onto native
    window() views and the join itself stays pure Catalyst."""
    register_tables(spark, sf_dir)
    ev = spark.table("events")
    ev.filter(F.col("event_type") == "click").createOrReplaceTempView("wj_clicks")
    ev.filter(F.col("event_type") == "purchase").createOrReplaceTempView(
        "wj_purchases"
    )
    return fsql(
        spark,
        """
        SELECT unix_timestamp(c.window_start) AS ws, c.user_id,
               c.event_id AS click_id, p.event_id AS purchase_id
        FROM TABLE(TUMBLE(TABLE wj_clicks, DESCRIPTOR(ts), INTERVAL '15' MINUTE)) c
        JOIN TABLE(TUMBLE(TABLE wj_purchases, DESCRIPTOR(ts), INTERVAL '15' MINUTE)) p
          ON c.user_id = p.user_id AND c.window_start = p.window_start
        ORDER BY ws, user_id, click_id, purchase_id
        """,
    )

@query(
    "sql_mr_expr_measures",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    ), runs AS (
      SELECT user_id, grp, value, event_id,
             row_number() OVER
               (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, grp) AS n
      FROM g WHERE dn = 1
    )
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN event_id END) AS first_id,
           CAST(max(CASE WHEN rn = 1 THEN value END)
                - max(CASE WHEN rn = n THEN value END) AS DOUBLE) AS drop_total,
           CAST(sum(event_id * 2 + 1) AS DOUBLE) AS agg_sum
    FROM runs GROUP BY user_id, grp
    ORDER BY user_id, first_id
    """,
)
def sql_mr_expr_measures(spark, sf_dir):
    """MEASURES beyond plain column refs (r5 "What's missing" #3): a scalar
    expression over navigation calls (FIRST(D.value) - LAST(D.value)) and an
    aggregate over an arithmetic operand (SUM(D.event_id * 2 + 1)) — the
    reference's MatchCodeGenerator generates arbitrary measure expressions
    (MatchCodeGenerator.scala generateOneRowPerMatchExpression). Exactness:
    the subtraction is two order-free navigation reads; the aggregate operand
    is integer-valued, so the Python fold and DuckDB's sum agree exactly."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, first_id, drop_total, agg_sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(D.event_id) AS first_id,
                   FIRST(D.value) - LAST(D.value) AS drop_total,
                   SUM(D.event_id * 2 + 1) AS agg_sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
        ORDER BY user_id, first_id
        """,
    )


@query(
    "sql_mr_subset_final",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    err AS (
      SELECT user_id, event_id, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
      FROM o WHERE event_type = 'error'),
    isl AS (
      SELECT user_id, isl, min(rn) AS start_rn,
             least(count(*), 64) AS k
      FROM err GROUP BY user_id, isl),
    m AS (
      SELECT i.user_id, i.isl, i.start_rn, i.k, c.rn AS a_rn
      FROM isl i JOIN o c ON c.user_id = i.user_id AND c.rn = i.start_rn - 1
      WHERE c.event_type = 'click'),
    bsum AS (
      SELECT m.user_id, m.isl, CAST(sum(e2.event_id * 2) AS DOUBLE) AS final_sum
      FROM m JOIN err e2 ON e2.user_id = m.user_id AND e2.isl = m.isl
        AND e2.rn <= m.start_rn + m.k - 1
      GROUP BY m.user_id, m.isl)
    SELECT m.user_id AS user_id, r.event_id AS event_id,
           CAST(r.rn - m.a_rn + 1 AS BIGINT) AS total_n, b.final_sum
    FROM m JOIN o r ON r.user_id = m.user_id
      AND r.rn BETWEEN m.a_rn AND m.start_rn + m.k - 1
    JOIN bsum b ON b.user_id = m.user_id AND b.isl = m.isl
    ORDER BY m.user_id, r.event_id
    """,
)
def sql_mr_subset_final(spark, sf_dir):
    """SUBSET union variables + FINAL measure semantics (the last two
    MATCH_RECOGNIZE grammar gaps; reference parserImpls.ftl SUBSET clause,
    MatchCodeGenerator FINAL aggregates): a click strictly followed by an
    error run, ALL ROWS PER MATCH, with a running COUNT over the union
    variable U = (A, B) and a FINAL (whole-match) aggregate over an
    arithmetic operand — the same value on every row of the match."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, event_id, total_n, final_sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES COUNT(U.*) AS total_n,
                   FINAL SUM(B.event_id * 2) AS final_sum
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          SUBSET U = (A, B)
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'error'
        )
        ORDER BY user_id, event_id
        """,
    )


@query(
    "sql_mr_define_grammar",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                   AND value BETWEEN 10 AND 90
                   AND event_id % 3 IN (0, 1)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    ), runs AS (
      SELECT user_id, grp, event_id,
             row_number() OVER
               (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn
      FROM g WHERE dn = 1
    )
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN event_id END) AS first_id,
           count(*) AS n_down
    FROM runs GROUP BY user_id, grp
    ORDER BY user_id, first_id
    """,
)
def sql_mr_define_grammar(spark, sf_dir):
    """DEFINE grammar beyond plain comparisons (reference MatchCodeGenerator
    handles arbitrary Calcite row expressions): BETWEEN, IN lists, and the
    modulo operator — desugared by the condition parser into the same AST
    the vectorized mask / windowed fast path consume, so this query still
    plans with zero Python stages."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, first_id, n_down
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(D.event_id) AS first_id, COUNT(D.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
                      AND D.value BETWEEN 10 AND 90
                      AND D.event_id % 3 IN (0, 1)
        )
        ORDER BY user_id, first_id
        """,
    )


@query(
    "sql_mr_multi_agg",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS dn
      FROM events
    ), g AS (
      SELECT *, sum(1 - dn) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS grp
      FROM w
    ), runs AS (
      SELECT user_id, grp, event_id,
             row_number() OVER
               (PARTITION BY user_id, grp ORDER BY ts, event_id) AS rn
      FROM g WHERE dn = 1
    )
    SELECT user_id,
           max(CASE WHEN rn = 1 THEN event_id END) AS first_id,
           CAST(sum(event_id) + sum(event_id % 7) AS DOUBLE) AS agg_mix,
           CAST(max(event_id) - min(event_id) AS DOUBLE) AS spread
    FROM runs GROUP BY user_id, grp
    ORDER BY user_id, first_id
    """,
)
def sql_mr_multi_agg(spark, sf_dir):
    """Arithmetic OVER multiple aggregate calls in MEASURES —
    ``SUM(D.event_id) + SUM(D.event_id % 7)`` and ``MAX - MIN`` — the last
    measure-grammar gap (round-6 "What's missing" #3): aggregate calls are
    now ordinary terms of the measure expression tree (reference
    MatchCodeGenerator composes aggregate results into arbitrary Calcite
    expressions). Operands are integer-valued, so the Python fold and
    DuckDB's sums agree exactly; the emission is the exact-integer result
    as DOUBLE."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, first_id, agg_mix, spread
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES FIRST(D.event_id) AS first_id,
                   SUM(D.event_id) + SUM(D.event_id % 7) AS agg_mix,
                   MAX(D.event_id) - MIN(D.event_id) AS spread
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (D+)
          DEFINE D AS D.value < PREV(D.value)
        )
        ORDER BY user_id, first_id
        """,
    )


@query(
    "sql_mr_subset_define",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
    err AS (
      SELECT user_id, event_id, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS isl
      FROM o WHERE event_type = 'error'),
    isl AS (
      SELECT user_id, isl, min(rn) AS start_rn
      FROM err GROUP BY user_id, isl),
    m AS (
      SELECT i.user_id, i.isl, i.start_rn, c.event_id AS a_id
      FROM isl i JOIN o c ON c.user_id = i.user_id AND c.rn = i.start_rn - 1
      WHERE c.event_type = 'click'),
    run AS (
      SELECT m.user_id, m.isl, e.event_id, e.rn - m.start_rn + 1 AS k,
             m.a_id + sum(e.event_id) OVER (
               PARTITION BY m.user_id, m.isl ORDER BY e.rn) AS cum
      FROM m JOIN err e ON e.user_id = m.user_id AND e.isl = m.isl),
    lens AS (
      SELECT r.user_id, r.isl,
             least(coalesce(min(CASE WHEN r.cum % 5 >= 4 THEN r.k END) - 1,
                            max(r.k)), 64) AS n
      FROM run r GROUP BY r.user_id, r.isl)
    SELECT r.user_id AS user_id,
           max(CASE WHEN r.k = l.n THEN r.event_id END) AS last_id,
           CAST(l.n AS BIGINT) AS n_err,
           CAST(max(CASE WHEN r.k = l.n THEN r.cum END) AS BIGINT) AS u_sum
    FROM run r
    JOIN lens l ON l.user_id = r.user_id AND l.isl = r.isl AND l.n >= 1
    WHERE r.k <= l.n
    GROUP BY r.user_id, r.isl, l.n
    ORDER BY user_id, last_id
    """,
)
def sql_mr_subset_define(spark, sf_dir):
    """SUBSET union variable referenced inside DEFINE (the round-6 residual
    grammar gap at the old sqlext rejection site): the B condition reads a
    RUNNING aggregate over U = (A, B) — member rows merged in row order
    with the candidate row included — so the error run extends only while
    the running click+error id sum stays in the residue band. The oracle
    replays the same greedy truncation with island detection, a cumulative
    window and a first-failure cutoff, capped at the engine's bounded-Kleene
    64 like the SUBSET/FINAL query. Reference: parserImpls.ftl SUBSET
    grammar; MatchCodeGenerator subset resolution + aggregate calls in
    DEFINE."""
    register_tables(spark, sf_dir)
    return fsql(
        spark,
        """
        SELECT user_id, last_id, n_err, u_sum
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts, event_id
          MEASURES LAST(U.event_id) AS last_id,
                   COUNT(B.event_id) AS n_err,
                   SUM(U.event_id) AS u_sum
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+)
          SUBSET U = (A, B)
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'error' AND SUM(U.event_id) % 5 < 4
        )
        ORDER BY user_id, last_id
        """,
    )
