"""Changelog / row_kind queries (SURVEY §1.1, §2.10 — RowKind.java,
StreamPhysicalChangelogNormalize.scala, DropUpdateBeforeFunction.java).

The events table plays a CDC feed: each event is an upsert (+U) of its user's
state, except 'error' events which act as deletes (-D). Normalizing that
changelog to the current snapshot is the reference's ChangelogNormalize:
one shuffle on the key + one window pass, then tombstones drop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.changelog import DELETE, UPDATE_AFTER, changelog_normalize
from ..registry import query


@query(
    "changelog_snapshot",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN '-D' ELSE '+U' END AS row_kind
      FROM events),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM ch)
    SELECT user_id, event_id, ts, value, row_kind
    FROM r WHERE rn = 1 AND row_kind <> '-D'
    ORDER BY user_id
    """,
)
def changelog_snapshot(spark, sf_dir):
    """Materialize a +U/-D changelog into its current snapshot per key
    (operators/changelog.changelog_normalize)."""
    events = load_table(spark, sf_dir, "events")
    ch = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit(DELETE))
        .otherwise(F.lit(UPDATE_AFTER))
        .alias("row_kind"),
    )
    snap = changelog_normalize(
        ch, keys=["user_id"], order_by=[F.col("ts"), F.col("event_id")]
    )
    return snap.select("user_id", "event_id", "ts", "value", "row_kind").orderBy(
        "user_id"
    )
