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
from ..registry import micro, query, sorted_result


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
    return snap.select("user_id", "event_id", "ts", "value", "row_kind").transform(sorted_result, 
        "user_id"
    )


@query(
    "cdc_debezium_roundtrip",
    oracle="""
    WITH src AS (
      SELECT o_orderkey AS id, o_custkey AS qty, o_orderkey % 10 AS m
      FROM orders WHERE o_orderkey % 7 = 0
    ), expanded AS (
      SELECT '+I' AS row_kind, id, qty FROM src WHERE m < 7
      UNION ALL
      SELECT '-U', id, qty FROM src WHERE m IN (7, 8)
      UNION ALL
      SELECT '+U', id, qty + 1 FROM src WHERE m IN (7, 8)
      UNION ALL
      SELECT '-D', id, qty FROM src WHERE m = 9
    )
    SELECT row_kind, count(*) AS n, CAST(sum(qty) AS BIGINT) AS total
    FROM expanded GROUP BY row_kind ORDER BY row_kind
    """,
)
def cdc_debezium_roundtrip(spark, sf_dir):
    """Debezium-json round trip (sources/cdc.py): serialize a deterministic
    change stream derived from orders into debezium envelopes (to_json),
    parse them back with parse_debezium_json (DebeziumJsonDeserializationSchema
    op c/u/d semantics), and aggregate the changelog. The oracle restates the
    emitted changelog relationally — the JSON leg is Spark-parsing-Spark, so
    any envelope/parse asymmetry breaks the compare."""
    from ..sources.cdc import parse_debezium_json

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 7 == 0
    )
    m = F.col("o_orderkey") % 10
    row = lambda qty: F.struct(  # noqa: E731
        F.col("o_orderkey").alias("id"), qty.alias("qty")
    )
    env = F.when(
        m < 7,
        F.to_json(
            F.struct(
                F.lit(None).cast("struct<id:bigint,qty:bigint>").alias("before"),
                row(F.col("o_custkey")).alias("after"),
                F.lit("c").alias("op"),
                F.lit(0).cast("bigint").alias("ts_ms"),
            )
        ),
    ).when(
        m.isin(7, 8),
        F.to_json(
            F.struct(
                row(F.col("o_custkey")).alias("before"),
                row(F.col("o_custkey") + 1).alias("after"),
                F.lit("u").alias("op"),
                F.lit(0).cast("bigint").alias("ts_ms"),
            )
        ),
    ).otherwise(
        F.to_json(
            F.struct(
                row(F.col("o_custkey")).alias("before"),
                F.lit(None).cast("struct<id:bigint,qty:bigint>").alias("after"),
                F.lit("d").alias("op"),
                F.lit(0).cast("bigint").alias("ts_ms"),
            )
        )
    )
    messages = orders.select(env.alias("value"))
    parsed = parse_debezium_json(messages, "value", "id BIGINT, qty BIGINT")
    return (
        parsed.groupBy("row_kind")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("total"))
        .orderBy("row_kind")
    )


@query(
    "changelog_apply",
    oracle="""
    WITH chg AS (
      SELECT CASE WHEN o_orderkey % 10 = 9 THEN '-D' ELSE '+U' END AS row_kind,
             o_custkey AS id, o_totalprice AS val, o_orderkey AS seq
      FROM orders WHERE o_orderkey % 5 = 0
    ), latest AS (
      SELECT id, row_kind, val,
             row_number() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
      FROM chg
    )
    SELECT COALESCE(l.id, c.c_custkey) AS id,
           CAST(floor(CASE WHEN l.id IS NULL THEN c.c_acctbal ELSE l.val END
                * 1e2 + 0.5) AS BIGINT) AS val
    FROM customer c
    FULL JOIN (SELECT * FROM latest WHERE rn = 1) l ON l.id = c.c_custkey
    WHERE l.row_kind IS NULL OR l.row_kind <> '-D'
    ORDER BY id
    """,
)
def changelog_apply(spark, sf_dir):
    """Incremental snapshot maintenance (operators/changelog.apply_changelog):
    a customer-balance snapshot merged with an orders-derived changelog
    (+U latest-wins by seq, -D removes) — ONE union + ONE keyed window, the
    per-micro-batch materialized-view step the streaming CDC test drives.

    The oracle is a FULL join: apply_changelog has UPSERT semantics (a +U
    for a key absent from the snapshot INSERTS it — the reference's
    upsert-sink behavior). A LEFT-join oracle only agreed by dataset
    accident (every 1x custkey exists); the round-8 10x strict gate, whose
    replicated orders reference custkeys beyond the 1x customer table,
    exposed the difference."""
    from ..operators.changelog import apply_changelog

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), micro(F.col("c_acctbal"), 2).alias("val")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    changes = orders.select(
        F.when(F.col("o_orderkey") % 10 == 9, "-D").otherwise("+U").alias("row_kind"),
        F.col("o_custkey").alias("id"),
        micro(F.col("o_totalprice"), 2).alias("val"),
        F.col("o_orderkey").alias("seq"),
    )
    out = apply_changelog(cust, changes, ["id"], [F.col("seq")])
    return out.orderBy("id")
