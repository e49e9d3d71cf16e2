"""Changelog / row_kind semantics (SURVEY §1.1, §2.10).

Reference: RowKind.java:31-52 (+I/-U/+U/-D), ChangelogNormalize
(StreamPhysicalChangelogNormalize.scala), DropUpdateBefore
(DropUpdateBeforeFunction.java), changelog inference
(FlinkChangelogModeInferenceProgram.scala:40).

Spark has no changelog rows; we model RowKind as an explicit ``row_kind``
column ('+I', '-U', '+U', '-D') and provide the normalize/materialize
operators. At scale these are one shuffle on the primary key + a window — the
same cost as the reference's keyed ChangelogNormalize state pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

INSERT = "+I"
UPDATE_BEFORE = "-U"
UPDATE_AFTER = "+U"
DELETE = "-D"

_KINDS = [INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE]


def with_row_kind(df: DataFrame, kind: str | Column = INSERT) -> DataFrame:
    """Attach a row_kind column (defaults to insert-only, Flink's append mode)."""
    col = F.lit(kind) if isinstance(kind, str) else kind
    return df.withColumn("row_kind", col)


def drop_update_before(df: DataFrame) -> DataFrame:
    """Reference DropUpdateBeforeFunction: retraction consumers that key by PK
    don't need -U rows."""
    return df.filter(F.col("row_kind") != UPDATE_BEFORE)


def changelog_normalize(
    df: DataFrame, keys: list[str], order_by: list[Column]
) -> DataFrame:
    """Materialize a changelog into its current snapshot: keep the last
    non-delete row per key in changelog order (reference ChangelogNormalize).

    One shuffle on the key + one window sort — then the -D tombstones drop.
    """
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("row_kind") != DELETE)
        .drop("__rn")
    )


def to_changelog(
    before: DataFrame, after: DataFrame, keys: list[str]
) -> DataFrame:
    """Diff two snapshots into a changelog (+I / -U,+U / -D) — the inverse of
    changelog_normalize; useful for CDC emission from batch recomputes.

    Implementation: full outer join on the key; non-key column comparison via
    md5 over a canonical struct (no per-column codegen explosion).
    """
    val_cols = [c for c in after.columns if c not in keys]
    digest = lambda d: F.md5(F.to_json(F.struct(*[d[c] for c in val_cols])))  # noqa: E731
    # Existence markers: a lit(true) tag per side survives the outer join as
    # NULL when that side is absent — unlike keys[0].isNotNull(), which loses
    # rows whose key is legitimately NULL (the join itself is eqNullSafe).
    b = before.withColumn("__b_tag", F.lit(True)).alias("b")
    a = after.withColumn("__a_tag", F.lit(True)).alias("a")
    cond = [b[k].eqNullSafe(a[k]) for k in keys]
    joined = b.join(a, cond, "full_outer")
    b_exists = b["__b_tag"].isNotNull()
    a_exists = a["__a_tag"].isNotNull()
    changed = digest(b) != digest(a)

    inserts = joined.filter(~b_exists & a_exists).select(
        F.lit(INSERT).alias("row_kind"), *[a[c].alias(c) for c in after.columns]
    )
    deletes = joined.filter(b_exists & ~a_exists).select(
        F.lit(DELETE).alias("row_kind"), *[b[c].alias(c) for c in after.columns]
    )
    upd_before = joined.filter(b_exists & a_exists & changed).select(
        F.lit(UPDATE_BEFORE).alias("row_kind"), *[b[c].alias(c) for c in after.columns]
    )
    upd_after = joined.filter(b_exists & a_exists & changed).select(
        F.lit(UPDATE_AFTER).alias("row_kind"), *[a[c].alias(c) for c in after.columns]
    )
    return inserts.unionByName(upd_before).unionByName(upd_after).unionByName(deletes)


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Merge a changelog batch into a keyed snapshot: the incremental
    materialized-view maintenance step (reference: the state update a
    ChangelogNormalize/upsert-sink pair performs per record; Spark shape:
    one union + one keyed window per batch, the per-micro-batch analog).

    ``snapshot`` rows are treated as ``+I`` at order −∞ (they precede every
    change); the result is the new snapshot (no row_kind column). At scale
    the snapshot is a bucketed table on ``keys`` so the per-batch merge is
    co-located; with deletes dominating, compact periodically.
    """
    lo = F.lit(-1).cast("long")
    snap = snapshot.withColumn("row_kind", F.lit(INSERT)).withColumn(
        "__ord", lo
    )
    chg = changes.withColumn("__ord", F.lit(0).cast("long"))
    # the snapshot lacks the changelog's ordering columns (they only break
    # ties WITHIN the batch; __ord already orders snapshot before changes)
    merged = snap.unionByName(chg, allowMissingColumns=True)
    # Deterministic tie-break when a -U/+U pair (or a -D racing a +U) shares
    # identical __ord and order_by values: rank the after-image first so the
    # merged snapshot never keeps a stale UPDATE_BEFORE row.
    kind_priority = (
        F.when(F.col("row_kind") == UPDATE_AFTER, 3)
        .when(F.col("row_kind") == INSERT, 2)
        .when(F.col("row_kind") == DELETE, 1)
        .otherwise(0)
    )
    w = Window.partitionBy(*keys).orderBy(
        *[c.desc() for c in ([F.col("__ord")] + list(order_by) + [kind_priority])]
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col("row_kind") != DELETE)
        .drop("__rn", "__ord", "row_kind")
        .select(*snapshot.columns)
    )
