"""Changelog operator tests (reference RowKind.java, ChangelogNormalize,
DropUpdateBefore)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fries_flink_spark.operators.changelog import (
    DELETE,
    INSERT,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    changelog_normalize,
    drop_update_before,
    to_changelog,
    with_row_kind,
)


def test_to_changelog_classifies(spark):
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    after = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id long, v string"
    )
    ch = to_changelog(before, after, ["id"])
    kinds = {(r.id, r.row_kind): r.v for r in ch.collect()}
    assert kinds == {
        (1, DELETE): "a",
        (3, UPDATE_BEFORE): "c",
        (3, UPDATE_AFTER): "C",
        (4, INSERT): "d",
    }


def test_changelog_roundtrip_normalize(spark):
    """diff -> changelog -> apply over 'before' reproduces 'after'."""
    before = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    after = spark.createDataFrame(
        [(2, "b2"), (3, "c"), (5, "e")], "id long, v string"
    )
    ch = to_changelog(before, after, ["id"]).withColumn("seq", F.lit(1))
    base = with_row_kind(before).withColumn("seq", F.lit(0))
    # -U rows carry the OLD value at the same seq as their +U partner; for
    # keyed materialization they are redundant — exactly DropUpdateBefore's job.
    merged = drop_update_before(base.unionByName(ch.select(*base.columns)))
    snap = changelog_normalize(merged, ["id"], [F.col("seq")])
    got = {(r.id): r.v for r in snap.collect()}
    want = {(r.id): r.v for r in after.collect()}
    assert got == want


def test_to_changelog_null_keys(spark):
    """NULL-keyed rows must participate: the join is eqNullSafe, so existence
    must be tested via side markers, not keys[0].isNotNull()."""
    before = spark.createDataFrame([(None, "a"), (1, "x")], "id long, v string")
    after = spark.createDataFrame([(None, "A"), (2, "y")], "id long, v string")
    ch = to_changelog(before, after, ["id"])
    kinds = {(r.id, r.row_kind): r.v for r in ch.collect()}
    assert kinds == {
        (None, UPDATE_BEFORE): "a",
        (None, UPDATE_AFTER): "A",
        (1, DELETE): "x",
        (2, INSERT): "y",
    }


def test_drop_update_before(spark):
    df = spark.createDataFrame(
        [(1, UPDATE_BEFORE), (1, UPDATE_AFTER), (2, INSERT)], "id long, row_kind string"
    )
    kinds = {r.row_kind for r in drop_update_before(df).collect()}
    assert UPDATE_BEFORE not in kinds and len(kinds) == 2
