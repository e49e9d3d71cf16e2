"""Fluent Table API (SURVEY §3.2): Flink's ``Table`` surface, one-to-one onto
DataFrame operations.

Reference: flink-table/flink-table-api-java/src/main/java/org/apache/flink/
table/api/Table.java (method citations inline below). Flink builds a
QueryOperation tree from these calls and hands it to the Blink planner; here
every call builds an unresolved Catalyst plan — the same shape, optimizer
included (SURVEY §3.2: "identical shape, one-to-one translation").

Expressions: accept either Spark ``Column`` objects or SQL expression strings
(parsed with ``F.expr``) — mirroring Flink's Expression-DSL/string duality.

Group windows (Tumble/Slide/Session — reference Tumble.java:43, Slide.java:47,
Session.java:43) become ``F.window``/``F.session_window`` grouping columns.
Over windows (Over.java:44) become ``pyspark.sql.Window`` specs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _col(e: Column | str) -> Column:
    return e if isinstance(e, Column) else F.expr(e)


def _cols(exprs) -> list[Column]:
    return [_col(e) for e in exprs]


@dataclass
class TumbleWindow:
    """Tumble.over(size).on(time).alias(name) — Tumble.java:43."""

    size: str
    time_col: str
    name: str = "w"

    def grouping(self) -> Column:
        return F.window(F.col(self.time_col), self.size).alias(self.name)


@dataclass
class SlideWindow:
    """Slide.over(size).every(slide).on(time).alias(name) — Slide.java:47."""

    size: str
    slide: str
    time_col: str
    name: str = "w"

    def grouping(self) -> Column:
        return F.window(F.col(self.time_col), self.size, self.slide).alias(self.name)


@dataclass
class SessionWindow:
    """Session.withGap(gap).on(time).alias(name) — Session.java:43."""

    gap: str
    time_col: str
    name: str = "w"

    def grouping(self) -> Column:
        return F.session_window(F.col(self.time_col), self.gap).alias(self.name)


class Over:
    """Over-window spec builder (Over.java:44; Table.window(OverWindow):994).

    Over.partition_by("k").order_by("ts").preceding(5).as_spec()
    """

    def __init__(self):
        self._partition: list = []
        self._order: list = []
        self._frame: tuple | None = None

    @classmethod
    def partition_by(cls, *exprs) -> "Over":
        o = cls()
        o._partition = list(exprs)
        return o

    @classmethod
    def order_by_only(cls, *exprs) -> "Over":
        return cls().order_by(*exprs)

    def order_by(self, *exprs) -> "Over":
        self._order = list(exprs)
        return self

    def preceding(self, n: int) -> "Over":
        """ROWS BETWEEN n PRECEDING AND CURRENT ROW."""
        self._frame = (-n, 0)
        return self

    def unbounded(self) -> "Over":
        self._frame = (Window.unboundedPreceding, 0)
        return self

    def rows_between(self, start: int, end: int) -> "Over":
        self._frame = (start, end)
        return self

    def as_spec(self) -> WindowSpec:
        spec = Window.partitionBy(*_cols(self._partition)) if self._partition else Window.partitionBy()
        if self._order:
            spec = spec.orderBy(*_cols(self._order))
        if self._frame is not None:
            spec = spec.rowsBetween(*self._frame)
        return spec


class GroupedTable:
    """Result of Table.group_by — terminal ``select`` runs the aggregation
    (Table.groupBy → GroupedTable.select, Table.java:258)."""

    def __init__(self, df: DataFrame, keys: list[Column], window_names: list[str]):
        self._df = df
        self._keys = keys
        self._window_names = window_names

    def select(self, *aggs: Column | str) -> "Table":
        return Table(self._df.groupBy(*self._keys).agg(*_cols(aggs)))

    def aggregate(self, *aggs: Column | str) -> "Table":
        return self.select(*aggs)

    def flat_aggregate(self, fn, schema: str) -> "Table":
        """TableAggregateFunction analog (Table.flatAggregate:1278) — emits
        multiple rows per group via applyInPandas."""
        key_names = [self._df.select(k).columns[0] for k in self._keys]
        return Table(self._df.groupBy(*self._keys).applyInPandas(fn, schema=schema))


class WindowedTable:
    """Result of Table.window(groupWindow) (Table.java:966)."""

    def __init__(self, df: DataFrame, window):
        self._df = df
        self._window = window

    def group_by(self, *keys: Column | str) -> GroupedTable:
        ks = [self._window.grouping()] + [
            _col(k) for k in keys if not (isinstance(k, str) and k == self._window.name)
        ]
        return GroupedTable(self._df, ks, [self._window.name])


class Table:
    """Flink Table facade over a DataFrame. Methods cite Table.java lines."""

    def __init__(self, df: DataFrame):
        self._df = df

    # -- conversions ------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def execute(self) -> "TableResult":
        """Table.execute (TableEnvironmentImpl executeInternal): returns a
        TableResult supporting .print() / .collect() / .wait() like the
        reference's; the plan runs on the first action."""
        return TableResult(self._df)

    def to_pandas(self):
        """pyflink Table.to_pandas parity (Arrow-backed)."""
        return self._df.toPandas()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- projection / row ops (§2.2) --------------------------------------
    def select(self, *exprs: Column | str) -> "Table":  # Table.java:108
        return Table(self._df.select(*_cols(exprs)))

    def project(self, *indexes: int) -> "Table":
        """DataSet-style positional projection (reference
        DataSet.project(int...) — ProjectOperator.java): keep the columns at
        the given 0-based positions, in the given order."""
        cols = self._df.columns
        return Table(self._df.select(*[cols[i] for i in indexes]))

    def alias(self, *names: str) -> "Table":  # Table.as, Table.java:179
        return Table(self._df.toDF(*names))

    as_ = alias

    def filter(self, pred: Column | str) -> "Table":  # Table.java:214
        return Table(self._df.filter(_col(pred)))

    where = filter  # Table.java:245

    def add_columns(self, **named: Column | str) -> "Table":  # Table.java:1010
        df = self._df
        for name, e in named.items():
            df = df.withColumn(name, _col(e))
        return Table(df)

    def add_or_replace_columns(self, **named) -> "Table":  # Table.java:1048
        return self.add_columns(**named)

    def rename_columns(self, **renames: str) -> "Table":  # Table.java:1092
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return Table(df)

    def drop_columns(self, *names: str) -> "Table":  # Table.java:1130
        return Table(self._df.drop(*names))

    def map(self, fn, schema: str) -> "Table":
        """Table.map (Table.java:1164) — vectorized over mapInPandas."""
        return Table(self._df.mapInPandas(fn, schema=schema))

    def flat_map(self, udtf_col: Column, *keep: Column | str) -> "Table":
        """Table.flatMap (Table.java:1200) — UDTF-by-explode."""
        return Table(self._df.select(*_cols(keep), F.explode(udtf_col)))

    # -- aggregations (§2.4) ----------------------------------------------
    def group_by(self, *keys: Column | str) -> GroupedTable:  # Table.java:258
        return GroupedTable(self._df, _cols(keys), [])

    def distinct(self) -> "Table":  # Table.java:306
        return Table(self._df.distinct())

    # -- joins (§2.3) ------------------------------------------------------
    def _join(self, right: "Table", on, how: str) -> "Table":
        cond = _col(on) if on is not None else None
        return Table(self._df.join(right._df, cond, how))

    def join(self, right: "Table", on=None) -> "Table":  # Table.java:352
        return self._join(right, on, "inner")

    def left_outer_join(self, right: "Table", on=None) -> "Table":  # :399
        return self._join(right, on, "left")

    def right_outer_join(self, right: "Table", on=None) -> "Table":  # :426
        return self._join(right, on, "right")

    def full_outer_join(self, right: "Table", on=None) -> "Table":  # :453
        return self._join(right, on, "full")

    def join_lateral(self, udtf_col: Column, alias: str) -> "Table":
        """Table.joinLateral (Table.java:525) — correlate via explode."""
        return Table(self._df.select("*", F.explode(udtf_col).alias(alias)))

    def left_outer_join_lateral(self, udtf_col: Column, alias: str) -> "Table":
        """Table.leftOuterJoinLateral (Table.java:642)."""
        return Table(self._df.select("*", F.explode_outer(udtf_col).alias(alias)))

    def cross_join(self, right: "Table") -> "Table":  # DataSet.cross analog
        return Table(self._df.crossJoin(right._df))

    # -- set operations (§2.8) --------------------------------------------
    def union(self, other: "Table") -> "Table":  # Table.java:784 (dedups)
        return Table(self._df.union(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":  # Table.java:798
        return Table(self._df.union(other._df))

    def intersect(self, other: "Table") -> "Table":  # Table.java:814
        return Table(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":  # Table.java:830
        return Table(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":  # Table.java:753
        # SQL EXCEPT: remove ALL left rows that appear on the right, then
        # dedup (exceptAll().distinct() would wrongly keep per-occurrence
        # survivors when the left has more duplicates than the right).
        return Table(self._df.subtract(other._df))

    def minus_all(self, other: "Table") -> "Table":  # Table.java:770
        return Table(self._df.exceptAll(other._df))

    # -- hints -------------------------------------------------------------
    def hint(self, name: str, *parameters) -> "Table":
        """Optimizer hint passthrough (reference DataSet.java:793-995
        joinWithTiny/joinWithHuge + JoinHint, JoinOperatorBase.java:39).
        Spark names: broadcast, merge, shuffle_hash, shuffle_replicate_nl,
        rebalance, repartition, coalesce."""
        return Table(self._df.hint(name, *parameters))

    # -- sort / limit (§2.7) ----------------------------------------------
    def order_by(self, *exprs: Column | str) -> "Table":  # Table.java:861
        return Table(self._df.orderBy(*_cols(exprs)))

    def offset(self, n: int) -> "Table":  # Table.java:887
        return Table(self._df.offset(n))

    def fetch(self, n: int) -> "Table":  # Table.java:905
        return Table(self._df.limit(n))

    def limit(self, n: int) -> "Table":
        return self.fetch(n)

    # -- windows (§2.5, §2.6) ---------------------------------------------
    def window(self, w) -> WindowedTable:  # Table.java:966
        return WindowedTable(self._df, w)

    def over_select(self, *exprs: Column | str) -> "Table":
        """Table.window(OverWindow...).select(...) (Table.java:994) — Spark
        needs no separate scoping call: pass ``col.over(spec)`` columns."""
        return Table(self._df.select(*_cols(exprs)))


class TableResult:
    """Reference TableResult surface (TableResultImpl.java): print/collect/
    wait over an executed Table. collect() returns an iterator of Rows like
    the reference's CloseableIterator."""

    def __init__(self, df: DataFrame):
        self._df = df

    def print(self, n: int = 20) -> None:  # noqa: A003
        self._df.show(n, truncate=False)

    def collect(self):
        return iter(self._df.collect())

    def wait(self) -> "TableResult":
        """Block until finished — Spark actions are synchronous; forcing a
        count materializes side effects for parity with awaiting an INSERT."""
        self._df.count()
        return self


class EnvironmentSettings:
    """pyflink EnvironmentSettings shim: both modes map to one well-tuned
    SparkSession (batch = DataFrame, streaming = Structured Streaming — the
    mode lives in how the source is opened, not in the environment)."""

    def __init__(self, streaming: bool):
        self.streaming = streaming

    @staticmethod
    def in_streaming_mode() -> "EnvironmentSettings":
        return EnvironmentSettings(True)

    @staticmethod
    def in_batch_mode() -> "EnvironmentSettings":
        return EnvironmentSettings(False)
