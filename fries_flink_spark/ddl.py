"""Flink SQL DDL compatibility: CREATE TABLE ... WITH (connector options),
INSERT INTO, DROP TABLE.

Reference surface: TableEnvironment.executeSql DDL handling
(flink-table/flink-table-api-java/.../TableEnvironmentImpl.java executeSql →
SqlToOperationConverter), the filesystem connector factory
(flink-table/flink-table-runtime-blink/.../filesystem/FileSystemTableFactory),
datagen (flink-table/.../factories/DataGenTableSourceFactory.java), print
(PrintTableSinkFactory) and blackhole (BlackHoleTableSinkFactory). A reference
user's first lines of SQL are this DDL; this module lets them run unchanged.

Lowering (Spark-first):

- ``connector=filesystem`` → ``spark.read.<format>`` registered as a temp
  view — the scan stays declarative, so pushdown/pruning work. The parsed
  watermark clause is recorded and applied via ``withWatermark`` when the
  table is opened as a stream (``TableEnvironment.from_path_stream``).
- ``connector=datagen`` → bounded ``spark.range`` (batch) or rate source
  (stream) with deterministic hash-derived columns — reproducible, unlike
  Flink's random datagen, which suits oracle-testing better.
- ``connector=print`` / ``blackhole`` → sink-only tables; INSERT INTO maps
  to ``.show()`` / noop-format write.
- ``connector=kafka``/``jdbc`` → recorded, with the same env-gated behavior
  as ``streaming/sources.kafka_source`` / ``sources/connectors.read_jdbc``
  (no connector jars in this environment).

Scale note: nothing here adds execution machinery — DDL only routes to the
same declarative reads/writes used everywhere else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["FlinkDdl", "TableSpec", "is_ddl"]

_CREATE_HEAD_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*\(",
    re.IGNORECASE,
)
_PARTITIONED_RE = re.compile(
    r"^\s*PARTITIONED\s+BY\s*\(([\w\s,]+)\)\s*", re.IGNORECASE
)
_WITH_RE = re.compile(r"^\s*WITH\s*\(", re.IGNORECASE)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$", re.IGNORECASE
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s+(?P<select>SELECT\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_VALUES_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(\w+)\s+(?P<values>VALUES\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_SET_RE = re.compile(
    r"^\s*SET\s+'([^']+)'\s*=\s*'([^']*)'\s*$", re.IGNORECASE
)
_RESET_RE = re.compile(r"^\s*RESET\s+'([^']+)'\s*$", re.IGNORECASE)
_SHOW_CREATE_RE = re.compile(
    r"^\s*SHOW\s+CREATE\s+TABLE\s+(\w+)\s*$", re.IGNORECASE
)
_STMT_SET_RE = re.compile(
    r"^\s*EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(?P<body>.*?)\s+END\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WATERMARK_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'(\d+)'\s+(\w+)",
    re.IGNORECASE,
)


@dataclass
class TableSpec:
    name: str
    columns: list[tuple[str, str]]  # (name, sql type)
    options: dict[str, str]
    watermark: tuple[str, int] | None = None  # (ts col, delay seconds)
    computed: list[tuple[str, str]] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)


def is_ddl(sql: str) -> bool:
    s = sql.lstrip().upper()
    return s.startswith(("CREATE TABLE", "CREATE TEMPORARY TABLE", "DROP TABLE",
                         "INSERT INTO", "EXECUTE STATEMENT SET", "SET ", "SET'",
                         "RESET", "SHOW CREATE TABLE"))


def _split_top(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


_UNIT_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _balanced_span(s: str, open_idx: int) -> int:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError("unbalanced parentheses in CREATE TABLE")


def _parse_create(sql: str) -> TableSpec:
    m = _CREATE_HEAD_RE.match(sql)
    if not m:
        raise ValueError(f"cannot parse CREATE TABLE statement: {sql[:120]!r}")
    name = m.group(1)
    cols_open = m.end() - 1
    cols_close = _balanced_span(sql, cols_open)
    cols_body = sql[cols_open + 1 : cols_close]
    rest = sql[cols_close + 1 :]
    part_cols: list[str] = []
    pm = _PARTITIONED_RE.match(rest)
    if pm:
        part_cols = [p.strip() for p in pm.group(1).split(",") if p.strip()]
        rest = rest[pm.end():]
    wm_ = _WITH_RE.match(rest)
    if not wm_:
        raise ValueError(f"CREATE TABLE {name}: missing WITH (options)")
    with_open = wm_.end() - 1
    with_close = _balanced_span(rest, with_open)
    opts_body = rest[with_open + 1 : with_close]
    columns: list[tuple[str, str]] = []
    computed: list[tuple[str, str]] = []
    watermark = None
    for item in _split_top(cols_body):
        wm = _WATERMARK_RE.match(item)
        if wm:
            watermark = (wm.group(1), int(wm.group(2)) * _UNIT_S[wm.group(3).upper()])
            continue
        if re.match(r"PRIMARY\s+KEY", item, re.IGNORECASE):
            continue  # NOT ENFORCED in the reference too
        cm = re.match(r"(\w+)\s+AS\s+(.+)$", item, re.IGNORECASE)
        if cm and not re.match(r"\w+\s+AS\s*$", item):
            computed.append((cm.group(1), cm.group(2)))
            continue
        parts = item.split(None, 1)
        if len(parts) == 2:
            columns.append((parts[0], parts[1]))
    options = {}
    for opt in _split_top(opts_body):
        om = re.match(r"'([^']+)'\s*=\s*'([^']*)'", opt.strip())
        if om:
            options[om.group(1).lower()] = om.group(2)
    if "connector" not in options:
        raise ValueError(f"CREATE TABLE {name}: missing 'connector' option")
    return TableSpec(name, columns, options, watermark, computed, part_cols)


_FMT_ALIASES = {"raw": "text"}


class FlinkDdl:
    """DDL state + execution over a SparkSession (one per TableEnvironment)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, TableSpec] = {}

    # ------------------------------------------------------------------ #

    def execute(self, sql: str) -> DataFrame | None:
        setm = _SET_RE.match(sql)
        if setm:
            # Flink SQL-client SET 'key' = 'value' (SetOperation) — session
            # config lands on the SparkSession's runtime conf
            self.spark.conf.set(setm.group(1), setm.group(2))
            return None
        rm = _RESET_RE.match(sql)
        if rm:
            self.spark.conf.unset(rm.group(1))
            return None
        scm = _SHOW_CREATE_RE.match(sql)
        if scm:
            return self._show_create(scm.group(1))
        sm = _STMT_SET_RE.match(sql)
        if sm:
            # Flink STATEMENT SET (TableEnvironmentImpl.createStatementSet /
            # parserImpls.ftl EXECUTE STATEMENT SET BEGIN ... END): a batch
            # of INSERTs planned together. Flink shares common source scans
            # across the inserts; Spark's analog for repeated sources is the
            # shuffle/exchange reuse Catalyst applies per action — here the
            # inserts run sequentially, each fully optimized.
            for stmt in sm.group("body").split(";"):
                if stmt.strip():
                    self.execute(stmt.strip())
            return None
        if _DROP_RE.match(sql):
            name = _DROP_RE.match(sql).group(1)
            self.tables.pop(name, None)
            self.spark.catalog.dropTempView(name)
            return None
        im = _INSERT_RE.match(sql)
        if im:
            return self._insert(im.group(1), im.group("select"))
        vm = _INSERT_VALUES_RE.match(sql)
        if vm:
            target = vm.group(1)
            spec = self.tables.get(target)
            if spec is None:
                raise ValueError(f"INSERT INTO unknown table {target!r}")
            names = ", ".join(n for n, _t in spec.columns)
            return self._insert(
                target, f"SELECT * FROM ({vm.group('values')}) AS __v({names})"
            )
        spec = _parse_create(sql)
        self.tables[spec.name] = spec
        self._register(spec)
        return None

    # ------------------------------------------------------------------ #

    def _show_create(self, name: str) -> DataFrame:
        """Reconstruct the DDL of a shim-registered table (reference
        ShowCreateTableOperation)."""
        spec = self.tables.get(name)
        if spec is None:
            raise ValueError(f"SHOW CREATE TABLE: unknown table {name!r}")
        cols = [f"  {n} {t}" for n, t in spec.columns]
        cols += [f"  {n} AS {e}" for n, e in spec.computed]
        if spec.watermark:
            ts, delay = spec.watermark
            cols.append(f"  WATERMARK FOR {ts} AS {ts} - INTERVAL '{delay}' SECOND")
        opts = ",\n".join(f"  '{k}' = '{v}'" for k, v in sorted(spec.options.items()))
        stmt = (
            f"CREATE TABLE {name} (\n" + ",\n".join(cols) + f"\n) WITH (\n{opts}\n)"
        )
        return self.spark.createDataFrame([(stmt,)], "result string")

    def _schema_str(self, spec: TableSpec) -> str:
        return ", ".join(f"{n} {t}" for n, t in spec.columns)

    def _apply_computed(self, df: DataFrame, spec: TableSpec) -> DataFrame:
        for cname, expr in spec.computed:
            df = df.withColumn(cname, F.expr(expr))
        return df

    def _register(self, spec: TableSpec) -> None:
        conn = spec.options["connector"].lower()
        if conn == "filesystem":
            # A filesystem table may be created as a SINK before its path
            # exists (Flink's factory is lazy too) — defer registration to
            # the first INSERT in that case.
            try:
                df = self._read_filesystem(spec)
                self._apply_computed(df, spec).createOrReplaceTempView(spec.name)
            except Exception as exc:  # defer ONLY the not-yet-written sink case
                msg = str(exc)
                if not (
                    "PATH_NOT_FOUND" in msg
                    or "Path does not exist" in msg
                    or "No such file" in msg
                ):
                    # genuine misconfiguration (bad schema/format/option)
                    # must surface at CREATE TABLE time, not as a later
                    # unrelated 'table not found'
                    raise
        elif conn == "datagen":
            n = int(spec.options.get("number-of-rows", "1000"))
            df = self._datagen(spec, n)
            df.createOrReplaceTempView(spec.name)
        elif conn in ("print", "blackhole"):
            pass  # sink-only: resolved at INSERT INTO time
        elif conn in ("kafka", "jdbc"):
            # same env-gating as the dedicated wrappers — fail at USE, not
            # at CREATE, mirroring Flink's lazy factory instantiation
            pass
        else:
            raise ValueError(f"unsupported connector {conn!r}")

    def _read_filesystem(self, spec: TableSpec) -> DataFrame:
        path = spec.options["path"]
        fmt = _FMT_ALIASES.get(
            spec.options.get("format", "parquet").lower(),
            spec.options.get("format", "parquet").lower(),
        )
        reader = self.spark.read
        if fmt == "csv":
            reader = reader.option(
                "header", spec.options.get("csv.include-header", "false")
            ).option(
                "sep", spec.options.get("csv.field-delimiter", ",")
            ).schema(self._schema_str(spec))
        elif fmt == "json":
            reader = reader.schema(self._schema_str(spec))
        return reader.format(fmt).load(path)

    def _datagen(self, spec: TableSpec, n: int) -> DataFrame:
        """Deterministic datagen: hash-derived values per column type."""
        df = self.spark.range(n).withColumn(
            "timestamp", F.timestamp_seconds(F.lit(1704067200) + F.col("id"))
        )
        return df.select(*self._datagen_cols_for(spec))

    # ------------------------------------------------------------------ #

    def _insert(self, target: str, select_sql: str) -> DataFrame | None:
        from .sqlext import sql as _ext_sql

        df = _ext_sql(self.spark, select_sql)
        spec = self.tables.get(target)
        if spec is None:
            raise ValueError(f"INSERT INTO unknown table {target!r}")
        conn = spec.options["connector"].lower()
        if conn == "filesystem":
            fmt = spec.options.get("format", "parquet").lower()
            writer = df.write.mode("append").format(_FMT_ALIASES.get(fmt, fmt))
            if spec.partitioned_by:
                # Flink PARTITIONED BY → Hive-style dynamic partition dirs
                # (FileSystemTableSink partition-path grammar = Spark's)
                writer = writer.partitionBy(*spec.partitioned_by)
            writer.save(spec.options["path"])
            self._register(spec)  # the path exists now: (re)expose the view
            return None
        if conn == "print":
            df.show(truncate=False)
            return None
        if conn == "blackhole":
            df.write.mode("overwrite").format("noop").save()
            return None
        raise ValueError(f"INSERT INTO connector {conn!r} not supported")

    # ------------------------------------------------------------------ #

    def open_stream(self, name: str) -> DataFrame:
        """Streaming read of a DDL table (filesystem/datagen), with the DDL
        watermark applied — the streaming half of the Flink table."""
        spec = self.tables[name]
        conn = spec.options["connector"].lower()
        if conn == "filesystem":
            fmt = spec.options.get("format", "parquet").lower()
            sdf = (
                self.spark.readStream.schema(self._schema_str(spec))
                .format(_FMT_ALIASES.get(fmt, fmt))
                .load(spec.options["path"])
            )
        elif conn == "datagen":
            rps = int(spec.options.get("rows-per-second", "100"))
            rate = (
                self.spark.readStream.format("rate")
                .option("rowsPerSecond", rps)
                .load()
                .withColumnRenamed("value", "id")
            )
            sdf = rate.select(*self._datagen_cols_for(spec))
        else:
            raise ValueError(f"connector {conn!r} has no streaming source here")
        sdf = self._apply_computed(sdf, spec)
        if spec.watermark:
            ts, delay = spec.watermark
            sdf = sdf.withWatermark(ts, f"{delay} seconds")
        return sdf

    def _datagen_cols_for(self, spec: TableSpec):
        """Column derivations shared by the batch (spark.range) and streaming
        (rate source) datagen paths — both expose ``id`` and ``timestamp``."""
        cols = []
        for cname, ctype in spec.columns:
            t = ctype.strip().upper()
            h = F.xxhash64(F.col("id"), F.lit(cname))
            if t.startswith(("INT", "BIGINT", "SMALLINT", "TINYINT")):
                cols.append(F.pmod(h, F.lit(1000)).cast("long").alias(cname))
            elif t.startswith(("DOUBLE", "FLOAT", "DECIMAL")):
                cols.append(
                    (F.pmod(h, F.lit(100000)) / 1000.0).cast("double").alias(cname)
                )
            elif t.startswith("TIMESTAMP"):
                cols.append(F.col("timestamp").alias(cname))
            elif t.startswith("BOOLEAN"):
                cols.append((F.pmod(h, F.lit(2)) == 0).alias(cname))
            else:
                cols.append(
                    F.concat(F.lit(cname + "-"), F.pmod(h, F.lit(1000))).alias(cname)
                )
        return cols
