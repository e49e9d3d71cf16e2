"""Scalar-function parity layer (SURVEY §2.9).

The reference's scalar library is BuiltInFunctionDefinitions.java + the SQL
operator table FlinkSqlOperatorTable.java (243 ops), with runtime impls in
SqlFunctionUtils.java / SqlDateTimeUtils.java. Almost all map 1:1 onto
``pyspark.sql.functions`` (JVM-side, codegen'd — SURVEY §2.9 table). This
module provides the ~10 gap functions as one-line Column expressions — NO
Python UDFs, so everything stays inside whole-stage codegen.

Each function cites the Flink name it implements.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_index(s: Column | str, sep: str, idx: int) -> Column:
    """Flink SPLIT_INDEX(str, sep, index) — 0-based; NULL when out of range.

    Reference impl: SqlFunctionUtils.splitIndex (flink-table-runtime-blink
    .../functions/SqlFunctionUtils.java).
    """
    col = F.col(s) if isinstance(s, str) else s
    # element_at is 1-based and raises/returns NULL out-of-range under ANSI off;
    # use try_element_at for NULL semantics.
    return F.try_element_at(F.split(col, F.lit(sep), -1), F.lit(idx + 1))


def is_digit(s: Column | str) -> Column:
    """Flink IS_DIGIT: every char is a decimal digit (SqlFunctionUtils.isDigit)."""
    col = F.col(s) if isinstance(s, str) else s
    return col.rlike("^[0-9]+$")


def is_alpha(s: Column | str) -> Column:
    """Flink IS_ALPHA: every char is a letter (SqlFunctionUtils.isAlpha)."""
    col = F.col(s) if isinstance(s, str) else s
    return col.rlike("^[A-Za-z]+$")


def is_decimal(s: Column | str) -> Column:
    """Flink IS_DECIMAL: string parses as a decimal number
    (SqlFunctionUtils.isDecimal)."""
    col = F.col(s) if isinstance(s, str) else s
    return F.try_to_number(col, F.lit("999999999999999999.999999")).isNotNull() | col.rlike(
        r"^[+-]?(\d+(\.\d*)?|\.\d+)$"
    )


def hash_code(s: Column | str) -> Column:
    """Flink HASH_CODE(str): Java String.hashCode (h = 31*h + c).

    Implemented as a JVM-side aggregate over the char codes — stays in codegen.
    """
    col = F.col(s) if isinstance(s, str) else s
    # fold over characters: h = 31*h + code, in 32-bit int arithmetic
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c)),
        F.lit(0),
        lambda acc, c: (acc * 31 + c).cast("int"),
    )


def chr_(n: Column | int) -> Column:
    """Flink CHR(int) → character (FlinkSqlOperatorTable CHR)."""
    col = F.lit(n) if isinstance(n, int) else n
    return F.char(col)


def regexp(s: Column | str, pattern: str) -> Column:
    """Flink REGEXP(str, pattern): true if any substring matches."""
    col = F.col(s) if isinstance(s, str) else s
    return col.rlike(pattern)


def similar_to(s: Column | str, pattern: str) -> Column:
    """SQL SIMILAR TO — translate the SQL pattern (%/_) to a regex and anchor."""
    col = F.col(s) if isinstance(s, str) else s
    regex = (
        pattern.replace(".", r"\.")
        .replace("%", ".*")
        .replace("_", ".")
    )
    return col.rlike(f"^{regex}$")


def to_timestamp_ltz(epoch: Column | str, precision: int = 3) -> Column:
    """Flink TO_TIMESTAMP_LTZ(numeric, precision 0|3) → local-zone timestamp."""
    col = F.col(epoch) if isinstance(epoch, str) else epoch
    if precision == 0:
        return F.timestamp_seconds(col)
    if precision == 3:
        return F.timestamp_millis(col.cast("long"))
    raise ValueError("precision must be 0 or 3")


def str_to_map(s: Column | str, pair_sep: str = ",", kv_sep: str = "=") -> Column:
    """Flink STR_TO_MAP (SqlFunctionUtils.strToMap) — Spark has it built in."""
    col = F.col(s) if isinstance(s, str) else s
    return F.str_to_map(col, F.lit(pair_sep), F.lit(kv_sep))


def parse_url(url: Column | str, part: str, key: str | None = None) -> Column:
    """Flink PARSE_URL (SqlFunctionUtils.parseUrl) — Spark built-in."""
    col = F.col(url) if isinstance(url, str) else url
    if key is None:
        return F.parse_url(col, F.lit(part))
    return F.parse_url(col, F.lit(part), F.lit(key))


def single_value(col: Column | str) -> Column:
    """Flink SINGLE_VALUE aggregate (SingleValueAggFunction.java): returns the
    group's one value; FAILS AT RUNTIME if the group holds more than one row —
    the semantics scalar subqueries rely on. Spark's scalar subqueries enforce
    this natively; this is the explicit aggregate form for Table-API use.
    """
    c = F.col(col) if isinstance(col, str) else col
    # raise_error in the else branch: NullType coerces to the value branch's
    # type, and (unlike an assert_true that both branches share) the CASE
    # cannot be constant-folded away.
    return F.when(F.count(F.lit(1)) <= 1, F.first(c)).otherwise(
        F.raise_error(F.lit("SINGLE_VALUE: group has more than one row"))
    )
