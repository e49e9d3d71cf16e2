"""Oracle-portability lint: flag DuckDB oracle constructs whose results can
drift across DuckDB versions (the class that produced the only driver-red
rows in rounds 1-5 — `round()` on doubles, HUGEINT sums, float division
feeding integer casts).

The driver runs each oracle on ITS DuckDB build; local strict passes prove
nothing about a different engine version when the SQL contains
version-sensitive constructs. This lint makes portability a gate, not a
memory:

1. **round() feeding a compared DOUBLE column.** DuckDB's round() changed
   float-vs-exact strategy across versions; Spark rounds via BigDecimal
   HALF_UP. Near-tie quotients flip. Fix: emit integer micro-units
   ``CAST(floor(x * 1e6 + 0.5) AS BIGINT)`` spelled identically on both
   sides (pure IEEE ops, engine-version-proof), or drop the derived column.
2. **HUGEINT / DECIMAL output columns** (uncast ``sum()`` of integers et
   al.). How a driver materializes int128 through pandas is version- and
   path-dependent. Fix: ``CAST(... AS BIGINT)`` / ``CAST(... AS DOUBLE)``.
3. **Float division inside CAST(... AS BIGINT).** Double-rounding semantics
   of the cast differ across versions. Fix: integer division ``//``.

Usage:  python tools/lint_oracles.py [name_filter ...]
Exit 1 on any flag. Wired into the round-close gate next to the strict sweep.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

RISKY_INT_TYPES = {"HUGEINT", "INT128", "UHUGEINT"}


def _cast_spans(sql: str):
    """Yield the balanced-paren argument text of every CAST(...) in sql."""
    up = sql.upper()
    i = 0
    while True:
        j = up.find("CAST(", i)
        if j < 0:
            return
        depth, k = 1, j + 5
        while k < len(sql) and depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        yield sql[j + 5 : k - 1]
        i = k


def _strip_floored(body: str) -> str:
    """Remove floor(...)/ceil(...) balanced spans: a division inside floor()
    is integral before the cast, so the cast is exact and version-proof."""
    up = body.upper()
    out, i = [], 0
    while i < len(body):
        m = re.match(r"(FLOOR|CEIL|CEILING)\s*\(", up[i:])
        if m:
            depth, k = 1, i + m.end()
            while k < len(body) and depth:
                if body[k] == "(":
                    depth += 1
                elif body[k] == ")":
                    depth -= 1
                k += 1
            i = k
            continue
        out.append(body[i])
        i += 1
    return "".join(out)


def _float_div_in_bigint_cast(sql: str) -> bool:
    for arg in _cast_spans(sql):
        if not re.search(r"AS\s+(BIGINT|INTEGER|INT|SMALLINT)\s*$", arg.strip(), re.I):
            continue
        body = re.sub(r"AS\s+\w+\s*$", "", arg.strip(), flags=re.I)
        body = _strip_floored(body)
        # single '/' that is not the '//' integer-division operator
        if re.search(r"(?<!/)/(?!/)", body):
            return True
    return False


# Fixture columns whose values carry decimal fractions: their double sums
# are inexact, so reduction ORDER changes the last ulp. Integral-valued
# doubles (l_quantity, n_chars, *_cents, keys) sum exactly below 2^53 and
# are safe to compare raw.
INEXACT_COLS = (
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "o_totalprice",
    "s_acctbal",
    "c_acctbal",
    r"\bvalue\b",
)


def _unordered_inexact_reduction(sql: str) -> bool:
    """True if the sql contains sum()/avg() over a known-inexact column that
    is NOT an ordered window aggregate (OVER frames visit rows in the frame
    order on both engines) and NOT already wrapped in the fixed-point
    CAST(floor(...) AS BIGINT) emit."""
    # Drop every CAST(...) span first: a micro-unit emit rounds away the
    # ulp before comparison, so sums inside a CAST are handled.
    stripped, up, i = [], sql.upper(), 0
    while i < len(sql):
        if up.startswith("CAST(", i):
            depth, k = 1, i + 5
            while k < len(sql) and depth:
                if sql[k] == "(":
                    depth += 1
                elif sql[k] == ")":
                    depth -= 1
                k += 1
            i = k
            continue
        stripped.append(sql[i])
        i += 1
    text = "".join(stripped)
    for m in re.finditer(r"\b(sum|avg)\s*\(", text, re.I):
        depth, k = 1, m.end()
        while k < len(text) and depth:
            if text[k] == "(":
                depth += 1
            elif text[k] == ")":
                depth -= 1
            k += 1
        arg = text[m.end() : k - 1]
        # A column named only inside a CASE's WHEN condition is a predicate,
        # not the summand (sum(CASE WHEN value > x THEN 0 ELSE 1 END) sums
        # exact integers); test the summed branches only.
        arg = re.sub(r"\bWHEN\b.*?\bTHEN\b", " ", arg, flags=re.I | re.S)
        if not any(re.search(c, arg, re.I) for c in INEXACT_COLS):
            continue
        tail = text[k:].lstrip()
        if re.match(r"(FILTER\s*\([^)]*\)\s*)?OVER\b", tail, re.I):
            continue  # ordered window aggregate — frame order is shared
        return True
    return False


def lint_one(con, name: str, sql: str) -> list[str]:
    flags: list[str] = []
    try:
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as exc:  # noqa: BLE001 - lint must report, not crash
        return [f"DESCRIBE failed: {str(exc).splitlines()[0][:120]}"]
    out_types = {c[0]: c[1].upper() for c in cols}

    for col, typ in out_types.items():
        base = typ.split("(")[0]
        if base in RISKY_INT_TYPES:
            flags.append(
                f"output `{col}` is {typ} (uncast integer sum?) — CAST(... AS BIGINT)"
            )
        elif base == "DECIMAL":
            flags.append(
                f"output `{col}` is {typ} — cast to BIGINT/DOUBLE explicitly"
            )

    if re.search(r"\bround\s*\(", sql, re.I) and any(
        t.startswith(("DOUBLE", "FLOAT", "REAL")) for t in out_types.values()
    ):
        flags.append(
            "round() with a DOUBLE output column — emit integer micro-units "
            "(CAST(floor(x*1eN + 0.5) AS BIGINT)) on both sides instead"
        )

    if _float_div_in_bigint_cast(sql):
        flags.append(
            "float division inside CAST(... AS BIGINT) — use integer // division"
        )

    if any(
        t.startswith(("DOUBLE", "FLOAT", "REAL")) for t in out_types.values()
    ) and _unordered_inexact_reduction(sql):
        flags.append(
            "unordered sum()/avg() over a decimal-valued double feeding a "
            "DOUBLE output — summation order differs between Spark's "
            "partial-agg tree and DuckDB's sequential fold, so the last ulp "
            "diverges at scale (tpch_q10 did at sf0.1). Emit integer "
            "micro-units on both sides"
        )
    return flags


def main() -> int:
    from fries_flink_spark.registry import load_all

    filters = sys.argv[1:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    regs = load_all()
    n_checked = n_flagged = 0
    for name in sorted(regs):
        if filters and not any(f in name for f in filters):
            continue
        sql = regs[name].oracle
        if not sql:
            continue
        n_checked += 1
        flags = lint_one(con, name, sql)
        if flags:
            n_flagged += 1
            for f in flags:
                print(f"FLAG  {name}: {f}")
    print(f"\n{n_checked} oracles linted, {n_flagged} flagged")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    sys.exit(main())
