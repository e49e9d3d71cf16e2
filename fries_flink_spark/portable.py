"""Engine-portable rounding for cross-engine value hashing.

``round(x, n)`` is a correctness trap for oracle comparison: when a double
is a dyadic rational whose decimal expansion terminates exactly at digit
n+1 with a 5 (e.g. any odd/128 at n=6: 1/128 = 0.0078125), the rounding
sits exactly on a decimal tie, and tie direction differs between engines
and even between builds of the same engine (HALF_UP vs HALF_EVEN).
Ratio-style outputs hit this for real — any count/count quotient whose
reduced denominator is a power of two.

The portable form spells out HALF_UP in plain IEEE-754 double arithmetic:

    floor(x * 10^n + 0.5) / 10^n

Both Spark and DuckDB evaluate this expression with the same IEEE ops, so
the results are bit-identical by construction — no library rounding mode
is involved. (Spark's ``floor`` returns BIGINT and DuckDB's returns
DOUBLE; the subsequent division promotes both to the same double for any
magnitude below 2^53.) Intended for non-negative ratio outputs; for
negative x this rounds half toward +inf on both engines alike.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_portable(col: Column, n: int) -> Column:
    """HALF_UP rounding of ``col`` to ``n`` decimals, bit-identical across
    engines (see module docstring). Spark side of the pair."""
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale


def round_portable_sql(expr: str, n: int) -> str:
    """The same expression rendered as SQL for the DuckDB oracle."""
    return f"floor(({expr}) * {float(10 ** n)} + 0.5) / {float(10 ** n)}"


def micro(col: Column, digits: int = 6) -> Column:
    """Fixed-point emit for a compared double column: ``floor(x * 10^digits
    + 0.5)`` as BIGINT — the integer-valued sibling of ``round_portable``
    (same IEEE half-up construction, but the compared artifact stays an
    integer, so not even float FORMATTING can differ between engines).
    Oracle side: ``micro_sql``. This is the repo-wide oracle discipline
    since round 6 (tools/lint_oracles.py enforces it)."""
    return F.floor(col * F.lit(float(10**digits)) + F.lit(0.5)).cast("long")


def micro_sql(expr: str, digits: int = 6) -> str:
    """DuckDB rendering of ``micro`` for oracle SQL."""
    return f"CAST(floor(({expr}) * 1e{digits} + 0.5) AS BIGINT)"
