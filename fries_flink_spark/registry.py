"""Query registry: the driver-facing inventory of implemented operators.

Every operator family module registers named queries here via the ``@query``
decorator. ``__spark_entry__.py`` exposes the registry through the driver
contract (``queries()`` / ``oracle_sql()``).

A registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB-compatible ANSI-SQL oracle string. Column names must match
between the Spark result and the oracle (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None

    def __call__(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        return self.fn(spark, sf_dir)


REGISTRY: dict[str, QuerySpec] = {}


def micro(col, digits: int = 6):
    """Engine-version-proof fixed-point emit for a compared double column —
    re-exported from ``portable`` (the engine-portable rounding home) for
    the query modules' convenience. See portable.micro."""
    from .portable import micro as _micro

    return _micro(col, digits)


def sorted_result(df: DataFrame, *cols) -> DataFrame:
    """Deterministic total order for a DRIVER-FACING result table.

    Equivalent to ``df.orderBy(*cols)`` for the driver compare (which is
    order-insensitive anyway — the sort is defense for order-sensitive
    consumers), but skips the range-sort machinery: a global orderBy runs a
    boundary-sampling job plus a range exchange, ~0.2-0.3s of pure floor per
    query at small SF. Registered results are dim-sized by construction
    (aggregated summaries, top-k lists, pair samples), so a one-partition
    local sort — the same shape the driver's collect() implies — is the
    right plan at ANY scale for these outputs. Not for large outputs; use
    orderBy there.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def query(name: str, oracle: str | None = None):
    """Register a query under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query-family module (side effect: fills REGISTRY)."""
    from .queries import (  # noqa: F401
        aggregates,
        cep_queries,
        changelog_queries,
        dedup_queries,
        graph_queries,
        iterate_queries,
        joins,
        multimodal_queries,
        pipeline_queries,
        scalar_funcs,
        setops,
        similarity_queries,
        sort_topn,
        sql_queries,
        streaming_batch,
        text_queries,
        tpcds,
        tpch,
        trigger_queries,
        windows_over,
    )
    from .queries.golden import ensure_driver_goldens

    # materialize the golden parquets the static oracle SQL references (cached
    # on disk after the first call; never raises)
    ensure_driver_goldens()

    return REGISTRY
