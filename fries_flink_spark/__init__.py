"""fries_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Fries-Flink (Apache Flink 1.13 +
Fries runtime-reconfiguration controller).

Architecture: a thin, well-tested semantic layer over DataFrame / Spark SQL /
Structured Streaming. Catalyst + Tungsten replace the Blink planner, codegen,
shuffle, spill, and state machinery (SURVEY.md §4). Custom operators (as-of
join, CUMULATE windows, MinHash dedup, ANN search, stateful Top-N, Fries-style
epoch reconfiguration) are compositions of built-in ops, dropping to Pandas
UDFs only where DataFrame semantics genuinely can't express them.
"""

from .catalog import TableEnvironment, load_table, register_tables
from .session import ensure_confs, get_spark

__all__ = [
    "TableEnvironment",
    "ensure_confs",
    "get_spark",
    "load_table",
    "register_tables",
]

__version__ = "0.1.0"
