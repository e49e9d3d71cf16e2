"""Dump .explain("formatted") for named registered queries to files.

Usage: python tools/dump_plan.py outdir suffix name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
Writes outdir/<name>_<suffix>.txt for each query.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from fries_flink_spark.registry import load_all
    from fries_flink_spark.session import get_spark

    registry = load_all()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange tokens)")
    spark.stop()


if __name__ == "__main__":
    main()
