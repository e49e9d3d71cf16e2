"""Plan audit: explain every registered query and flag structural red flags.

Round-11 optimization tool (guide §7.2): the minhash SortAggregate defect sat
invisible in a green, fast-enough query for five rounds — this scans EVERY
registered query's physical plan for the known red-flag node classes instead
of sampling the slow rows:

- SortAggregate            (hash-unfriendly buffer => full sort per aggregate)
- BatchEvalPython          (row-at-a-time pickled UDF)
- CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins)
- Exchange count           (shuffle budget per query)
- in-plan `rand(` outside sampling queries (retry-unsafe partitioning)

Usage: python tools/plan_audit.py [name-filter ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
Writes one line per query: name, #exchange, flags. Exit code 0 always —
this is a survey tool, findings are adjudicated by a human.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = [
    "SortAggregate",
    "BatchEvalPython",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
]


def main() -> None:
    from fries_flink_spark.registry import load_all
    from fries_flink_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    registry = load_all()
    spark = get_spark(app_name="plan-audit")
    rows = []
    for name, spec in sorted(registry.items()):
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            print(f"{name}\tERROR\t{type(e).__name__}: {e}", flush=True)
            continue
        n_ex = plan.count("Exchange")
        hits = [f for f in FLAGS if f in plan]
        print(f"{name}\texchanges={n_ex}\t{','.join(hits) or '-'}", flush=True)
        rows.append((name, n_ex, hits))
    flagged = [r for r in rows if r[2]]
    print(f"\n== {len(rows)} plans, {len(flagged)} flagged ==", file=sys.stderr)
    for name, n_ex, hits in flagged:
        print(f"  {name}: {','.join(hits)}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
