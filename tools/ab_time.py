"""Targeted noop-sink A/B timer: time named registered queries at a dir.

Usage: python tools/ab_time.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_AB_REPS (default 3).
Prints one JSON line {name: [rep_secs...]} — medians are computed by the
caller so both min and median survive for skew-robust compares (PERF §72).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_AB_REPS", "3"))


def main():
    names = sys.argv[1:]
    from fries_flink_spark.registry import load_all
    from fries_flink_spark.session import get_spark

    registry = load_all()
    missing = [n for n in names if n not in registry]
    if missing:
        # fail fast on a typo'd name instead of mixing a bare string into
        # the timings map (ADVICE r11): callers compute medians over values
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        fn = registry[name].fn
        reps = []
        for i in range(REPS + 1):  # rep 0 is warmup (golden builds, broadcasts)
            spark.sparkContext.setJobDescription(f"ab:{name}#{i}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            if i:
                reps.append(round(dt, 3))
        out[name] = reps
    print(json.dumps(out))


if __name__ == "__main__":
    main()
