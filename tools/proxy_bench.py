"""DuckDB-proxy comparison: time each headline query's ORACLE in DuckDB
(same sf parquet, all threads) next to the Spark implementation, mirroring
the judge's single-process columnar baseline proxy.

Usage: python tools/proxy_bench.py [name ...]   (default: bench.HEADLINE)
Prints a per-query table (sorted by Spark wall, worst first) and a total
ratio. Both engines run one warmup then median-of-3 timed runs — single
samples carry ±2x noise on sub-second queries for BOTH engines (Spark GC /
DuckDB page-cache state), which round 6 showed can swing the aggregate ratio
by ±0.3x between back-to-back runs. Golden-parquet oracles are skipped
(their DuckDB side is a precomputed-file SELECT — no work to time).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Same fixture-cache policy as bench.py: the proxy compares warmed engines.
os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

import duckdb

from bench import CPUS, HEADLINE, SF_DIR
from fries_flink_spark.registry import load_all
from fries_flink_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

REPEATS = int(os.environ.get("SPARK_GRAFT_PROXY_REPEATS", "3"))


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    reg = load_all()
    spark = get_spark(app_name="proxy-bench", cpus=CPUS, shuffle_partitions=CPUS)
    con = duckdb.connect()
    con.execute(f"SET threads TO {CPUS}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    # warm both engines
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    rows = []
    tot_s = tot_d = 0.0
    for name in names:
        spec = reg.get(name)
        if spec is None or not spec.oracle:
            continue
        if "read_parquet('" in spec.oracle and "golden" in spec.oracle:
            continue  # precomputed-file oracle: nothing to time
        try:
            spec.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        except Exception as e:
            print(f"{name}: spark warmup failed: {e}", file=sys.stderr)
            continue
        ss = []
        for _ in range(REPEATS):
            t0 = time.time()
            spec.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            ss.append(time.time() - t0)
        s = _median(ss)
        try:
            con.execute(spec.oracle).fetchall()  # warm duckdb (page cache, plan)
            ds = []
            for _ in range(REPEATS):
                t0 = time.time()
                con.execute(spec.oracle).fetchall()
                ds.append(time.time() - t0)
            d = _median(ds)
        except Exception as e:
            print(f"{name}: duckdb failed: {str(e)[:90]}", file=sys.stderr)
            continue
        rows.append((name, s, d))
        tot_s += s
        tot_d += d
        print(
            f"{name:34s} spark {s:7.2f}s  duckdb {d:7.2f}s  "
            f"ratio {s / max(d, 1e-9):6.2f}x",
            file=sys.stderr,
        )

    print("\n==== summary (sorted by spark wall, worst first) ====")
    for name, s, d in sorted(rows, key=lambda r: -r[1]):
        print(
            f"{name:34s} spark {s:7.2f}s  duckdb {d:7.2f}s  "
            f"ratio {s / max(d, 1e-9):6.2f}x"
        )
    print(
        f"\nTOTAL spark {tot_s:.2f}s  duckdb {tot_d:.2f}s  "
        f"ratio {tot_s / max(tot_d, 1e-9):.2f}x  over {len(rows)} queries"
    )


if __name__ == "__main__":
    main()
