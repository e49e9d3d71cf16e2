"""CBO-stats parity experiment (reference: the TPC-DS e2e run feeds Flink's
optimizer per-table/column statistics via its stats provider,
flink-end-to-end-tests/flink-tpcds-test/.../stats/TpcdsStatsProvider.java:37;
this repo relies on AQE's runtime statistics instead).

Question: does static cost-based optimization (ANALYZE TABLE ... FOR ALL
COLUMNS + spark.sql.cbo.enabled + joinReorder) improve the join-heavy
TPC-DS ports over AQE alone at the 10x (sf1-scale) fixture?

Method: three configs over the same data, median of 3 per query
  A. production path — register_tpcds temp views (ds_base/date_dim cached),
     AQE only (the repo's default);
  B. catalog parquet tables, AQE only (isolates the table-vs-view substrate);
  C. catalog parquet tables + ANALYZE ALL COLUMNS + CBO + joinReorder + AQE.
C vs B isolates the CBO effect; A anchors against the registered path.

Usage: python tools/cbo_probe.py [sf_dir] [query ...]
       (default: /tmp/spark_graft_scale10 and the 10 join-heaviest ports)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")

# join-heavy ports: multi-fact self/cross-channel joins, no q14-style
# persisted-frame setup (their spark body must run standalone from catalog
# tables)
DEFAULT_QUERIES = [
    "tpcds_q4", "tpcds_q11", "tpcds_q17", "tpcds_q25", "tpcds_q29",
    "tpcds_q64", "tpcds_q72", "tpcds_q78", "tpcds_q85", "tpcds_q95",
]
TABLES = [
    "store_sales", "catalog_sales", "web_sales", "store_returns",
    "catalog_returns", "web_returns", "date_dim", "item", "store",
    "warehouse", "customer_dim", "inventory",
]


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _time_sql(spark, body, repeats=3):
    spark.sql(body).write.mode("overwrite").format("noop").save()
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        spark.sql(body).write.mode("overwrite").format("noop").save()
        ts.append(time.time() - t0)
    return _median(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale10"
    names = sys.argv[2:] or DEFAULT_QUERIES
    from fries_flink_spark.queries.tpcds import register_tpcds
    from fries_flink_spark.registry import load_all
    from fries_flink_spark.session import get_spark

    reg = load_all()
    bodies = {n: reg[n].fn.__defaults__[0] for n in names}

    spark = get_spark(app_name="cbo-probe", cpus=32, shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # --- A: production temp-view path, AQE only -------------------------- #
    register_tpcds(spark, sf_dir)
    a = {n: _time_sql(spark, b) for n, b in bodies.items()}
    print("A (views+AQE):     " + "  ".join(f"{n.split('_q')[1]}={v:.2f}" for n, v in a.items()), flush=True)

    # --- materialize catalog tables from the views ----------------------- #
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_probe")
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS cbo_probe.{t}")
        spark.sql(
            f"CREATE TABLE cbo_probe.{t} USING parquet AS SELECT * FROM {t}"
        )
    for t in TABLES + ["ds_base"]:
        spark.catalog.dropTempView(t)
    spark.sql("USE cbo_probe")

    # --- B: catalog tables, AQE only, no stats --------------------------- #
    spark.conf.set("spark.sql.cbo.enabled", "false")
    b_res = {n: _time_sql(spark, b) for n, b in bodies.items()}
    print("B (tables+AQE):    " + "  ".join(f"{n.split('_q')[1]}={v:.2f}" for n, v in b_res.items()), flush=True)

    # --- C: + ANALYZE ALL COLUMNS + CBO + joinReorder --------------------- #
    t0 = time.time()
    for t in TABLES:
        spark.sql(f"ANALYZE TABLE cbo_probe.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    analyze_s = time.time() - t0
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    c_res = {n: _time_sql(spark, b) for n, b in bodies.items()}
    print("C (tables+CBO):    " + "  ".join(f"{n.split('_q')[1]}={v:.2f}" for n, v in c_res.items()), flush=True)

    print(f"\nANALYZE cost: {analyze_s:.1f}s for {len(TABLES)} tables")
    print(f"{'query':12s} {'A views':>8s} {'B tables':>9s} {'C cbo':>8s} {'C/B':>6s}")
    for n in names:
        print(
            f"{n:12s} {a[n]:8.2f} {b_res[n]:9.2f} {c_res[n]:8.2f} "
            f"{c_res[n] / max(b_res[n], 1e-9):6.2f}"
        )
    print(
        f"{'TOTAL':12s} {sum(a.values()):8.2f} {sum(b_res.values()):9.2f} "
        f"{sum(c_res.values()):8.2f} "
        f"{sum(c_res.values()) / max(sum(b_res.values()), 1e-9):6.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
