"""Deterministic-sample value check for dedup_embedding_cosine at fixture
scales where the all-pairs DuckDB oracle is infeasible (200k vectors at the
100x dir = 2*10^10 cosines).

Both engines compute the SAME restricted query — all pairs over the
deterministic subset vec_id % STRIDE == 0 — so this is a true value-level
compare of the operator (the tiled-GEMM path still engages: the subset is
sized above the broadcast threshold), just on a 1/STRIDE^2 pair sample.

Usage: python tools/cosine_sample_check.py [sf_dir] [stride] [broadcast_threshold]
       (default: /tmp/spark_graft_scale100, stride 10 -> 20k vectors)

Run it twice to value-verify BOTH engine paths at scale: once with the
default threshold (the subset's stats estimate sits under 10 MB -> the
broadcast+mapInPandas path engages) and once with a small threshold, e.g.
1048576, to force the tiled cogrouped-GEMM path on the same subset — the
printed `tiled_path` flag states which path actually ran.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "0")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale100"
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    threshold = int(sys.argv[3]) if len(sys.argv) > 3 else None

    import duckdb
    from pyspark.sql import functions as F

    from fries_flink_spark.catalog import load_table
    from fries_flink_spark.registry import micro
    from fries_flink_spark.session import get_spark
    from fries_flink_spark.similarity.ann import cosine_pairs

    spark = get_spark(app_name="cosine-sample", cpus=24, shuffle_partitions=24)
    if threshold is not None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % stride == 0
    )
    out = (
        cosine_pairs(emb, "embedding", "vec_id", threshold=0.4)
        .select("a", "b", micro(F.col("cos"), 4).alias("cos"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    tiled = "FlatMapCoGroupsInPandas" in plan
    srows = sorted(tuple(r) for r in out.collect())
    print(f"spark rows: {len(srows)}  tiled_path: {tiled}")

    con = duckdb.connect()
    p = f"{sf_dir}/embeddings.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    orows = con.execute(
        f"""
        WITH e AS (SELECT * FROM '{p}' WHERE vec_id % {stride} = 0)
        SELECT a.vec_id AS a, b.vec_id AS b,
               CAST(floor(list_cosine_similarity(
                      CAST(a.embedding AS DOUBLE[]),
                      CAST(b.embedding AS DOUBLE[])) * 1e4 + 0.5) AS BIGINT)
                 AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
        ORDER BY a, b
        """
    ).fetchall()
    orows = sorted(tuple(r) for r in orows)
    print(f"oracle rows: {len(orows)}")
    if srows == orows:
        print("MATCH: bit-identical pair sets and micro-unit cosines")
    else:
        diff = set(srows) ^ set(orows)
        print(f"MISMATCH: {len(diff)} differing rows; sample: {list(diff)[:5]}")
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
