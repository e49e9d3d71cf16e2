"""State-store provider probe: HDFS-backed (default) vs RocksDB for the two
GroupState pipelines (stream_event_sorted, stream_topn).

Round-8 finding: per-batch state commit cost is proportional to the state
PARTITION count (each partition pays a delta-file write + fsync per batch),
which is why bench.py sizes spark.sql.shuffle.partitions to the pipelines'
key parallelism (8). RocksDB changes the commit constant (changelog/SST
instead of whole-snapshot delta files) — this probe measures by how much,
across providers x partition counts x input scale.

Usage:
    python tools/rocksdb_probe.py [sf_dir ...]
        (default: /root/testdata/sf0.01 /root/testdata/sf0.1)

Prints one row per (sf, provider, partitions): medians of 3 for each
pipeline. The dedup-ingest row is stateless-foreachBatch and is reported
only as a control (the provider must not matter there).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CACHE_TABLES", "1")

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
}


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    import bench
    from fries_flink_spark.session import get_spark

    spark = get_spark(
        app_name="rocksdb-probe", cpus=bench.CPUS, shuffle_partitions=bench.CPUS
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    key = "spark.sql.streaming.stateStore.providerClass"
    rows = []
    for sf_dir in sf_dirs:
        bench.SF_DIR = sf_dir
        for pname, pclass in PROVIDERS.items():
            spark.conf.set(key, pclass)
            for parts in (8, 32):
                out, _ = bench.run_streaming_benches(
                    spark, repeats=3, state_partitions=parts
                )
                rows.append((sf_dir, pname, parts, out))
                print(
                    f"PROBE sf={os.path.basename(sf_dir):8s} {pname:8s} "
                    f"parts={parts:2d}  "
                    + "  ".join(f"{k}={v:.2f}s" for k, v in sorted(out.items()))
                )
    print("\n==== summary ====")
    for sf_dir, pname, parts, out in rows:
        print(
            f"{os.path.basename(sf_dir):8s} {pname:8s} parts={parts:2d}  "
            + "  ".join(f"{k}={v:.2f}s" for k, v in sorted(out.items()))
        )
    spark.stop()


if __name__ == "__main__":
    main()
