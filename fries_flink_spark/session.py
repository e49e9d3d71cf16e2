"""SparkSession construction tuned for the engine.

The reference (Fries-Flink = Apache Flink 1.13 + the Fries controller) sets up a
``StreamExecutionEnvironment`` / ``TableEnvironment``
(reference: flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/
TableEnvironment.java); in Spark the analog is one well-configured SparkSession.

Config choices and why (scale rationale — these matter at 100 TB, not just local):

- ``spark.sql.adaptive.enabled`` + coalesce/skew-join: AQE re-plans at runtime
  using real shuffle statistics (replaces Flink's static CBO stats provider,
  reference: flink-end-to-end-tests/flink-tpcds-test/.../TpcdsStatsProvider.java).
- ``spark.sql.shuffle.partitions``: sized to cores locally; on a real cluster AQE
  coalescing makes a high initial value safe.
- ``spark.sql.session.timeZone=UTC``: parquet / DuckDB oracle comparisons must be
  timezone-stable.
- ``spark.sql.legacy.parquet.nanosAsLong``: the events table carries
  TIMESTAMP(NANOS) which Spark's reader otherwise rejects; the catalog converts
  the long to a microsecond timestamp column (see catalog.load_table).
- Arrow enabled: every Pandas-UDF operator (dedup, similarity, stateful
  streaming) rides the Arrow batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Dynamic (runtime-settable) SQL confs that our operators rely on. Applied both
# at build time and defensively to externally-provided sessions (the correctness
# driver owns its own SparkSession).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Coalesce to the advisory size instead of defending initial parallelism:
    # post-shuffle stages get data-proportional task counts, which removes
    # 20-30% of wall on small-shuffle queries (A/B in PERF.md §11) and is the
    # right policy at 100 TB too — a 1 GB shuffle still fans out to ~32 tasks
    # at 32 MB advisory, while KB-sized shuffles stop paying 32 task launches.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python-boundary batch sizing (guide §4.2): the 10k-row
    # maxRecordsPerBatch cap alone would let a corpus with MB-scale
    # documents build multi-GB Arrow batches at the multimodal / media /
    # MATCH_RECOGNIZE boundaries and OOM the Python workers at 100 TB
    # scale. Spark 4's bytes-based cap bounds worker memory directly and
    # wins whenever it is the tighter limit; pinned EXPLICITLY to the
    # engine default (64 MiB) so the production contract is documented and
    # stable across Spark upgrades rather than inherited silently. Rows
    # narrower than ~6.4 KB still batch by the 10k-row cap, so bench-SF
    # behavior is unchanged (verified: mm pipelines at the 10x dir within
    # noise before/after pinning).
    "spark.sql.execution.arrow.maxBytesPerBatch": str(64 * 1024 * 1024),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


STATE_STORE_PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
}


def resolve_state_provider(sf_dir: str) -> str:
    """Pick the streaming state-store provider class for a fixture dir.

    ``SPARK_GRAFT_STATE_PROVIDER``: ``hdfs`` | ``rocksdb`` | ``auto``
    (default). Auto chooses RocksDB at the scaled fixture dirs (sf1-scale
    and up): tools/rocksdb_probe.py (PERF §58) measured RocksDB + 8 state
    partitions as the best cell on all three streaming pipelines there —
    its changelog commit replaces HDFSBacked's whole-snapshot delta write,
    which starts to matter once per-batch state deltas are MBs. At bench
    SFs the providers are noise apart, so HDFSBacked stays the default for
    row-series comparability. Set the result as
    ``spark.sql.streaming.stateStore.providerClass`` BEFORE starting the
    streaming query (the provider is fixed per query at start)."""
    mode = os.environ.get("SPARK_GRAFT_STATE_PROVIDER", "auto").lower()
    if mode in STATE_STORE_PROVIDERS:
        return STATE_STORE_PROVIDERS[mode]
    scaled = "spark_graft_scale" in sf_dir
    return STATE_STORE_PROVIDERS["rocksdb" if scaled else "hdfs"]


def _mem_gb(mem: str) -> int:
    """Parse a JVM memory string ('48g', '8192m') to whole GiB (floor, min 1)."""
    m = mem.strip().lower()
    try:
        if m.endswith("g"):
            return max(1, int(float(m[:-1])))
        if m.endswith("m"):
            return max(1, int(float(m[:-1])) // 1024)
        if m.endswith("k"):
            return 1
        return max(1, int(float(m)) // (1024**3))
    except ValueError:
        return 8


def get_spark(
    app_name: str = "fries-flink-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or get) the tuned local SparkSession."""
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    # SPARK_GRAFT_MASTER overrides the master URL — used by the robustness
    # sweep to run the full query registry under ``local-cluster[N,C,M]``
    # (separate executor JVMs + python workers), which exercises closure
    # serialization, broadcast transfer and Arrow batch shipping that the
    # in-process local[K] mode cannot.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.master(master)
    )
    if master.startswith("local-cluster"):
        # Separate executor JVMs spawn their own Python workers, which need
        # this package importable (cloudpickle serializes module-level
        # functions BY REFERENCE). On a real cluster this is the job's
        # wheel/--py-files; for the local-cluster probe, executorEnv is the
        # equivalent. Without it every pickle-by-reference query dies
        # executor-side with ModuleNotFoundError.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        existing = os.environ.get("PYTHONPATH", "")
        b = b.config(
            "spark.executorEnv.PYTHONPATH",
            f"{repo_root}:{existing}" if existing else repo_root,
        )
    b = (
        b
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        # The driver contract COLLECTS full query results for the oracle
        # compare; at scaled fixture dirs a pair-emitting dedup query can
        # return >1 GiB, which the 1g default silently caps. Collect buffers
        # live inside the driver heap, so the cap is derived from it:
        # heap/4 capped at 8g (8g at the default SPARK_GRAFT_DRIVER_MEM=48g;
        # a smaller SPARK_GRAFT_DRIVER_MEM shrinks the cap proportionally so
        # an oversized collect fails cleanly at the cap instead of OOMing
        # the driver JVM).
        .config(
            "spark.driver.maxResultSize",
            f"{max(1, min(8, _mem_gb(driver_memory) // 4))}g",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Long benchmark/driver sessions compile hundreds of WholeStageCodegen
        # methods; the JVM default 240m code cache fills and C2 silently stops
        # compiling (observed: md5-heavy queries 1.0s solo -> 4s late in a
        # 47-query sweep). Irrelevant on a real cluster where executors are
        # per-job, but required for a faithful local bench.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        # Spark's generated-class cache defaults to 100 entries, and a single
        # plan-heavy query can exceed that alone (tpcds_q14 emits ~250 codegen
        # units), so every re-run LRU-thrashes: 100% janino+JIT recompilation,
        # measured 224 recompiles/run and 2-3x wall inflation late in a bench
        # sweep. Static conf — applies at session creation only. On a real
        # cluster the same thrash would tax every executor's first task waves,
        # so the raised bound is the production setting too.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
    )
    # SPARK_GRAFT_SHUFFLE_CODEC (e.g. "zstd"): shuffle/spill block codec —
    # static conf, so env-gated at build. zstd trades ~10% CPU for a
    # 1.5-2x better spill ratio than the lz4 default; the single-box decade
    # gate sets it when a shape's shuffle spill exceeds the local disk
    # (tpcds_q14b at the 1000x dir), and it's the same knob a real
    # cluster turns for shuffle-heavy jobs whose scratch disks are tight.
    codec = os.environ.get("SPARK_GRAFT_SHUFFLE_CODEC", "")
    if codec:
        b = b.config("spark.io.compression.codec", codec)
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_parallelism(df):
    """Repartition ``df`` to the session default parallelism ONLY if its
    current plan has fewer partitions — the guard CPU-bound per-row operators
    (minhash/simhash folds) apply to their input. A small-SF parquet is a
    single split and a cached fixture may hold few partitions; either would
    pin the whole fold to one task. When the input is already parallel (any
    cluster-scale scan), this is a no-op — no exchange is added."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Apply the dynamic confs our operators need to an existing session.

    Safe to call repeatedly; used on driver-owned sessions before running
    queries (e.g. the correctness harness builds its own SparkSession).
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — best effort
    return spark
