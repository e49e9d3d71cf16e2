"""Speculation-machinery probe: with spark.speculation on, a straggler task
must be detected and marked speculatable without perturbing results.

What this CAN and CANNOT prove on one machine: Spark refuses to schedule a
speculative attempt on the same HOST as the original
(``TaskSetManager.dequeueSpeculativeTask`` excludes the task's current
host), and every local-cluster executor reports ``localhost`` — so the
concurrent duplicate attempt itself is unschedulable here by design
(verified: the INFO log shows "Marking task 0 … as speculatable" and then
no 0.1 attempt). The attempt-independence property that makes a winning
duplicate safe — output depends only on (partition, data), never on attempt
identity — is exactly what tests/test_retry_safety.py proves with real
re-executed attempts. This probe pins the detection half on a real
straggler: the scheduler marks it, no spurious result corruption, and the
config surface (interval/multiplier/quantile/efficiency gate) stays wired.

Subprocess session: speculation confs and the local-cluster master are
static, and the shared test session must stay untouched.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

PROBE = textwrap.dedent(
    """
    import sys, time
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("speculation-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.2")
        .config("spark.speculation.quantile", "0.4")
        .config("spark.speculation.efficiency.enabled", "false")
        .getOrCreate()
    )
    # DEBUG, not INFO: the default log4j2 template only surfaces
    # TaskSetManager INFO lines once the root level is DEBUG (observed)
    spark.sparkContext.setLogLevel("DEBUG")

    df = spark.range(0, 80_000, 1, 8).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )

    def staged(sleepy):
        from pyspark import TaskContext

        def gen(batches):
            ctx = TaskContext.get()
            if (
                sleepy
                and ctx is not None
                and ctx.partitionId() == 0
                and ctx.attemptNumber() == 0
            ):
                time.sleep(5)
            yield from batches

        out = df.mapInPandas(gen, df.schema)
        return out.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
        )

    clean = sorted(tuple(r) for r in staged(False).collect())  # also warms workers
    spec = sorted(tuple(r) for r in staged(True).collect())
    assert spec == clean, "straggler run diverged"
    print(f"SPECULATION-PROBE-OK groups={len(spec)}")
    """
)


def test_straggler_marked_speculatable_and_results_unchanged():
    r = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "SPECULATION-PROBE-OK" in r.stdout
    # the scheduler must have detected the straggler (log goes to stderr)
    assert "as speculatable" in r.stderr, r.stderr[-3000:]
