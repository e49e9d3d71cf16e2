"""Executor-loss recovery: a task SIGKILLs its own executor JVM mid-stage
(the single-machine analog of spot-instance preemption / OOM-killed
executors — routine at 1000-executor scale) and the job must complete with
results identical to an undisturbed run, via task rescheduling on the
surviving/replacement executors.

Mechanics: subprocess local-cluster session (2 executor JVMs). Partition 0's
first attempt walks /proc from the python worker up through the pyspark
daemon to the executor JVM and SIGKILLs it (a one-shot flag file keeps
re-attempts clean). Spark standalone relaunches the executor; the lost
tasks re-run; the aggregate must match the clean run exactly. Complements
test_retry_safety.py (task-level failures) with process-level loss — this
also re-executes any OTHER tasks that were mid-flight on the killed JVM, so
it exercises multi-task recovery, not one task's retry.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

PROBE = textwrap.dedent(
    """
    import sys, time, os
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("executor-loss-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.task.maxFailures", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = spark.range(0, 80_000, 1, 8).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    FLAG = "/tmp/spark_graft_exec_killed.flag"
    try:
        os.remove(FLAG)
    except OSError:
        pass
    from pyspark import TaskContext

    def staged(murder):
        def gen(batches):
            ctx = TaskContext.get()
            if murder and ctx.partitionId() == 0 and not os.path.exists(FLAG):
                open(FLAG, "w").write("x")
                # python worker -> pyspark daemon -> executor JVM
                daemon = os.getppid()
                jvm = int(open(f"/proc/{daemon}/stat").read().split()[3])
                os.kill(jvm, 9)
                time.sleep(5)  # this worker dies with its executor
            yield from batches

        out = df.mapInPandas(gen, df.schema)
        return out.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")
        )

    clean = sorted(tuple(r) for r in staged(False).collect())
    hurt = sorted(tuple(r) for r in staged(True).collect())
    assert os.path.exists(FLAG), "kill never ran"
    assert hurt == clean, "post-executor-loss result diverged"
    print(f"EXECUTOR-LOSS-OK groups={len(hurt)}")
    """
)


def test_job_recovers_from_executor_sigkill_with_identical_results():
    r = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "EXECUTOR-LOSS-OK" in r.stdout
    # evidence the failure path actually fired: the scheduler saw the loss
    assert "Lost executor" in r.stderr, r.stderr[-3000:]
