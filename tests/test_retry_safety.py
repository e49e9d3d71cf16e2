"""Task-retry safety: operator results must be identical when tasks fail
and re-execute — on a 1000-executor cluster task retries are routine
(preemption, spot loss, OOM kills), so any operator whose output depends on
attempt-local state (RNG seeded per attempt, accumulated side effects,
attempt-dependent ordering) silently corrupts results at scale.

Mechanics: a separate SparkSession with master ``local[4,4]`` (maxFailures=4
— local[K] defaults to fail-fast) runs each probe twice over the documents
table: once clean, once with a flaky pass-through stage injected that makes
EVERY task of that stage fail its first attempt (TaskContext.attemptNumber
== 0). The two results must hash identically. Runs in a subprocess because
task-failure tolerance is a static master-URL property of the JVM-singleton
session the other tests share.

Probes chosen for attempt-sensitive machinery: content-hash sampling,
dense-id assignment (range exchange + per-partition offsets), MinHash
signatures, and the DSIR Gumbel draw (hash-derived noise — a
``rand()``-based draw would fail exactly this test).
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

PROBE = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4,4]")
        .appName("retry-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from fries_flink_spark.session import ensure_confs
    ensure_confs(spark)
    from fries_flink_spark.catalog import load_table

    def flaky_once(df):
        # identity mapInPandas stage whose tasks all fail attempt 0
        from pyspark import TaskContext

        schema = df.schema

        def gen(batches):
            ctx = TaskContext.get()
            if ctx is not None and ctx.attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            yield from batches

        return df.mapInPandas(gen, schema)

    def fingerprint(df):
        # order-independent content hash of the full result
        cols = [F.col(c).cast("string") for c in sorted(df.columns)]
        h = df.select(F.md5(F.concat_ws("|", *cols)).alias("h"))
        return h.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")).alias("s"),
        ).first()

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def probes(d):
        from fries_flink_spark.dedup.minhash import minhash_table
        from fries_flink_spark.pipeline.dsir import (
            bucket_counts, bucket_log_ratio, doc_importance, hashed_grams,
            gumbel_topk,
        )
        from fries_flink_spark.pipeline.ids import assign_consecutive_ids
        from fries_flink_spark.pipeline.sampling import sample_bernoulli

        out = {}
        out["sample"] = fingerprint(sample_bernoulli(d, "doc_id", 0.3))
        out["ids"] = fingerprint(assign_consecutive_ids(d.select("doc_id"), "doc_id"))
        out["minhash"] = fingerprint(minhash_table(d, "text", "doc_id"))
        grams = hashed_grams(d, "text", "doc_id")
        lr = bucket_log_ratio(
            bucket_counts(grams.join(
                d.select("doc_id", (F.col("source") == "src0").alias("t")), "doc_id"
            ).filter("t")),
            bucket_counts(grams),
            1000, 5000,
        )
        w = doc_importance(d, "text", "doc_id", lr)
        out["gumbel"] = fingerprint(gumbel_topk(w, "doc_id", 25))
        return out

    clean = probes(docs)
    flaky = probes(flaky_once(docs))
    for k in clean:
        assert clean[k] == flaky[k], (k, clean[k], flaky[k])
        print("RETRY-OK", k, tuple(clean[k]))
    print("ALL-OK")
    """
)


def test_operators_deterministic_under_task_retries():
    r = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "ALL-OK" in r.stdout
    assert r.stdout.count("RETRY-OK") == 4
