"""Shape-scaling probe: replicate the sf0.1 fixtures Nx with deterministic
key offsets and time the heaviest registry shapes at 1x vs Nx.

Usage: python tools/scale_probe.py [factor] [query ...]
       (default: factor 100, the round-7 probe set)

Replication keeps the DISTRIBUTIONS that drive each plan linear in N:

- lineitem/orders: order keys offset per replica -> join fan-in and group
  cardinalities scale linearly, per-key density constant.
- events: user_id/event_id offset per replica -> per-key run structure (the
  MR/CEP state machines' unit of work) is IDENTICAL per replica.
- documents: doc_id offset AND a per-replica substitution cipher of the text
  -> every char shingle differs across replicas, so LSH bucket sizes stay
  ~1x-sized and candidate-pair volume grows linearly. Naive text replication
  would square the pair count - that would be a DATA pathology (100 exact
  copies of the corpus), not a shape property. The corpus alphabet is
  exactly [a-z ], so the cipher is (letter rotation r%25+1) composed with
  (swap space <-> letter[r//25]) - unique for 650 replicas; an earlier
  letters-only rotation cycled every 25 replicas, leaving 4 verbatim copies
  of every doc and a measured 6x superlinear candidate-pair blowup that was
  probe data, not engine behavior.
- embeddings: vec_id offset AND a per-replica SIGNED COORDINATE PERMUTATION
  of the vector (replica 0 = identity, so fixture lookups like the
  vec_id=0 query vector are unchanged). A signed permutation is an exact
  isometry with NO float arithmetic: within-replica cosines are preserved
  bit-for-bit (each replica contributes exactly the 1x near-dup pair
  structure), while cross-replica cosines decorrelate like a random
  rotation (~N(0, 1/dim)), so threshold-pair volume grows ~linearly in the
  factor. Naive copy would make every vector an exact f-way duplicate -
  a factor^2 pair blowup that is data pathology, not engine behavior.

The probe runs with the fixture cache OFF: the question is how the
production scan->shuffle path scales, not how fast a warmed cache is.
"""

from __future__ import annotations

import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_CACHE_TABLES"] = "0"

from pyspark.sql import functions as F

from fries_flink_spark.registry import load_all
from fries_flink_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PROBES = ["tpcds_q14", "dedup_minhash_lsh", "sql_mr_all_rows", "cep_branchy_any"]
SMALL_TABLES = ["region", "nation", "customer", "supplier", "part"]


def _doc_cipher(r: int) -> tuple[str, str]:
    """Replica-unique bijection over the corpus alphabet [a-z ]: rotate the
    letters by r%25+1, then swap space with letter (r//25)%26, then (for
    r >= 650 only — replicas below that keep their original mapping, so
    previously-built 10x/100x dirs are unchanged) transpose letter
    (r//650-1)%25 with 'z'. The (rotation, space-swap, z-transposition)
    triple is distinct for r < 650*26 = 16,900. The third factor exists
    because the 1000x build exhausted the 650-cipher space: replicas r and
    r+650 carried IDENTICAL text, which merged their LSH near-dup buckets
    and SQUARED candidate-pair volume (the exact data pathology the module
    docstring warns naive replication causes — it ENOSPC'd the local disk
    before the probe could even time the query)."""
    alpha = string.ascii_lowercase
    s = (r % 25) + 1
    rot = {c: alpha[(i + s) % 26] for i, c in enumerate(alpha)}
    swap_l = alpha[(r // 25) % 26]
    t = r // 650
    z_l = alpha[(t - 1) % 25] if t > 0 else None
    out = {}
    for c in alpha + " ":
        m = rot.get(c, c)  # space rotates to itself
        if m == swap_l:
            m = " "
        elif m == " ":
            m = swap_l
        if z_l is not None:  # extra transposition, applied after the swap
            if m == z_l:
                m = "z"
            elif m == "z":
                m = z_l
        out[c] = m
    src = alpha + " "
    return src, "".join(out[c] for c in src)


def build_scale_dir(spark, factor: int) -> str:
    out = f"/tmp/spark_graft_scale{factor}"
    os.makedirs(out, exist_ok=True)
    rep = spark.range(factor).withColumnRenamed("id", "__rep")

    def done(table: str) -> bool:
        return os.path.exists(os.path.join(out, f"_DONE_{table}"))

    def mark(table: str) -> None:
        # Post-write sanity: the replicated table must hold exactly
        # factor x the base row count. A same-session back-to-back build
        # once wrote an EMPTY (but _SUCCESS-marked) lineitem at 100x --
        # an assert here turns that silent corruption into a loud retry.
        base_n = spark.read.parquet(f"{BASE}/{table}.parquet").count()
        got_n = spark.read.parquet(f"{out}/{table}.parquet").count()
        if got_n != base_n * factor:
            raise RuntimeError(
                f"scale build corrupt: {table} at {factor}x has {got_n} rows, "
                f"expected {base_n * factor}"
            )
        open(os.path.join(out, f"_DONE_{table}"), "w").write("ok")

    if not done("lineitem"):
        li = spark.read.parquet(f"{BASE}/lineitem.parquet")
        ok_span = li.agg(F.max("l_orderkey")).first()[0] + 1
        li.crossJoin(rep).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__rep") * ok_span
        ).drop("__rep").write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
        mark("lineitem")

    if not done("orders"):
        li = spark.read.parquet(f"{BASE}/lineitem.parquet")
        ok_span = li.agg(F.max("l_orderkey")).first()[0] + 1
        o = spark.read.parquet(f"{BASE}/orders.parquet")
        ck_span = o.agg(F.max("o_custkey")).first()[0] + 1
        o.crossJoin(rep).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__rep") * ok_span
        ).withColumn(
            # customers replicate too so per-customer order counts stay 1x
            "o_custkey", F.col("o_custkey") + F.col("__rep") * ck_span
        ).drop("__rep").write.mode("overwrite").parquet(f"{out}/orders.parquet")
        mark("orders")

    if not done("events"):
        ev = spark.read.parquet(f"{BASE}/events.parquet")
        u_span = ev.agg(F.max("user_id")).first()[0] + 1
        e_span = ev.agg(F.max("event_id")).first()[0] + 1
        ev.crossJoin(rep).withColumn(
            "user_id", F.col("user_id") + F.col("__rep") * u_span
        ).withColumn(
            "event_id", F.col("event_id") + F.col("__rep") * e_span
        ).drop("__rep").write.mode("overwrite").parquet(f"{out}/events.parquet")
        mark("events")

    if not done("documents"):
        docs = spark.read.parquet(f"{BASE}/documents.parquet")
        d_span = docs.agg(F.max("doc_id")).first()[0] + 1
        shifted = docs.crossJoin(rep).withColumn(
            "doc_id", F.col("doc_id") + F.col("__rep") * d_span
        )
        cases = None
        for r in range(min(factor, 16900)):
            src, dst = _doc_cipher(r)
            expr = F.translate(F.col("text"), src, dst)
            cond = F.col("__rep") % 16900 == r
            cases = F.when(cond, expr) if cases is None else cases.when(cond, expr)
        shifted.withColumn("text", cases).drop("__rep").write.mode(
            "overwrite"
        ).parquet(f"{out}/documents.parquet")
        mark("documents")

    if not done("embeddings"):
        import numpy as np
        import pandas as pd

        emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
        v_span = emb.agg(F.max("vec_id")).first()[0] + 1
        dim = len(emb.select("embedding").first()[0])
        perms = np.empty((factor, dim), dtype="int64")
        signs = np.empty((factor, dim), dtype="float32")
        perms[0] = np.arange(dim)
        signs[0] = 1.0
        for r in range(1, factor):
            rng = np.random.default_rng(7000 + r)
            perms[r] = rng.permutation(dim)
            signs[r] = rng.integers(0, 2, dim).astype("float32") * 2 - 1

        def rotate(batches):
            for b in batches:
                reps = (b["vec_id"].to_numpy() // v_span).astype("int64")
                x = np.stack(b["embedding"].to_numpy()).astype("float32")
                out = np.empty_like(x)
                for r in np.unique(reps):
                    m = reps == r
                    out[m] = x[m][:, perms[r]] * signs[r]
                yield pd.DataFrame(
                    {
                        "vec_id": b["vec_id"],
                        "embedding": list(out),
                        "label": b["label"],
                    }
                )

        (
            emb.crossJoin(rep)
            .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * v_span)
            .drop("__rep")
            .mapInPandas(
                rotate, schema="vec_id bigint, embedding array<float>, label int"
            )
            .write.mode("overwrite")
            .parquet(f"{out}/embeddings.parquet")
        )
        mark("embeddings")

    import shutil

    for t in SMALL_TABLES:
        src, dst = f"{BASE}/{t}.parquet", f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    names = sys.argv[2:] or PROBES
    reg = load_all()
    spark = get_spark(app_name=f"scale-probe-{factor}", cpus=32,
                      shuffle_partitions=32)
    t0 = time.time()
    sdir = build_scale_dir(spark, factor)
    print(f"scale dir {sdir} ready in {time.time()-t0:.0f}s", file=sys.stderr)
    for name in names:
        spec = reg[name]
        row = [name]
        for label, d in (("1x", BASE), (f"{factor}x", sdir)):
            spec.fn(spark, d).write.mode("overwrite").format("noop").save()
            ts = []
            for _ in range(2):
                t0 = time.time()
                spec.fn(spark, d).write.mode("overwrite").format("noop").save()
                ts.append(time.time() - t0)
            row.append(f"{min(ts):.2f}s")
        print(f"PROBE {row[0]:28s} 1x {row[1]:>8s}  {factor}x {row[2]:>8s}")
        # Release this probe's persisted frames and shuffle files before the
        # next one: q14's ds_base persist at 1000x is tens of GB of
        # MEMORY_AND_DISK blocks, and register_tpcds only unpersists on an
        # sf switch — carried into the LSH probe it ENOSPC'd the local disk
        # (a single-node artifact: per-probe working sets, not one probe's
        # footprint, exceeded /tmp). ContextCleaner deletes shuffle files
        # only when their stage objects are GC'd, hence the explicit gc.
        spark.catalog.clearCache()
        spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
