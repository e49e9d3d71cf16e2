"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Runs every registered query at sf0.01 via Spark AND its oracle SQL via DuckDB,
then compares row count, sorted column names, and order-insensitive
canonicalized value hashes. Usage:

    python tools/check_correctness.py [name_filter ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


STRICT = os.environ.get("SPARK_GRAFT_STRICT", "") == "1"


def canon(v):
    """Canonicalize a value for hashing.

    Default mode rounds floats to 6 significant digits (lenient). STRICT mode
    (SPARK_GRAFT_STRICT=1) uses full-precision repr — bit-identical doubles
    required — which over-approximates whatever canonicalization the driver
    uses, so strict-green queries are safe under any float stringification.
    """
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            return repr(v)
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    name_filter = sys.argv[1:]
    excludes = [
        e for e in os.environ.get("SPARK_GRAFT_EXCLUDE", "").split(",") if e
    ]
    # The CBO substrate (CTAS + ANALYZE FOR ALL COLUMNS, queries/tpcds.py)
    # is measured 1.46x better aggregate on the join-heavy TPC-DS ports at
    # the 10x dir (PERF §57) but costs a ~60s warmup — which amortizes over
    # a full-registry sweep and not over a targeted run. Full sweeps (no
    # name filter) therefore default it ON; SPARK_GRAFT_CBO=0 opts out,
    # filtered runs keep the plain temp-view substrate.
    if not name_filter and os.environ.get("SPARK_GRAFT_CBO", "") == "":
        os.environ["SPARK_GRAFT_CBO"] = "1"
        print("CBO substrate ON (full-sweep default; SPARK_GRAFT_CBO=0 disables)")
    from fries_flink_spark.registry import load_all
    from fries_flink_spark.session import get_spark

    registry = load_all()

    # Golden-file oracles are registered with the driver's sf0.01 paths; when
    # this harness runs at a different sf, regenerate for THIS sf and repoint.
    from fries_flink_spark.queries import golden as _golden

    if os.path.normpath(SF_DIR) != os.path.normpath(_golden.DRIVER_SF_DIR):
        for gname, ensure in (
            ("mm_image_features", _golden.ensure_mm_image_features),
            ("sim_topk_ivf", _golden.ensure_sim_topk_ivf),
            ("pq_codes", _golden.ensure_pq_codes),
            ("mm_video_frames", _golden.ensure_mm_video_frames),
            ("mm_audio_features", _golden.ensure_mm_audio_features),
            ("text_bpe_merges", _golden.ensure_bpe_merges),
            ("text_bpe_encode", _golden.ensure_bpe_encode),
            ("dedup_semantic", _golden.ensure_semantic_dedup),
            ("mm_video_scenecut", _golden.ensure_mm_video_scenecut),
            ("emb_pca_project", _golden.ensure_pca_project),
        ):
            if name_filter and not any(f in gname for f in name_filter):
                continue  # filtered out: don't pay its regeneration
            if any(e in gname for e in excludes):
                continue  # excluded: don't pay its regeneration
            spec = registry.get(gname)
            if spec is not None and spec.oracle:
                spec.oracle = spec.oracle.replace(
                    _golden.golden_path(gname, _golden.DRIVER_SF_DIR),
                    ensure(SF_DIR, force=True),
                )

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    # SPARK_GRAFT_DUCK_THREADS: cap the oracle's thread pool (DuckDB defaults
    # to every core) so concurrent harness runs don't oversubscribe the box.
    duck_threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS", "")
    if duck_threads:
        con.execute(f"SET threads={int(duck_threads)}")
    # SPARK_GRAFT_DUCK_MEM (e.g. "24GB"): cap the oracle's memory budget
    # (DuckDB defaults to 80% of RAM, which on one box CONCURRENT with a
    # large Spark heap is how the round-9 kernel OOMs happened; a capped
    # DuckDB spills to disk instead).
    duck_mem = os.environ.get("SPARK_GRAFT_DUCK_MEM", "")
    if duck_mem:
        con.execute(f"SET memory_limit='{duck_mem}'")
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files (the scaled
        # fixture dirs from tools/scale_probe.py); glob them for DuckDB.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # SPARK_GRAFT_MAT_SIGS=1: materialize the shared shingle + MinHash
    # signature CTEs ONCE as DuckDB temp tables and rewrite the dedup pair/
    # cluster oracles to read them. Pure CTE materialization — the rewritten
    # fragments are the exact f-string bodies the oracles embed, replaced
    # with equivalent scans (documents-subset filters preserved), so
    # semantics are identical by construction. Purpose: at scaled fixture
    # dirs (10x/100x) the signature recomputation (8 md5s per shingle, every
    # doc) is ~30 s per oracle x 6 oracles; this pays it once.
    if os.environ.get("SPARK_GRAFT_MAT_SIGS", "") == "1":
        from fries_flink_spark.queries.dedup_queries import _MH_COLS, _SH

        con.execute(f"CREATE TABLE __sh_mat AS SELECT doc_id, {_SH} AS s FROM documents")
        # Equivalent to SELECT doc_id, {_MH_COLS} FROM __sh_mat, restated as
        # an exploded vectorized GROUP BY: list_min(list_transform(s, x ->
        # substr(md5(x), k, 8))) == min(substr(md5(x), k, 8)) over the
        # unnested elements (both are lexicographic VARCHAR minima over the
        # same set). The list-lambda form computes md5 PER LANE (8x) and
        # holds 8 transformed lists per row in memory — at the 100x dir
        # (500k docs, ~145M shingles, 1.16B md5 calls) it ran >45 min and
        # ~30 GB RSS; this form computes each md5 once, streams, and
        # parallelizes across row groups.
        lanes = ", ".join(
            f"min(substr(h, {1 + 3 * i}, 8)) AS mh{i}" for i in range(8)
        )
        con.execute(
            f"""
            CREATE TABLE __sig_mat AS
            SELECT doc_id, {lanes}
            FROM (SELECT doc_id, md5(unnest(s)) AS h FROM __sh_mat)
            GROUP BY doc_id
            """
        )
        rewrites = [
            (
                f"SELECT doc_id, {_SH} AS s FROM documents",
                "SELECT doc_id, s FROM __sh_mat",
            ),
            (
                f"SELECT doc_id, {_SH} AS s FROM corpus",
                "SELECT doc_id, s FROM __sh_mat WHERE doc_id % 10 < 8",
            ),
            (
                f"SELECT doc_id, {_SH} AS s FROM batch",
                "SELECT doc_id, s FROM __sh_mat WHERE doc_id % 10 >= 8",
            ),
            (
                f"SELECT doc_id,\n           {_MH_COLS}\n      FROM sh",
                "SELECT * FROM __sig_mat",
            ),
            (
                f"SELECT doc_id, {_MH_COLS} FROM csh",
                "SELECT * FROM __sig_mat WHERE doc_id % 10 < 8",
            ),
            (
                f"SELECT doc_id, {_MH_COLS} FROM bsh",
                "SELECT * FROM __sig_mat WHERE doc_id % 10 >= 8",
            ),
        ]
        # The connected-components oracles use a transitive-closure recursive
        # CTE (reach = every (node, reachable-label) pair): O(sum of
        # component-size^2) rows — 22.6M at sf0.1's one 4,752-doc component,
        # ~226M at 10x, which DuckDB 1.0 (no keyed recursion) cannot finish.
        # In scale mode the components come from an INDEPENDENT union-find
        # (plain Python) over the DuckDB-computed candidate pairs; cluster_id
        # = min doc_id per component, the same definition the CTE encodes.
        # The registered sf0.01 oracles the driver runs are unchanged.
        from fries_flink_spark.queries.dedup_queries import _CAND_CTES

        con.execute(
            """
            CREATE TABLE __cand AS
            WITH bands AS (
              SELECT doc_id, b.band,
                     CASE b.band
                       WHEN 0 THEN md5(mh0 || '|' || mh1)
                       WHEN 1 THEN md5(mh2 || '|' || mh3)
                       WHEN 2 THEN md5(mh4 || '|' || mh5)
                       ELSE        md5(mh6 || '|' || mh7)
                     END AS key
              FROM __sig_mat, (SELECT unnest(generate_series(0, 3)) AS band) b)
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
                                     AND x.doc_id < y.doc_id
            """
        )
        parent: dict = {}

        def _find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in con.execute("SELECT a, b FROM __cand").fetchall():
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = _find(a), _find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        cc_rows = [(n, _find(n)) for n in parent]
        con.execute("CREATE TABLE __cc_mat (node BIGINT, cluster_id BIGINT)")
        if cc_rows:
            con.executemany("INSERT INTO __cc_mat VALUES (?, ?)", cc_rows)
        tail = _CAND_CTES[_CAND_CTES.index("    edges AS") :]
        rewrites.append(
            (tail, "    cc AS (SELECT node, cluster_id FROM __cc_mat)\n")
        )
        for spec in registry.values():
            if spec.oracle:
                for old, new in rewrites:
                    spec.oracle = spec.oracle.replace(old, new)

    # SPARK_GRAFT_DECOMP_ORACLE=1: swap the q17/q25/q29 oracles for their
    # algebraically-decomposed forms (queries/tpcds.py DECOMP_ORACLES): the
    # direct 3-fact fan-out plan materializes >160 GB in DuckDB at the 100x
    # dir and exhausts a single box's disk; the decomposed form pre-
    # aggregates both join sides per item so the fan-out never exists. The
    # Spark side is untouched; the registered sf0.01 oracles the driver
    # runs are unchanged.
    if os.environ.get("SPARK_GRAFT_DECOMP_ORACLE", "") == "1":
        from fries_flink_spark.queries.tpcds import DECOMP_ORACLES

        for dname, dsql in DECOMP_ORACLES.items():
            if dname in registry:
                registry[dname].oracle = dsql
        print(f"decomposed scale oracles active: {sorted(DECOMP_ORACLES)}")

    # SPARK_GRAFT_ORACLE_NOMAT=1: drop the MATERIALIZED hint from the
    # TPC-DS oracles' ds_base CTE. The hint is right at every bench SF and
    # at 10x/100x (each query references the channel views 2-6 times), but
    # at the 1000x dir the materialization IS the disk wall: 600M rows x 15
    # cols of CTE spill (>46 GB measured on tpcds_q14b) on top of DuckDB's
    # hash memory. Inlined, DuckDB recomputes the lineitem-orders join per
    # reference — pure streaming hash joins, no materialized spill — trading
    # CPU for the disk the box doesn't have. Semantics identical (the hint
    # is an evaluation strategy, not a query change).
    if os.environ.get("SPARK_GRAFT_ORACLE_NOMAT", "") == "1":
        for spec in registry.values():
            if spec.oracle:
                spec.oracle = spec.oracle.replace(
                    "ds_base AS MATERIALIZED (", "ds_base AS ("
                )
        print("oracle ds_base materialization OFF (SPARK_GRAFT_ORACLE_NOMAT)")

    # SPARK_GRAFT_EXCLUDE (parsed above): comma-separated substrings to SKIP
    # (e.g. the BPE goldens on scaled dirs, whose regeneration is a
    # driver-side Python training loop).
    # SPARK_GRAFT_SKIP_PASSED: path to a prior run's log; every exact query
    # name on a "PASS  <name>:" line there is skipped, so an interrupted
    # sweep (OOM-killed JVM, machine loss) resumes where it stopped.
    # Staleness guard (ADVICE r9): every run prints its git HEAD; a resume
    # refuses when the skip-log's recorded HEAD differs from the current
    # tree's (the prior passes would silently certify stale code), unless
    # SPARK_GRAFT_RESUME_STALE=1 explicitly accepts that (e.g. the only
    # commits since were docs). Resumed queries are counted separately in
    # the summary so a resumed run's totals don't overstate what THIS run
    # verified.
    import subprocess as _sp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = _sp.run(
            ["git", "rev-parse", "HEAD"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
        dirty = _sp.run(
            ["git", "status", "--porcelain"],
            cwd=repo, capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        if head != "unknown" and dirty:
            head += "-dirty"  # uncommitted edits: never resumable as-is
    except Exception:
        head = "unknown"
    print(f"HEAD {head}")

    already_passed: set = set()
    skip_log = os.environ.get("SPARK_GRAFT_SKIP_PASSED", "")
    if skip_log and os.path.exists(skip_log):
        import re as _re

        with open(skip_log, errors="replace") as fh:
            content = fh.read().replace("\r", "\n")
        log_head = None
        for line in content.splitlines():
            # match every token this script itself writes: clean sha,
            # '<sha>-dirty', and 'unknown' (ADVICE r10: the bare-sha regex
            # misreported dirty/unknown-HEAD logs as 'records no HEAD')
            hm = _re.match(
                r"HEAD\s+([0-9a-f]{7,40}(?:-dirty)?|unknown)$", line.strip()
            )
            if hm:
                log_head = hm.group(1)
            m = _re.match(r"PASS\s+(\S+):", line.strip())
            if m:
                already_passed.add(m.group(1))
        if log_head is None:
            print(
                "resume WARNING: skip-log records no HEAD (pre-r10 log) — "
                "its passes may predate code changes"
            )
            if os.environ.get("SPARK_GRAFT_RESUME_STALE", "") != "1":
                print("refusing to resume (set SPARK_GRAFT_RESUME_STALE=1 to accept)")
                return 2
        elif log_head.endswith("-dirty") or log_head == "unknown":
            print(
                f"resume WARNING: skip-log HEAD is {log_head} — its passes "
                "were verified on an uncommitted (or unidentifiable) tree"
            )
            if os.environ.get("SPARK_GRAFT_RESUME_STALE", "") != "1":
                print("refusing to resume (set SPARK_GRAFT_RESUME_STALE=1 to accept)")
                return 2
        elif log_head != head and head != "unknown":
            print(
                f"resume WARNING: skip-log HEAD {log_head[:12]} != current "
                f"{head[:12]} — its passes were verified on different code"
            )
            if os.environ.get("SPARK_GRAFT_RESUME_STALE", "") != "1":
                print("refusing to resume (set SPARK_GRAFT_RESUME_STALE=1 to accept)")
                return 2
        print(f"resuming: {len(already_passed)} previously-passed queries skipped")

    n_pass = n_fail = n_nosql = n_resumed = 0
    for name, spec in sorted(registry.items()):
        if name_filter and not any(f in name for f in name_filter):
            continue
        if any(e in name for e in excludes):
            print(f"SKIP  {name} (SPARK_GRAFT_EXCLUDE)")
            continue
        if name in already_passed:
            n_resumed += 1
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"NOSQL {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_nosql += 1
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash spark={sh} oracle={oh}")
                # show a sample diff
                so = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                )
                oo = sorted(
                    "|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                )
                for a, b in zip(so, oo):
                    if a != b:
                        problems.append(f"first diff:\n  spark  {a}\n  oracle {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            n_pass += 1
    resumed = f" (+{n_resumed} resumed from prior log)" if n_resumed else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only{resumed}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
