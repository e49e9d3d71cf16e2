"""Similarity-search queries over the embeddings table (LLM-pipeline ops).

The query vector is embeddings[vec_id=0] — fetched inside the query builder so
both engines use identical literals. Brute-force top-k is oracled exactly;
the LSH and IVF variants are approximate by design, so they're registered as
rows-only checks and pytest-verified for recall against brute force.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import micro, query
from ..similarity.ann import cosine_lit, cosine_topk, ivf_topk, lsh_bucket_topk, _as_double
from . import golden as _golden


_QV_CACHE: dict[str, list[float]] = {}


def _query_vec(spark, sf_dir):
    # memoized per sf_dir: the query vector is fixture DATA (deterministic per
    # sf), and the .first() lookup is otherwise one extra Spark job on every
    # plan build
    qv = _QV_CACHE.get(sf_dir)
    if qv is None:
        emb = load_table(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        _QV_CACHE[sf_dir] = qv
    return qv


@query(
    "sim_topk_bruteforce",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(floor(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS DOUBLE)
                * 1e4 + 0.5) AS BIGINT) AS cos
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_bruteforce(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id 0 (brute force baseline)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    out = cosine_topk(emb, "embedding", "vec_id", qv, k=10)
    return out.select("vec_id", micro(F.col("cos"), 4).alias("cos"))


@query(
    "sim_range_search",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(floor(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS DOUBLE)
                * 1e4 + 0.5) AS BIGINT) AS cos
    FROM embeddings e, q
    WHERE e.vec_id <> 0 AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) >= 0.15
    ORDER BY e.vec_id
    """,
)
def sim_range_search(spark, sf_dir):
    """Range (threshold) similarity search: all vectors with cos >= 0.15."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    return (
        emb.select(
            "vec_id", cosine_lit(F.col("embedding"), qv).alias("__cos")
        )
        .filter(F.col("__cos") >= 0.15)
        .select("vec_id", micro(F.col("__cos"), 4).alias("cos"))
        .orderBy("vec_id")
    )


# The SRP hyperplanes are deterministic (md5-seeded, similarity/ann.
# _hyperplanes), so the LSH query is exactly reproducible: the same plane
# constants are embedded into the oracle as SQL literals and DuckDB recomputes
# buckets + the Hamming<=1 probe in SQL (bit_count(xor(...))).
def _bucket_sql_expr() -> str:
    from ..similarity.ann import _hyperplanes

    terms = []
    for p, plane in enumerate(_hyperplanes(64, 8, 42)):
        lits = ", ".join(repr(v) for v in plane)
        terms.append(
            "(CASE WHEN list_dot_product("
            "list_transform(embedding, x -> CAST(x AS DOUBLE)), "
            f"[{lits}]) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return "\n         + ".join(terms)


@query(
    "sim_topk_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
         {_bucket_sql_expr()} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS qv, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT e.vec_id,
           CAST(floor(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) AS DOUBLE)
                * 1e4 + 0.5) AS BIGINT)
             AS cos
    FROM b e, q
    WHERE e.vec_id <> 0 AND bit_count(xor(e.bucket, q.qb)) <= 1
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qv AS DOUBLE[])) DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_lsh(spark, sf_dir):
    """SRP-LSH bucketed approximate top-10 (similarity/ann.lsh_bucket_topk) —
    the 100 TB path: bucket column doubles as a partition key. Exactly
    oracled: both engines derive identical buckets from the deterministic
    hyperplanes and probe the same Hamming<=1 neighborhood."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    out = lsh_bucket_topk(emb, "embedding", "vec_id", qv, k=10)
    return out.select("vec_id", micro(F.col("cos"), 4).alias("cos"))


@query(
    "sim_topk_ivf",
    # Value-level oracle via a golden parquet: an independent numpy replay of
    # the deterministic IVF pipeline (queries/golden.py). The cosine is a
    # sequential fold replayed bit-identically; emitted as integer
    # micro-units so no float formatting/rounding mode is involved.
    oracle=f"""
    SELECT vec_id, cos4
    FROM read_parquet('{_golden.golden_path("sim_topk_ivf", _golden.DRIVER_SF_DIR)}')
    ORDER BY cos4 DESC, vec_id
    """,
)
def sim_topk_ivf(spark, sf_dir):
    """IVF-style two-stage approximate top-10 (similarity/ann.ivf_topk),
    oracled against an independent numpy replay of the same deterministic
    algorithm (first-n k-means seeds, spherical assignment); see
    sim_ivf_recall for the quality band vs exact brute force."""
    _golden.ensure_sim_topk_ivf(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    out = ivf_topk(emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", qv, k=10)
    return out.select(
        "vec_id",
        F.floor(F.col("cos") * F.lit(1e4) + F.lit(0.5)).cast("bigint").alias("cos4"),
    )


@query(
    "sim_ivf_recall",
    oracle="SELECT CAST(10 AS BIGINT) AS k, true AS recall_ok",
)
def sim_ivf_recall(spark, sf_dir):
    """Driver-visible quality band for the IVF path (the agg_approx_distinct
    pattern): recall of IVF top-10 vs exact brute-force top-10 must reach
    0.5. The index is SIZED TO THE CORPUS the way a real deployment sizes
    IVF — cells ~ sqrt(n)/3 (floor 16), probing a quarter of them (floor 4):
    fixed 16/4 is exactly right at the base fixtures (<= 2k vectors, where
    the rule floors to 16/4, keeping those runs bit-identical) but at the
    10x dir (20k vectors, 10 permuted-replica manifolds) 16 cells cannot
    resolve the structure and recall legitimately collapses — a quality
    band calibrated at one scale must carry its sizing rule to survive the
    next decade. The sketch is engine-specific, the band is not."""
    import math

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    n = emb.count()
    cells = max(16, int(math.sqrt(n) / 3))
    ivf = ivf_topk(
        emb, "embedding", "vec_id", qv, k=10,
        n_centroids=cells, nprobe=max(4, cells // 4),
    ).select("vec_id")
    brute = cosine_topk(emb, "embedding", "vec_id", qv, k=10).select("vec_id")
    hits = ivf.join(brute, "vec_id").count()
    return spark.createDataFrame([(10, hits >= 5)], "k long, recall_ok boolean")


@query(
    "sim_label_centroids",
    oracle="""
    SELECT label,
           count(*) AS n,
           CAST(floor(avg(list_aggregate(embedding, 'sum')) * 1e4 + 0.5) AS BIGINT)
             AS avg_component_sum
    FROM embeddings GROUP BY label
    """,
)
def sim_label_centroids(spark, sf_dir):
    """Per-label aggregate over the vector column (array agg pushes through
    the JVM higher-order sum — no Python)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp_sum = F.aggregate(
        _as_double(F.col("embedding")), F.lit(0.0), lambda s, x: s + x
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        micro(F.avg(comp_sum), 4).alias("avg_component_sum"),
    )


@query(
    "pq_codes",
    # Golden-parquet oracle: independent numpy replay of the deterministic PQ
    # train+encode (queries/golden.ensure_pq_codes). Codes are integers —
    # no float formatting in the compare; see similarity/pq.py determinism
    # contract.
    oracle=f"""
    SELECT vec_id, codes_str
    FROM read_parquet('{_golden.golden_path("pq_codes", _golden.DRIVER_SF_DIR)}')
    ORDER BY vec_id
    """,
)
def pq_codes(spark, sf_dir):
    """Product-quantization codes (similarity/pq.py): 64-dim vectors -> 8
    subspaces x 16-centroid codebooks trained with two Lloyd iterations
    (one mapInPandas assignment pass + tiny mean aggregate each), encoded by
    a single vectorized pandas_udf. Emitted dash-joined so the compare is
    representation-proof."""
    from ..similarity.pq import pq_encode, pq_train

    _golden.ensure_pq_codes(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, "embedding", "vec_id", dim=64, m=8, ksub=16, n_iter=2)
    codes = pq_encode(emb, "embedding", "vec_id", books)
    return codes.select(
        "vec_id", F.array_join(F.col("codes"), "-").alias("codes_str")
    ).orderBy("vec_id")


@query(
    "pq_adc_recall",
    oracle="SELECT CAST(10 AS BIGINT) AS k, true AS recall_ok",
)
def pq_adc_recall(spark, sf_dir):
    """Quality band for the PQ search pipeline (the sim_ivf_recall pattern):
    L2-normalize -> PQ(16x32) encode -> ADC shortlist(50) -> exact rerank;
    top-10 must recover >= 7 of the exact cosine top-10 (observed: 10/10).
    The compressed-domain score is engine-specific; the band is not."""
    import math

    from ..similarity.pq import l2_normalize, pq_encode, pq_shortlist_rerank, pq_train

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = _query_vec(spark, sf_dir)
    qn = math.sqrt(sum(x * x for x in qv))
    qvn = [x / qn for x in qv]
    nemb = l2_normalize(emb, "embedding", "vec_id")
    books = pq_train(nemb, "embedding", "vec_id", dim=64, m=16, ksub=32, n_iter=2)
    codes = pq_encode(nemb, "embedding", "vec_id", books)
    # Shortlist sized to the corpus (~n/40, floor 50 — identical to the old
    # fixed 50 at every base fixture <= 2k): a constant shortlist dilutes to
    # nothing as n grows and the recall band would fail at the 10x dir for
    # sizing, not engine, reasons.
    n = emb.count()
    reranked = pq_shortlist_rerank(
        emb, codes, "embedding", "vec_id", books, qvn, k=10,
        shortlist=max(50, n // 40),
    ).select("vec_id")
    brute = cosine_topk(emb, "embedding", "vec_id", qv, k=10).select("vec_id")
    hits = reranked.join(brute, "vec_id").count()
    return spark.createDataFrame([(10, hits >= 7)], "k long, recall_ok boolean")
