"""Deduplication queries over documents (LLM-pipeline operators): exact,
MinHash signatures, MinHash+LSH candidates, n-gram Jaccard, SimHash,
embedding-cosine near-dup.

Oracles reproduce the md5-based signatures bit-for-bit in DuckDB, so these are
exact (not statistical) comparisons.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup.minhash import (
    N_PERMS,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_table,
    ngram_jaccard_lsh,
    simhash_table,
)
from ..portable import round_portable, round_portable_sql
from ..registry import micro, query, sorted_result

# Shared DuckDB fragments (k=8 char shingles, 8 md5 "permutations")
_SH = (
    "list_distinct(list_transform(generate_series(1, greatest(length(text)-7, 1)),"
    " i -> substr(text, i, 8)))"
)
_MH_COLS = ",\n           ".join(
    f"list_min(list_transform(s, x -> substr(md5(x), {1 + 3 * j}, 8))) AS mh{j}"
    for j in range(N_PERMS)
)


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


@query(
    "dedup_minhash_sig",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SH} AS s FROM documents)
    SELECT doc_id,
           {_MH_COLS}
    FROM sh ORDER BY doc_id
    """,
)
def dedup_minhash_sig(spark, sf_dir):
    """MinHash signatures (k=8 char shingles, 8 perms) — bit-identical to the
    DuckDB oracle because both sides minimize md5 hex strings."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_table(docs, "text", "doc_id").orderBy("doc_id")


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SH} AS s FROM documents),
    sig AS (
      SELECT doc_id,
           {_MH_COLS}
      FROM sh
    ),
    bands AS (
      SELECT doc_id, b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    )
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
    FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
                             AND x.doc_id < y.doc_id
    ORDER BY a, b
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs (4 bands × 2 rows). The banding join is the
    100 TB path: shuffle on band keys, no cross product."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_table(docs, "text", "doc_id")
    return lsh_candidate_pairs(sig, "doc_id").transform(sorted_result, "a", "b")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS (SELECT doc_id, {_SH} AS s FROM documents),
    sig AS (
      SELECT doc_id,
           {_MH_COLS}
      FROM sh
    ),
    bands AS (
      SELECT doc_id, b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
                               AND x.doc_id < y.doc_id
    )
    SELECT c.a, c.b,
           {round_portable_sql(
               'len(list_intersect(sa.s, sb.s)) * 1.0'
               ' / len(list_distinct(list_concat(sa.s, sb.s)))', 6)} AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.a
    JOIN sh sb ON sb.doc_id = c.b
    WHERE len(list_intersect(sa.s, sb.s)) * 1.0
          / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.2
    ORDER BY a, b
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """8-gram Jaccard verification of MinHash+LSH candidate pairs (threshold
    0.2) — the full two-stage near-dup pipeline. Candidates come from LSH
    banding (shuffle on band keys), so the expensive shingle-set intersection
    runs only on pairs that share a band, never on the O(n²) cross product:
    the all-pairs formulation stops being runnable around 10⁴ docs, this one
    scales with the (bounded) candidate count. The fused form explodes and
    md5-hashes the corpus ONCE and derives both the signatures and the
    verifier's join keys from that pass (dedup/minhash.ngram_jaccard_lsh)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_lsh(docs, "text", "doc_id", k=8, threshold=0.2)
    return pairs.select(
        "a", "b", round_portable(F.col("jaccard"), 6).alias("jaccard")
    ).orderBy("a", "b")


_SIMHASH_BIT = (
    "CASE WHEN list_sum(list_transform(h, x -> CASE WHEN "
    "substr(x, {p}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) > 0 "
    "THEN {v} ELSE 0 END"
)
_SIMHASH_SUM = " + ".join(
    _SIMHASH_BIT.format(p=j + 1, v=1 << j) for j in range(16)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                           w -> w <> ''),
               w -> md5(w)) AS h
      FROM documents
    )
    SELECT doc_id, {_SIMHASH_SUM} AS simhash
    FROM toks ORDER BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash per document (dedup/minhash.simhash_table) — md5-nibble
    votes, bit-identical across engines. sortWithinPartitions, not
    sorted_result: the operator is zero-exchange end-to-end (a per-row fold),
    and the output is corpus-sized — a repartition(1) would both add the
    plan's only shuffle and be wrong at scale; the driver compare is
    order-insensitive."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_table(docs, "text", "doc_id").sortWithinPartitions("doc_id")


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(floor(CAST(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS DOUBLE)
                * 1e4 + 0.5) AS BIGINT) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
    ORDER BY a, b
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.4), via the blocked-GEMM
    operator (similarity/ann.cosine_pairs) — float64 throughout. The oracle
    casts both vectors to DOUBLE[] first: DuckDB's list_cosine_similarity on
    raw FLOAT[] computes in float32, whose ~1e-7 error flipped a micro-unit
    on 1 of 95k pairs at the 10x fixture (f32 0.45204994 vs f64 0.45205002
    across the .45205 boundary — the round-8 §49 divergence class, caught by
    the same decade gate); in float64 both engines agree to ~1e-15."""
    from ..similarity.ann import cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        cosine_pairs(emb, "embedding", "vec_id", threshold=0.4)
        .select("a", "b", micro(F.col("cos"), 4).alias("cos"))
        # pair output is corpus-sized at scale: no repartition(1); the
        # driver compare is order-insensitive
        .sortWithinPartitions("a", "b")
    )


_CAND_CTES = f"""
    sh AS (SELECT doc_id, {_SH} AS s FROM documents),
    sig AS (
      SELECT doc_id,
           {_MH_COLS}
      FROM sh
    ),
    bands AS (
      SELECT doc_id, b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
                               AND x.doc_id < y.doc_id
    ),
    edges AS (SELECT a AS u, b AS v FROM cand
              UNION ALL
              SELECT b AS u, a AS v FROM cand),
    reach AS (
      SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT e.v AS node, r.lab AS lab
      FROM reach r JOIN edges e ON r.node = e.u
    ),
    cc AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node)
"""


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES}
    SELECT node AS doc_id, cluster_id FROM cc ORDER BY doc_id
    """,
)
def dedup_clusters(spark, sf_dir):
    """LSH candidate pairs → connected components → (doc_id, cluster_id =
    min id in component). Min-label propagation as a DELTA iteration
    (frontier-only messages, reference DataSet.iterateDelta:1208 /
    Gelly ConnectedComponents); rounds bounded by component diameter, which
    for near-dup clusters is a small constant."""
    from ..dedup.clusters import connected_components

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_table(docs, "text", "doc_id")
    pairs = lsh_candidate_pairs(sig, "doc_id")
    cc = connected_components(pairs, "a", "b")
    return cc.select(F.col("node").alias("doc_id"), "cluster_id").orderBy("doc_id")


@query(
    "dedup_keep_canonical",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES}
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM cc
                      WHERE cc.node = d.doc_id AND cc.node <> cc.cluster_id)
    ORDER BY d.doc_id
    """,
)
def dedup_keep_canonical(spark, sf_dir):
    """End-to-end near-dup removal: keep each cluster's minimum-id document
    plus all never-candidate singletons — the full shingle → MinHash → LSH →
    cluster → resolve pipeline as one plan (one anti-join against the
    cluster members on the corpus side)."""
    from ..dedup.clusters import connected_components, keep_canonical

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_table(docs, "text", "doc_id")
    pairs = lsh_candidate_pairs(sig, "doc_id")
    cc = connected_components(pairs, "a", "b")
    return keep_canonical(docs, cc, "doc_id").select("doc_id").orderBy("doc_id")


@query("dedup_semantic", oracle=None)  # golden-parquet oracle set below
def dedup_semantic(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540, dedup/semantic.py): spherical k-means
    clustering + per-cluster ascending-id greedy cosine pruning at 0.4;
    verified against an independent numpy replay (queries/golden.py)."""
    from . import golden as _g
    from ..dedup.semantic import semantic_dedup

    _g.ensure_semantic_dedup(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(emb, "embedding", "vec_id", threshold=0.4, n_clusters=16)
    return out.select(
        F.col("id").alias("vec_id"), "cluster", "keep"
    ).orderBy("vec_id")


def _set_semantic_oracle() -> None:
    from . import golden as _g
    from ..registry import REGISTRY

    REGISTRY["dedup_semantic"].oracle = f"""
    SELECT vec_id, cluster, keep
    FROM read_parquet('{_g.golden_path("dedup_semantic", _g.DRIVER_SF_DIR)}')
    ORDER BY vec_id
    """


_set_semantic_oracle()


@query(
    "dedup_incremental",
    oracle=f"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 10 < 8),
    batch AS (SELECT * FROM documents WHERE doc_id % 10 >= 8),
    csh AS (SELECT doc_id, {_SH} AS s FROM corpus),
    csig AS (SELECT doc_id, {_MH_COLS} FROM csh),
    cidx AS (
      SELECT b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM csig, (SELECT unnest(generate_series(0, 3)) AS band) b),
    bsh AS (SELECT doc_id, {_SH} AS s FROM batch),
    bsig AS (SELECT doc_id, {_MH_COLS} FROM bsh),
    bidx AS (
      SELECT doc_id, b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM bsig, (SELECT unnest(generate_series(0, 3)) AS band) b),
    dropped AS (
      SELECT DISTINCT x.doc_id FROM bidx x
      WHERE EXISTS (SELECT 1 FROM cidx c
                    WHERE c.band = x.band AND c.key = x.key)
         OR EXISTS (SELECT 1 FROM bidx y
                    WHERE y.band = x.band AND y.key = x.key
                      AND y.doc_id < x.doc_id))
    SELECT b.doc_id FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.doc_id = b.doc_id)
    ORDER BY b.doc_id
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (dedup/minhash.incremental_dedup): the corpus
    (doc_id%10<8) is reduced to a persisted (band,key) index once; the new
    batch (doc_id%10>=8) is minhashed and probed against the index — O(batch)
    work, never O(corpus). Returns the batch survivors."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    from ..dedup.minhash import band_table, incremental_dedup

    index = band_table(minhash_table(corpus, "text", "doc_id"), "doc_id")
    survivors, _ = incremental_dedup(batch, index, "text", "doc_id")
    return survivors.select("doc_id").transform(sorted_result, "doc_id")


@query(
    "split_cluster_safe",
    oracle=f"""
    WITH RECURSIVE {_CAND_CTES},
    grp AS (
      SELECT d.doc_id,
             coalesce(cc.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    ), s AS (
      SELECT doc_id, group_id,
             CASE WHEN substr(md5(CAST(group_id AS VARCHAR)), 1, 8) < '40000000'
                  THEN 'holdout' ELSE 'train' END AS split
      FROM grp
    )
    SELECT split, count(*) AS n_docs, count(DISTINCT group_id) AS n_groups
    FROM s GROUP BY split ORDER BY split
    """,
)
def split_cluster_safe(spark, sf_dir):
    """Contamination-safe train/holdout split keyed by NEAR-DUP CLUSTER:
    connected components over LSH candidate pairs define the group, the
    split hashes the cluster id (singletons = their own id), so a document
    and its near-duplicates can never straddle the eval boundary — the
    composition of dedup/clusters with sampling.split_by_group that a real
    decontamination pipeline runs. 0.25 holdout (hex threshold 40000000)."""
    from ..dedup.clusters import connected_components
    from ..pipeline.sampling import split_by_group

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_table(docs, "text", "doc_id")
    cc = connected_components(lsh_candidate_pairs(sig, "doc_id"), "a", "b")
    grouped = docs.join(
        cc.select(F.col("node").alias("doc_id"), "cluster_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("group_id")
    )
    out = split_by_group(grouped, "group_id", holdout_fraction=0.25)
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("group_id").alias("n_groups"),
        )
        .orderBy("split")
    )
