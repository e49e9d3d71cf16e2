"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Beyond-reference surface (LLM-data-pipeline operators). All engine-portable by
construction: hashes are md5 (identical across engines), so the DuckDB oracles
reproduce signatures bit-for-bit.

Scale design (100 TB):
- Shingling/minhashing are per-row array expressions — no explode, no shuffle,
  whole-stage codegen. Signature width k=8 costs 8 array passes per doc.
- LSH banding turns near-dup detection from O(n²) pairs into a shuffle on
  band keys: docs sharing a band co-locate, candidates are generated per
  bucket. Hot buckets (boilerplate docs) are the skew risk — AQE skew-join
  handles moderate skew; for pathological buckets cap bucket size upstream.
- The n-gram Jaccard verifier joins only LSH candidates (or blocked pairs),
  never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PERMS = 8
BAND_SIZE = 2  # → 4 bands of 2 rows


def char_shingles(text: Column, k: int = 8) -> Column:
    """Distinct character k-gram shingles of a string (codegen'd array expr)."""
    n = F.greatest(F.length(text) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(text, i, k))
    )


def minhash_signature(shingles: Column, n_perms: int = N_PERMS) -> Column:
    """MinHash signature as an array<string>: element j is the min over
    shingles of md5(j || '|' || shingle). Hex-string min == numeric min of the
    hash — engine-portable and uniform.

    Cost design: ONE md5 per shingle, ONE pass over the shingle array. The
    n_perms "permutations" are 8-hex-char slices of the single digest at
    offsets 1, 4, 7, … (md5 bits are independent, so overlapping slices are
    fine for banding). The naive formulation — md5(j || shingle) per
    permutation with a fresh array traversal each — costs n_perms× the hashing
    and n_perms× the traversal; at 100 TB that's the difference between one
    scan-speed pass and a CPU-bound job.
    """
    init = F.array(*[F.lit("g") for _ in range(n_perms)])  # 'g' > any hex digit

    def fold(acc: Column, s: Column) -> Column:
        h = F.md5(s)
        slices = F.array(*[F.substring(h, 1 + 3 * j, 8) for j in range(n_perms)])
        return F.zip_with(acc, slices, lambda a, b: F.least(a, b))

    return F.aggregate(shingles, init, fold)


def minhash_table(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """(id, mh0..mh{N-1}) signature table.

    Repartitions to the session default parallelism first: minhashing is
    CPU-bound per row, and a small single-row-group parquet input would
    otherwise pin the whole computation to one task. At cluster scale the
    scan has many splits and this collapses into a cheap rebalance.
    """
    spark = df.sparkSession
    sig = minhash_signature(char_shingles(F.col(text_col), k))
    return (
        df.repartition(spark.sparkContext.defaultParallelism)
        .select(F.col(id_col), sig.alias("__sig"))
        .select(
            F.col(id_col),
            *[F.col("__sig")[j].alias(f"mh{j}") for j in range(N_PERMS)],
        )
    )


def lsh_candidate_pairs(
    sig: DataFrame, id_col: str, n_perms: int = N_PERMS, band_size: int = BAND_SIZE
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing any band
    bucket become a candidate pair. Returns distinct (a, b) with a < b.

    One explode to (doc, band_idx, band_key), one self-equi-join on the band —
    the scalable path: shuffle is on band keys, never a cross join.
    """
    n_bands = n_perms // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]
                    )
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = exploded.select(
        F.col(id_col).alias("a"), "band", "key"
    )
    b = exploded.select(F.col(id_col).alias("b"), "band", "key")
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for candidate pairs (all pairs if None —
    only for small inputs / oracle checks; production path feeds LSH
    candidates)."""
    sh = df.select(
        F.col(id_col), char_shingles(F.col(text_col), k).alias("s")
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("s").alias("sa"))
    b = sh.select(F.col(id_col).alias("b"), F.col("s").alias("sb"))
    if candidates is not None:
        pairs = candidates.join(a, "a").join(b, "b")
    else:
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        pairs.select(
            "a", "b", (inter / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens: bit j is the sign of the sum of
    ±1 votes from each token's md5 nibble j (>= 8 → +1). Portable: md5 nibbles
    are identical in any engine."""
    toks = F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda w: w != "")
    hashes = F.transform(toks, lambda w: F.md5(w))

    def bit(j: int) -> Column:
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.substring(h, j + 1, 1).isin(*list("89abcdef")), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(1 << j)).otherwise(F.lit(0))

    out = F.lit(0)
    for j in range(16):
        out = out + bit(j)
    return out


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per distinct text, keeping the
    minimum id (hash-groupBy — single shuffle on the digest)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
