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


def minhash_table(df: DataFrame, text_col: str, id_col: str, k: int = 8) -> DataFrame:
    """(id, mh0..mh{N-1}) signature table.

    Formulated as explode(shingle positions) → md5 → groupBy(id).agg(min(...))
    rather than a higher-order-function fold: Spark evaluates HOF lambdas
    interpretively per array element, while explode + hash agg stays inside
    whole-stage codegen with map-side partial aggregation (≈10× faster
    measured). Values are identical — min over duplicated shingles equals min
    over distinct shingles, so no array_distinct is needed either.

    Raised to the session default parallelism only when the input has fewer
    partitions (session.ensure_parallelism): minhashing is CPU-bound per
    row, and a small single-row-group parquet input would otherwise pin the
    whole computation to one task; an already-parallel input (any
    cluster-scale scan) adds no exchange. The groupBy shuffles one row per
    (doc, shingle) md5 — partial aggregation collapses that to one row per
    doc per map task before the exchange.
    """
    from ..session import ensure_parallelism

    n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    hashed = (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n)).alias("__i"),
            F.col(text_col).alias("__t"),
        )
        .select(
            F.col(id_col),
            F.md5(F.col("__t").substr(F.col("__i"), F.lit(k))).alias("__h"),
        )
    )
    return hashed.groupBy(id_col).agg(
        *[
            F.min(F.substring("__h", 1 + 3 * j, 8)).alias(f"mh{j}")
            for j in range(N_PERMS)
        ]
    )


def band_table(
    sig: DataFrame,
    id_col: str,
    n_perms: int = N_PERMS,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(band, key, id) LSH band-bucket table of a signature table — the
    joinable/persistable form of the signatures. Used both for in-batch pair
    generation (:func:`lsh_candidate_pairs`) and as the PERSISTED CORPUS
    INDEX for incremental dedup (:func:`incremental_dedup`): at scale, write
    it bucketed by (band, key) so future probes are exchange-free."""
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
    return sig.select(F.col(id_col), F.explode(bands).alias("bk")).select(
        F.col(id_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def incremental_dedup(
    batch: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Deduplicate a NEW batch against an existing corpus band index without
    touching the corpus text: returns ``(survivors, new_index_entries)``.

    The growth path every production dedup pipeline needs: when a shard
    arrives, re-hashing the whole corpus is O(corpus); probing a persisted
    band index is O(batch). A batch doc is dropped iff

    - any of its band keys collides with the corpus index, or
    - an earlier batch doc (smaller id) shares a band key — the same
      order-invariant "drop if similar to any earlier doc" rule as the
      oracle restates (a dropped earlier doc still disqualifies, unlike
      SemDeDup's sequential greedy; both semantics are standard, this one is
      join-expressible with no iteration).

    ``new_index_entries`` is the survivors' band table; append it to the
    index to complete the ingest (index grows by O(batch), never rewritten).

    Scale shape: the batch band table is tiny next to the index — Catalyst
    broadcasts it into the index probe (asserted in test_plans), so the only
    exchange over index-sized data is none at all; with the index stored
    bucketed by (band, key) even a large batch probes co-located.
    """
    sig = minhash_table(batch, text_col, id_col, k=k)
    # The batch band table feeds FOUR consumers (corpus probe, in-batch
    # self-join both sides, surviving-entry output); without pinning, each
    # re-evaluates the md5-heavy minhash subtree. It is batch-sized — tiny
    # next to the corpus — so materializing it is the right trade at any
    # scale.
    nb = band_table(sig, id_col).localCheckpoint(eager=True)
    hit_corpus = (
        nb.join(index.select("band", "key"), ["band", "key"], "left_semi")
        .select(id_col)
        .distinct()
    )
    earlier = nb.select(
        F.col("band").alias("band"),
        F.col("key").alias("key"),
        F.col(id_col).alias("__earlier_id"),
    )
    hit_batch = (
        nb.join(earlier, ["band", "key"])
        .filter(F.col("__earlier_id") < F.col(id_col))
        .select(id_col)
        .distinct()
    )
    dropped = hit_corpus.unionByName(hit_batch).distinct()
    survivors = batch.join(dropped, id_col, "left_anti")
    new_entries = nb.join(dropped, id_col, "left_anti")
    return survivors, new_entries


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    n_perms: int = N_PERMS,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing any band
    bucket become a candidate pair. Returns distinct (a, b) with a < b.

    One explode to (doc, band_idx, band_key), then ONE shuffle grouping docs
    by band key; pairs are generated inside each bucket from the collected id
    list. Chosen over a self-equi-join on the band key because the join
    evaluates the (expensive) signature subtree twice and shuffles both sides;
    this computes it once and shuffles only (band, key, id) rows.

    Skew note (100 TB): a boilerplate bucket with m docs yields m² pairs.
    ``max_bucket`` drops over-full buckets (standard practice in web-scale
    dedup — a bucket that hot means the docs are near-identical and will be
    caught by exact/other bands anyway). Default None = exact LSH semantics,
    which is what the DuckDB oracle reproduces.
    """
    exploded = band_table(sig, id_col, n_perms, band_size)
    buckets = (
        exploded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    # For each element x_i, pair it with every later element y_j (j > i):
    # slice the (x_i, y_*) struct array to positions i+2.. (1-based).
    pair_arrays = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.slice(
                F.transform("ids", lambda y: F.struct(x.alias("a"), y.alias("b"))),
                i + 2,
                F.size("ids"),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arrays).alias("p"))
        .select("p.a", "p.b")
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
    only for tiny inputs; the production path feeds LSH candidates).

    The candidate path computes |A∩B| by exploding each doc's distinct
    shingles to rows and equi-joining through the candidate list — whole-stage
    codegen end to end. The per-pair array formulation
    (``array_intersect``/``array_union``) evaluates interpretively per element
    and is ~20× slower at 10⁵ candidate pairs. Pairs sharing zero shingles
    drop out of the join; they'd be filtered by any threshold > 0 anyway.
    """
    if candidates is None:
        sh_arr = df.select(
            F.col(id_col), char_shingles(F.col(text_col), k).alias("s")
        )
        a = sh_arr.select(F.col(id_col).alias("a"), F.col("s").alias("sa"))
        b = sh_arr.select(F.col(id_col).alias("b"), F.col("s").alias("sb"))
        pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
        inter = F.size(F.array_intersect("sa", "sb"))
        union = F.size(F.array_union("sa", "sb"))
        return pairs.select("a", "b", (inter / union).alias("jaccard")).filter(
            F.col("jaccard") >= threshold
        )
    n = F.greatest(F.length(F.col(text_col)) - (k - 1), F.lit(1))
    sh = (
        df.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), n)).alias("__i"),
            F.col(text_col).alias("__t"),
        )
        # Internal join key: xxhash64 of the shingle, not the string — 8-byte
        # fixed keys shrink the shuffled intermediate ~4×. Hash equality
        # stands in for string equality (collision odds ~n²/2⁶⁵ ≈ 10⁻⁸ at 10⁶
        # distinct shingles).
        .select(
            F.col(id_col),
            F.xxhash64(F.col("__t").substr(F.col("__i"), F.lit(k))).alias("s"),
        )
        .distinct()
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col(id_col).alias("a"), "s")
    b_sh = sh.select(F.col(id_col).alias("b"), "s")
    inter = (
        candidates.join(a_sh, "a")
        .join(b_sh, ["b", "s"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("__sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("__sb")), "b")
        .select(
            "a",
            "b",
            (F.col("__i") / (F.col("__sa") + F.col("__sb") - F.col("__i"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_table(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash per row: bit j is the sign of the sum of ±1 votes from
    each whitespace token's md5 nibble j (>= 8 → +1). Portable: md5 nibbles
    are identical in any engine.

    Formulated as explode_outer(tokens) → md5 → groupBy(id).agg(packed vote
    sums) so the whole computation stays in whole-stage codegen with map-side
    partial aggregation — a higher-order-function fold would run 16
    interpreted array passes per row (measured 1.5x slower end-to-end, as was
    a grouped-explode variant folding 4 tokens per row: the per-token
    arithmetic is cheap, the wall cost is stages). explode_outer keeps one
    null-token row for token-less docs, which aggregates to simhash 0 —
    replacing the old left-join-back stage (~35% of wall at sf0.1).

    The 16 per-bit ±1 vote sums are BIT-PACKED into 4 int64 lanes of 4
    16-bit positive counters each (+ one row count): per token, nibble j's
    high-bit test contributes ``1 << 16·(j mod 4)`` to lane ``j div 4``, and
    the sign test recovers as ``2·count_j > n``. That cuts the aggregation
    state 16 longs → 5 and replaces 16 ``isin``-of-8-strings predicates per
    row with 16 single ``ascii >= 56`` compares ('8'..'f' sort after '7' in
    ASCII for the lowercase hex alphabet). Counter overflow would need a
    65 535-token document per 16-bit lane — far beyond any real document;
    the oracle reproduces the same fold from raw md5 nibbles.

    The input is raised to the session default parallelism only when it has
    fewer partitions (session.ensure_parallelism): the fold is CPU-bound per
    row, and a single-row-group parquet input would otherwise pin the
    explode+agg to one task (measured 30% of wall at sf0.1); an
    already-parallel input adds no exchange.
    """
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
                lambda w: w != "",
            )
        ).alias("__w"),
    ).select(F.col(id_col), F.md5("__w").alias("__h"))

    # Two conv() calls decode the 16 nibbles into two 32-bit ints; each
    # nibble's high bit is then one shift+AND — far smaller codegen than 16
    # per-nibble substring predicates (large generated methods fall out of
    # C2's code cache in long sessions and drop to the interpreter).
    h1 = F.conv(F.substring("__h", 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring("__h", 9, 8), 16, 10).cast("long")

    def bit(j: int):
        h = h1 if j < 8 else h2
        p = j % 8
        return F.shiftright(h, 4 * (7 - p) + 3).bitwiseAND(F.lit(1))

    def lane(k: int):
        e = None
        for p in range(4):
            t = bit(4 * k + p) * F.lit(1 << (16 * p))
            e = t if e is None else e + t
        return e.cast("long")

    # count("__h") not count(1): the explode_outer null row of a token-less
    # doc must not count as a token. For such a doc every s{k} is NULL (sum
    # of no non-null inputs), each bit's `cnt*2 > n` predicate is NULL →
    # otherwise(0), and the signature correctly lands at 0.
    votes = toks.groupBy(id_col).agg(
        F.count(F.col("__h")).alias("__n"),
        *[F.sum(lane(k)).alias(f"s{k}") for k in range(4)],
    )
    bits = None
    for j in range(16):
        k, p = divmod(j, 4)
        cnt = F.shiftright(F.col(f"s{k}"), 16 * p).bitwiseAND(F.lit(0xFFFF))
        b = F.when(cnt * 2 > F.col("__n"), F.lit(1 << j)).otherwise(F.lit(0))
        bits = b if bits is None else bits + b
    return votes.select(F.col(id_col), bits.alias("simhash"))


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
