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
    parsed = _parsed_shingle_hashes(df, text_col, id_col, k)
    return _sig_from_parsed(parsed, id_col)


def _parsed_shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """One exploded row per shingle POSITION: (id, __h1, __h2) where
    __h1/__h2 are the two 15-hex-char halves of md5(shingle) parsed to
    int64 (chars 1..15 and 16..30; char 31+ is never referenced by the
    signature windows). The shared front end of the signature aggregate
    and the fused LSH+Jaccard pipeline."""
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
    return hashed.select(
        F.col(id_col),
        F.conv(F.substring("__h", 1, 15), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring("__h", 16, 15), 16, 10).cast("long").alias("__h2"),
    )


def _sig_from_parsed(parsed: DataFrame, id_col: str) -> DataFrame:
    """Signature aggregate over (id, __h1, __h2) rows — min over every
    8-hex-char window, hex rebuilt bit-identical after the aggregate.

    Aggregate the NUMERIC value of each 8-hex-char window, not the string:
    min over a STRING buffer is unsupported by HashAggregateExec, so the
    string form silently planned as SortAggregate — a per-partition sort of
    the exploded (doc, shingle) table (~300x corpus rows). Fixed-width
    lowercase hex is order-isomorphic to its integer value ('0'-'9' <
    'a'-'f' maps monotonically to 0-15), so min over the window's integer
    value equals the integer value of min over the window string exactly;
    the hex string is reconstructed bit-identical after the aggregate
    (lpad restores leading zeros that hex() drops).

    conv() itself is the expensive part (string parse per call), so the
    32-hex md5 is parsed ONCE into two 15-hex-char longs (60 bits each,
    int64-safe) and each overlapping 8-char window is extracted with
    integer div/mod — 2 convs per exploded row instead of 8. Interleaved
    noop A/B on the minhash stage (min of 3, one session): 8-conv 0.85s /
    string-sort 0.68s / this form 0.78s at sf0.1, and 3.19 / 2.40 /
    2.12s at the 10x dir — the only variant that is BOTH hash-aggregated
    (no sort spill of the exploded intermediate at scale) and faster than
    the sort form where data exceeds cache.

    Window j covers hex chars [1+3j, 8+3j] (1-indexed). chars 1..15 live
    in __h1 (char c has place 16^(15-c)), chars 16..30 in __h2 (char c
    has place 16^(30-c)); windows j=3,4 straddle the split and recombine
    hi*16^k + lo from the two halves. char 31+ is never referenced
    (8 + 3*7 = 29).
    """
    p16 = [16**i for i in range(16)]
    windows = [
        F.expr(f"__h1 DIV {p16[7]}"),
        F.expr(f"__h1 DIV {p16[4]}") % p16[8],
        F.expr(f"__h1 DIV {p16[1]}") % p16[8],
        (F.col("__h1") % p16[6]) * p16[2] + F.expr(f"__h2 DIV {p16[13]}"),
        (F.col("__h1") % p16[3]) * p16[5] + F.expr(f"__h2 DIV {p16[10]}"),
        F.expr(f"__h2 DIV {p16[7]}"),
        F.expr(f"__h2 DIV {p16[4]}") % p16[8],
        F.expr(f"__h2 DIV {p16[1]}") % p16[8],
    ]
    agged = parsed.groupBy(id_col).agg(
        *[F.min(w).alias(f"__m{j}") for j, w in enumerate(windows)]
    )
    return agged.select(
        F.col(id_col),
        *[
            F.lower(F.lpad(F.hex(F.col(f"__m{j}")), 8, "0")).alias(f"mh{j}")
            for j in range(N_PERMS)
        ],
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
    # SHUFFLE_HASH hints are load-bearing at scale: the exploded shingle
    # tables carry no stats (sequence-explode lineage), so Catalyst
    # UNDER-estimates them and plans BroadcastHashJoin with the ~docs×290-row
    # side as build — which works by luck below the 8 GiB broadcast cap and
    # failed hard at the 100x dir (500k docs → >8 GiB build side, r10
    # decade find). Shuffled-hash (not sort-merge: sorting the
    # candidate×shingle probe side — 3.2B rows at the 100x dir — spilled
    # ~100 GB of sort runs; the hash build side is the hinted table, whose
    # per-partition maps are MBs) keeps both joins shuffle-partitioned with
    # no per-node table ever exceeding a partition. The sizes joins below
    # stay UN-hinted on purpose: sizes is one row per doc, so AQE's
    # measured stats pick broadcast while it fits and fall back when not.
    inter = (
        candidates.join(a_sh.hint("shuffle_hash"), "a")
        .join(b_sh.hint("shuffle_hash"), ["b", "s"])
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


def ngram_jaccard_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Fused LSH-candidates → n-gram-Jaccard-verify pipeline with ONE
    shingle explode of the corpus (r11 verdict ask #2).

    The two-stage pipeline composed from :func:`minhash_table` +
    :func:`lsh_candidate_pairs` + :func:`jaccard_pairs` explodes and hashes
    the corpus text twice (md5 for the signatures, xxhash64 for the
    verifier) — and because the verifier's shingle table feeds three
    consumers (both join sides and the size aggregate) without
    materialization, the explode+hash subtree actually evaluates four
    times. Here the exploded md5 halves are computed once
    (:func:`_parsed_shingle_hashes`), distinct-ed per doc, and pinned with
    ``localCheckpoint`` — batch-shaped state inside one query execution,
    the same trade :func:`incremental_dedup` makes for its band table. The
    signature aggregate runs over the distinct rows (min over distinct
    shingles == min over all occurrences) and the verifier keys on
    ``xxhash64(__h1, __h2)`` — 8-byte join keys derived from the md5 the
    signature stage already paid for.

    Equivalence: signatures are bit-identical by the min-over-distinct
    argument; intersection/size counts replace "distinct shingle strings"
    with "distinct md5-120-bit prefixes", the same accepted collision
    residual class as the xxhash64 string keys they replace (odds
    ~|grams|²/2¹²⁰ vs ~|grams|²/2⁶⁴ per join; the string-keyed DuckDB
    oracle doubles as the collision check at every tested SF). Interleaved
    noop A/B (min of 3-4, one session): 10.06 → 9.30 s at sf0.1 and
    48.4 → 28.2 s at the 10x dir, exceptAll 0 both directions at both.
    """
    parsed = _parsed_shingle_hashes(df, text_col, id_col, k)
    dsh = parsed.distinct().localCheckpoint(eager=True)
    sig = _sig_from_parsed(dsh, id_col)
    cands = lsh_candidate_pairs(sig, id_col)
    sh = dsh.select(F.col(id_col), F.xxhash64("__h1", "__h2").alias("s"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col(id_col).alias("a"), "s")
    b_sh = sh.select(F.col(id_col).alias("b"), "s")
    # same join shape and SHUFFLE_HASH rationale as jaccard_pairs
    inter = (
        cands.join(a_sh.hint("shuffle_hash"), "a")
        .join(b_sh.hint("shuffle_hash"), ["b", "s"])
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

    Formulated as a ZERO-SHUFFLE per-row fold: one ``transform`` pass maps
    each token to its two decoded md5 halves (md5 computed exactly once per
    token), then one ``aggregate`` pass folds the 16 ±1 vote counts into 4
    bit-packed int64 lanes of 4 16-bit counters (+ a token count) and the
    finish lambda decodes the sign bits (``2·count_j > n``). No explode, no
    keyed exchange, no aggregation state: the whole operator is a projection,
    embarrassingly parallel at any scale — strictly better at 100 TB than the
    previous explode → md5 → groupBy(id) two-stage plan, whose keyed shuffle
    (however small after map-side combine) still cost a stage barrier. At
    sf0.1 the fold is 0.23 s vs the explode+agg's 0.46 s; per-token the HOF
    lambda is interpreted rather than whole-stage-codegen'd, but md5 itself
    (the dominant per-token cost) runs native either way, and a SINGLE
    combined pass avoids the 16-interpreted-passes formulation that round 2
    measured 1.5x slower. Counter overflow would need a 65 535-token document
    per 16-bit lane; the oracle reproduces the same fold from raw md5
    nibbles.

    Token-less docs: ``filter`` yields an empty array, the fold returns the
    zero accumulator, every ``2·0 > 0`` test is false → simhash 0. A NULL
    text propagates NULL through the fold and is coalesced to 0, matching
    the oracle's CASE-over-NULL behavior.

    The input is raised to the session default parallelism only when it has
    fewer partitions (session.ensure_parallelism): the fold is CPU-bound per
    row, and a single-row-group parquet input would otherwise pin it to one
    task; an already-parallel input adds no exchange.

    Expressions are built as SQL STRINGS, not py4j Column algebra: the ~450
    Column calls of the algebraic formulation cost ~0.35 s of pure
    plan-build time per query (cProfile: socket recv), ~40% of the whole
    query's wall at sf0.1 — the same build-vs-exec split that halved the
    triadic census.
    """
    from ..session import ensure_parallelism

    df = ensure_parallelism(df)

    def lane_terms(k: int) -> str:
        ts = []
        for p in range(4):
            j = 4 * k + p
            h = "t.a" if j < 8 else "t.b"
            shift = 4 * (7 - j % 8) + 3
            ts.append(f"(shiftright({h}, {shift}) & 1) * {1 << (16 * p)}")
        return " + ".join(ts)

    acc_update = ", ".join(
        ["'n', acc.n + 1"]
        + [f"'s{k}', acc.s{k} + ({lane_terms(k)})" for k in range(4)]
    )
    bits = " + ".join(
        f"(CASE WHEN (shiftright(acc.s{j // 4}, {16 * (j % 4)}) & 65535) * 2"
        f" > acc.n THEN {1 << j} ELSE 0 END)"
        for j in range(16)
    )
    fold = f"""coalesce(aggregate(
      transform(filter(split(trim(lower({text_col})), '\\\\s+'), w -> w != ''),
                w -> named_struct(
                  'a', cast(conv(substring(md5(w), 1, 8), 16, 10) AS bigint),
                  'b', cast(conv(substring(md5(w), 9, 8), 16, 10) AS bigint))),
      named_struct('n', 0L, 's0', 0L, 's1', 0L, 's2', 0L, 's3', 0L),
      (acc, t) -> named_struct({acc_update}),
      acc -> {bits}), 0) AS simhash"""
    return df.selectExpr(id_col, fold)


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
