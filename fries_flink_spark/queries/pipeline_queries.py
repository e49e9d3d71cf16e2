"""Training-data pipeline queries: sampling, packing, mixing, quantization,
PII scrubbing (the beyond-the-reference operator surface, over documents /
embeddings).

Everything here is deterministic and engine-portable by construction — the
sampling/mixing decisions hash row keys with md5 and compare hex prefixes,
so the DuckDB oracles restate the identical predicate and match exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..pipeline.mixing import mix_weighted, mixture_stats
from ..portable import round_portable, round_portable_sql
from ..pipeline.packing import pack_sequences, pack_stats
from ..pipeline.quantize import dequant_error, quantize_int8
from ..pipeline.sampling import (
    frac_to_hex,
    sample_bernoulli,
    sample_reservoir,
    sample_stratified,
    split_train_holdout,
)
from ..registry import micro, query, sorted_result
from ..text.pii import PII_PATTERNS, pii_total, redact

_H = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"


@query(
    "sample_bernoulli",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {_H} < '{frac_to_hex(0.1)}'
    ORDER BY doc_id
    """,
)
def q_sample_bernoulli(spark, sf_dir):
    """Deterministic 10% Bernoulli sample keyed on doc_id (content-hash
    threshold — reproducible across engines/partitionings, unlike
    DataFrame.sample). pipeline/sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_bernoulli(docs, "doc_id", 0.1).select("doc_id", "source").orderBy(
        "doc_id"
    )


_STRAT = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_STRAT_DEFAULT = 0.05


def _strat_case_sql() -> str:
    whens = "\n           ".join(
        f"WHEN source = '{s}' THEN '{frac_to_hex(f)}'"
        for s, f in sorted(_STRAT.items())
    )
    return f"CASE {whens} ELSE '{frac_to_hex(_STRAT_DEFAULT)}' END"


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {_H} < {_strat_case_sql()}
    ORDER BY doc_id
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Per-stratum keep fractions (src0 100%, src1 50%, src2 25%, rest 5%)
    as one zero-exchange CASE filter. pipeline/sampling.py."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_stratified(docs, "doc_id", "source", _STRAT, _STRAT_DEFAULT)
        .select("doc_id", "source")
        .transform(sorted_result, "doc_id")
    )


@query(
    "sample_reservoir",
    oracle=f"""
    SELECT doc_id, source FROM documents
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY {_H}, doc_id) <= 5
    ORDER BY doc_id
    """,
)
def q_sample_reservoir(spark, sf_dir):
    """Fixed-size-5 deterministic reservoir per source (rank by content
    hash; WindowGroupLimit keeps per-task top-5 before the shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_reservoir(docs, "doc_id", "source", 5)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "sample_train_holdout",
    oracle=f"""
    SELECT count(*) FILTER ({_H} >= '{frac_to_hex(0.2)}') AS n_train,
           count(*) FILTER ({_H} < '{frac_to_hex(0.2)}')  AS n_holdout,
           count(*) AS n_total
    FROM documents
    """,
)
def q_sample_train_holdout(spark, sf_dir):
    """80/20 deterministic split: the two sides partition the input exactly
    (same hash predicate, negated). pipeline/sampling.split_train_holdout."""
    docs = load_table(spark, sf_dir, "documents")
    train, hold = split_train_holdout(docs, "doc_id", 0.2)
    return (
        train.select(F.lit(1).alias("s"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_train"))
        .crossJoin(hold.groupBy().agg(F.count(F.lit(1)).alias("n_holdout")))
        .crossJoin(docs.groupBy().agg(F.count(F.lit(1)).alias("n_total")))
    )


# Token proxy: chars/4 heuristic, floored at 1 (same expression both engines).
_TOK_SQL = "greatest(1, CAST(floor(n_chars / 4) AS BIGINT))"
_PACK_BUDGET = 256


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOK_SQL} AS tokens FROM documents
    ), b AS (
      SELECT doc_id, source, tokens,
             CAST(floor(coalesce(sum(tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / {_PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM t
    )
    SELECT source, bin_id, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens,
           sum(tokens) / {float(_PACK_BUDGET)} AS fill_ratio
    FROM b GROUP BY source, bin_id
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing into 256-token bins per source
    (prefix-sum bin ids — pipeline/packing.py), reported as per-bin stats."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4)).cast("bigint").alias(
            "tokens"
        ),
    )
    packed = pack_sequences(docs, "tokens", "doc_id", _PACK_BUDGET, part_col="source")
    return pack_stats(packed, "tokens", _PACK_BUDGET, part_col="source")


_MIX_RATES = {"src0": 2.5, "src1": 0.25, "src2": 1.0}
_MIX_DEFAULT = 0.1


def _mix_rate_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {float(r)}" for s, r in sorted(_MIX_RATES.items())
    )
    return f"CASE {whens} ELSE {float(_MIX_DEFAULT)} END"


def _mix_frac_hex_sql() -> str:
    import math

    whens = " ".join(
        f"WHEN source = '{s}' THEN '{frac_to_hex(r - math.floor(r))}'"
        for s, r in sorted(_MIX_RATES.items())
    )
    return f"CASE {whens} ELSE '{frac_to_hex(_MIX_DEFAULT)}' END"


@query(
    "mix_weighted",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source, {_mix_rate_sql()} AS rate, {_mix_frac_hex_sql()} AS fhex
      FROM documents
    ), reps AS (
      SELECT doc_id, source, rate, fhex, g.rep
      FROM rated CROSS JOIN generate_series(1, 3) AS g(rep)
      WHERE g.rep <= greatest(CAST(ceil(rate) AS BIGINT), 1)
    )
    SELECT doc_id, source, CAST(rep AS BIGINT) AS rep
    FROM reps
    WHERE rep <= CAST(floor(rate) AS BIGINT)
       OR substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(rep AS VARCHAR))), 1, 8)
          < fhex
    ORDER BY doc_id, rep
    """,
)
def q_mix_weighted(spark, sf_dir):
    """Deterministic mixture resampling: src0 x2.5 epochs, src1 x0.25,
    src2 x1.0, rest x0.1 — upsampling via rowwise explode, fractional epochs
    via per-(key, rep) hash Bernoulli. Zero exchanges. pipeline/mixing.py."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_weighted(docs, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT)
    return mixed.select(
        "doc_id", "source", F.col("rep").cast("bigint").alias("rep")
    ).transform(sorted_result, "doc_id", "rep")


@query(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
      FROM embeddings
    ), sc AS (
      SELECT vec_id, x,
             CASE WHEN list_max(list_transform(x, e -> abs(e))) = 0 THEN 1.0
                  ELSE list_max(list_transform(x, e -> abs(e))) / 127.0
             END AS scale
      FROM v
    ), q AS (
      SELECT vec_id, x, scale,
             list_transform(x, e -> greatest(-127.0, least(127.0,
                 CASE WHEN e / scale >= 0 THEN floor(e / scale + 0.5)
                      ELSE -floor(-(e / scale) + 0.5) END))) AS qq
      FROM sc
    )
    SELECT vec_id,
           CAST(list_sum(qq) AS BIGINT) AS q_sum,
           CAST(floor(scale * 1e6 + 0.5) AS BIGINT) AS scale_r,
           CAST(floor(list_max(list_transform(generate_series(1, len(x)),
                 i -> abs(x[i] - qq[i] * scale))) * 1e6 + 0.5)
                AS BIGINT) AS max_err
    FROM q ORDER BY vec_id
    """,
)
def q_emb_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (pipeline/quantize.py): per-row
    JVM array expressions, array<tinyint> output (4x smaller), checksummed
    by component sum + reconstruction max-error."""
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = dequant_error(quantize_int8(emb, "embedding"), "embedding")
    return qdf.select(
        "vec_id",
        F.aggregate("q", F.lit(0).cast("bigint"), lambda s, x: s + x.cast("bigint")).alias(
            "q_sum"
        ),
        micro(F.col("q_scale")).alias("scale_r"),
        micro(F.col("max_err")).alias("max_err"),
    ).transform(sorted_result, "vec_id")


def _pii_aug_sql() -> str:
    """The synthesized-PII text expression (documents carry no real PII, so
    both engines append identical doc_id-derived PII spans)."""
    return (
        "concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com"
        " or 555-123-4567; host 10.0.0.1 ssn 123-45-6789.')"
    )


def _redact_chain_sql(expr: str) -> str:
    out = expr
    for pattern, repl in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pattern}', '{repl}', 'g')"
    return out


def _pii_total_sql(expr: str) -> str:
    terms = []
    cur = expr
    for pattern, repl in PII_PATTERNS.values():
        terms.append(f"len(regexp_extract_all({cur}, '{pattern}'))")
        cur = f"regexp_replace({cur}, '{pattern}', '{repl}', 'g')"
    return " + ".join(terms)


@query(
    "pii_scrub",
    oracle=f"""
    WITH aug AS (SELECT doc_id, {_pii_aug_sql()} AS t FROM documents)
    SELECT doc_id,
           md5({_redact_chain_sql('t')}) AS redacted_md5,
           CAST({_pii_total_sql('t')} AS BIGINT) AS n_pii
    FROM aug ORDER BY doc_id
    """,
)
def q_pii_scrub(spark, sf_dir):
    """PII redaction (text/pii.py) over documents with deterministic
    synthesized PII spans (email/phone/IP/SSN per doc); RE2-safe patterns run
    verbatim in both engines. Output = md5 of scrubbed text + counts."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567; host 10.0.0.1 ssn 123-45-6789."),
        ).alias("t"),
    )
    return aug.select(
        "doc_id",
        F.md5(redact(F.col("t"))).alias("redacted_md5"),
        pii_total(F.col("t")).cast("bigint").alias("n_pii"),
    ).transform(sorted_result, "doc_id")


_ZBITS = 16


def _zorder_sql(xcol: str, ycol: str, bits: int = _ZBITS) -> str:
    """DuckDB rendition of sources/layout.zorder_key for two columns: bit i
    of x -> output bit 2i, bit i of y -> output bit 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "layout_zorder_key",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST({_zorder_sql('o_custkey', 'o_orderkey')} AS BIGINT) AS zkey
    FROM orders ORDER BY o_orderkey
    """,
)
def q_layout_zorder_key(spark, sf_dir):
    """Morton (Z-order) interleave of (o_custkey, o_orderkey) — the cluster
    key write_clustered sorts by so row-group min/max stats prune scans on
    EITHER column (sources/layout.py). Pure shift/mask codegen, no UDF."""
    from ..sources.layout import zorder_key

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        zorder_key(["o_custkey", "o_orderkey"], _ZBITS).alias("zkey"),
    ).orderBy("o_orderkey")


@query(
    "mix_stats",
    oracle=f"""
    WITH rated AS (
      SELECT doc_id, source, {_mix_rate_sql()} AS rate, {_mix_frac_hex_sql()} AS fhex
      FROM documents
    ), reps AS (
      SELECT doc_id, source, rate, fhex, g.rep
      FROM rated CROSS JOIN generate_series(1, 3) AS g(rep)
      WHERE g.rep <= greatest(CAST(ceil(rate) AS BIGINT), 1)
    ), mixed AS (
      SELECT doc_id, source, rep FROM reps
      WHERE rep <= CAST(floor(rate) AS BIGINT)
         OR substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(rep AS VARCHAR))), 1, 8)
            < fhex
    )
    SELECT source, count(*) AS n_rows,
           {round_portable_sql('count(*) * 1.0 / (SELECT count(*) FROM mixed)', 6)} AS share
    FROM mixed GROUP BY source ORDER BY source
    """,
)
def q_mix_stats(spark, sf_dir):
    """Achieved-mixture report over mix_weighted's output: rows and corpus
    share per source (pipeline/mixing.mixture_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = mix_weighted(docs, "doc_id", "source", _MIX_RATES, _MIX_DEFAULT)
    stats = mixture_stats(mixed, "source")
    return stats.select(
        "source", "n_rows", round_portable(F.col("share"), 6).alias("share")
    ).orderBy("source")


@query(
    "pipeline_row_ids",
    oracle="""
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS row_id
    FROM documents ORDER BY doc_id
    """,
)
def q_pipeline_row_ids(spark, sf_dir):
    """Dense global 0-based ids in doc_id order (pipeline/ids.py — range
    partition + per-partition counts + offset broadcast; no global window)."""
    from ..pipeline.ids import assign_consecutive_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_consecutive_ids(docs, "doc_id").orderBy("doc_id")


@query(
    "pipeline_epoch_shuffle",
    oracle="""
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5('1|' || CAST(doc_id AS VARCHAR)),
                      lpad(CAST(doc_id AS VARCHAR), 20, '0')
           ) - 1 AS shuffle_pos
    FROM documents ORDER BY doc_id
    """,
)
def q_pipeline_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch-1 training shuffle (pipeline/shuffle.py): position
    = rank under the salted content hash, computed with the range-exchange +
    offset scheme of pipeline/ids.py — reproducible, balanced regardless of
    key skew, no global window."""
    from ..pipeline.shuffle import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", epoch=1).orderBy("doc_id")


@query(
    "pipeline_validate",
    oracle=f"""
    WITH agg AS (
      SELECT count(*) AS n,
             sum(CASE WHEN value >= 0 AND value <= 1000000 THEN 0 ELSE 1 END) AS v_value_range,
             sum(CASE WHEN event_type IN ('click','view','purchase','signup','error')
                      THEN 0 ELSE 1 END) AS v_known_type,
             sum(CASE WHEN ts IS NOT NULL THEN 0 ELSE 1 END) AS v_ts_not_null,
             sum(CASE WHEN user_id > 0 THEN 0 ELSE 1 END) AS v_user_positive
      FROM events
    )
    SELECT rule, n AS n_rows, CAST(v AS BIGINT) AS n_violations,
           {round_portable_sql('v * 1.0 / n', 6)} AS violation_rate
    FROM agg, LATERAL (VALUES
      ('value_range', v_value_range), ('known_type', v_known_type),
      ('ts_not_null', v_ts_not_null), ('user_positive', v_user_positive)
    ) AS t(rule, v)
    ORDER BY rule
    """,
)
def q_pipeline_validate(spark, sf_dir):
    """Declarative data-quality expectations over events (pipeline/validate.
    summarize): one aggregate pass emits per-rule violation counts + rates
    (deequ-style checks re-expressed as plain conditional aggregates)."""
    from ..pipeline.validate import summarize

    ev = load_table(spark, sf_dir, "events")
    rules = {
        "value_range": F.col("value").between(0, 1_000_000),
        "known_type": F.col("event_type").isin(
            "click", "view", "purchase", "signup", "error"
        ),
        "ts_not_null": F.col("ts").isNotNull(),
        "user_positive": F.col("user_id") > 0,
    }
    return summarize(ev, rules).orderBy("rule")


@query(
    "mix_temperature",
    oracle="""
    WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mx AS (SELECT max(n) AS nmax FROM cnt),
    rated AS (
      SELECT c.lang, least(sqrt(CAST(mx.nmax AS DOUBLE) / c.n), 10.0) AS rate
      FROM cnt c, mx),
    docs AS (
      SELECT d.doc_id, d.lang, r.rate
      FROM documents d JOIN rated r USING (lang)),
    reps AS (
      SELECT doc_id, lang, rate,
             unnest(generate_series(1, CAST(greatest(ceil(rate), 1) AS BIGINT))) AS rep
      FROM docs)
    SELECT doc_id, lang, CAST(rep AS BIGINT) AS rep
    FROM reps
    WHERE rep <= CAST(floor(rate) AS BIGINT)
       OR substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(rep AS VARCHAR))), 1, 8)
          < printf('%08x', CAST(least(floor((rate - floor(rate)) * 4294967296.0
                                            + 0.5),
                                      4294967295.0) AS BIGINT))
    ORDER BY doc_id, rep
    """,
)
def q_mix_temperature(spark, sf_dir):
    """Temperature-smoothed language rebalancing (pipeline/mixing.
    mix_temperature, T=0.5): rates sqrt(n_max/n_lang) computed from the data
    (no configured dict), content-hash Bernoulli replication with a columnar
    hex threshold. Engine-exact at T=0.5 (IEEE sqrt)."""
    from ..pipeline.mixing import mix_temperature

    docs = load_table(spark, sf_dir, "documents")
    out = mix_temperature(docs, "doc_id", "lang", temperature=0.5, max_rate=10.0)
    return out.select("doc_id", "lang", F.col("rep").cast("long").alias("rep")).orderBy(
        "doc_id", "rep"
    )


@query(
    "pipeline_shard_balance",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOK_SQL} AS tokens FROM documents
    ), ranked AS (
      SELECT source, tokens,
             row_number() OVER (PARTITION BY source
                                ORDER BY tokens DESC, doc_id ASC) - 1 AS rank
      FROM t
    ), sharded AS (
      SELECT source, tokens,
             CAST(CASE WHEN (rank // 4) % 2 = 0 THEN rank % 4
                       ELSE 3 - rank % 4 END AS INTEGER) AS shard
      FROM ranked
    )
    SELECT source, shard, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens
    FROM sharded GROUP BY source, shard
    ORDER BY source, shard
    """,
)
def q_pipeline_shard_balance(spark, sf_dir):
    """Serpentine-balanced output sharding (pipeline/sharding.py): 4 shards
    per source stratum by token-descending rank; per-shard balance report.
    Integer arithmetic end to end — engine-exact."""
    from ..pipeline.sharding import assign_shards, shard_stats

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4)).cast("bigint").alias(
            "tokens"
        ),
    )
    sharded = assign_shards(docs, "tokens", "doc_id", n_shards=4, part_col="source")
    return shard_stats(sharded, "tokens", part_col="source").transform(sorted_result, "source", "shard")


@query("emb_pca_project", oracle=None)  # golden oracle set below
def q_emb_pca_project(spark, sf_dir):
    """Distributed PCA (pipeline/pca.py): exact fixed-point second moments
    (partition-invariant int64 Gram), driver eigh, broadcast top-8
    projection in micro-units — verified against the independent
    single-machine replay."""
    from . import golden as _g
    from ..pipeline.pca import pca_components, project_pca, second_moments

    _g.ensure_pca_project(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    n, s, g = second_moments(emb, "embedding", dim)
    mu, comp = pca_components(n, s, g, k=8)
    out = project_pca(emb, "embedding", "vec_id", mu, comp)
    return out.select(
        "vec_id",
        F.array_join(F.transform("pc", lambda x: x.cast("string")), "|").alias(
            "pc_str"
        ),
    ).orderBy("vec_id")


def _set_pca_oracle() -> None:
    from . import golden as _g
    from ..registry import REGISTRY

    REGISTRY["emb_pca_project"].oracle = f"""
    SELECT vec_id, pc_str
    FROM read_parquet('{_g.golden_path("emb_pca_project", _g.DRIVER_SF_DIR)}')
    ORDER BY vec_id
    """


_set_pca_oracle()


_E2E_SAMPLE_FRAC = 0.5


@query(
    "pipeline_e2e_prep",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, source, text, n_chars,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '') AS t,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> w <> '') AS lt
      FROM documents
    ), kept AS (
      SELECT doc_id, source, text, n_chars FROM toks
      WHERE len(t) BETWEEN 20 AND 100000
        AND coalesce(list_sum(list_transform(t, w -> length(w))), 0)
              BETWEEN 3 * len(t) AND 10 * len(t)
        AND 5 * len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]')))
              >= 4 * len(t)
        AND len(list_filter(list_distinct(lt),
                            w -> list_contains([{{SW}}], w))) >= 2
        AND 10 * length(regexp_replace(text, '[^[:punct:]]', '', 'g'))
              < length(text)
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(text) - 7, 1)),
               i -> substr(text, i, 8))) AS s
      FROM kept
    ), sig AS (
      SELECT doc_id, {{MH}} FROM sh
    ), bands AS (
      SELECT doc_id, b.band,
             CASE b.band
               WHEN 0 THEN md5(mh0 || '|' || mh1)
               WHEN 1 THEN md5(mh2 || '|' || mh3)
               WHEN 2 THEN md5(mh4 || '|' || mh5)
               ELSE        md5(mh6 || '|' || mh7)
             END AS key
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b
    ), cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
                               AND x.doc_id < y.doc_id
    ), edges AS (
      SELECT a AS u, b AS v FROM cand UNION ALL SELECT b AS u, a AS v FROM cand
    ), reach AS (
      SELECT u AS node, u AS lab FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT e.v AS node, r.lab AS lab FROM reach r JOIN edges e ON r.node = e.u
    ), cc AS (
      SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node
    ), canon AS (
      SELECT k.* FROM kept k
      WHERE NOT EXISTS (SELECT 1 FROM cc
                        WHERE cc.node = k.doc_id AND cc.node <> cc.cluster_id)
    ), sampled AS (
      SELECT doc_id, source,
             greatest(1, CAST(floor(n_chars / 4) AS BIGINT)) AS tokens
      FROM canon
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{{THR}}'
    ), binned AS (
      SELECT source, tokens,
             CAST(floor(coalesce(sum(tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 256) AS BIGINT) AS bin_id
      FROM sampled
    )
    SELECT source, bin_id, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens
    FROM binned GROUP BY source, bin_id
    ORDER BY source, bin_id
    """.replace("{SW}", "PLACEHOLDER_SW")
       .replace("{MH}", "PLACEHOLDER_MH")
       .replace("{THR}", "PLACEHOLDER_THR"),
)
def q_pipeline_e2e_prep(spark, sf_dir):
    """The COMPOSED preprocessing pipeline as one Spark plan: Gopher quality
    gate -> MinHash+LSH near-dup removal (canonical keep) -> deterministic
    50% Bernoulli sample -> per-source 256-token sequence packing, reported
    as per-bin stats. Every stage is the same library operator its
    standalone query verifies; the oracle chains the same verified SQL
    fragments."""
    from ..dedup.clusters import connected_components, keep_canonical
    from ..dedup.minhash import lsh_candidate_pairs, minhash_table
    from ..text.analysis import gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    rules = gopher_rules(F.col("text"))
    passes = None
    for k in rules:
        passes = rules[k] if passes is None else (passes & rules[k])
    kept = docs.filter(passes)
    sig = minhash_table(kept, "text", "doc_id")
    cc = connected_components(lsh_candidate_pairs(sig, "doc_id"), "a", "b")
    canon = keep_canonical(kept, cc, "doc_id")
    sampled = sample_bernoulli(canon, "doc_id", _E2E_SAMPLE_FRAC).select(
        "doc_id",
        "source",
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4)).cast("bigint").alias(
            "tokens"
        ),
    )
    packed = pack_sequences(sampled, "tokens", "doc_id", _PACK_BUDGET, part_col="source")
    return pack_stats(packed, "tokens", _PACK_BUDGET, part_col="source").select(
        "source", "bin_id", "n_docs", "tokens"
    ).orderBy("source", "bin_id")


def _fix_e2e_oracle() -> None:
    from ..registry import REGISTRY
    from .dedup_queries import _MH_COLS
    from .text_queries import _SW

    o = REGISTRY["pipeline_e2e_prep"].oracle
    o = o.replace("PLACEHOLDER_SW", _SW)
    o = o.replace("PLACEHOLDER_MH", _MH_COLS)
    o = o.replace("PLACEHOLDER_THR", frac_to_hex(_E2E_SAMPLE_FRAC))
    REGISTRY["pipeline_e2e_prep"].oracle = o


_fix_e2e_oracle()


@query(
    "pipeline_quality_quartiles",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> w <> '') AS toks,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> w <> '') AS ltoks
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             (least(length(text) / 500.0, 1.0)
              + greatest(0.0, 1.0 - (length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / length(text)) * 4)
              + greatest(0.0, 1.0 - (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)) * 4)
              + least((len(list_filter(ltoks, w -> list_contains([PLACEHOLDER_SW], w))) * 1.0
                       / len(ltoks)) * 4, 1.0)) / 4 AS score
      FROM t
    )
    SELECT doc_id, source,
           ntile(4) OVER (PARTITION BY source ORDER BY score, doc_id) AS quartile
    FROM scored ORDER BY doc_id
    """,
)
def q_pipeline_quality_quartiles(spark, sf_dir):
    """Per-source quality quartile assignment (the FineWeb/CCNet 'keep the
    best slice per stratum' selection primitive): composite quality score
    (text/analysis.quality_score), ntile(4) per stratum with a doc_id
    tiebreak — integer output, engine-exact given identical score
    arithmetic."""
    from pyspark.sql import Window as W

    from ..text.analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.col("score"), F.col("doc_id"))
    return (
        docs.select(
            "doc_id", "source", quality_score(F.col("text")).alias("score")
        )
        .withColumn("quartile", F.ntile(4).over(w))
        .select("doc_id", "source", "quartile")
        .orderBy("doc_id")
    )


def _fix_quartile_oracle() -> None:
    from ..registry import REGISTRY
    from .text_queries import _SW

    REGISTRY["pipeline_quality_quartiles"].oracle = REGISTRY[
        "pipeline_quality_quartiles"
    ].oracle.replace("PLACEHOLDER_SW", _SW)


_fix_quartile_oracle()


@query(
    "sample_group_holdout",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CASE WHEN substr(md5(source), 1, 8) < '{frac_to_hex(0.25)}'
                  THEN 'holdout' ELSE 'train' END AS split
      FROM documents
    )
    SELECT split, source, count(*) AS n
    FROM s GROUP BY split, source ORDER BY split, source
    """,
)
def q_sample_group_holdout(spark, sf_dir):
    """Leakage-safe group holdout (pipeline/sampling.split_by_group): the
    split decision hashes the GROUP key (source), so every document of a
    group lands on one side — near-dups within a group cannot straddle the
    train/eval boundary. Per-(split, group) counts prove atomicity."""
    from ..pipeline.sampling import split_by_group

    docs = load_table(spark, sf_dir, "documents")
    out = split_by_group(docs, "source", holdout_fraction=0.25)
    return (
        out.groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "source")
    )


# DSIR hashed-n-gram importance weighting (pipeline/dsir.py). The oracle CTE
# chain restates the library's arithmetic verbatim: md5-prefix buckets,
# Laplace-smoothed micro-nat log-ratios, integer per-doc sums.
_DSIR_TARGET = "src0"
_DSIR_WEIGHTS_SQL = f"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> w <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, source, substr(md5(g.gram), 1, 2) AS bucket
      FROM toks, LATERAL unnest(list_concat(t,
            list_transform(generate_series(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1]))) AS g(gram)
    ), tcnt AS (
      SELECT bucket, count(*) AS t_cnt FROM grams
      WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
    ), rcnt AS (
      SELECT bucket, count(*) AS r_cnt FROM grams GROUP BY bucket
    ), tot AS (
      SELECT (SELECT count(*) FROM grams WHERE source = '{_DSIR_TARGET}') AS tt,
             (SELECT count(*) FROM grams) AS rt
    ), lr AS (
      SELECT r.bucket,
             CAST(floor((ln((coalesce(t.t_cnt, 0) + 1) / CAST(tot.tt + 256 AS DOUBLE))
                       - ln((r.r_cnt + 1) / CAST(tot.rt + 256 AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT) AS lr_micro
      FROM rcnt r LEFT JOIN tcnt t ON r.bucket = t.bucket, tot
    ), w AS (
      SELECT g.doc_id, count(*) AS n_grams,
             CAST(sum(lr.lr_micro) AS BIGINT) AS weight_micro
      FROM grams g JOIN lr ON g.bucket = lr.bucket
      GROUP BY g.doc_id
    )
"""


# per-session memo for the DSIR hashed-gram table (same discipline as
# queries/tpcds.register_tpcds): the explode is the dominant cost and feeds
# the model histograms, the totals AND the scoring pass — one persisted copy
# per (session, sf), replaced on sf switch.
_DSIR_GRAMS: dict[int, tuple] = {}


def _dsir_tagged_grams(spark, sf_dir):
    import weakref

    from ..pipeline.dsir import hashed_grams

    entry = _DSIR_GRAMS.get(id(spark))
    if entry is not None:
        ref, reg_sf, frame = entry
        if ref() is spark and reg_sf == sf_dir:
            return frame
        if ref() is spark:
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 - best-effort cleanup
                pass
    docs = load_table(spark, sf_dir, "documents")
    # __is_t rides THROUGH the explode (carry=) — tagging the gram table by
    # joining docs back onto it afterwards would be a corpus-sized SMJ.
    tagged = hashed_grams(
        docs.withColumn("__is_t", F.col("source") == _DSIR_TARGET),
        "text",
        "doc_id",
        carry=["__is_t"],
    ).persist()
    _DSIR_GRAMS[id(spark)] = (weakref.ref(spark), sf_dir, tagged)
    return tagged


def _dsir_weights(spark, sf_dir):
    from ..pipeline.dsir import bucket_counts, bucket_log_ratio, doc_importance

    docs = load_table(spark, sf_dir, "documents")
    tagged = _dsir_tagged_grams(spark, sf_dir)
    raw = bucket_counts(tagged)
    tgt = bucket_counts(tagged.filter("__is_t"))
    totals = tagged.agg(
        F.count(F.lit(1)).alias("rt"),
        F.sum(F.col("__is_t").cast("bigint")).alias("tt"),
    ).first()
    lr = bucket_log_ratio(tgt, raw, int(totals["tt"]), int(totals["rt"]))
    return doc_importance(docs, "text", "doc_id", lr, grams=tagged)


@query(
    "dsir_importance_weights",
    oracle=_DSIR_WEIGHTS_SQL
    + """
    SELECT doc_id, n_grams, weight_micro FROM w ORDER BY doc_id
    """,
)
def q_dsir_importance_weights(spark, sf_dir):
    """DSIR importance weights (pipeline/dsir.py, after arXiv:2302.03169):
    hashed unigram+bigram bucket models target='src0' vs the raw pool,
    per-doc log-likelihood-ratio weight in integer micro-nats. The 256-row
    ratio model broadcasts; one explode + one partial-agg shuffle."""
    return _dsir_weights(spark, sf_dir).select(
        "doc_id", "n_grams", "weight_micro"
    ).transform(sorted_result, "doc_id")


@query(
    "dsir_gumbel_topk",
    oracle=_DSIR_WEIGHTS_SQL
    + """
    SELECT doc_id, weight_micro,
           CAST(weight_micro + floor(-ln(-ln(
                 (CAST(concat('0x', substr(md5('dsir|' || CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT) + 0.5)
                 / 4294967296.0)) * 1e6 + 0.5) AS BIGINT) AS key_micro
    FROM w
    ORDER BY key_micro DESC, doc_id LIMIT 50
    """,
)
def q_dsir_gumbel_topk(spark, sf_dir):
    """DSIR Gumbel top-k selection: sample 50 docs without replacement with
    probability ∝ exp(importance weight). Gumbel noise is derived from
    md5(seed|doc_id) so the draw is deterministic and partition-invariant;
    the top-k is a sort-limit (TakeOrdered), never a global sort."""
    from ..pipeline.dsir import gumbel_topk

    w = _dsir_weights(spark, sf_dir)
    return gumbel_topk(w, "doc_id", k=50, seed="dsir").select(
        "doc_id", "weight_micro", "key_micro"
    )


@query(
    "pipeline_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOK_SQL} AS tokens,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, source, tokens,
             sum(tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT source, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS tokens
    FROM c WHERE cum <= 4096 GROUP BY source ORDER BY source
    """,
)
def q_pipeline_token_budget(spark, sf_dir):
    """Exact token-budget subsetting (pipeline/sampling.take_token_budget):
    deterministic hash-order prefix of <= 4096 tokens per source stratum —
    the 'give me exactly N tokens of this corpus' primitive. Integer window
    arithmetic, engine-exact."""
    from ..pipeline.sampling import take_token_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / 4)).cast("bigint").alias("tokens"),
    )
    kept = take_token_budget(docs, "tokens", "doc_id", budget=4096, part_col="source")
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("tokens"))
        .orderBy("source")
    )
