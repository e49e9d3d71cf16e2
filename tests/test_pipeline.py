"""Tests for the training-data pipeline operators (sampling, mixing,
packing, quantization, PII scrubbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.pipeline.mixing import mix_weighted, mixture_stats
from fries_flink_spark.pipeline.packing import pack_sequences, pack_stats
from fries_flink_spark.pipeline.quantize import dequant_error, quantize_int8
from fries_flink_spark.pipeline.sampling import (
    frac_to_hex,
    sample_bernoulli,
    sample_reservoir,
    sample_stratified,
    split_train_holdout,
)
from fries_flink_spark.text.pii import PII_PATTERNS, pii_count, pii_total, redact


def test_frac_to_hex_bounds():
    assert frac_to_hex(0.0) == "00000000"
    # exact endpoints: 0 keeps nothing, 1 keeps everything (threshold must
    # sort after every 8-char hex prefix under STRING comparison)
    assert frac_to_hex(1.0) > "ffffffff"
    with pytest.raises(ValueError):
        frac_to_hex(1.5)


def test_sample_bernoulli_deterministic_and_calibrated(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = sample_bernoulli(docs, "doc_id", 0.3)
    s2 = sample_bernoulli(docs.repartition(7), "doc_id", 0.3)
    c1, c2 = s1.count(), s2.count()
    assert c1 == c2  # partition-invariant, unlike DataFrame.sample
    assert abs(c1 / n - 0.3) < 0.15  # calibrated within noise at sf0.001
    # monotone nesting: the 10% sample is a subset of the 30% sample
    s_small = sample_bernoulli(docs, "doc_id", 0.1)
    assert s_small.join(s1, "doc_id", "left_anti").count() == 0


def test_sample_stratified_respects_fractions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sample_stratified(docs, "doc_id", "source", {"src0": 1.0}, 0.0)
    kept = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    all_src0 = docs.filter(F.col("source") == "src0").count()
    assert kept.get("src0") == all_src0  # fraction 1.0 keeps everything
    assert set(kept) == {"src0"}  # default 0.0 keeps nothing else


def test_sample_reservoir_fixed_size_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = sample_reservoir(docs, "doc_id", "source", 3)
    sizes = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    per_stratum = {
        r["source"]: r["count"] for r in docs.groupBy("source").count().collect()
    }
    for src, available in per_stratum.items():
        assert sizes[src] == min(3, available)
    # deterministic under repartitioning
    again = sample_reservoir(docs.repartition(5), "doc_id", "source", 3)
    assert sorted(out.select("doc_id").toPandas()["doc_id"]) == sorted(
        again.select("doc_id").toPandas()["doc_id"]
    )


def test_split_train_holdout_partitions_exactly(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    train, hold = split_train_holdout(docs, "doc_id", 0.25)
    n = docs.count()
    assert train.count() + hold.count() == n
    assert train.join(hold, "doc_id", "inner").count() == 0


def test_mix_weighted_replication_and_fractional(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 2.0, "src1": 0.5}
    mixed = mix_weighted(docs, "doc_id", "source", rates, 0.0)
    per = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    n0 = docs.filter(F.col("source") == "src0").count()
    n1 = docs.filter(F.col("source") == "src1").count()
    assert per.get("src0") == 2 * n0  # integer rate: exact replication
    assert 0 < per.get("src1", 0) < n1  # fractional rate: strict subsample
    assert "src2" not in per  # default 0.0 drops unlisted strata
    # rep index is 1-based and bounded by ceil(rate)
    reps = mixed.filter(F.col("source") == "src0").select("rep").distinct()
    assert sorted(r["rep"] for r in reps.collect()) == [1, 2]
    # stats sum to 1
    stats = mixture_stats(mixed, "source")
    total_share = sum(r["share"] for r in stats.collect())
    assert abs(total_share - 1.0) < 1e-4


def test_pack_sequences_budget_and_order(spark):
    rows = [(i, 10 * (i % 3 + 1)) for i in range(20)]  # tokens 10/20/30
    df = spark.createDataFrame(rows, "id int, tokens int")
    packed = pack_sequences(df, "tokens", "id", budget=50)
    pdf = packed.orderBy("id").toPandas()
    # bin ids are non-decreasing in layout order and start at 0
    assert pdf["bin_id"].iloc[0] == 0
    assert (pdf["bin_id"].diff().dropna() >= 0).all()
    stats = pack_stats(packed, "tokens", 50).orderBy("bin_id").toPandas()
    # every bin except possibly the last is filled near budget; none exceeds
    # budget by more than one document's worth under concat-and-chunk
    assert (stats["tokens"].iloc[:-1] > 0).all()
    assert stats["n_docs"].sum() == 20


def test_pack_oversized_doc_gets_own_overfull_bin(spark):
    df = spark.createDataFrame([(1, 10), (2, 120), (3, 10)], "id int, tokens int")
    packed = pack_sequences(df, "tokens", "id", budget=50).orderBy("id").collect()
    bins = [r["bin_id"] for r in packed]
    # 10/120/10 tokens, budget 50: doc2 joins doc1's bin (cum_before=10),
    # overfills it, and doc3 starts fresh at floor(130/50) = bin 2.
    assert bins == [0, 0, 2]


def test_quantize_int8_roundtrip_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    q = dequant_error(quantize_int8(emb, "embedding"), "embedding")
    rows = q.select("q", "q_scale", "max_err", "mse").collect()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["q"])
        # max reconstruction error of symmetric int8 is scale/2 per component
        assert r["max_err"] <= r["q_scale"] / 2 + 1e-9
        assert r["mse"] >= 0


def test_quantize_zero_vector_safe(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id int, v array<double>")
    out = quantize_int8(df, "v").collect()[0]
    assert out["q_scale"] == 1.0
    assert list(out["q"]) == [0, 0, 0]


def test_pii_redact_and_count(spark):
    text = (
        "mail bob.smith+x@corp.example.org, call 555-123-4567, "
        "ip 192.168.0.1, ssn 123-45-6789 end"
    )
    df = spark.createDataFrame([(text,)], "t string")
    out = df.select(
        redact(F.col("t")).alias("r"),
        pii_total(F.col("t")).alias("n"),
        *[pii_count(F.col("t"), k).alias(k) for k in PII_PATTERNS],
    ).collect()[0]
    assert "<EMAIL>" in out["r"] and "<PHONE>" in out["r"]
    assert "<IP>" in out["r"] and "<SSN>" in out["r"]
    assert "@" not in out["r"] and "192.168" not in out["r"]
    assert out["n"] == 4
    assert out["email"] == 1 and out["ipv4"] == 1
    # phone/ssn shapes do not double count: the ssn is NOT also a phone
    assert out["phone"] == 1 and out["ssn"] == 1


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii here at all",)], "t string")
    out = df.select(redact(F.col("t")).alias("r"), pii_total(F.col("t")).alias("n"))
    row = out.collect()[0]
    assert row["r"] == "no pii here at all"
    assert row["n"] == 0


def test_assign_consecutive_ids_dense_and_ordered(spark, sf_dir):
    from fries_flink_spark.pipeline.ids import assign_consecutive_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    out = assign_consecutive_ids(docs, "doc_id", n_partitions=5).collect()
    ids = sorted(r["row_id"] for r in out)
    assert ids == list(range(n))  # dense 0..N-1, no gaps or dupes
    by_key = sorted(out, key=lambda r: r["doc_id"])
    assert [r["row_id"] for r in by_key] == list(range(n))  # follows key order
    # partition-count invariance
    again = assign_consecutive_ids(
        docs.repartition(13), "doc_id", n_partitions=3
    ).collect()
    assert {r["doc_id"]: r["row_id"] for r in again} == {
        r["doc_id"]: r["row_id"] for r in out
    }


def test_assign_consecutive_ids_pins_partitioning(spark, sf_dir):
    """The ranged layout must be persisted so the counts job and the id job
    read the SAME physical partitioning (range boundaries are sampled with a
    per-execution seed) — and the source is scanned once, not twice."""
    from fries_flink_spark.pipeline.ids import assign_consecutive_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = assign_consecutive_ids(docs, "doc_id", n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # id pass reads the persisted layout
    n = docs.count()
    assert sorted(r["row_id"] for r in out.collect()) == list(range(n))
    spark.catalog.clearCache()


def test_epoch_shuffle_properties(spark):
    """Different epochs give different orders; same epoch is reproducible;
    positions are a dense permutation."""
    from fries_flink_spark.pipeline.shuffle import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")
    e1 = {r.k: r.shuffle_pos for r in deterministic_shuffle(df, "k", epoch=1).collect()}
    e1b = {r.k: r.shuffle_pos for r in deterministic_shuffle(df, "k", epoch=1).collect()}
    e2 = {r.k: r.shuffle_pos for r in deterministic_shuffle(df, "k", epoch=2).collect()}
    assert e1 == e1b                       # reproducible
    assert sorted(e1.values()) == list(range(200))  # dense permutation
    assert e1 != e2                        # epochs decorrelate
    # not the identity order (hash actually shuffles)
    assert [e1[i] for i in range(200)] != list(range(200))


def test_validate_annotate_and_uniqueness(spark):
    from pyspark.sql import functions as F

    from fries_flink_spark.pipeline.validate import (
        annotate,
        summarize,
        uniqueness_violations,
    )

    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, -1.0, "b"), (2, 3.0, None), (4, 50.0, "a")],
        "id long, v double, tag string",
    )
    rules = {"v_nonneg": F.col("v") >= 0, "tag_set": F.col("tag").isin("a", "b")}
    ann = annotate(df, rules)
    got = {(r.id, r.v): (r.ok_v_nonneg, r.ok_tag_set, r.all_ok) for r in ann.collect()}
    assert got[(2, -1.0)] == (False, True, False)
    assert got[(2, 3.0)] == (True, False, False)   # NULL tag counts as violation
    assert got[(1, 5.0)] == (True, True, True)
    s = {r.rule: (r.n_rows, r.n_violations) for r in summarize(df, rules).collect()}
    assert s == {"v_nonneg": (4, 1), "tag_set": (4, 1)}
    u = uniqueness_violations(df, ["id"]).collect()
    assert [(r.id, r.n) for r in u] == [(2, 2)]


class TestMixTemperature:
    def _df(self, spark):
        rows = [(i, "big" if i < 90 else "small") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_majority_stratum_unchanged(self, spark):
        from fries_flink_spark.pipeline.mixing import mix_temperature

        out = mix_temperature(self._df(spark), "doc_id", "lang", temperature=0.5)
        big = out.filter(F.col("lang") == "big")
        assert big.count() == 90  # rate 1.0: every row exactly once
        assert big.select(F.max("rep")).first()[0] == 1

    def test_minority_upsampled_to_sqrt_rate(self, spark):
        from fries_flink_spark.pipeline.mixing import mix_temperature

        out = mix_temperature(self._df(spark), "doc_id", "lang", temperature=0.5)
        small = out.filter(F.col("lang") == "small").count()
        # rate = sqrt(90/10) = 3.0 exactly -> every row exactly 3 times
        assert small == 30

    def test_max_rate_caps_fanout(self, spark):
        from fries_flink_spark.pipeline.mixing import mix_temperature

        rows = [(i, "big" if i < 99 else "tiny") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = mix_temperature(df, "doc_id", "lang", temperature=1.0, max_rate=4.0)
        # uncapped rate would be 99; cap 4.0 -> exactly 4 replicas
        assert out.filter(F.col("lang") == "tiny").count() == 4

    def test_deterministic_across_runs(self, spark):
        from fries_flink_spark.pipeline.mixing import mix_temperature

        rows = [(i, "a" if i % 3 else "b") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        a = sorted(map(tuple, mix_temperature(df, "doc_id", "lang").collect()))
        b = sorted(
            map(tuple, mix_temperature(df.repartition(7), "doc_id", "lang").collect())
        )
        assert a == b

    def test_rejects_existing_rep_column(self, spark):
        from fries_flink_spark.pipeline.mixing import mix_temperature

        df = self._df(spark).withColumn("rep", F.lit(1))
        with pytest.raises(ValueError, match="rep"):
            mix_temperature(df, "doc_id", "lang")


def test_assign_shards_serpentine(spark):
    from fries_flink_spark.pipeline.sharding import assign_shards, shard_stats

    # tokens 8,7,6,5,4,3 over 3 shards: ranks 0,1,2 -> shards 0,1,2 (block 0),
    # ranks 3,4,5 -> shards 2,1,0 (block 1 reversed).
    rows = [(i, t) for i, t in enumerate([8, 7, 6, 5, 4, 3])]
    df = spark.createDataFrame(rows, "doc_id int, tokens int")
    sharded = assign_shards(df, "tokens", "doc_id", n_shards=3)
    by_id = {r["doc_id"]: r["shard"] for r in sharded.collect()}
    assert by_id == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}
    # Serpentine balance: totals 8+3, 7+4, 6+5 -> perfectly equal here.
    totals = {r["shard"]: r["tokens"] for r in shard_stats(sharded, "tokens").collect()}
    assert totals == {0: 11, 1: 11, 2: 11}


def test_assign_shards_imbalance_bound(spark):
    import random

    from fries_flink_spark.pipeline.sharding import assign_shards, shard_stats

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 1000)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, tokens int")
    stats = shard_stats(
        assign_shards(df, "tokens", "doc_id", n_shards=8), "tokens"
    ).collect()
    totals = [r["tokens"] for r in stats]
    assert len(totals) == 8
    # Serpentine bound: spread is at most ~the largest item, far under naive
    # hash assignment's variance.
    assert max(totals) - min(totals) <= 1000


def test_gopher_rules_hand_fixture(spark):
    from fries_flink_spark.text.analysis import gopher_rules
    from fries_flink_spark.pipeline.validate import summarize

    good = (
        "the quick brown fox jumps over the lazy dog and then it runs back "
        "home with the ball for fun in the warm sun all day long today"
    )
    too_short = "just five words right here"
    symbols = "the !!! ??? ### " + " ".join(["$$$%%%"] * 30)
    df = spark.createDataFrame([(1, good), (2, too_short), (3, symbols)], "id int, t string")
    rules = gopher_rules(F.col("t"))
    rows = {r["id"]: r for r in df.select("id", *[rules[k].alias(k) for k in rules]).collect()}
    assert all(rows[1][k] for k in rules)          # clean prose passes all
    assert not rows[2]["words_in_range"]           # too short
    assert not rows[3]["symbol_ratio_ok"]          # symbol soup
    assert not rows[3]["alpha_ratio_ok"]
    # rule set composes with the validation stage's one-pass summary
    summary = {r["rule"]: r["n_violations"] for r in summarize(df, rules).collect()}
    assert summary["words_in_range"] >= 1 and summary["symbol_ratio_ok"] >= 1


def test_pca_moments_partition_invariant(spark):
    import numpy as np

    from fries_flink_spark.pipeline.pca import second_moments

    rows = [(i, [float(i % 7) / 3.0, float(i % 5) - 2.0, 0.25 * i]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    n1, s1, g1 = second_moments(df.repartition(1), "embedding", 3)
    n8, s8, g8 = second_moments(df.repartition(8), "embedding", 3)
    assert n1 == n8 == 60
    assert (s1 == s8).all() and (g1 == g8).all()  # integer sums: exact


def test_pca_projects_onto_dominant_axis(spark):
    import numpy as np

    from fries_flink_spark.pipeline.pca import (
        pca_components,
        project_pca,
        second_moments,
    )

    # Variance almost entirely along dim 0.
    rows = [(i, [float(i), 0.001 * (i % 3), 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    n, s, g = second_moments(df, "embedding", 3)
    mu, comp = pca_components(n, s, g, k=1)
    assert abs(abs(comp[0, 0]) - 1.0) < 1e-3  # first axis ~ e0
    out = {r["vec_id"]: r["pc"] for r in project_pca(df, "embedding", "vec_id", mu, comp).collect()}
    # projections are centered: min and max are symmetric around 0
    vals = [v[0] for v in out.values()]
    assert abs(max(vals) + min(vals)) <= 1  # micro-unit rounding slack


def test_split_by_group_is_atomic(spark):
    from fries_flink_spark.pipeline.sampling import split_by_group

    rows = [(i, f"dom{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, domain string")
    out = split_by_group(df, "domain", 0.4)
    per_group = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(
            __import__("pyspark.sql.functions", fromlist=["countDistinct"]).countDistinct("split").alias("n")
        ).collect()
    }
    assert all(n == 1 for n in per_group.values())  # no group straddles


def test_take_token_budget_exact_prefix(spark):
    from fries_flink_spark.pipeline.sampling import take_token_budget

    rows = [(i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, tokens int")
    kept = take_token_budget(df, "tokens", "doc_id", budget=95)
    # 10-token docs, budget 95 -> exactly 9 kept regardless of partitioning
    assert kept.count() == 9
    assert take_token_budget(df.repartition(7), "tokens", "doc_id", 95).count() == 9


# ---------------------------------------------------------------- DSIR


class TestDsir:
    def _corpus(self, spark):
        rows = [
            # target domain: legal-ish vocabulary
            (1, "tgt", "the court finds the motion granted"),
            (2, "tgt", "the court denies the motion with prejudice"),
            (3, "tgt", "counsel for the motion addressed the court"),
            # raw pool: mixed
            (4, "web", "click here to win a free prize now"),
            (5, "web", "the court schedule and the motion docket"),  # target-like
            (6, "web", "best pizza recipes for a quick dinner"),
            (7, "web", "single"),
        ]
        return spark.createDataFrame(rows, "doc_id int, source string, text string")

    def test_hashed_grams_counts(self, spark):
        from fries_flink_spark.pipeline.dsir import hashed_grams

        df = self._corpus(spark)
        per_doc = {
            r["doc_id"]: r["n"]
            for r in hashed_grams(df, "text", "doc_id")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # k tokens -> k unigrams + (k-1) bigrams; 1 token -> 1 gram only
        assert per_doc[1] == 6 + 5
        assert per_doc[7] == 1

    def test_importance_matches_python_replay(self, spark):
        import hashlib
        import math

        from fries_flink_spark.pipeline.dsir import (
            bucket_counts,
            bucket_log_ratio,
            doc_importance,
            hashed_grams,
        )

        df = self._corpus(spark)

        def grams_of(text):
            t = text.lower().split()
            gs = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
            return [hashlib.md5(g.encode()).hexdigest()[:2] for g in gs]

        rows = [(r["doc_id"], r["source"], r["text"]) for r in df.collect()]
        raw, tgt = {}, {}
        for _, src, text in rows:
            for b in grams_of(text):
                raw[b] = raw.get(b, 0) + 1
                if src == "tgt":
                    tgt[b] = tgt.get(b, 0) + 1
        rt, tt = sum(raw.values()), sum(tgt.values())
        lr = {
            b: math.floor(
                (math.log((tgt.get(b, 0) + 1) / (tt + 256))
                 - math.log((raw[b] + 1) / (rt + 256))) * 1e6 + 0.5)
            for b in raw
        }
        expect = {
            did: sum(lr[b] for b in grams_of(text)) for did, _, text in rows
        }

        grams = hashed_grams(df, "text", "doc_id")
        tagged = grams.join(
            df.select("doc_id", (F.col("source") == "tgt").alias("__is_t")), "doc_id"
        )
        model = bucket_log_ratio(
            bucket_counts(tagged.filter("__is_t")), bucket_counts(tagged), tt, rt
        )
        got = {
            r["doc_id"]: r["weight_micro"]
            for r in doc_importance(df, "text", "doc_id", model).collect()
        }
        assert got == expect
        # target-like raw doc outscores off-domain raw docs
        assert got[5] > got[4] and got[5] > got[6]

    def test_gumbel_topk_deterministic_and_sized(self, spark):
        from fries_flink_spark.pipeline.dsir import (
            bucket_counts,
            bucket_log_ratio,
            doc_importance,
            hashed_grams,
        )
        from fries_flink_spark.pipeline.dsir import gumbel_topk

        df = self._corpus(spark)
        grams = hashed_grams(df, "text", "doc_id")
        tagged = grams.join(
            df.select("doc_id", (F.col("source") == "tgt").alias("__is_t")), "doc_id"
        )
        tots = tagged.agg(
            F.count(F.lit(1)).alias("rt"),
            F.sum(F.col("__is_t").cast("bigint")).alias("tt"),
        ).first()
        model = bucket_log_ratio(
            bucket_counts(tagged.filter("__is_t")), bucket_counts(tagged),
            int(tots["tt"]), int(tots["rt"]),
        )
        w = doc_importance(df, "text", "doc_id", model)
        a = [r["doc_id"] for r in gumbel_topk(w, "doc_id", 3).collect()]
        b = [r["doc_id"] for r in gumbel_topk(w.repartition(5), "doc_id", 3).collect()]
        assert len(a) == 3 and a == b  # partition-invariant draw
        c = gumbel_topk(w, "doc_id", 3, seed="other").collect()
        assert len(c) == 3  # a different seed is an equally valid draw
