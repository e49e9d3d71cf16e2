"""Product quantization (similarity/pq.py): determinism, compression
shape, ADC math, and the shortlist-rerank recall band."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.similarity.ann import cosine_topk
from fries_flink_spark.similarity.pq import (
    _codes_for,
    l2_normalize,
    pq_adc_topk,
    pq_encode,
    pq_shortlist_rerank,
    pq_train,
)


def test_codes_for_matches_naive_argmin():
    rng = np.random.default_rng(7)
    X = rng.normal(size=(20, 8))
    books = rng.normal(size=(4, 3, 2))  # m=4 subspaces of 2 dims, ksub=3
    got = _codes_for(X, books)
    for n in range(20):
        for s in range(4):
            sub = X[n, s * 2 : s * 2 + 2]
            dists = ((books[s] - sub) ** 2).sum(axis=1)
            assert got[n, s] == int(np.argmin(dists))


def test_train_is_deterministic_and_encode_shape(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    b1 = pq_train(emb, "embedding", "vec_id", dim=64, m=8, ksub=16, n_iter=1)
    b2 = pq_train(emb, "embedding", "vec_id", dim=64, m=8, ksub=16, n_iter=1)
    assert b1.shape == (8, 16, 8)
    assert np.array_equal(b1, b2)  # same data, same seeds, same plan
    codes = pq_encode(emb, "embedding", "vec_id", b1)
    row = codes.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])


def test_adc_scores_equal_lut_sum(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    books = pq_train(emb, "embedding", "vec_id", dim=64, m=8, ksub=16, n_iter=1)
    codes = pq_encode(emb, "embedding", "vec_id", books)
    q = [float(i % 5 - 2) for i in range(64)]
    got = {r["vec_id"]: r["score"] for r in pq_adc_topk(codes, "vec_id", books, q, k=50).collect()}
    qs = np.asarray(q).reshape(8, 8)
    lut = np.einsum("md,mkd->mk", qs, books)
    for r in codes.collect():
        want = sum(lut[s, c] for s, c in enumerate(r["codes"]))
        assert math.isclose(got[r["vec_id"]], want, rel_tol=1e-12)


def test_shortlist_rerank_recall_band(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    qv = [float(x) for x in load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()["embedding"]]
    qn = math.sqrt(sum(x * x for x in qv))
    qvn = [x / qn for x in qv]
    nemb = l2_normalize(emb, "embedding", "vec_id")
    books = pq_train(nemb, "embedding", "vec_id", dim=64, m=16, ksub=32, n_iter=2)
    codes = pq_encode(nemb, "embedding", "vec_id", books)
    rr = {r.vec_id for r in pq_shortlist_rerank(emb, codes, "embedding", "vec_id", books, qvn, k=10, shortlist=50).collect()}
    brute = {r.vec_id for r in cosine_topk(emb, "embedding", "vec_id", qv, k=10).collect()}
    assert len(rr & brute) >= 7  # observed 10/10 at sf0.01/0.001
