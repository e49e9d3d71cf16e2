"""The stateless training-data pipeline operators must run UNCHANGED under
Structured Streaming (they are pure row-wise expressions), producing exactly
the batch result once the bounded stream drains — the property that makes the
same scrub/sample/mix definitions usable in both backfill and live ingest."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from fries_flink_spark.catalog import load_table
from fries_flink_spark.pipeline.sampling import sample_stratified
from fries_flink_spark.streaming.sources import stream_from_df
from fries_flink_spark.streaming.windows import run_to_completion
from fries_flink_spark.text.pii import pii_total, redact


@pytest.fixture(scope="module")
def doc_stream(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sdf, stage = stream_from_df(docs, n_chunks=3, order_col="doc_id")
    yield sdf
    shutil.rmtree(stage, ignore_errors=True)


def test_streaming_pii_scrub_matches_batch(spark, sf_dir, doc_stream):
    def scrub(df):
        return df.select(
            "doc_id",
            F.md5(redact(F.col("text"))).alias("redacted_md5"),
            pii_total(F.col("text")).alias("n_pii"),
        )

    s = run_to_completion(scrub(doc_stream), "pii_stream", "append")
    got = {
        r["doc_id"]: (r["redacted_md5"], r["n_pii"])
        for r in s.sql("SELECT * FROM pii_stream").collect()
    }
    want = {
        r["doc_id"]: (r["redacted_md5"], r["n_pii"])
        for r in scrub(load_table(spark, sf_dir, "documents")).collect()
    }
    assert got == want


def test_streaming_stratified_sample_matches_batch(spark, sf_dir, doc_stream):
    fracs = {"src0": 1.0, "src1": 0.5}
    sampled = sample_stratified(doc_stream, "doc_id", "source", fracs, 0.1)
    s = run_to_completion(sampled.select("doc_id"), "sample_stream", "append")
    got = sorted(
        r["doc_id"] for r in s.sql("SELECT doc_id FROM sample_stream").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in sample_stratified(
            load_table(spark, sf_dir, "documents"), "doc_id", "source", fracs, 0.1
        )
        .select("doc_id")
        .collect()
    )
    # hash-threshold sampling is partition- and arrival-order-invariant, so
    # the streamed sample is EXACTLY the batch sample
    assert got == want


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir):
    """Live-ingest dedup: each micro-batch probes the band index grown by all
    prior batches (foreachBatch — the corpus is never re-hashed). With chunks
    arriving in doc_id order, the streamed survivors equal the one-shot batch
    result exactly: cross-chunk 'earlier doc' collisions are caught by the
    grown index, within-chunk ones by the in-batch rule."""
    from fries_flink_spark.dedup.minhash import (
        band_table,
        incremental_dedup,
        minhash_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)

    index0 = band_table(minhash_table(corpus, "text", "doc_id"), "doc_id")
    # one-shot reference
    want = sorted(
        r["doc_id"]
        for r in incremental_dedup(new, index0, "text", "doc_id")[0]
        .select("doc_id")
        .collect()
    )

    sdf, stage = stream_from_df(new, n_chunks=3, order_col="doc_id")
    state = {"index": index0.localCheckpoint(eager=True)}
    got: list[int] = []

    def ingest(batch_df, _epoch):
        survivors, new_entries = incremental_dedup(
            batch_df, state["index"], "text", "doc_id"
        )
        got.extend(r["doc_id"] for r in survivors.select("doc_id").collect())
        # production form: append new_entries to the bucketed index table;
        # here: grow in memory with lineage truncation per epoch
        state["index"] = state["index"].unionByName(new_entries).localCheckpoint(
            eager=True
        )

    q = (
        sdf.writeStream.foreachBatch(ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", stage + "/_ckpt")
        .start()
    )
    q.awaitTermination(120)
    shutil.rmtree(stage, ignore_errors=True)
    assert sorted(got) == want
