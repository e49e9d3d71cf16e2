"""Multimodal plumbing tests: SYN codec round-trips through Spark binary
columns, mapInPandas batch shapes, resize math, frame sampling, features."""

from __future__ import annotations

import numpy as np
import pytest

from fries_flink_spark.multimodal.media import (
    decode_jpeg,
    decode_syn_image,
    encode_syn_image,
    encode_syn_video,
    image_features,
    image_metadata,
    resize_images,
    sample_frames,
)


@pytest.fixture()
def images(spark):
    rng = np.random.default_rng(42)
    rows = [
        (i, bytearray(encode_syn_image(rng.integers(0, 256, (16, 12, 3), dtype=np.uint8))))
        for i in range(5)
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_codec_roundtrip():
    arr = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    assert np.array_equal(decode_syn_image(encode_syn_image(arr)), arr)


def test_metadata_header_parse(spark, images):
    out = image_metadata(images).select("media_id", "meta.*").collect()
    assert all(r.width == 12 and r.height == 16 and r.channels == 3 for r in out)
    assert all(r.n_bytes == 9 + 16 * 12 * 3 for r in out)


def test_metadata_unknown_format(spark):
    df = spark.createDataFrame([(1, bytearray(b"JUNKJUNK"))], "media_id long, content binary")
    r = image_metadata(df).select("meta.*").collect()[0]
    assert r.format == "unknown" and r.width is None and r.n_bytes == 8


def test_resize_shape_and_determinism(spark, images):
    out = resize_images(images, out_w=6, out_h=8).collect()
    for r in out:
        arr = decode_syn_image(bytes(r.content))
        assert arr.shape == (8, 6, 3)
    # deterministic: same input -> identical bytes on rerun
    again = resize_images(images, out_w=6, out_h=8).collect()
    assert {r.media_id: bytes(r.content) for r in out} == {
        r.media_id: bytes(r.content) for r in again
    }


def test_frame_sampling(spark):
    frames = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    df = spark.createDataFrame(
        [(7, bytearray(encode_syn_video(frames)))], "media_id long, content binary"
    )
    out = sample_frames(df, every_nth=2).collect()
    assert [r.frame_idx for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 2, 4]
    f0 = decode_syn_image(bytes(sorted(out, key=lambda r: r.frame_idx)[0].content))
    assert np.array_equal(f0[:, :, 0], frames[0])


def test_features_shape_and_values(spark):
    flat = np.zeros((4, 4), dtype=np.uint8)  # all-zero image
    df = spark.createDataFrame(
        [(1, bytearray(encode_syn_image(flat)))], "media_id long, content binary"
    )
    r = image_features(df, n_bins=8).collect()[0]
    assert len(r.features) == 8
    assert r.features[0] == 1.0 and sum(r.features) == 1.0
    assert r.mean_intensity == 0.0 and r.std_intensity == 0.0


def test_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8\xff")


def test_audio_roundtrip_and_features(spark):
    from fries_flink_spark.multimodal.media import (
        audio_features,
        decode_syn_audio,
        encode_syn_audio,
        resample_audio,
    )

    t = np.arange(1024)
    wave = (10000 * np.sin(2 * np.pi * t / 64)).astype(np.int16)
    back, rate = decode_syn_audio(encode_syn_audio(wave, 8000))
    assert rate == 8000 and np.array_equal(back, wave)

    df = spark.createDataFrame(
        [(1, bytearray(encode_syn_audio(wave, 8000)))], "media_id long, content binary"
    )
    half = resample_audio(df, out_rate=4000).collect()[0]
    samples, r2 = decode_syn_audio(bytes(half.content))
    assert r2 == 4000 and len(samples) == 512

    feats = audio_features(df, frame_len=256).collect()[0]
    assert feats.sample_rate == 8000 and len(feats.frame_rms) == 4
    # a pure sine's RMS ≈ amplitude/sqrt(2)
    expected = (10000 / 32768.0) / np.sqrt(2)
    assert all(abs(v - expected) < 0.01 for v in feats.frame_rms)
    assert abs(feats.peak - 10000 / 32768.0) < 1e-6


def test_silence_features(spark):
    from fries_flink_spark.multimodal.media import audio_features, encode_syn_audio

    df = spark.createDataFrame(
        [(2, bytearray(encode_syn_audio(np.zeros(100, dtype=np.int16), 16000)))],
        "media_id long, content binary",
    )
    r = audio_features(df, frame_len=50).collect()[0]
    assert r.frame_rms == [0.0, 0.0] and r.peak == 0.0


def test_golden_mm_image_features_matches_spark(spark, sf_dir):
    """The independent numpy golden (queries/golden.py) must equal the Spark
    mapInPandas featurizer value-for-value — this is the driver's oracle."""
    import duckdb

    from fries_flink_spark.queries import golden as g
    from fries_flink_spark.queries.multimodal_queries import mm_image_features

    path = g.ensure_mm_image_features(sf_dir, force=True)
    got = {
        r["media_id"]: (r["features_str"], r["mean_intensity"], r["std_intensity"])
        for r in mm_image_features(spark, sf_dir).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(f"SELECT * FROM read_parquet('{path}')").fetchall()
    }
    assert got == want  # bit-identical doubles + identical micro-unit strings


def test_golden_sim_topk_ivf_matches_spark(spark, sf_dir):
    import duckdb

    from fries_flink_spark.queries import golden as g
    from fries_flink_spark.queries.similarity_queries import sim_topk_ivf

    path = g.ensure_sim_topk_ivf(sf_dir, force=True)
    got = [(r["vec_id"], r["cos4"]) for r in sim_topk_ivf(spark, sf_dir).collect()]
    want = duckdb.sql(
        f"SELECT vec_id, cos4 FROM read_parquet('{path}') ORDER BY cos4 DESC, vec_id"
    ).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]


def test_scene_cut_detection(spark):
    import numpy as np

    from fries_flink_spark.multimodal.media import (
        detect_scene_cuts,
        encode_syn_video,
    )

    # 4 frames: flat 10, flat 12 (no cut), flat 200 (cut), flat 205 (no cut)
    frames = np.stack(
        [np.full((8, 8), v, dtype=np.uint8) for v in (10, 12, 200, 205)]
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_syn_video(frames)))], "media_id long, content binary"
    )
    rows = sorted(
        detect_scene_cuts(df, threshold=16.0).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["is_cut"] for r in rows] == [False, False, True, False]
    assert rows[0]["mean_intensity"] == 10.0
    assert rows[2]["mean_intensity"] == 200.0
