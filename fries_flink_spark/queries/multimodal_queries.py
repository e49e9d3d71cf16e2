"""Multimodal queries over the documents table (binary-column pipeline).

No binary media table ships in the test data, so these derive a deterministic
binary column from ``documents.text`` (utf-8 bytes) — the point is the
binary-column plumbing at real table scale, not the codec.
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..catalog import load_table
from ..multimodal.media import IMAGE_MAGIC, VIDEO_MAGIC, image_features
from ..registry import query, sorted_result
from . import golden as _golden


def _syn_content(header: bytes, n_bytes: int) -> Column:
    """SYN media content derived from ``text`` in pure codegen: the first
    ``n_bytes`` utf-8 bytes zero-padded to ``n_bytes``, behind the constant
    ``header``. Byte-identical to the former Python/mapInPandas synthesizer
    (substring/rpad operate bytewise on BINARY, exactly like the numpy
    slice-and-pad) — keeping the synthesis in the JVM removes one whole
    MapInPandas stage per pipeline, so the media bytes cross the Arrow
    boundary once (into the feature operator) instead of twice."""
    return F.concat(
        F.lit(header),
        F.rpad(
            F.substring(F.encode(F.col("text"), "UTF-8"), 1, n_bytes),
            n_bytes,
            bytes([0]),
        ),
    )


@query(
    "mm_media_meta",
    oracle="""
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS checksum
    FROM documents ORDER BY doc_id
    """,
)
def mm_media_meta(spark, sf_dir):
    """Manifest pass over a binary column: size + checksum without decoding —
    the cheap first stage of any media pipeline (header/metadata only)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.md5(blob).alias("checksum"),
    ).orderBy("doc_id")


@query(
    "mm_image_features",
    # Value-level oracle via a golden parquet computed by an INDEPENDENT
    # numpy implementation (queries/golden.py — no Spark, no reuse of
    # multimodal/media.py). Every emitted quantity is dyadic-exact or an
    # integer, so the compare is bit-identical by construction.
    oracle=f"""
    SELECT media_id, features_str, mean_intensity, std_intensity
    FROM read_parquet('{_golden.golden_path("mm_image_features", _golden.DRIVER_SF_DIR)}')
    ORDER BY media_id
    """,
)
def mm_image_features(spark, sf_dir):
    """Full binary pipeline on a real table: pack each document's bytes into a
    deterministic 16x16 SYN image, then run the mapInPandas feature extractor
    (histogram + mean/std). Exercises binary column -> Arrow batch -> numpy ->
    fixed-width vector at table scale."""
    _golden.ensure_mm_image_features(sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("media_id"),
        _syn_content(IMAGE_MAGIC + _struct.pack(">HHB", 16, 16, 1), 256).alias(
            "content"
        ),
    )
    feats = image_features(imgs)
    # Driver-hashable projection: the canonicalizer can't hash array<double>
    # cells, so flatten the vector to '|'-joined INTEGER micro-units
    # (floor(x*1e6+0.5) — exact for the dyadic k/256 histogram values; no
    # engine float formatting involved). Mean/std are dyadic-exact or a
    # correctly-rounded sqrt of an exact value, so they ship unrounded.
    return feats.select(
        "media_id",
        F.array_join(
            F.transform(
                F.col("features"),
                lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("string"),
            ),
            "|",
        ).alias("features_str"),
        "mean_intensity",
        "std_intensity",
    ).transform(sorted_result, "media_id")


@query(
    "mm_video_frames",
    oracle=f"""
    SELECT media_id, frame_idx, mean_intensity, peak
    FROM read_parquet('{_golden.golden_path("mm_video_frames", _golden.DRIVER_SF_DIR)}')
    ORDER BY media_id, frame_idx
    """,
)
def mm_video_frames(spark, sf_dir):
    """Video pipeline on a real table: pack each document's bytes into a
    deterministic 4-frame 8x8 SYN video, stride-2 frame sampling
    (multimodal/media.sample_frames — the explode-shaped transform), then
    per-frame mean (sum/64, dyadic-exact) and peak. Golden-parquet oracle
    from an independent numpy replay."""
    from ..multimodal.media import sample_frames

    _golden.ensure_mm_video_frames(sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        _syn_content(VIDEO_MAGIC + _struct.pack(">HHH", 8, 8, 4), 256).alias(
            "content"
        ),
    )
    frames = sample_frames(vids, every_nth=2)

    def frame_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..multimodal.media import decode_syn_image

        for pdf in batches:
            rows = []
            for mid, fi, data in zip(pdf["media_id"], pdf["frame_idx"], pdf["content"]):
                arr = decode_syn_image(bytes(data)).astype(np.float64)
                rows.append((mid, fi, float(arr.sum() / 64.0), int(arr.max())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "mean_intensity", "peak"]
            )

    return frames.mapInPandas(
        frame_stats,
        schema="media_id long, frame_idx int, mean_intensity double, peak long",
    ).orderBy("media_id", "frame_idx")


@query(
    "mm_audio_features",
    oracle=f"""
    SELECT media_id, rms_str, peak
    FROM read_parquet('{_golden.golden_path("mm_audio_features", _golden.DRIVER_SF_DIR)}')
    ORDER BY media_id
    """,
)
def mm_audio_features(spark, sf_dir):
    """Audio pipeline on a real table: doc bytes -> deterministic 512-sample
    int16 SYN audio, then multimodal/media.audio_features (frame RMS + peak,
    frame_len=128 -> 4 frames). RMS ships as '|'-joined integer micro-units
    (every intermediate is an exact double; see golden.ensure_mm_audio_features)."""
    from ..multimodal.media import audio_features, encode_syn_audio

    _golden.ensure_mm_audio_features(sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def to_syn_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(text.encode("utf-8")[:512], dtype=np.uint8)
                b = np.zeros(512, dtype=np.uint8)
                b[: len(raw)] = raw
                samples = (b.astype(np.int16) - 128) * 256
                rows.append((did, encode_syn_audio(samples, 16000)))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    clips = docs.mapInPandas(to_syn_audio, schema="media_id long, content binary")
    feats = audio_features(clips, frame_len=128)
    return feats.select(
        "media_id",
        F.array_join(
            F.transform(
                F.col("frame_rms"),
                lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("string"),
            ),
            "|",
        ).alias("rms_str"),
        "peak",
    ).orderBy("media_id")


@query("mm_video_scenecut", oracle=None)  # golden oracle set below
def mm_video_scenecut(spark, sf_dir):
    """Shot-boundary detection on SYN video (multimodal/media.detect_scene_cuts):
    frame-diff of per-frame means against a dyadic threshold — one mapInPandas
    pass, flags engine-exact against the independent numpy golden."""
    from ..multimodal.media import detect_scene_cuts

    _golden.ensure_mm_video_scenecut(sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        _syn_content(VIDEO_MAGIC + _struct.pack(">HHH", 8, 8, 4), 256).alias(
            "content"
        ),
    )
    return detect_scene_cuts(vids, threshold=16.0).orderBy("media_id", "frame_idx")


def _set_scenecut_oracle() -> None:
    from ..registry import REGISTRY

    REGISTRY["mm_video_scenecut"].oracle = f"""
    SELECT media_id, frame_idx, mean_intensity, is_cut
    FROM read_parquet('{_golden.golden_path("mm_video_scenecut", _golden.DRIVER_SF_DIR)}')
    ORDER BY media_id, frame_idx
    """


_set_scenecut_oracle()
