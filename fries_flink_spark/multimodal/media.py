"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(beyond-reference surface for large-scale training-data pipelines).

Design (the part that must be right at 100 TB):
- Media lives in ``binary`` columns next to typed metadata structs — never
  Python objects. Parquet stores binary natively; Arrow moves it to Pandas
  UDFs zero-copy.
- Every transform is ``mapInPandas`` over Arrow batches: one Python worker
  call per batch, numpy math inside, bounded memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (media rows are large —
  size batches by bytes, not rows).
- Decode for real formats (JPEG/PNG/WAV/MP4) requires codec libs that are NOT
  in this environment; those entry points raise NotImplementedError with the
  intended library. The deterministic SYN format exercises the identical
  plumbing (schema, batching, partitioning) with real parsing + real math.

SYN format (deterministic fake, for tests and the plumbing path):
  image: b"SYNI" | width:u16be | height:u16be | channels:u8 | pixels (row-major)
  video: b"SYNV" | width:u16be | height:u16be | n_frames:u16be | frames
         (each frame = width*height grayscale bytes)
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

IMAGE_MAGIC = b"SYNI"
VIDEO_MAGIC = b"SYNV"

IMAGE_META_SCHEMA = (
    "width int, height int, channels int, n_bytes long, format string"
)


def encode_syn_image(arr: np.ndarray) -> bytes:
    """Pack an (h, w) or (h, w, c) uint8 array into SYN image bytes."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return IMAGE_MAGIC + _struct.pack(">HHB", w, h, c) + arr.astype(np.uint8).tobytes()


def decode_syn_image(data: bytes) -> np.ndarray:
    """Parse SYN image bytes back to an (h, w, c) uint8 array."""
    if data[:4] != IMAGE_MAGIC:
        raise ValueError("not a SYN image")
    w, h, c = _struct.unpack(">HHB", data[4:9])
    return np.frombuffer(data[9 : 9 + w * h * c], dtype=np.uint8).reshape(h, w, c)


def encode_syn_video(frames: np.ndarray) -> bytes:
    """Pack an (n, h, w) uint8 array into SYN video bytes."""
    n, h, w = frames.shape
    return VIDEO_MAGIC + _struct.pack(">HHH", w, h, n) + frames.astype(np.uint8).tobytes()


def decode_jpeg(data: bytes) -> np.ndarray:
    """Real-format decode entry point — requires Pillow, not bundled here."""
    raise NotImplementedError(
        "JPEG decode needs Pillow (PIL.Image.open) — not available in this "
        "environment; the SYN path exercises the same Spark plumbing"
    )


def decode_wav(data: bytes) -> np.ndarray:
    """Real-format audio decode entry point — requires soundfile/scipy."""
    raise NotImplementedError(
        "WAV decode needs soundfile/scipy.io.wavfile — not available here"
    )


def image_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Parse header metadata for SYN images: (… , meta struct).

    Header-only parse — does NOT materialize pixels; at scale this is the
    cheap manifest pass you run before any decode."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", meta struct<{IMAGE_META_SCHEMA.replace(',', ',')}>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for data in pdf[content_col]:
                b = bytes(data)
                if b[:4] == IMAGE_MAGIC:
                    w, h, c = _struct.unpack(">HHB", b[4:9])
                    metas.append((w, h, c, len(b), "syn"))
                else:
                    metas.append((None, None, None, len(b), "unknown"))
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded as SYN (the reference shape of a
    per-item media transform: binary in → binary out, metadata updated)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                arr = decode_syn_image(bytes(data))
                h, w, _ = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out.append((mid, encode_syn_image(arr[np.ix_(yi, xi)])))
            yield pd.DataFrame(out, columns=[id_col, "content"])

    return df.mapInPandas(gen, schema=f"{id_col} long, content binary")


def sample_frames(
    df: DataFrame,
    every_nth: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling for SYN video: one output row per kept frame (the
    explode-shaped transform — output cardinality = frames/stride)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                b = bytes(data)
                if b[:4] != VIDEO_MAGIC:
                    raise ValueError("not a SYN video")
                w, h, n = _struct.unpack(">HHH", b[4:10])
                frames = np.frombuffer(
                    b[10 : 10 + n * h * w], dtype=np.uint8
                ).reshape(n, h, w)
                for fi in range(0, n, every_nth):
                    rows.append((mid, fi, encode_syn_image(frames[fi])))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "content"])

    return df.mapInPandas(gen, schema=f"{id_col} long, frame_idx int, content binary")


def image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    n_bins: int = 8,
) -> DataFrame:
    """Feature extraction: per-image normalized intensity histogram + mean/std
    — a stand-in for an embedding model forward pass with the identical Spark
    shape (binary batch in → fixed-width float vector out)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = [
                decode_syn_image(bytes(data)).reshape(-1)
                for data in pdf[content_col]
            ]
            # Vectorized whole-batch path when every image in the Arrow batch
            # has the same pixel count (the common fixed-resolution pipeline):
            # one (n, pixels) matrix, histograms via a single bincount of
            # row_index*n_bins + pixel_bin — no per-row numpy call overhead.
            sizes = {a.size for a in imgs}
            if len(sizes) == 1 and sizes != {0} and 256 % n_bins == 0:
                flat = np.stack(imgs).astype(np.float64)
                n, px = flat.shape
                bin_idx = (flat.astype(np.int64) // (256 // n_bins)).clip(
                    0, n_bins - 1
                )
                row_idx = np.repeat(np.arange(n), px)
                hist = np.bincount(
                    row_idx * n_bins + bin_idx.reshape(-1),
                    minlength=n * n_bins,
                ).reshape(n, n_bins) / px
                feats = [list(map(float, h)) for h in hist]
                means = flat.mean(axis=1)
                stds = flat.std(axis=1)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "features": feats,
                        "mean_intensity": means,
                        "std_intensity": stds,
                    }
                )
                continue
            rows = []
            for mid, arr in zip(pdf[id_col], imgs):
                a = arr.astype(np.float64)
                hist = np.histogram(a, bins=n_bins, range=(0, 256))[0]
                hist = hist / max(a.size, 1)
                rows.append(
                    (mid, [float(x) for x in hist], float(a.mean()), float(a.std()))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "features", "mean_intensity", "std_intensity"]
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, features array<double>, "
        "mean_intensity double, std_intensity double",
    )


AUDIO_MAGIC = b"SYNA"


def encode_syn_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """Pack a 1-D int16 sample array into SYN audio bytes:
    b"SYNA" | sample_rate:u32be | n_samples:u32be | int16le samples."""
    s = samples.astype("<i2")
    return (
        AUDIO_MAGIC
        + _struct.pack(">II", sample_rate, len(s))
        + s.tobytes()
    )


def decode_syn_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Parse SYN audio bytes back to (samples int16, sample_rate)."""
    if data[:4] != AUDIO_MAGIC:
        raise ValueError("not a SYN audio blob")
    rate, n = _struct.unpack(">II", data[4:12])
    return np.frombuffer(data[12 : 12 + 2 * n], dtype="<i2"), rate


def resample_audio(
    df: DataFrame,
    out_rate: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Nearest-sample resample to ``out_rate`` (binary in → binary out, the
    audio analog of resize_images)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_syn_audio(bytes(data))
                n_out = max(1, int(round(len(samples) * out_rate / rate)))
                idx = (np.arange(n_out) * rate // out_rate).clip(0, len(samples) - 1)
                rows.append((mid, encode_syn_audio(samples[idx], out_rate)))
            yield pd.DataFrame(rows, columns=[id_col, "content"])

    return df.mapInPandas(gen, schema=f"{id_col} long, content binary")


def audio_features(
    df: DataFrame,
    frame_len: int = 256,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-clip features: RMS energy per fixed-length frame (truncating tail)
    + global mean/peak — the mel-spectrogram stand-in with the identical
    Spark shape (binary batch in → float vector out)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                samples, rate = decode_syn_audio(bytes(data))
                x = samples.astype(np.float64) / 32768.0
                n_frames = len(x) // frame_len
                frames = x[: n_frames * frame_len].reshape(n_frames, frame_len)
                rms = np.sqrt((frames**2).mean(axis=1)) if n_frames else np.array([])
                rows.append(
                    (
                        mid,
                        rate,
                        [float(v) for v in rms],
                        float(np.abs(x).max()) if len(x) else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "sample_rate", "frame_rms", "peak"]
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, sample_rate int, frame_rms array<double>, peak double",
    )


def decode_syn_video(data: bytes) -> np.ndarray:
    """Parse SYN video bytes back to an (n, h, w) uint8 frame array."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("not a SYN video")
    w, h, n = _struct.unpack(">HHH", data[4:10])
    return np.frombuffer(data[10 : 10 + n * h * w], dtype=np.uint8).reshape(n, h, w)


def detect_scene_cuts(
    df: DataFrame,
    threshold: float,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-frame mean intensity + scene-cut flags for SYN videos: frame i>0
    is a cut iff |mean_i − mean_{i−1}| > threshold (the standard frame-diff
    shot-boundary heuristic; a real pipeline swaps the decoder for ffmpeg and
    the metric for a histogram distance — the Spark shape is identical).

    One mapInPandas pass, output cardinality = total frames. Means are
    sums/2^k of uint8 pixels (dyadic-exact doubles); with a dyadic
    ``threshold`` the flags are engine-exact.
    """
    import pandas as pd

    thr = float(threshold)

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf[id_col], pdf[content_col]):
                frames = decode_syn_video(bytes(data)).astype(np.float64)
                npx = frames.shape[1] * frames.shape[2]
                means = frames.reshape(len(frames), npx).sum(axis=1) / npx
                prev = None
                for fi, m in enumerate(means):
                    cut = prev is not None and abs(m - prev) > thr
                    rows.append((mid, fi, float(m), bool(cut)))
                    prev = m
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "mean_intensity", "is_cut"]
            )

    return df.mapInPandas(
        gen,
        schema=f"{id_col} long, frame_idx int, mean_intensity double, is_cut boolean",
    )
