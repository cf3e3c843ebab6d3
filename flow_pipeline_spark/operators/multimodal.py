"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payload columns plus a typed metadata
struct — the pattern that scales: payloads stay columnar (parquet binary,
never materialized on the driver), metadata prunes/partitions, and all
per-item compute runs as Arrow-batched ``mapInPandas`` so the Python cost
is amortized per batch, not per row.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_decode_image`` /
``_decode_audio`` (clearly marked); the Spark-side contract — schemas, UDF
signatures, batch iteration, partitioning — is real and tested. Swapping in
a real codec changes only the function bodies.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("payload", T.BinaryType(), False),     # opaque bytes
    T.StructField("meta", T.StructType([                 # typed metadata
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("thumb_w", T.IntegerType(), True),
    T.StructField("thumb_h", T.IntegerType(), True),
])


def synthetic_media(spark, n_rows: int = 1000, *, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from the id
    (stands in for real image/audio bytes; same shape/dtypes)."""
    df = spark.range(0, n_rows)
    kind = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video"))
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 512).cast("binary")
    meta = F.struct(
        (F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(1))) % 1920 + 64)
        .cast("int").alias("width"),
        (F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(2))) % 1080 + 64)
        .cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(3))) % 300 + 1)
        .cast("int").alias("n_frames"),
        F.lit("fake").alias("format"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"),
        payload.alias("payload"), meta.alias("meta"))


def _decode_image(payload: bytes, meta) -> np.ndarray:
    """STUB — deterministic fake decode. A real implementation would be
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``; this container has
    no image codec, so we expand the payload bytes into a fake (h, w)
    luminance grid deterministically."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return np.resize(arr, (8, 8))  # fake 8x8 luminance


def _decode_audio(payload: bytes, meta) -> np.ndarray:
    """STUB — deterministic fake PCM decode (real: soundfile.read)."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return (arr - 128.0) / 128.0


def extract_features(media: DataFrame, *, thumb: tuple[int, int] = (4, 4)
                     ) -> DataFrame:
    """decode → feature-extract → resize/frame-sample, one mapInPandas pass.

    Runs per Arrow batch; each batch decodes N payloads without driver
    involvement. Features: 16-dim pooled grid (image/video) or 16-bin
    energy histogram (audio) — stand-ins with the real UDF shape."""
    tw, th = thumb

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Decode is inherently per-item (a real codec parses one container
        # per call), but everything after it is vectorized ACROSS the batch:
        # one stacked average-pool for all image/video rows, numpy-internal
        # histograms for audio. No per-row pandas iteration (iterrows builds
        # a Series per row — the slow path this kernel exists to avoid).
        for pdf in batches:
            n = len(pdf)
            kinds = pdf["kind"].to_numpy()
            payloads = [bytes(b) for b in pdf["payload"]]
            n_bytes = np.array([len(b) for b in payloads], dtype="int32")
            feats: list = [None] * n
            visual = np.nonzero((kinds == "image") | (kinds == "video"))[0]
            if visual.size:
                # stub grids are all (8, 8) so one stacked pool serves the
                # whole batch; a real variable-size decoder would pool each
                # grid to (th, tw) before the stack
                grids = np.stack([_decode_image(payloads[i], None)
                                  for i in visual])
                pooled = grids.reshape(
                    visual.size, th, grids.shape[1] // th,
                    tw, grids.shape[2] // tw).mean(axis=(2, 4))
                pooled = pooled.reshape(visual.size, -1).astype(np.float32)
                for j, i in enumerate(visual):
                    feats[i] = pooled[j].tolist()
            for i in np.nonzero((kinds != "image") & (kinds != "video"))[0]:
                pcm = _decode_audio(payloads[i], None)
                hist, _ = np.histogram(pcm, bins=16, range=(-1, 1))
                feats[i] = (hist / max(len(pcm), 1)).astype(np.float32).tolist()
            is_visual = (kinds == "image") | (kinds == "video")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": kinds,
                "n_bytes": n_bytes,
                "feature": feats,
                "thumb_w": pd.array(np.where(is_visual, tw, None),
                                    dtype="Int32"),
                "thumb_h": pd.array(np.where(is_visual, th, None),
                                    dtype="Int32"),
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0, n, 2n, ... from
    metadata — pure expressions; the (stubbed) per-frame decode then rides
    extract_features. Demonstrates the fan-out side of the pipeline."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id", "payload",
            F.explode(F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)))
            .alias("frame_idx"))
    )
