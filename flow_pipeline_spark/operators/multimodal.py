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
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                kind = row["kind"]
                if kind in ("image", "video"):
                    grid = _decode_image(payload, row.get("meta"))
                    # "resize": average-pool to the thumb grid
                    pooled = grid.reshape(th, grid.shape[0] // th,
                                          tw, grid.shape[1] // tw).mean(axis=(1, 3))
                    feat = pooled.flatten().astype(np.float32)
                    out.append((row["media_id"], kind, len(payload),
                                feat.tolist(), tw, th))
                else:
                    pcm = _decode_audio(payload, row.get("meta"))
                    hist, _ = np.histogram(pcm, bins=16, range=(-1, 1))
                    feat = (hist / max(len(pcm), 1)).astype(np.float32)
                    out.append((row["media_id"], kind, len(payload),
                                feat.tolist(), None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "feature",
                              "thumb_w", "thumb_h"])

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
