"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (no imaging/audio libraries in this
environment): ``decode_image_batch`` raises NotImplementedError unless the
deterministic fake decoder is requested. Everything Spark-side is real and
tested — schemas, ``mapInPandas`` batch shapes, partition sizing — so a
real decoder (PIL/librosa/ffmpeg) drops in as a single function swap.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, mime string, width int, height int, "
    "duration_ms int, data binary"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, feat_dim int, features array<float>, decode_ok boolean"
)


def synth_media(spark, n_rows: int, seed: str = "jss-media-v1") -> DataFrame:
    """Deterministic fake media table (binary payload = hashed bytes)."""
    df = spark.range(n_rows)
    rid = F.col("id")
    h = F.abs(F.xxhash64(F.lit(seed), rid))
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (h % 3 + 1).cast("int"))
    return df.select(
        rid.alias("media_id"),
        kind.alias("kind"),
        F.when(kind == "image", F.lit("image/png"))
        .when(kind == "audio", F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("mime"),
        F.when(kind == "image", (h % 1920 + 16).cast("int")).alias("width"),
        F.when(kind == "image", (h % 1080 + 16).cast("int")).alias("height"),
        F.when(kind != "image", (h % 300000).cast("int")).alias("duration_ms"),
        F.sha2(F.concat(F.lit(seed), rid.cast("string")), 256).cast("binary").alias("data"),
    )


def _fake_decode(data: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: hash bytes → features."""
    out = []
    h = 2166136261
    for i in range(dim):
        for ch in data[:32] + bytes([i % 256]):
            h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
        out.append((h / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def extract_features(
    df: DataFrame, dim: int = 16, use_fake_decoder: bool = True
) -> DataFrame:
    """media table → feature vectors via ONE Arrow-batched mapInPandas stage.

    Batch shape: the decoder sees pandas DataFrames bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; binary payloads ride
    Arrow buffers (zero-copy into Python). With a real decoder, tune
    ``maxRecordsPerBatch`` down so batch_bytes = records × media_size fits
    the Python worker.
    """
    import pandas as pd

    if not use_fake_decoder:
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa/ffmpeg (absent in "
            "this environment); pass use_fake_decoder=True for the plumbing path"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(b) if b is not None else b"", dim)
                for b in pdf["data"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_dim": dim,
                    "features": feats,
                    "decode_ok": [b is not None for b in pdf["data"]],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → one planned frame-extraction row per sampled timestamp
    (the Spark-side fan-out a real frame sampler would feed). Pure JVM."""
    vids = df.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
    return vids.select(
        "media_id", F.explode(ts).alias("frame_ts_ms")
    )
