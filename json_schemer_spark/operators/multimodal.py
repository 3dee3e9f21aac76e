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


# ---------------------------------------------------------------------------
# REAL decoders for the formats pure stdlib can handle (round 4): WAV-PCM16
# and uncompressed 24-bit BMP. PNG/JPEG/MP4 remain declared stubs (they
# genuinely need PIL/ffmpeg, absent in this environment); with these two the
# decode path itself — header parse, sample/pixel extraction, featurization —
# is REAL code under test, not a hash placeholder.
# ---------------------------------------------------------------------------

import struct as _struct


def synth_wav_bytes(media_id: int, seed: str = "jss-wav-v1",
                    n_samples: int = 800, rate: int = 8000) -> bytes:
    """A genuine RIFF/WAVE mono PCM16 file, deterministic per id (integer
    hash phase-modulated square-ish wave — no floats, reproducible)."""
    h = 2166136261
    for ch in f"{seed}:{media_id}".encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    period = 20 + (h % 180)
    amp = 4000 + (h % 24000)
    frames = bytearray()
    for i in range(n_samples):
        v = amp if (i % period) * 2 < period else -amp
        # decay envelope keeps per-chunk RMS distinct
        v = v * (n_samples - i) // n_samples
        frames += _struct.pack("<h", v)
    data = bytes(frames)
    hdr = b"RIFF" + _struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + _struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[int, list[int]]:
    """Parse RIFF/WAVE PCM16 → (sample_rate, samples). Raises ValueError on
    anything that is not canonical mono PCM16."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, channels = 12, None, None, None
    samples: list[int] = []
    while pos + 8 <= len(data):
        cid, size = data[pos:pos + 4], _struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = _struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format ({fmt_tag=}, {channels=}, {bits=})")
        elif cid == b"data":
            samples = [v[0] for v in _struct.iter_unpack("<h", body[: size - (size % 2)])]
        pos += 8 + size + (size % 2)
    if rate is None or not samples:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def synth_bmp_bytes(media_id: int, seed: str = "jss-bmp-v1",
                    width: int = 16, height: int = 16) -> bytes:
    """A genuine uncompressed 24-bit BMP, deterministic per id (hash-driven
    RGB gradient; bottom-up rows, 4-byte row padding per the spec)."""
    h = 2166136261
    for ch in f"{seed}:{media_id}".encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    row_pad = (4 - (width * 3) % 4) % 4
    rows = bytearray()
    for y in range(height):
        for x in range(width):
            rows += bytes((
                (h + 7 * x + 13 * y) % 256,        # B
                (h >> 8 ^ (x * y)) % 256,          # G
                (h >> 16 ^ (x + 3 * y)) % 256,     # R
            ))
        rows += b"\x00" * row_pad
    img = bytes(rows)
    file_hdr = b"BM" + _struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
    info_hdr = _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(img), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + img


def decode_bmp(data: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Parse an uncompressed 24-bit BMP → (width, height, row-major
    top-down [(r,g,b)] pixels). Raises ValueError otherwise."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = _struct.unpack("<I", data[10:14])[0]
    _hdr_size, width, height, _planes, bpp, comp = _struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP ({bpp=}, {comp=})")
    row_pad = (4 - (width * 3) % 4) % 4
    stride = width * 3 + row_pad
    flip = height > 0
    height = abs(height)
    px: list[tuple[int, int, int]] = []
    for y in range(height):
        src_y = (height - 1 - y) if flip else y  # stored bottom-up
        base = off + src_y * stride
        row = data[base: base + width * 3]
        for x in range(width):
            b, g, r = row[3 * x: 3 * x + 3]
            px.append((r, g, b))
    return width, height, px


def wav_features(samples: list[int], dim: int) -> list[float]:
    """Per-chunk RMS over ``dim`` equal time slices, normalized to [0, 1]."""
    if not samples:
        return [0.0] * dim
    n = len(samples)
    out = []
    for i in range(dim):
        chunk = samples[i * n // dim: (i + 1) * n // dim] or [0]
        rms = (sum(v * v for v in chunk) / len(chunk)) ** 0.5
        out.append(rms / 32768.0)
    return out


def bmp_features(width: int, height: int, px: list[tuple[int, int, int]],
                 dim: int) -> list[float]:
    """Mean luminance over ``dim`` horizontal strips, normalized to [0, 1]."""
    if not px:
        return [0.0] * dim
    out = []
    for i in range(dim):
        y0, y1 = i * height // dim, max((i + 1) * height // dim, i * height // dim + 1)
        strip = px[y0 * width: y1 * width] or [(0, 0, 0)]
        lum = sum(0.299 * r + 0.587 * g + 0.114 * b for r, g, b in strip)
        out.append(lum / (len(strip) * 255.0))
    return out


def synth_media_real(spark, n_rows: int, seed: str = "jss-media-real-v1") -> DataFrame:
    """Media table whose payloads are REAL decodable files (even ids: WAV,
    odd ids: BMP) — generated per Arrow batch on the executors, not the
    driver."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            rows = {"media_id": [], "kind": [], "mime": [], "width": [],
                    "height": [], "duration_ms": [], "data": []}
            for i in ids:
                if i % 2 == 0:
                    rows["media_id"].append(i); rows["kind"].append("audio")
                    rows["mime"].append("audio/wav")
                    rows["width"].append(None); rows["height"].append(None)
                    rows["duration_ms"].append(100)
                    rows["data"].append(synth_wav_bytes(i, seed=seed))
                else:
                    rows["media_id"].append(i); rows["kind"].append("image")
                    rows["mime"].append("image/bmp")
                    rows["width"].append(16); rows["height"].append(16)
                    rows["duration_ms"].append(None)
                    rows["data"].append(synth_bmp_bytes(i, seed=seed))
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features_real(df: DataFrame, dim: int = 16) -> DataFrame:
    """media table → features with REAL decoding for WAV-PCM16 and 24-bit
    BMP payloads (dispatch by mime); undecodable rows get decode_ok=False
    and zero features instead of failing the batch. Same single
    mapInPandas stage and schema as :func:`extract_features`."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            feats, ok = [], []
            for mime, blob in zip(pdf["mime"], pdf["data"]):
                try:
                    data = bytes(blob) if blob is not None else b""
                    if mime == "audio/wav":
                        _rate, samples = decode_wav(data)
                        feats.append(wav_features(samples, dim)); ok.append(True)
                    elif mime == "image/bmp":
                        w, hgt, px = decode_bmp(data)
                        feats.append(bmp_features(w, hgt, px, dim)); ok.append(True)
                    else:
                        feats.append([0.0] * dim); ok.append(False)
                except (ValueError, IndexError, _struct.error):
                    feats.append([0.0] * dim); ok.append(False)
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "feat_dim": dim, "features": feats, "decode_ok": ok,
            })

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
