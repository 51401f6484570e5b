"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
deterministic fake behind ``decode_stub`` (clearly marked). Everything
Spark-side is real and tested: schema, Arrow batching via ``mapInPandas``,
partition-preserving iteration, and metadata extraction with built-ins.

At 100 TB this is the pattern for media processing: binary column stays
opaque through shuffles; per-batch Python touches only the rows of its
Arrow batch (no collect, no driver data path).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_len", LongType()),
        StructField("payload_md5", StringType()),
        StructField("feat_dim", IntegerType()),
        StructField("feature_norm", StringType()),
    ]
)


def read_media_dir(spark, path: str, *, pattern: str = "*") -> DataFrame:
    """Ingest real media files as a media-shaped table via Spark's
    ``binaryFile`` source (path, modificationTime, length, content).
    Media type is inferred from the extension; metadata fields default to
    0 until a real decoder fills them (decode_stub here)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    from pyspark.sql import functions as F2

    ext = F2.lower(F2.element_at(F2.split(F2.col("path"), r"\."), -1))
    media_type = (
        F2.when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
        .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
        .when(ext.isin("mp4", "avi", "mkv", "webm"), "video")
        .otherwise("unknown")
    )
    return raw.select(
        F2.xxhash64("path").alias("media_id"),
        media_type.alias("media_type"),
        F2.col("content").alias("payload"),
        F2.lit(0).cast("int").alias("meta_width"),
        F2.lit(0).cast("int").alias("meta_height"),
        F2.lit(0).cast("int").alias("meta_duration_ms"),
    )


def text_as_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a media-shaped table from text payloads (test stand-in:
    real deployments read binary files via ``spark.read.format('binaryFile')``)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        (F.pmod(F.col(id_col), 1920) + 1).cast("int").alias("meta_width"),
        (F.pmod(F.col(id_col), 1080) + 1).cast("int").alias("meta_height"),
        (F.pmod(F.col(id_col), 60000) + 1).cast("int").alias("meta_duration_ms"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB — real decode needs PIL/ffmpeg/torchaudio, absent here.

    Deterministic fake: derives a pseudo 'feature vector norm' from the
    payload bytes so tests can assert exact values end-to-end.
    """
    checksum = sum(payload) % 997
    return {"feat_dim": 64, "feature_norm": f"{checksum / 997.0:.6f}"}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats = [decode_stub(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": [len(p) for p in pdf["payload"]],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in pdf["payload"]],
                    "feat_dim": [f["feat_dim"] for f in feats],
                    "feature_norm": [f["feature_norm"] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub over image rows. Real impl decodes with PIL and
    re-encodes (absent here) — the STUB produces a deterministic payload
    (truncated/padded to width*height bytes) so the Spark plumbing
    (schema, batching, binary in/out) is fully exercised and testable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            imgs = pdf[pdf["media_type"] == "image"]
            resized = [
                bytes(p[:target]).ljust(target, b"\x00") for p in imgs["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": imgs["media_id"],
                    "payload": resized,
                    "out_width": width,
                    "out_height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub over video rows: real impl seeks keyframes via
    ffmpeg; the STUB slices the payload every ``every_n_bytes`` (1 row out
    per sampled frame — the fan-out shape real frame extraction has)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vids = pdf[pdf["media_type"] == "video"]
            ids, idxs, frames = [], [], []
            for mid, p in zip(vids["media_id"], vids["payload"]):
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_ENERGY_SCHEMA = (
    "media_id long, window_index int, window_bytes int, energy bigint"
)


def audio_window_energy(
    media: DataFrame, *, window_bytes: int = 64, max_windows: int = 8
) -> DataFrame:
    """Windowed energy over audio rows: the payload interpreted as
    unsigned 8-bit PCM, per-``window_bytes`` window energy
    Σ(sample − 128)² — REAL signal math over the binary column, not a
    stub (contrast decode_stub: no codec is needed to window and measure
    raw PCM, which is exactly the silence-detection / loudness-gate pass
    an audio curation pipeline runs before any model). Arrow-batched
    mapInPandas with the 1→N fan-out shape of sample_frames; energies
    are exact integers, so the whole output value-oracles. At 100 TB the
    pass is scan-bound over the binary column with zero shuffles."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            auds = pdf[pdf["media_type"] == "audio"]
            ids, idxs, sizes, energies = [], [], [], []
            for mid, p in zip(auds["media_id"], auds["payload"]):
                n_win = min(max_windows, max(1, len(p) // window_bytes))
                for i in range(n_win):
                    w = np.frombuffer(
                        p[i * window_bytes:(i + 1) * window_bytes],
                        dtype=np.uint8,
                    ).astype(np.int64)
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(w))
                    energies.append(int(((w - 128) ** 2).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "window_index": idxs,
                    "window_bytes": sizes,
                    "energy": energies,
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_ENERGY_SCHEMA)
