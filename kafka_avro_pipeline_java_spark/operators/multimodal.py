"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image decode is REAL for the one mainstream container that needs no codec
library: 24-bpp uncompressed BMP (``decode_bmp``/``encode_bmp``, golden-
bytes-pinned), with an integer-exact box-filter resize (``box_resize``)
and windowed PCM energy for audio (``audio_window_energy``). Only the
compressed-codec paths (JPEG/ffmpeg frame seeking) remain deterministic
fakes behind ``decode_stub``/``sample_frames`` (clearly marked — those
libraries are absent here). Everything Spark-side is real and tested:
schema, Arrow batching via ``mapInPandas``, partition-preserving
iteration, and metadata extraction with built-ins.

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


# --------------------------------------------------------------------------
# REAL image decode: 24-bit uncompressed BMP (BI_RGB), pure numpy.
# BMP is the one mainstream raster container that needs no codec library —
# the pixel array is raw bytes behind a 54-byte header (BITMAPFILEHEADER +
# BITMAPINFOHEADER, Windows GDI public spec): little-endian fields, rows
# stored BOTTOM-UP, each row padded to a 4-byte boundary, pixels as BGR.
# decode_bmp/encode_bmp below implement that spec exactly (golden-bytes
# pinned in tests/test_operators.py), replacing the md5 decode stub for
# the image path.
# --------------------------------------------------------------------------
_BMP_HEADER_SIZE = 54


def encode_bmp(pixels) -> bytes:
    """HxWx3 uint8 RGB array → 24-bpp BI_RGB BMP file bytes."""
    import numpy as np
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row_raw = w * 3
    row_padded = (row_raw + 3) & ~3
    img_size = row_padded * h
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_SIZE + img_size, 0, 0, _BMP_HEADER_SIZE
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_padded), dtype=np.uint8)
    # bottom-up, BGR
    rows[:, :row_raw] = px[::-1, :, ::-1].reshape(h, row_raw)
    return header + rows.tobytes()


def decode_bmp(data: bytes):
    """BMP file bytes → HxWx3 uint8 RGB array. Supports the 24-bpp
    uncompressed (BI_RGB) case only; anything else raises loudly."""
    import numpy as np
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing BM magic)")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", data, 14
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_raw = w * 3
    row_padded = (row_raw + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=row_padded * h, offset=pixel_offset
    ).reshape(h, row_padded)
    bgr = rows[:, :row_raw].reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def box_resize(img, factor: int):
    """Integer-exact box-filter downsample: each output pixel is the
    FLOOR-MEAN of its factor×factor input block (Σblock // factor²) —
    deterministic integer math, so resized pixels value-oracle exactly."""
    import numpy as np

    px = np.asarray(img, dtype=np.int64)
    h, w, c = px.shape
    oh, ow = h // factor, w // factor
    blocks = px[: oh * factor, : ow * factor].reshape(
        oh, factor, ow, factor, c
    )
    return (blocks.sum(axis=(1, 3)) // (factor * factor)).astype(np.uint8)


GRAY_BMP_SCHEMA = "media_id long, payload binary"


def text_to_gray_bmp(
    media: DataFrame, *, width: int = 8, height: int = 8
) -> DataFrame:
    """Synthesize REAL BMP payloads from the text-derived media table:
    pixel (r, c) is the grayscale byte text[(r*width + c) mod n] repeated
    across RGB — the codec-free stand-in for reading image files via
    binaryFile (the bytes ARE a spec-compliant BMP; only their provenance
    is synthetic). Image-typed rows only; empty payloads dropped."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = (
            np.arange(height * width).reshape(height, width)
        )
        for pdf in it:
            imgs = pdf[pdf["media_type"] == "image"]
            ids, payloads = [], []
            for mid, p in zip(imgs["media_id"], imgs["payload"]):
                b = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(b) == 0:
                    continue
                gray = b[idx % len(b)]
                ids.append(mid)
                payloads.append(encode_bmp(np.repeat(gray[:, :, None], 3, axis=2)))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return media.mapInPandas(batches, schema=GRAY_BMP_SCHEMA)


RESIZED_PIXEL_SCHEMA = "media_id long, out_r int, out_c int, gray int"


def decode_resize_pixels(bmp_media: DataFrame, *, factor: int = 2) -> DataFrame:
    """REAL image decode + resize over binary payloads: parse each BMP
    (header, bottom-up row order, 4-byte padding — decode_bmp), box-filter
    downsample by ``factor`` with integer-exact floor-mean pixels
    (box_resize), emit one row per output pixel (R channel; inputs here
    are grayscale so channels agree). This retires the md5 resize stub as
    the only image path: the pixel VALUES are real math on decoded bytes.
    Arrow-batched mapInPandas; at 100 TB the pass is scan-bound over the
    binary column with zero shuffles, the same shape as audio energy."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rs, cs, vals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                small = box_resize(decode_bmp(bytes(p)), factor)
                oh, ow, _ = small.shape
                rr, cc = np.meshgrid(
                    np.arange(oh), np.arange(ow), indexing="ij"
                )
                ids.extend([mid] * (oh * ow))
                rs.extend(rr.ravel().tolist())
                cs.extend(cc.ravel().tolist())
                vals.extend(small[:, :, 0].ravel().tolist())
            yield pd.DataFrame(
                {"media_id": ids, "out_r": rs, "out_c": cs, "gray": vals}
            )

    return bmp_media.mapInPandas(batches, schema=RESIZED_PIXEL_SCHEMA)


CROPPED_PIXEL_SCHEMA = "media_id long, out_r int, out_c int, gray int"


def decode_crop_pixels(
    bmp_media: DataFrame, *, crop_h: int, crop_w: int
) -> DataFrame:
    """REAL image decode + CENTER CROP over binary payloads: parse each
    BMP (decode_bmp — header, bottom-up rows, padding), take the central
    ``crop_h × crop_w`` window (offset = (dim − crop) // 2, the standard
    eval-preprocessing crop every vision pipeline applies after resize),
    emit one row per cropped pixel with coordinates RELATIVE to the crop.
    Pixel values are untouched bytes — a pure geometric selection, so a
    decoder that misreads row order or padding shifts WHICH pixels
    survive and cannot hash-match the oracle. Arrow-batched mapInPandas;
    scan-bound over the binary column with zero shuffles at any scale."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rs, cs, vals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp(bytes(p))
                h, w, _ = img.shape
                if crop_h > h or crop_w > w:
                    # a negative offset would slice a wrapped (wrong)
                    # window via Python negative indexing — fail loudly
                    raise ValueError(
                        f"crop {crop_h}x{crop_w} exceeds image {h}x{w} "
                        f"for media_id={mid}"
                    )
                r0 = (h - crop_h) // 2
                c0 = (w - crop_w) // 2
                win = img[r0:r0 + crop_h, c0:c0 + crop_w, 0]
                oh, ow = win.shape
                rr, cc = np.meshgrid(
                    np.arange(oh), np.arange(ow), indexing="ij"
                )
                ids.extend([mid] * (oh * ow))
                rs.extend(rr.ravel().tolist())
                cs.extend(cc.ravel().tolist())
                vals.extend(win.ravel().tolist())
            yield pd.DataFrame(
                {"media_id": ids, "out_r": rs, "out_c": cs, "gray": vals}
            )

    return bmp_media.mapInPandas(batches, schema=CROPPED_PIXEL_SCHEMA)


FLIPPED_PIXEL_SCHEMA = "media_id long, out_r int, out_c int, gray int"


def decode_flip_pixels(bmp_media: DataFrame) -> DataFrame:
    """REAL image decode + HORIZONTAL FLIP over binary payloads: parse
    each BMP (decode_bmp — header, bottom-up rows, padding), mirror the
    columns (out(r, c) = src(r, w−1−c) — the cheapest and most common
    train-time augmentation), emit one row per output pixel. Like the
    crop, a pure geometric permutation of untouched bytes: a decoder that
    misreads row order or padding emits the wrong permutation and cannot
    hash-match the oracle. Arrow-batched mapInPandas; scan-bound with
    zero shuffles at any scale."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rs, cs, vals = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp(bytes(p))
                flipped = img[:, ::-1, 0]
                oh, ow = flipped.shape
                rr, cc = np.meshgrid(
                    np.arange(oh), np.arange(ow), indexing="ij"
                )
                ids.extend([mid] * (oh * ow))
                rs.extend(rr.ravel().tolist())
                cs.extend(cc.ravel().tolist())
                vals.extend(flipped.ravel().tolist())
            yield pd.DataFrame(
                {"media_id": ids, "out_r": rs, "out_c": cs, "gray": vals}
            )

    return bmp_media.mapInPandas(batches, schema=FLIPPED_PIXEL_SCHEMA)


PATCH_SCHEMA = "media_id long, patch_r int, patch_c int, mean_gray int, n_px int"


def decode_patch_means(bmp_media: DataFrame, *, patch: int = 4) -> DataFrame:
    """REAL image decode + ViT-STYLE PATCHIFY over binary payloads: parse
    each BMP (decode_bmp — header, bottom-up rows, padding), split the
    gray array into non-overlapping ``patch``×``patch`` tiles, emit one
    row per tile with its integer floor-mean intensity (Σ block //
    patch²) — the patch-embedding precursor every vision transformer
    pipeline runs, and the same integer-exact mean discipline as the box
    resize so the oracle can recompute every tile from raw bytes.
    Arrow-batched mapInPandas; scan-bound with zero shuffles at any
    scale."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, prs, pcs, means, ns = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp(bytes(p))[:, :, 0].astype(np.int64)
                h, w = img.shape
                ph, pw = h // patch, w // patch
                tiles = img[: ph * patch, : pw * patch].reshape(
                    ph, patch, pw, patch
                )
                sums = tiles.sum(axis=(1, 3))
                rr, cc = np.meshgrid(np.arange(ph), np.arange(pw), indexing="ij")
                ids.extend([mid] * (ph * pw))
                prs.extend(rr.ravel().tolist())
                pcs.extend(cc.ravel().tolist())
                means.extend((sums // (patch * patch)).ravel().tolist())
                ns.extend([patch * patch] * (ph * pw))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "patch_r": prs,
                    "patch_c": pcs,
                    "mean_gray": means,
                    "n_px": ns,
                }
            )

    return bmp_media.mapInPandas(batches, schema=PATCH_SCHEMA)


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
