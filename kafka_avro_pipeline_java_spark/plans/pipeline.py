"""Pipeline-parity and multimodal queries.

These surface the reference's ETL behaviors (keyed partitioning, schema-
driven typing — SURVEY.md §2A) and the multimodal binary-column plumbing
as driver-checkable queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import partition_for_key
from ..operators.multimodal import extract_features, text_as_media
from ..sources import load_table
from ..sources.schema_dsl import struct_to_avro
from .registry import query


@query(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing end-to-end: text → binary column → Arrow-
    batched mapInPandas feature extractor → typed metadata. The md5/length
    computed in Python batches must equal DuckDB's over the same bytes."""
    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    feats = extract_features(media)
    return feats.select("media_id", "payload_len", "payload_md5")


@query(
    "pipeline_avro_roundtrip",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def pipeline_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro serde proof: documents → Confluent-framed Avro binary (pure-
    Python codec, reference wire format AvroProducer.java:48-50) → decode →
    identical rows. The oracle is the untouched table: any codec bug breaks
    the value hash."""
    from ..streaming.avro_codec import decode_df, encode_df

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    schema = struct_to_avro("documents", d.schema)
    return decode_df(encode_df(d, schema, schema_id=1), schema)


@query(
    "pipeline_generated_workload",
    oracle=None,  # rand()-based — domains unit-tested in tests/test_generate.py
)
def pipeline_generated_workload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference producer workload shape (3 schemas × 1,500 msgs,
    02-producer config.properties:5,8): per-topic message count and
    per-key partition spread under the keyed-partitioning invariant."""
    from ..generate import generate_dataset
    from ..sources.schema_dsl import dsl_to_avro

    dsl = [
        {"name": f"dataset{i}", "fields": {f"key_field{i}": "string",
                                           f"timestamp_field{i}": "long",
                                           f"string_field{i}": "string"}}
        for i in (1, 2, 3)
    ]
    out = None
    for schema in dsl_to_avro(dsl):
        key = schema["fields"][0]["name"]
        g = generate_dataset(spark, schema, 1500, seed=42).select(
            F.lit(schema["name"]).alias("topic"),
            partition_for_key(F.col(key).cast("string"), 3).alias("partition"),
        )
        out = g if out is None else out.unionByName(g)
    return out.groupBy("topic", "partition").agg(F.count("*").alias("n_messages"))


# Keyed-partition invariant (reference AvroProducer.java:81-83: same key →
# same partition). java_string_hashcode isn't expressible in DuckDB SQL —
# rows-only check here; exactness vs java.lang.String.hashCode is unit-
# tested in tests/test_generate.py.
@query("pipeline_key_partitions")
def pipeline_key_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(F.col("source").alias("key"),
                     partition_for_key("source", 3).alias("partition"))
    return (
        keyed.groupBy("key")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("partition").alias("n_partitions"),
            F.min("partition").alias("partition"),
        )
    )


@query(
    "multimodal_resize_pipeline",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(16 AS INT) AS out_width, CAST(16 AS INT) AS out_height,
           CAST(256 AS INT) AS n_bytes,
           md5(CASE WHEN length(text) >= 256 THEN substr(text, 1, 256)
                    ELSE text || repeat(chr(0), 256 - length(text)) END)
             AS resized_md5
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def multimodal_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing end-to-end: media table → Arrow-batched
    mapInPandas resize STUB (deterministic truncate/NUL-pad to 16×16
    bytes — real decode needs PIL, absent in this container and honestly
    stubbed, operators/multimodal.py) → md5 of every resized payload
    checked against DuckDB reconstructing the same bytes. Proves the
    binary-in/binary-out batch path, schema, and image-row routing —
    the parts that survive when a real codec replaces the stub."""
    from ..operators.multimodal import resize_images, text_as_media

    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    resized = resize_images(media, 16, 16)
    return resized.select(
        "media_id", "out_width", "out_height",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("resized_md5"),
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, CAST(i.i AS INT) AS frame_index,
           CAST(length(substr(text, CAST(i.i * 64 + 1 AS INT), 64)) AS INT) AS frame_bytes,
           md5(substr(text, CAST(i.i * 64 + 1 AS INT), 64)) AS frame_md5
    FROM vids, UNNEST(range(0, least(8, greatest(1, n // 64)))) AS i(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing end-to-end: video rows fan out 1→N through
    the Arrow-batched mapInPandas STUB (64-byte slices standing in for
    ffmpeg keyframes — the fan-out shape is what's real), and every
    frame's bytes are md5-verified against DuckDB slicing the same
    payload. With the resize row this closes the multimodal trio:
    metadata, image path, and video fan-out all value-checked."""
    from ..operators.multimodal import sample_frames, text_as_media

    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    frames = sample_frames(media, every_n_bytes=64, max_frames=8)
    return frames.select(
        "media_id", "frame_index",
        F.length("frame_payload").alias("frame_bytes"),
        F.md5("frame_payload").alias("frame_md5"),
    )


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH auds AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 1
    )
    SELECT media_id, CAST(i.i AS INT) AS window_index,
           CAST(length(substr(text, CAST(i.i * 64 + 1 AS INT), 64)) AS INT)
             AS window_bytes,
           CAST((
             SELECT SUM((ascii(substr(w.win, j.j, 1)) - 128)
                        * (ascii(substr(w.win, j.j, 1)) - 128))
             FROM (SELECT substr(text, CAST(i.i * 64 + 1 AS INT), 64)
                     AS win) w,
                  UNNEST(range(1, len(w.win) + 1)) AS j(j)
           ) AS BIGINT) AS energy
    FROM auds, UNNEST(range(0, least(8, greatest(1, n // 64)))) AS i(i)
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed PCM energy over the audio rows — the fourth multimodal
    row, and the first whose per-window VALUE is real signal math on the
    raw bytes rather than an md5 of a stub slice: unsigned-8-bit samples,
    Σ(s−128)² per 64-byte window (the silence/loudness gate an audio
    pipeline runs before decode). Exact integer energies; the oracle
    recomputes them from ASCII codes of the same text-derived payload
    (operators/multimodal.py::audio_window_energy)."""
    from ..operators.multimodal import audio_window_energy, text_as_media

    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    return audio_window_energy(media, window_bytes=64, max_windows=8)


@query(
    "multimodal_image_resize",
    oracle="""
    WITH imgs AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    ), px AS (
      SELECT media_id, r.r AS r, c.c AS c,
             ascii(substr(text,
                          CAST((r.r * 8 + c.c) % n + 1 AS INT), 1)) AS v
      FROM imgs,
           UNNEST(range(0, 8)) AS r(r),
           UNNEST(range(0, 8)) AS c(c)
    )
    SELECT media_id,
           CAST(r // 2 AS INT) AS out_r,
           CAST(c // 2 AS INT) AS out_c,
           CAST(SUM(v) // 4 AS INT) AS gray
    FROM px
    GROUP BY media_id, r // 2, c // 2
    """,
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + box-filter resize — the row that flips the
    multimodal component from partial to done. Image-typed docs are
    rendered as spec-compliant 24-bpp BMP files (54-byte header,
    bottom-up rows, 4-byte padding — encode_bmp), then the operator under
    test DECODES those bytes (decode_bmp: header parse, row unflip,
    BGR→RGB, pad strip) and box-downsamples 8×8→4×4 with integer-exact
    floor-mean pixels (Σ 2×2 block // 4). One row per output pixel; the
    oracle recomputes every gray value straight from the document's
    ASCII bytes, so a decoder that misreads padding, row order, or
    channel order CANNOT hash-match (and the golden-bytes pytest pins the
    format independently of this encode→decode round trip). No codec
    library involved — BMP's pixel array is raw bytes behind a public
    54-byte header, which is exactly why it's the scale-path container
    for decode-side tests (operators/multimodal.py::decode_bmp)."""
    from ..operators.multimodal import (
        decode_resize_pixels,
        text_as_media,
        text_to_gray_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = text_as_media(d, "doc_id", "text")
    bmps = text_to_gray_bmp(media, width=8, height=8)
    return decode_resize_pixels(bmps, factor=2)


@query(
    "multimodal_image_center_crop",
    oracle="""
    WITH imgs AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    )
    SELECT media_id,
           CAST(r.r - 2 AS INT) AS out_r,
           CAST(c.c - 2 AS INT) AS out_c,
           CAST(ascii(substr(text, CAST((r.r * 8 + c.c) % n + 1 AS INT), 1))
                AS INT) AS gray
    FROM imgs, UNNEST(range(2, 6)) AS r(r), UNNEST(range(2, 6)) AS c(c)
    """,
)
def multimodal_image_center_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + CENTER CROP (8×8 → central 4×4) — the third
    consumer of the BMP decode path and the standard eval-preprocessing
    geometry op (resize-then-center-crop is how every vision eval feeds
    its model). Pixel values pass through untouched, so the op is a pure
    geometric selection: the oracle recomputes exactly WHICH source
    bytes must survive ((r, c) ∈ [2, 6)² of the bottom-up-decoded,
    padding-stripped array), and a decoder that misreads row order or
    padding selects different pixels and cannot hash-match
    (operators/multimodal.py::decode_crop_pixels). Zero-shuffle
    scan-bound mapInPandas, same shape as the resize row."""
    from ..operators.multimodal import (
        decode_crop_pixels,
        text_as_media,
        text_to_gray_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = text_as_media(d, "doc_id", "text")
    bmps = text_to_gray_bmp(media, width=8, height=8)
    return decode_crop_pixels(bmps, crop_h=4, crop_w=4)


@query(
    "multimodal_image_flip",
    oracle="""
    WITH imgs AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    )
    SELECT media_id,
           CAST(r.r AS INT) AS out_r,
           CAST(c.c AS INT) AS out_c,
           CAST(ascii(substr(text,
                             CAST((r.r * 8 + (7 - c.c)) % n + 1 AS INT), 1))
                AS INT) AS gray
    FROM imgs, UNNEST(range(0, 8)) AS r(r), UNNEST(range(0, 8)) AS c(c)
    """,
)
def multimodal_image_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + HORIZONTAL FLIP (mirror) — the fourth consumer
    of the BMP decode path and the cheapest train-time augmentation every
    vision pipeline applies. A pure geometric permutation: out(r, c) =
    src(r, 7−c) of the bottom-up-decoded, padding-stripped 8×8 array, so
    the oracle recomputes exactly WHICH source byte lands at every output
    coordinate and a decoder that misreads row order, padding, or the
    mirror direction cannot hash-match
    (operators/multimodal.py::decode_flip_pixels). Zero-shuffle scan-bound
    mapInPandas, same shape as the resize/crop rows."""
    from ..operators.multimodal import (
        decode_flip_pixels,
        text_as_media,
        text_to_gray_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = text_as_media(d, "doc_id", "text")
    bmps = text_to_gray_bmp(media, width=8, height=8)
    return decode_flip_pixels(bmps)


@query(
    "multimodal_image_patches",
    oracle="""
    WITH imgs AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    ), px AS (
      SELECT media_id,
             CAST(r.r // 4 AS INT) AS patch_r,
             CAST(c.c // 4 AS INT) AS patch_c,
             ascii(substr(text, CAST((r.r * 8 + c.c) % n + 1 AS INT), 1)) AS g
      FROM imgs, UNNEST(range(0, 8)) AS r(r), UNNEST(range(0, 8)) AS c(c)
    )
    SELECT media_id, patch_r, patch_c,
           CAST(SUM(g) // 16 AS INT) AS mean_gray,
           CAST(COUNT(*) AS INT) AS n_px
    FROM px GROUP BY 1, 2, 3
    """,
)
def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + ViT-STYLE PATCHIFY (8×8 → four 4×4 tiles with
    integer floor-mean intensity) — the patch-embedding precursor every
    vision-transformer data pipeline runs before projection, and the
    fifth consumer of the BMP decode path. The oracle recomputes every
    tile mean straight from the document's ASCII bytes (Σ block // 16),
    so a decoder bug in padding, row order, or tile geometry shifts
    bytes between tiles and cannot hash-match
    (operators/multimodal.py::decode_patch_means). Zero-shuffle
    scan-bound mapInPandas, same shape as the resize/crop/flip rows."""
    from ..operators.multimodal import (
        decode_patch_means,
        text_as_media,
        text_to_gray_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = text_as_media(d, "doc_id", "text")
    bmps = text_to_gray_bmp(media, width=8, height=8)
    return decode_patch_means(bmps, patch=4)


@query(
    "multimodal_image_histogram",
    oracle="""
    WITH imgs AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0
    ), px AS (
      SELECT media_id,
             ascii(substr(text, CAST(i.i % n + 1 AS INT), 1)) // 32 AS bin
      FROM imgs, UNNEST(range(0, 64)) AS i(i)
    )
    SELECT media_id, CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_px
    FROM px GROUP BY 1, 2
    """,
)
def multimodal_image_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bin grayscale histogram per DECODED image — the second consumer
    of the real BMP decode path (multimodal_image_resize): parse the
    spec-compliant BMP bytes, bucket each pixel's gray value by //32,
    count per bin. The exposure/contrast profile an image curation
    pipeline gates on before any model (all-dark / blown-out detection).
    Counts are exact integers straight off decoded bytes; the oracle
    recomputes the same bins from the document's ASCII codes, so a
    decoder bug in padding or row order shifts pixels between bins and
    cannot hash-match. Same zero-shuffle scan-bound shape as the resize
    row."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from ..operators.multimodal import (
        decode_bmp,
        text_as_media,
        text_to_gray_bmp,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = text_as_media(d, "doc_id", "text")
    bmps = text_to_gray_bmp(media, width=8, height=8)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bins, counts = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_bmp(bytes(p))
                vals, cnts = np.unique(
                    img[:, :, 0].astype(np.int64) // 32, return_counts=True
                )
                ids.extend([mid] * len(vals))
                bins.extend(vals.tolist())
                counts.extend(cnts.tolist())
            yield pd.DataFrame(
                {"media_id": ids, "bin": bins, "n_px": counts}
            )

    return bmps.mapInPandas(
        batches, schema="media_id long, bin int, n_px bigint"
    )


@query(
    "multimodal_audio_zero_crossings",
    oracle="""
    WITH auds AS (
      SELECT doc_id AS media_id, substr(text, 1, 256) AS w,
             length(substr(text, 1, 256)) AS n
      FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 2
    )
    SELECT media_id, CAST(n AS INT) AS n_samples,
           CAST((
             SELECT COUNT(*) FROM UNNEST(range(2, n + 1)) AS j(j)
             WHERE (ascii(substr(w, CAST(j.j - 1 AS INT), 1)) >= 128)
                <> (ascii(substr(w, CAST(j.j AS INT), 1)) >= 128)
           ) AS INT) AS zero_crossings
    FROM auds
    """,
)
def multimodal_audio_zero_crossings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zero-crossing count over the first 256 unsigned-8-bit PCM samples
    of each audio payload — with windowed energy, THE classic pair of
    cheap time-domain audio features (ZCR separates voiced/tonal content
    from noise before any codec or model). A sign change is a crossing of
    the u8 midline 128; exact integer counts, computed with one shifted
    numpy compare per payload in the same zero-shuffle Arrow-batched scan
    as audio_window_energy, and re-derived by the oracle from ASCII codes
    of the same text-derived bytes."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from ..operators.multimodal import text_as_media

    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    media = text_as_media(d, "doc_id", "text")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            auds = pdf[pdf["media_type"] == "audio"]
            ids, ns, zcs = [], [], []
            for mid, p in zip(auds["media_id"], auds["payload"]):
                w = np.frombuffer(bytes(p)[:256], dtype=np.uint8)
                if len(w) < 2:
                    continue
                hi = w >= 128
                ids.append(mid)
                ns.append(len(w))
                zcs.append(int((hi[1:] != hi[:-1]).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "n_samples": ns, "zero_crossings": zcs}
            )

    return media.mapInPandas(
        batches, schema="media_id long, n_samples int, zero_crossings int"
    )


@query(
    "pipeline_dataset_card",
    oracle="""
    WITH docs AS (
      SELECT source, lang, n_chars,
             length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
             CAST(('0x' || substr(md5(lower(trim(
               regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)) AS BIGINT)
               AS fp
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en_docs,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM docs GROUP BY source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DATASET CARD — the one-table summary a curation team
    publishes with a corpus release (docs / chars / whitespace tokens /
    language spread / exact-dup count via the normalized md5 fingerprint
    the dedup family keys on / length bounds), assembled in ONE pass per
    source instead of running the individual audit queries separately.
    Every column is an exact integer from a single groupBy; the
    fingerprint reuses the portable hash, so even the dup count
    value-oracles. The scale shape is the word-count shape: one
    source-keyed shuffle over per-row scalars."""
    d = load_table(spark, sf_dir, "documents")
    from ..functions.hashing import portable_hash64

    fp = portable_hash64(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    )
    tokens = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), " ", ""))
        + 1
    )
    docs = d.select(
        "source",
        "lang",
        "n_chars",
        tokens.alias("n_tokens"),
        fp.alias("fp"),
    )
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint").alias("n_en_docs"),
        (F.count("*") - F.count_distinct("fp")).cast("bigint").alias(
            "n_exact_dups"
        ),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


_PPL_THRESH_Q = -3402000000  # -3.402 nats/token, 1e9-quantized


@query(
    "pipeline_perplexity_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, t.tok
      FROM documents,
           UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS t(tok)
    ), vocab AS (
      SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS n_total FROM vocab
    ), ds AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(SUM(CAST(FLOOR(LN(cnt / n_total) * 1000000000 + 0.5)
                           AS BIGINT)) AS BIGINT) AS sum_q
      FROM toks JOIN vocab USING (tok), tot
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sum_q >= {_PPL_THRESH_Q} * n_tok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CASE WHEN sum_q >= {_PPL_THRESH_Q} * n_tok
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS kept_rate,
           ROUND(CAST(SUM(CASE WHEN sum_q >= {_PPL_THRESH_Q} * n_tok
                               THEN sum_q ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN sum_q >= {_PPL_THRESH_Q} * n_tok
                                   THEN n_tok ELSE 0 END), 0)
                 / 1000000000, 4) AS kept_mean_logprob
    FROM ds GROUP BY source
    """,
)
def pipeline_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERPLEXITY-FILTER PIPELINE STAGE (the CCNet/Gopher quality gate:
    drop documents the corpus LM finds surprising) — per-doc mean token
    logprob under the corpus unigram LM, thresholded at −3.402
    nats/token, reported as a per-source funnel (docs in, docs kept,
    kept rate, mean kept score). The THRESHOLD COMPARISON is where float
    order could flip membership, so each token's logprob is quantized to
    a 1e9 BIGINT BEFORE any cross-row sum and the gate is the exact
    integer test Σq ≥ threshold_q·n_tok — bit-identical in both engines
    (the repo's standard per-term quantization discipline); the reported
    means divide exact integer sums once at the end. Same three keyed
    shuffles as the unigram-LM scorer, then one source rollup."""
    from ..functions import text as T

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").cast("double").alias("n_total"))
    qt = F.floor(
        F.log(F.col("cnt") / F.col("n_total")) * 1000000000 + 0.5
    ).cast("bigint")
    ds = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_tok"),
            F.sum(qt).cast("bigint").alias("sum_q"),
        )
    )
    kept = F.col("sum_q") >= F.lit(_PPL_THRESH_Q) * F.col("n_tok")
    return ds.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.round(
            F.sum(F.when(kept, 1).otherwise(0)).cast("double") / F.count("*"), 4
        ).alias("kept_rate"),
        F.round(
            F.sum(F.when(kept, F.col("sum_q")).otherwise(0)).cast("double")
            / F.nullif(
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0)), F.lit(0)
            )
            / 1000000000,
            4,
        ).alias("kept_mean_logprob"),
    )


_QUIET_THRESH = 125000  # Σ(s−128)² over a 64-byte window; corpus median ≈ 128k


@query(
    "multimodal_audio_silence_gate",
    oracle=f"""
    WITH auds AS (
      SELECT doc_id AS media_id, text, length(text) AS n
      FROM documents WHERE doc_id % 3 = 1
    ), e AS (
      SELECT media_id,
             CAST((
               SELECT SUM((ascii(substr(w.win, j.j, 1)) - 128)
                          * (ascii(substr(w.win, j.j, 1)) - 128))
               FROM (SELECT substr(text, CAST(i.i * 64 + 1 AS INT), 64)
                       AS win) w,
                    UNNEST(range(1, len(w.win) + 1)) AS j(j)
             ) AS BIGINT) AS energy
      FROM auds, UNNEST(range(0, least(8, greatest(1, n // 64)))) AS i(i)
    )
    SELECT media_id,
           CAST(COUNT(*) AS INT) AS n_windows,
           CAST(SUM(CASE WHEN energy < {_QUIET_THRESH} THEN 1 ELSE 0 END)
                AS INT) AS n_quiet,
           ROUND(CAST(SUM(CASE WHEN energy < {_QUIET_THRESH} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS quiet_ratio,
           CAST(MIN(energy) AS BIGINT) AS min_energy,
           CAST(MAX(energy) AS BIGINT) AS max_energy,
           CASE WHEN SUM(CASE WHEN energy < {_QUIET_THRESH} THEN 1 ELSE 0 END)
                     * 2 >= COUNT(*) THEN 1 ELSE 0 END AS mostly_quiet
    FROM e GROUP BY media_id
    """,
)
def multimodal_audio_silence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO SILENCE/LOUDNESS GATE — the per-clip curation verdict built
    on the windowed PCM energy pass (multimodal_audio_energy): count
    quiet windows (energy below the corpus-median-scaled threshold),
    report the quiet ratio and energy envelope, and flag clips that are
    mostly quiet — the drop-dead-air gate an audio pipeline runs before
    any expensive decode or model. The flag comparison is exact integer
    arithmetic (2·n_quiet ≥ n_windows, no float threshold); energies are
    the same exact integers the energy row certifies, so the only new
    math is one keyed rollup over the window table."""
    from ..operators.multimodal import audio_window_energy, text_as_media

    d = load_table(spark, sf_dir, "documents")
    media = text_as_media(d, "doc_id", "text")
    en = audio_window_energy(media, window_bytes=64, max_windows=8)
    quiet = F.when(F.col("energy") < _QUIET_THRESH, 1).otherwise(0)
    return en.groupBy("media_id").agg(
        F.count("*").cast("int").alias("n_windows"),
        F.sum(quiet).cast("int").alias("n_quiet"),
        F.round(F.sum(quiet).cast("double") / F.count("*"), 4).alias("quiet_ratio"),
        F.min("energy").cast("bigint").alias("min_energy"),
        F.max("energy").cast("bigint").alias("max_energy"),
        F.when(
            F.sum(quiet) * 2 >= F.count("*"), 1
        ).otherwise(0).alias("mostly_quiet"),
    )
