"""Throughput demo for the REAL multimodal decode path at corpus scale.

Synthesizes N 64x64 spec-compliant BMP images as a binary parquet column
(the binaryFile-ingested shape), then times the three decode consumers —
box resize (per-pixel output), gray histogram, and full decode+stats —
end to end on local[32]. Usage: python tools/media_scale_demo.py [N].
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_avro_pipeline_java_spark.operators.multimodal import (  # noqa: E402
    box_resize,
    decode_bmp,
    encode_bmp,
)
from kafka_avro_pipeline_java_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
SIDE = 64

spark = get_spark("media-scale-demo")
spark.sparkContext.setLogLevel("ERROR")


def _make(it):
    for pdf in it:
        ids, payloads = [], []
        for i in pdf["id"]:
            rng = np.random.default_rng(int(i))
            px = rng.integers(0, 256, size=(SIDE, SIDE, 3), dtype=np.uint8)
            ids.append(int(i))
            payloads.append(encode_bmp(px))
        yield pd.DataFrame({"media_id": ids, "payload": payloads})


(
    spark.range(N)
    .repartition(64)
    .mapInPandas(_make, schema="media_id long, payload binary")
    .write.mode("overwrite")
    .parquet("/tmp/media_scale_demo")
)
media = spark.read.parquet("/tmp/media_scale_demo")
n = media.count()
payload_mb = SIDE * SIDE * 3 * n / 1e6
print(f"{n:,} images, ~{payload_mb:,.0f} MB of pixels")


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = round(time.perf_counter() - t0, 2)
    print(
        f"{name}: {dt}s ({round(n / dt):,} imgs/s, "
        f"{round(payload_mb / dt):,} MB/s) -> {out}"
    )


def _resize(it):
    for pdf in it:
        sums = [
            int(box_resize(decode_bmp(bytes(p)), 4).sum())
            for p in pdf["payload"]
        ]
        yield pd.DataFrame({"media_id": pdf["media_id"], "s": sums})


def _hist(it):
    for pdf in it:
        out = []
        for p in pdf["payload"]:
            img = decode_bmp(bytes(p))
            out.append(
                int(np.bincount((img[:, :, 0] // 32).ravel(), minlength=8).max())
            )
        yield pd.DataFrame({"media_id": pdf["media_id"], "m": out})


# warm the page cache first: the IO-only scan separates disk speed from
# decode cost (on a cold cache the first pass is disk-bound, not decode-bound)
timed(
    "payload_scan_cold",
    lambda: media.select(F.sum(F.length("payload"))).first()[0],
)
timed(
    "decode_resize_16x16",
    lambda: media.mapInPandas(_resize, schema="media_id long, s long")
    .agg(F.sum("s")).first()[0],
)
timed(
    "decode_histogram",
    lambda: media.mapInPandas(_hist, schema="media_id long, m long")
    .agg(F.max("m")).first()[0],
)
spark.stop()
