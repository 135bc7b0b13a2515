"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not in this container, so the decode
kernels are STUBS: ``decode=...`` either raises ``NotImplementedError``
(real mode) or produces deterministic fake features (test mode).  What IS
real and tested: the Spark-side plumbing — schema, media-type dispatch,
``mapInPandas`` batch shape, partition-preserving feature extraction —
which is the part that matters for the 100 TB plan (the decode kernel is
embarrassingly parallel either way).
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),       # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 8


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table exercising the schema."""
    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                mt = ("image", "audio", "video")[i % 3]
                payload = hashlib.md5(f"media-{i}".encode()).digest() * (1 + i % 4)
                meta = (64 + i % 128, 64 + (i * 3) % 128, 1000 + i * 10,
                        ("jpeg", "opus", "av1")[i % 3])
                rows.append((i, mt, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "media_type",
                                              "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    out = []
    for j in range(dim):
        h = hashlib.md5(payload + struct.pack("<I", j)).digest()[:8]
        (u,) = struct.unpack("<Q", h)
        out.append(round(u / float(1 << 64), 6))
    return out


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract per media row (mapInPandas, Arrow batches).

    ``fake=False`` is the production signature — it raises
    NotImplementedError because no codec libraries ship in this container;
    a deployment plugs its decoder into the same batch contract.
    """
    schema = (
        "media_id bigint, media_type string, feature array<double>, n_bytes int"
    )

    def run(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this container; supply a decoder or use fake=True"
                )
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "feature": feats,
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
            })

    return media.mapInPandas(run, schema=schema)


def resize_plan(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Pure-Column resize planning (no decode needed): target dims keeping
    aspect ratio — the metadata-only half of an image pipeline."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_px) / w, F.lit(max_px) / h, F.lit(1.0))
    return media.select(
        "media_id", "media_type",
        w.alias("src_width"), h.alias("src_height"),
        F.floor(w * scale).cast("int").alias("dst_width"),
        F.floor(h * scale).cast("int").alias("dst_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps from
    duration metadata — Column-only, decode-free."""
    dur = F.col("meta.duration_ms")
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), dur - 1, F.lit(every_ms))).alias("sample_ms"),
        )
    )
