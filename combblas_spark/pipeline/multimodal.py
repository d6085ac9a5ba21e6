"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.  The real codecs (PIL/ffmpeg/torchaudio) are
NOT in this container, so the decode step is stubbed: if a codec
import succeeds it is used, otherwise a clearly-marked deterministic
fake decodes the payload (hash-derived pixels).  The Spark-side
plumbing — schema, partitioning, UDF signatures, Arrow batch shapes —
is real and tested; swapping the stub for a codec changes no plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("payload", BinaryType(), False),    # opaque encoded bytes
        StructField("width", IntegerType(), True),      # typed metadata
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("decoded_w", IntegerType(), False),
        StructField("decoded_h", IntegerType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)

try:  # pragma: no cover - codec not present in this container
    from PIL import Image  # noqa: F401

    HAVE_CODEC = True
except ImportError:
    HAVE_CODEC = False


def synth_media(spark: SparkSession, n: int, seed: int = 42, n_partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
                w, h = 8 + i % 32, 8 + (i * 7) % 32
                rows.append((i, kind, payload, w, h, 1000 + i % 5000))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    return spark.range(0, n, 1, n_partitions).mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """STUB decode: deterministic pseudo-pixels from the payload hash.

    Replace with a real codec (PIL.Image.open etc.) when available —
    the surrounding plumbing is codec-agnostic.
    """
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


def decode_and_featurize(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """decode → resize-to-metadata → mean-pool row features.

    One ``mapInPandas`` pass; batches stay Arrow-columnar in and out.
    With a real codec this is where pixel decode happens; the stub
    keeps shapes/dtypes identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if HAVE_CODEC:
            raise NotImplementedError(
                "real codec path intentionally unimplemented in sandbox"
            )
        for b in batches:
            out = []
            for r in b.itertuples(index=False):
                img = _fake_decode(bytes(r.payload), int(r.width), int(r.height))
                # fixed-length feature: mean of feat_dim row-bands
                bands = np.array_split(img.astype(np.float32), feat_dim, axis=0)
                feats = [float(bd.mean()) for bd in bands]
                out.append((r.media_id, r.kind, img.shape[1], img.shape[0], feats))
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video → (media_id, frame_idx) sample plan (metadata-only, no
    decode): the distributed fan-out stage of a frame pipeline."""
    vids = media.filter(F.col("kind") == "video")
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
