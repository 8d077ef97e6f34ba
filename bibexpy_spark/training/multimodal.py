"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Large-scale training pipelines treat image/audio/video as ``binary`` columns
with a metadata struct; decode/feature steps run as Arrow-batched
``mapInPandas`` so each executor streams record batches without
materializing whole partitions.

The actual codec work is STUBBED (no imaging/audio libraries ship in this
container — driver brief): ``decode_image_batch`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded by the payload hash) produces stable feature vectors so
the Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image|audio|video
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.integers(64, 2048)))
        meta = {
            "width": int(rng.integers(16, 512)) if kind != "audio" else None,
            "height": int(rng.integers(16, 512)) if kind != "audio" else None,
            "duration_ms": int(rng.integers(100, 60_000)) if kind != "image" else None,
            "codec": {"image": "png", "audio": "opus", "video": "av1"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features from the sha256
    of the payload.  REPLACE with a real codec (PIL/libav) in production —
    same signature, same batch shape."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_features(
    media: DataFrame, fake: bool = False, batch_dim: int = 8
) -> DataFrame:
    """payload -> feature vector via Arrow-batched mapInPandas.

    Raises NotImplementedError per batch unless ``fake=True`` (no codec libs
    in this environment); the distributed plumbing is identical either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decoding needs PIL/libav; run with fake=True"
                )
            payloads = pdf["payload"]
            feats = [
                _fake_decode(bytes(p), batch_dim) if p is not None else None
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0).astype("int32"),
                    "content_sha": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest() if p is not None else ""
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def dedup_media_exact(features: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash — same staged-exact pattern as the
    text pipeline (content_sha groupBy)."""
    return features.groupBy("content_sha").agg(
        F.count("*").alias("n_members"), F.min("media_id").alias("rep_id")
    )
