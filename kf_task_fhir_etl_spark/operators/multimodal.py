"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side contract is real and tested (schemas, batch iteration,
partition behavior); the media decode itself is STUBBED — the container has
no image/audio codecs — behind ``_decode_image_stub``, a deterministic fake
that derives "pixels" from the bytes' md5. Swapping in PIL/torchvision later
touches only the stub.

At 100 TB: binary payloads stay columnar in parquet; ``mapInPandas`` streams
Arrow batches (bounded memory per task) and metadata-only queries never
touch the bytes thanks to column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes int"


def _decode_image_stub(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decoder: md5-derived feature vector.

    Replace with a real decode (PIL → resize → normalize) when codecs are
    available; raise NotImplementedError there for unsupported kinds.
    """
    if content is None:
        return [0.0] * dim
    h = hashlib.md5(content).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow batches in, bounded
    memory, schema-stable output."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [_decode_image_stub(c, dim) for c in pdf["content"]],
                    "n_bytes": [0 if c is None else len(c) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp.
    The frame decode is the same stub; the explode/shape logic is real."""
    frames = F.when(
        (F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull(),
        F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
    ).otherwise(F.array(F.lit(0)))
    return media.select(
        "media_id",
        "kind",
        F.explode(frames).alias("ts_ms"),
        F.col("content"),
    )


def metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — verify with .explain() that the binary
    column is pruned from the scan."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("meta.width")).alias("avg_width"),
            F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
