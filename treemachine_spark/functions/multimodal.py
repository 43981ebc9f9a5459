"""Multimodal column handling: image/audio/video as opaque BinaryType
columns with typed metadata structs, processed via Arrow-batched
mapInPandas (beyond-reference scope).

The actual media codecs are NOT available in this environment, so decode is
STUBBED: ``decode_image`` raises NotImplementedError unless
``fake_decoder=True``, in which case a deterministic fake (derived from the
bytes) exercises the full Spark plumbing — schema, batch iteration,
partitioning — which is the part that matters for the engine.

Scale design: media bytes stay opaque in the scan (no decode before the
filter/projection that prunes rows); mapInPandas processes Arrow record
batches so Python overhead is per-batch, not per-row; metadata lives in a
sibling struct column so Catalyst can prune/push down on it without
touching the blob.
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
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", LongType()),
        StructField("feat_mean", IntegerType()),
    ]
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo wrapper: derive a deterministic binary 'media' payload from the
    text column (the testdata has no real media) with typed metadata —
    the schema/partitioning pattern for real pipelines."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.lit(None).cast("int").alias("n_frames"),
    )


def decode_image(data: bytes, fake_decoder: bool = False):
    """STUB: real decode requires an image codec not present in this
    container. The fake decoder returns deterministic pseudo-pixels so the
    distributed plumbing is testable."""
    if not fake_decoder:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake_decoder=True for the deterministic test double"
        )
    return bytes((b * 31 + i) % 256 for i, b in enumerate(data[:64]))


def extract_features(media: DataFrame, fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: per media row,
    byte stats of the (fake-)decoded payload. Batch-shaped Python — the
    per-row cost is vectorized pandas, not interpreter loops."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["content"].map(lambda b: decode_image(bytes(b), fake_decoder))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "checksum": decoded.map(lambda d: sum(d) % 2_147_483_647).astype("int64"),
                    "feat_mean": decoded.map(
                        lambda d: int(sum(d) / len(d)) if len(d) else 0
                    ).astype("int32"),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata updated executor-side, content passed
    through (real resampling is codec work, stubbed)."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: explode sampled frame indices from the
    metadata without touching content bytes."""
    return media.where(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce("n_frames", F.lit(0)) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
