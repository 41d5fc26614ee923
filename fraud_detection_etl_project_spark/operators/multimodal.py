"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (north star): image/audio/video ride through the engine as
``binary`` columns with a metadata struct; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched Pandas functions via
``mapInPandas`` — the ONLY place Python touches the data, and it touches it
in columnar batches, never row-at-a-time.

The decode step itself is STUBBED (this container has no image/audio
libraries): ``decode_stub`` produces a deterministic fake "feature vector"
from the payload bytes, and ``decode_real`` raises NotImplementedError with
the intended contract. The Spark-side plumbing — schema, batch iteration,
partitioning — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, media_type: str) -> DataFrame:
    """Wrap any binary-ish column as a typed media table (metadata computed
    JVM-side: byte length + md5 checksum)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_real(payload: bytes, media_type: str):
    """The production decode contract (image -> HxWxC array, audio -> PCM
    frames, video -> sampled frames). Requires codec libraries not present
    in this environment."""
    raise NotImplementedError(
        "media decode requires image/audio codec libraries (PIL/ffmpeg); "
        "wire them here — the mapInPandas plumbing in extract_features is "
        "already batch-shaped for it"
    )


def decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake decoder: 8 'features' from payload byte stats.
    Stands in for decode_real so the distributed plumbing is testable."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    n = len(payload)
    return [
        float(n),
        payload[0] / 255.0,
        payload[-1] / 255.0,
        sum(payload[:64]) / (min(n, 64) * 255.0),
        (max(payload) - min(payload)) / 255.0,
        payload[n // 2] / 255.0,
        float(n % 251),
        float(sum(payload[:16]) % 997),
    ][:dim]


def extract_features(media: DataFrame, batch_decoder=decode_stub) -> DataFrame:
    """Arrow-batched feature extraction over a media table via mapInPandas.

    Each Python batch is a columnar pandas block (thousands of payloads),
    not a row — the 10-100× Pandas-UDF-vs-row-UDF gap. Partitioning is
    preserved; at scale, repartition by size class first so batches are
    byte-balanced rather than row-balanced.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": [batch_decoder(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)
