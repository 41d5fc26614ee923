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
    """The production decode contract (image -> (w, h, pixel bytes), audio
    -> PCM frames, video -> sampled frames).

    One container is decoded for real, with pure Python: binary PPM (P6) —
    a header ``P6 <w> <h> <maxval>`` then raw RGB bytes, no compression, so
    the full decode→feature path is exercised end-to-end (and oracle-
    checkable) without codec libraries. Every other container raises: JPEG/
    PNG/WAV/MP4 need PIL/ffmpeg, which this environment doesn't have; wire
    them here — the mapInPandas plumbing in extract_features is already
    batch-shaped for it.
    """
    if media_type == "image" and payload[:2] == b"P6":
        return decode_ppm(payload)
    raise NotImplementedError(
        "media decode beyond PPM requires image/audio codec libraries "
        "(PIL/ffmpeg); wire them here — the mapInPandas plumbing in "
        "extract_features is already batch-shaped for it"
    )


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Pure-Python binary-PPM (P6) decoder: returns (width, height, rgb)
    where ``rgb`` is w*h*3 raw bytes. Supports the standard header form
    ``P6\\n<w> <h>\\n<maxval>\\n`` with arbitrary whitespace and ``#``
    comments, maxval <= 255."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    rgb = payload[pos : pos + w * h * 3]
    if len(rgb) != w * h * 3:
        raise ValueError(f"truncated PPM: want {w * h * 3} bytes, have {len(rgb)}")
    return w, h, rgb


def ppm_pixel_features(payload: bytes) -> dict:
    """Decode a P6 PPM and compute per-channel pixel statistics — the
    feature-extraction step of an image pipeline, on a really-decoded
    container. Means are integer-sum / pixel-count divisions, so they are
    bit-identical across engines for identical bytes."""
    w, h, rgb = decode_ppm(payload)
    n = w * h
    chans = [rgb[c::3] for c in range(3)]
    return {
        "width": w,
        "height": h,
        "n_pixels": n,
        "mean_r": sum(chans[0]) / n,
        "mean_g": sum(chans[1]) / n,
        "mean_b": sum(chans[2]) / n,
        "max_byte": max(rgb),
        "min_byte": min(rgb),
    }


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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("target_h", LongType()),
        StructField("target_w", LongType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_stub(payload: bytes, h: int, w: int) -> bytes:
    """Deterministic fake resize: h*w bytes sampled evenly from the
    payload (stands in for decode -> interpolate -> re-encode; a real
    build swaps in PIL/libvips here — the batch plumbing is identical)."""
    if not payload:
        return b""
    n, out = len(payload), h * w
    return bytes(payload[(i * n) // out] for i in range(out))


def resize_media(media: DataFrame, h: int = 8, w: int = 8) -> DataFrame:
    """Arrow-batched resize over a media table (mapInPandas). Output stays
    an opaque binary column + typed metadata, so resized media flows
    through the same downstream operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize_stub(bytes(p), h, w) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                    "target_h": h,
                    "target_w": w,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for video-shaped payloads: emit up to ``n_frames``
    evenly-spaced byte windows per media row (1:N row fan-out inside
    mapInPandas — the output batch is the exploded frame table). A real
    build replaces the byte-window slicing with ffmpeg keyframe extraction;
    partitioning, schema, and fan-out shape are unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                k = min(n_frames, max(len(b) // frame_bytes, 1)) if b else 0
                for j in range(k):
                    start = (j * max(len(b) - frame_bytes, 0)) // max(k - 1, 1) if k > 1 else 0
                    ids.append(mid)
                    idxs.append(j)
                    payloads.append(b[start : start + frame_bytes])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


PPM_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("max_byte", LongType()),
        StructField("min_byte", LongType()),
    ]
)


def extract_ppm_features(media: DataFrame) -> DataFrame:
    """Real-decode feature extraction: parse each payload as binary PPM and
    emit per-channel pixel statistics (Arrow-batched mapInPandas — same
    batch shape a PIL/ffmpeg decoder would use)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [ppm_pixel_features(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=PPM_FEATURES_SCHEMA)


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
