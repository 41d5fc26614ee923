"""Multimodal plumbing tests: media table wrapping + mapInPandas features."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detection_etl_project_spark.operators.multimodal import (
    decode_real,
    decode_stub,
    extract_features,
    to_media_table,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x10\xff fake-jpeg-bytes"), (2, b"RIFF fake-wav"), (3, b"")],
        "id long, payload binary",
    )
    return to_media_table(df, "id", "payload", "image")


def test_media_table_metadata(media):
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == 19
    assert rows[1]["media_type"] == "image"
    assert len(rows[1]["checksum"]) == 32
    assert rows[3]["n_bytes"] == 0


def test_extract_features_shapes(media):
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    assert all(len(r["features"]) == 8 for r in rows.values())
    assert rows[1]["features"][0] == 19.0  # first stub feature = byte length
    assert rows[3]["features"] == [0.0] * 8  # empty payload


def test_extract_features_deterministic(media):
    a = extract_features(media).collect()
    b = extract_features(media).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"bytes", "image")


def test_stub_locality():
    assert decode_stub(b"abc")[0] == 3.0
    assert decode_stub(b"") == [0.0] * 8
