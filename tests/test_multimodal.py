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


def test_decode_real_is_explicit_stub_beyond_ppm():
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8 jpeg bytes", "image")
    with pytest.raises(NotImplementedError):
        decode_real(b"RIFF wav bytes", "audio")


def test_decode_ppm_roundtrip():
    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_ppm,
        ppm_pixel_features,
    )

    rgb = bytes(range(12))  # 2x2 image, channels 0..11
    payload = b"P6\n# a comment\n2 2\n255\n" + rgb
    w, h, got = decode_ppm(payload)
    assert (w, h, got) == (2, 2, rgb)
    f = ppm_pixel_features(payload)
    assert f["width"] == 2 and f["height"] == 2 and f["n_pixels"] == 4
    assert f["mean_r"] == (0 + 3 + 6 + 9) / 4
    assert f["mean_g"] == (1 + 4 + 7 + 10) / 4
    assert f["max_byte"] == 11 and f["min_byte"] == 0
    # decode_real dispatches PPM images to the real decoder
    assert decode_real(payload, "image") == (2, 2, rgb)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")  # truncated pixel data


def test_stub_locality():
    assert decode_stub(b"abc")[0] == 3.0
    assert decode_stub(b"") == [0.0] * 8


def test_resize_media_shapes(media):
    from fraud_detection_etl_project_spark.operators.multimodal import resize_media

    out = {r["media_id"]: r for r in resize_media(media, h=4, w=4).collect()}
    assert out[1]["n_bytes"] == 16 and len(out[1]["payload"]) == 16
    assert out[1]["target_h"] == 4 and out[1]["target_w"] == 4
    assert out[3]["n_bytes"] == 0  # empty payload stays empty
    # deterministic: same input -> same resized bytes
    again = {r["media_id"]: r for r in resize_media(media, h=4, w=4).collect()}
    assert bytes(out[1]["payload"]) == bytes(again[1]["payload"])


def test_sample_frames_fanout(media):
    from fraud_detection_etl_project_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, n_frames=3, frame_bytes=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    # 19-byte payload -> 3 frames; 13-byte -> 3; empty -> none
    assert len(by_media[1]) == 3
    assert sorted(r["frame_idx"] for r in by_media[1]) == [0, 1, 2]
    assert all(r["n_bytes"] <= 4 for r in frames)
    assert 3 not in by_media
