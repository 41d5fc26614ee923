"""AVI/MJPEG video container: RIFF chunk walk, word alignment, header
cross-checks, strided frame sampling over real JPEG decode."""

from __future__ import annotations

import pytest

from fraud_detection_etl_project_spark.operators.jpeg import encode_jpeg
from fraud_detection_etl_project_spark.operators.multimodal import (
    avi_frame_features,
    decode_avi_frames,
    encode_avi_mjpeg,
)


def _solid_jpeg(v: int, w: int = 16, h: int = 16) -> bytes:
    return encode_jpeg(w, h, bytes((v, v, v)) * (w * h), quant=16)


def _recon(v: int) -> int:
    """DC-only closed form: quantized DC roundtrip of a solid gray v."""
    dc = v - 128
    dcq = int(dc / 2 + 0.5) if dc >= 0 else -int(-dc / 2 + 0.5)
    return max(0, min(255, 128 + 2 * dcq))


def test_roundtrip_preserves_frame_bytes_exactly():
    frames = [b"\xff\xd8" + bytes(range(i + 1)) for i in range(5)]  # odd+even sizes
    w, h, got = decode_avi_frames(encode_avi_mjpeg(32, 8, frames))
    assert (w, h) == (32, 8)
    assert got == frames  # MJPEG chunks are stored verbatim, padding stripped


def test_reject_paths():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_frames(b"JUNK" + b"\x00" * 20)
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_avi_frames(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 16)
    good = encode_avi_mjpeg(16, 16, [_solid_jpeg(40)])
    with pytest.raises(ValueError, match="exceeds payload"):
        decode_avi_frames(good[:-10])
    # corrupt the declared frame count in avih (offset: find 'avih')
    i = good.index(b"avih") + 8 + 16
    bad = good[:i] + (99).to_bytes(4, "little") + good[i + 4 :]
    with pytest.raises(ValueError, match="declares 99 frames"):
        decode_avi_frames(bad)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg(16, 16, [])


def test_missing_avih_rejected():
    # a movi-only RIFF: structurally plausible, but no main header
    frame = b"\xff\xd8xx"
    movi_body = b"movi" + b"00dc" + (4).to_bytes(4, "little") + frame
    movi = b"LIST" + len(movi_body).to_bytes(4, "little") + movi_body
    body = b"AVI " + movi
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    with pytest.raises(ValueError, match="missing avih"):
        decode_avi_frames(payload)


def test_strided_features_match_closed_form():
    vals = [40, 90, 140, 200, 250]
    avi = encode_avi_mjpeg(16, 16, [_solid_jpeg(v) for v in vals])
    feats = avi_frame_features(avi, stride=2)  # samples frames 0, 2, 4
    sampled = [_recon(v) for v in (40, 140, 250)]
    assert feats["n_frames"] == 5 and feats["n_sampled"] == 3
    assert feats["width"] == 16 and feats["height"] == 16
    assert feats["mean_luma"] == pytest.approx(sum(sampled) / 3)
    assert feats["max_byte"] == max(sampled)
    assert feats["min_byte"] == min(sampled)


def test_stride_one_decodes_everything():
    avi = encode_avi_mjpeg(16, 16, [_solid_jpeg(v) for v in (10, 245)])
    feats = avi_frame_features(avi, stride=1)
    assert feats["n_sampled"] == 2
    assert feats["mean_luma"] == pytest.approx((_recon(10) + _recon(245)) / 2)


def test_zero_frame_avi_rejected_in_features():
    """A structurally valid RIFF AVI with zero frames must raise the
    contract ValueError, not divide by zero inside an Arrow batch."""
    avih = b"avih" + (56).to_bytes(4, "little") + b"".join(
        int(x).to_bytes(4, "little")
        for x in (100000, 0, 0, 0x10, 0, 0, 1, 4, 16, 16, 0, 0, 0, 0)
    )
    hdrl = b"LIST" + (4 + len(avih)).to_bytes(4, "little") + b"hdrl" + avih
    movi = b"LIST" + (4).to_bytes(4, "little") + b"movi"
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    w, h, frames = decode_avi_frames(payload)
    assert (w, h, frames) == (16, 16, [])
    with pytest.raises(ValueError, match="no frames"):
        avi_frame_features(payload, stride=2)
