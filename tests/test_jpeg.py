"""JPEG baseline codec tests.

Conformance standard: JPEG decoders are NOT bit-identical by design —
T.81 Annex A standardizes the DCT mathematically and bounds
implementation accuracy (the IEEE-1180 compliance regime), so
independent decoders legitimately differ by ±1 per sample, and chroma
UPSAMPLING kernels on subsampled material are implementation-defined
(we replicate; libjpeg-lineage decoders interpolate). The tests below
therefore assert:

* exact closed-form values where the math collapses (DC-only blocks,
  flat quant tables) — bit-exact, no tolerance;
* ±1-per-sample agreement with javax.imageio wherever no subsampled
  chroma varies (our 4:4:4 files both ways; their grayscale files);
* a documented, tight-mean tolerance on their 4:2:0 color files where
  the upsampling kernels differ.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from fraud_detection_etl_project_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _solid_expected(v: int, quant: int = 16) -> int:
    """Closed-form DC-only round-trip: DC = 8(v-128); quantize
    round-half-away by ``quant``; reconstruct DCq*quant/8 + 128."""
    t = v - 128
    dcq = int(math.copysign(math.floor(abs(t) * 8 / quant + 0.5), t)) if t else 0
    return max(0, min(255, round(dcq * quant / 8) + 128))


def _rand_rgb(w, h, seed):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


# ---------------------------------------------------------------------------
# Exact closed-form layer
# ---------------------------------------------------------------------------


def test_solid_gray_tiles_closed_form():
    """Solid 8x8 tiles decode to the exactly predictable DC-only values —
    including the DC-difference prediction chain across blocks."""
    vals = [0, 7, 60, 128, 129, 200, 255]
    w = h = 8 * len(vals)
    # each block-row r is a solid gray vals[r] -> tests DC diffs down rows
    rows = []
    for v in vals:
        rows.extend([v] * (w * 3) * 8)
    rgb = bytes(rows)
    dw, dh, out = decode_jpeg(encode_jpeg(w, h, rgb))
    assert (dw, dh) == (w, h)
    arr = np.frombuffer(out, np.uint8).reshape(h, w, 3)
    for r, v in enumerate(vals):
        exp = _solid_expected(v)
        assert (arr[8 * r : 8 * r + 8] == exp).all(), (v, exp)


def test_restart_markers_value_identical():
    w, h = 40, 24
    rgb = _rand_rgb(w, h, 5)
    plain = decode_jpeg(encode_jpeg(w, h, rgb, quant=1))[2]
    rst = decode_jpeg(encode_jpeg(w, h, rgb, quant=1, restart_interval=3))[2]
    assert plain == rst


def test_reject_paths():
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"nope")
    # flip SOF0 -> SOF2 (progressive) in a real file
    jp = bytearray(encode_jpeg(8, 8, bytes(192)))
    idx = jp.find(b"\xff\xc0")
    jp[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="unsupported JPEG process"):
        decode_jpeg(bytes(jp))


# ---------------------------------------------------------------------------
# Conformance vs javax.imageio (independent reference codec)
# ---------------------------------------------------------------------------


def _jvm_decode(spark, payload: bytes) -> np.ndarray:
    jvm = spark._jvm
    bais = jvm.java.io.ByteArrayInputStream(payload)
    bi = jvm.javax.imageio.ImageIO.read(bais)
    w, h = bi.getWidth(), bi.getHeight()
    out = np.zeros((h, w, 3), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            p = bi.getRGB(x, y)
            out[y, x] = [(p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF]
    return out


def _jvm_encode_jpeg(spark, arr: np.ndarray, gray: bool = False) -> bytes:
    jvm = spark._jvm
    h, w = arr.shape[:2]
    BI = jvm.java.awt.image.BufferedImage
    bi = BI(w, h, BI.TYPE_BYTE_GRAY if gray else BI.TYPE_INT_RGB)
    if gray:
        # setRGB on TYPE_BYTE_GRAY routes through an sRGB<->linear-gray
        # colorspace transform (gamma); poke raw samples instead.
        raster = bi.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(arr[y, x]))
    else:
        for y in range(h):
            for x in range(w):
                r, g, b = (int(c) for c in arr[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
    return bytes(baos.toByteArray())


def test_imageio_decodes_our_files_within_idct_tolerance(spark):
    """Our 4:4:4 encodings (incl. restart markers) must decode through
    javax.imageio to within the IDCT-accuracy envelope of our own
    decode: ±1 per YCbCr sample, which the 1.402/1.772 color-conversion
    factors amplify to at most ±2 per RGB sample — and almost every
    pixel must agree exactly. Any Huffman/table/marker emission bug
    would blow far past that."""
    w, h = 32, 16
    rgb = _rand_rgb(w, h, 11)
    for kwargs in ({"quant": 4}, {"quant": 16, "restart_interval": 2}):
        jp = encode_jpeg(w, h, rgb, **kwargs)
        ours = np.frombuffer(decode_jpeg(jp)[2], np.uint8).astype(int).reshape(h, w, 3)
        theirs = _jvm_decode(spark, jp)
        assert theirs.shape == (h, w, 3)
        diff = np.abs(ours - theirs)
        assert diff.max() <= 2 and diff.mean() <= 0.15, (kwargs, diff.max(), diff.mean())


def test_we_decode_imageio_grayscale_within_idct_tolerance(spark):
    """javax.imageio's own encodings (its tables, its scan layout;
    single-component for TYPE_BYTE_GRAY) must decode through our decoder
    to within ±1 of its own round-trip — no varying subsampled chroma, so
    the strict envelope applies."""
    rng = random.Random(13)
    h, w = 24, 40
    # smooth-ish gradient + noise: exercises AC coefficients
    base = np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 200
    noise = np.array([[rng.randrange(30) for _ in range(w)] for _ in range(h)])
    gray = ((base + noise) % 256).astype(np.int64)
    jp = _jvm_encode_jpeg(spark, gray, gray=True)
    dw, dh, out = decode_jpeg(jp)
    ours = np.frombuffer(out, np.uint8).astype(int).reshape(dh, dw, 3)
    # getRGB on the decoded grayscale image would gamma-transform; read
    # the raw luma samples instead.
    jvm = spark._jvm
    bi = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(jp))
    raster = bi.getRaster()
    theirs = np.array(
        [[raster.getSample(x, y, 0) for x in range(w)] for y in range(h)]
    )
    assert (dw, dh) == (w, h)
    assert (ours[:, :, 0] == ours[:, :, 1]).all() and (ours[:, :, 1] == ours[:, :, 2]).all()
    assert np.abs(ours[:, :, 0] - theirs).max() <= 1


def test_we_decode_imageio_color_420_within_upsampling_tolerance(spark):
    """javax.imageio writes color as 4:2:0; its decoder interpolates
    chroma where ours replicates (both spec-legal). On smooth material
    the kernels agree closely — assert a tight mean and a bounded max;
    a Huffman/placement bug would produce garbage, not a small smooth
    delta."""
    h, w = 32, 48
    r = np.add.outer(np.arange(h) * 2, np.arange(w)) % 256
    g = np.add.outer(np.arange(h), np.arange(w) * 2) % 256
    b = (r + g) % 256
    rgb = np.stack([r, g, b], axis=-1).astype(np.int64)
    jp = _jvm_encode_jpeg(spark, rgb)
    dw, dh, out = decode_jpeg(jp)
    ours = np.frombuffer(out, np.uint8).astype(int).reshape(dh, dw, 3)
    theirs = _jvm_decode(spark, jp)
    assert (dw, dh) == (w, h)
    diff = np.abs(ours - theirs)
    assert diff.mean() <= 2.0 and diff.max() <= 24, (diff.mean(), diff.max())
