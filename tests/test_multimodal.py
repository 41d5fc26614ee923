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


def test_decode_real_is_explicit_stub_beyond_builtin_codecs():
    # JPEG now dispatches to the REAL T.81 decoder, which rejects
    # truncated/garbage entropy data rather than NotImplementedError
    with pytest.raises(ValueError):
        decode_real(b"\xff\xd8 jpeg bytes", "image")
    with pytest.raises(NotImplementedError):
        decode_real(b"ID3 mp3 bytes", "audio")
    # RIFF dispatches to the REAL wav decoder, which rejects non-WAVE RIFF
    with pytest.raises(ValueError):
        decode_real(b"RIFF\x04\x00\x00\x00AVI ", "audio")


def _bmp(w, h_signed, pixels_bgr_rows, extra_offset=0):
    """Build a 24-bpp BMP from BGR row bytes (file order). pixels_bgr_rows
    is a list of rows, each a bytes of w*3 BGR values, already in FILE row
    order (bottom-up for positive h)."""
    import struct

    stride = (w * 3 + 3) & ~3
    offset = 54 + extra_offset
    body = b"".join(row + b"\x00" * (stride - len(row)) for row in pixels_bgr_rows)
    return (
        b"BM"
        + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h_signed, 1, 24, 0, len(body), 0, 0, 0, 0)
        + b"\x00" * extra_offset
        + body
    )


def test_decode_bmp_bottomup_bgr_padding():
    from fraud_detection_etl_project_spark.operators.multimodal import (
        bmp_pixel_features,
        decode_bmp,
    )

    # 3x2 image; logical top row RGB pixels (1,2,3),(4,5,6),(7,8,9);
    # bottom row (10,11,12),(13,14,15),(16,17,18)
    top = bytes([3, 2, 1, 6, 5, 4, 9, 8, 7])  # BGR per pixel
    bot = bytes([12, 11, 10, 15, 14, 13, 18, 17, 16])
    payload = _bmp(3, 2, [bot, top])  # positive height: bottom row FIRST
    w, h, rgb = decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert rgb == bytes(range(1, 19))  # back to top-down RGB
    f = bmp_pixel_features(payload)
    assert f["n_pixels"] == 6 and f["mean_r"] == (1 + 4 + 7 + 10 + 13 + 16) / 6
    assert f["min_byte"] == 1 and f["max_byte"] == 18
    # decode_real dispatches BM images to the real decoder
    assert decode_real(payload, "image")[2] == rgb


def test_decode_bmp_topdown_and_offset():
    from fraud_detection_etl_project_spark.operators.multimodal import decode_bmp

    top = bytes([3, 2, 1, 6, 5, 4, 9, 8, 7])
    bot = bytes([12, 11, 10, 15, 14, 13, 18, 17, 16])
    # NEGATIVE height: rows stored top-down; also a 16-byte gap before the
    # pixel array (e.g. color-space extension) the offset must skip
    payload = _bmp(3, -2, [top, bot], extra_offset=16)
    assert decode_bmp(payload)[2] == bytes(range(1, 19))


def test_decode_bmp_rejects():
    import struct

    from fraud_detection_etl_project_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"PNG...")
    with pytest.raises(ValueError):
        decode_bmp(_bmp(3, 2, [bytes(12)]))  # one row short -> truncated
    eight_bpp = bytearray(_bmp(1, 1, [bytes(4)]))
    struct.pack_into("<H", eight_bpp, 28, 8)
    with pytest.raises(ValueError):
        decode_bmp(bytes(eight_bpp))


def _wav(samples, rate=8000, channels=1, junk_chunk=True):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    junk = (b"fact" + struct.pack("<II", 4, len(samples))) if junk_chunk else b""
    body = b"WAVE" + fmt + junk + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_roundtrip_and_chunk_walk():
    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_wav,
        wav_sample_features,
    )

    samples = [0, 1, -1, 32767, -32768, 256, -257, 1000]
    rate, ch, got = decode_wav(_wav(samples))
    assert (rate, ch, got) == (8000, 1, samples)
    # odd-sized junk chunk exercises the 2-byte alignment rule
    import struct

    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 24 + 11 + 8 + 4)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"  # 3-byte chunk + pad
        + b"data" + struct.pack("<I", 4)
        + struct.pack("<2h", 7, -7)
    )
    assert decode_wav(payload)[2] == [7, -7]
    f = wav_sample_features(_wav(samples))
    assert f["n_samples"] == 8 and f["mean_sample"] == sum(samples) / 8
    assert f["min_sample"] == -32768 and f["max_sample"] == 32767
    assert f["abs_energy"] == sum(s * s for s in samples)
    # decode_real dispatches RIFF audio to the real decoder
    assert decode_real(_wav(samples), "audio")[2] == samples


def test_decode_wav_rejects():
    import struct

    from fraud_detection_etl_project_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"OggS...")
    no_data = b"RIFF" + struct.pack("<I", 28) + b"WAVE" + b"fmt " + struct.pack(
        "<I", 16
    ) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError):
        decode_wav(no_data)
    ieee_float = _wav([0, 0])
    pos = ieee_float.index(b"fmt ") + 8
    bad = ieee_float[:pos] + struct.pack("<H", 3) + ieee_float[pos + 2 :]
    with pytest.raises(ValueError):
        decode_wav(bad)


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


def test_decode_png_all_filters_roundtrip():
    """encode(Sub/Up) and hand-encoded Average/Paeth scanlines all
    reconstruct to the original pixels; multi-IDAT split also decodes."""
    import struct
    import zlib

    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rgb = bytes((i * 37 + 11) % 256 for i in range(24))  # 4x2 RGB
    assert decode_png(encode_png(4, 2, rgb)) == (4, 2, rgb)
    assert decode_png(encode_png(4, 2, rgb, row_filters=[0, 0])) == (4, 2, rgb)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # Average (3) on row 0, Paeth (4) on row 1, hand-filtered
    stride = 12
    prev = bytes(stride)
    raw = bytearray()
    row0 = rgb[:stride]
    raw.append(3)
    raw += bytes(
        (row0[i] - ((row0[i - 3] if i >= 3 else 0) + prev[i]) // 2) % 256
        for i in range(stride)
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    row1 = rgb[stride:]
    raw.append(4)
    raw += bytes(
        (row1[i] - paeth(row1[i - 3] if i >= 3 else 0, row0[i], row0[i - 3] if i >= 3 else 0))
        % 256
        for i in range(stride)
    )
    comp = zlib.compress(bytes(raw))
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    # split the deflate stream across two IDAT chunks: must concatenate
    png = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", comp[:5])
        + chunk(b"IDAT", comp[5:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(png) == (4, 2, rgb)


def test_decode_png_rejects():
    import struct
    import zlib

    import pytest

    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rgb = bytes(range(24))
    good = encode_png(4, 2, rgb)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JFIF" + good)
    # corrupt one IDAT byte -> CRC mismatch must be caught, not garbage pixels
    idat_pos = good.index(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_pos + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))
    # 16-bit depth rejected explicitly
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 4, 2, 16, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="only 8-bit RGB"):
        decode_png(sig + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="missing IHDR or IDAT"):
        decode_png(sig + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# GIF: LZW decode conformance vs javax.imageio ground truth + round-trip
# ---------------------------------------------------------------------------


def _imageio_gif(spark, w, h, pix):
    """Encode (w, h, row-major (r,g,b) pixels) as GIF with the JVM's
    javax.imageio codec — an independent reference implementation."""
    jvm = spark._jvm
    BI = jvm.java.awt.image.BufferedImage
    bi = BI(w, h, BI.TYPE_INT_RGB)
    for y in range(h):
        for x in range(w):
            r, g, b = pix[y * w + x]
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bi, "gif", baos)
    return bytes(baos.toByteArray())


def test_gif_decode_conformance_vs_imageio(spark):
    """The pure-Python GIF decoder must exactly reproduce images encoded
    by javax.imageio (which emits INTERLACED rasters with real LZW
    streams crossing code-width boundaries) — this pins our LZW
    width-growth timing and interlace pass order to the spec via an
    independent codec, not a self-consistent encoder/decoder pair."""
    import random

    from fraud_detection_etl_project_spark.operators.multimodal import decode_gif

    rng = random.Random(7)
    for (w, h, ncol) in [(4, 2, 8), (16, 16, 4), (31, 7, 256), (1, 1, 1), (7, 13, 3)]:
        colors = list(
            dict.fromkeys(
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(ncol)
            )
        )
        pix = [rng.choice(colors) for _ in range(w * h)]
        dw, dh, rgb = decode_gif(_imageio_gif(spark, w, h, pix))
        got = [(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]) for i in range(dw * dh)]
        assert (dw, dh) == (w, h) and got == pix, (w, h, ncol)


def test_gif_encoder_roundtrip(spark):
    """Our fixture encoder's LZW stream must decode bit-exactly through
    the (conformance-validated) decoder, including dictionary growth
    past the first code-width bump and multi-sub-block payloads."""
    import random

    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = random.Random(11)
    for (w, h, ncol) in [(4, 4, 8), (40, 30, 8), (13, 11, 4), (80, 60, 8)]:
        pal = bytes([(i * 37) % 256 for i in range(ncol * 3)])
        idx = [rng.randrange(ncol) for _ in range(w * h)]
        dw, dh, rgb = decode_gif(encode_gif(w, h, pal, idx))
        exp = b"".join(pal[3 * i : 3 * i + 3] for i in idx)
        assert (dw, dh) == (w, h) and rgb == exp


def test_gif_decoder_reject_paths():
    from fraud_detection_etl_project_spark.operators.multimodal import decode_gif

    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG9aXXXX")
    with pytest.raises(ValueError, match="truncated|trailer|unknown"):
        decode_gif(b"GIF87a" + b"\x04\x00\x02\x00\x00\x00\x00" + b"\x3b")


def test_resize_ppm_nn_exact_indices():
    """4x4 -> 2x2 NN must sample source pixels (0,0),(0,2),(2,0),(2,2);
    the resized payload is itself a valid PPM."""
    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm_nn,
    )

    rgb = bytes(range(48))  # pixel p has bytes (3p, 3p+1, 3p+2)
    payload = b"P6\n4 4\n255\n" + rgb
    out = resize_ppm_nn(payload, 2, 2)
    w, h, out_rgb = decode_ppm(out)
    assert (w, h) == (2, 2)
    expect = b"".join(rgb[3 * p : 3 * p + 3] for p in (0, 2, 8, 10))
    assert out_rgb == expect
    # upscale: 2x2 -> 4x4 replicates each pixel into a 2x2 block
    up = resize_ppm_nn(out, 4, 4)
    _w, _h, up_rgb = decode_ppm(up)
    assert up_rgb[0:3] == up_rgb[3:6] == out_rgb[0:3]


def test_resample_wav_nn_exact_indices_and_valid_output():
    import struct

    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_wav,
        resample_wav_nn,
    )

    samples = [100, -200, 300, -400, 500, -600, 700, -800]
    data = struct.pack("<8h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    out = resample_wav_nn(hdr + data, 4000)
    rate, ch, got = decode_wav(out)
    assert (rate, ch) == (4000, 1)
    assert got == [100, 300, 500, 700]  # zero-order hold keeps 2i
    # upsample doubles by repetition
    rate2, _ch, up = decode_wav(resample_wav_nn(out, 8000))
    assert rate2 == 8000 and up == [100, 100, 300, 300, 500, 500, 700, 700]


def test_animated_gif_roundtrip_and_frame_order():
    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    frames = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]]
    payload = encode_gif_frames(2, 2, pal, frames)
    got = decode_gif_frames(payload)
    assert len(got) == 3
    for (w, h, rgb), idx in zip(got, frames):
        assert (w, h) == (2, 2)
        assert rgb == b"".join(pal[3 * i : 3 * i + 3] for i in idx)


def test_single_frame_decode_is_first_frame():
    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_gif,
        encode_gif_frames,
    )

    pal = bytes([1, 2, 3, 4, 5, 6])
    payload = encode_gif_frames(1, 1, pal, [[0], [1]])
    w, h, rgb = decode_gif(payload)
    assert (w, h, rgb) == (1, 1, bytes([1, 2, 3]))


def test_frame_sampler_oversample_has_no_duplicates(spark):
    """n_out above the frame count must emit each frame at most once and
    never drop the tail (the k=(i*total)//n_out stall bug)."""
    import pandas as pd

    from fraud_detection_etl_project_spark.operators import multimodal as M

    pal = bytes([1, 2, 3, 4, 5, 6])
    payload = M.encode_gif_frames(1, 1, pal, [[0], [1], [0]])
    media = spark.createDataFrame(
        [(1, "image", payload, len(payload), "x")], M.MEDIA_SCHEMA
    )
    rows = M.sample_gif_frames(media, n_out=5).collect()
    idxs = sorted(r["frame_idx"] for r in rows)
    assert idxs == [0, 1, 2]  # every frame once, none duplicated


def test_resample_empty_wav_yields_empty_clip():
    import struct

    from fraud_detection_etl_project_spark.operators.multimodal import (
        decode_wav,
        resample_wav_nn,
    )

    hdr = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    rate, ch, got = decode_wav(resample_wav_nn(hdr, 4000))
    assert (rate, ch, got) == (4000, 1, [])
