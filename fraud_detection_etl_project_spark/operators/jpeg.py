"""Pure-Python baseline JPEG codec (ITU-T T.81 sequential DCT, JFIF).

The last real image-decode gap behind ``operators/multimodal.decode_real``:
this container has no PIL/libjpeg, so the codec is implemented from the
PUBLIC JPEG specification (ITU-T Recommendation T.81 / ISO 10918-1) —
marker segment parsing, DQT/DHT table management, Huffman entropy
decoding with byte stuffing and restart markers, DC prediction,
dequantize → dezigzag → 8x8 IDCT, sampling-factor block placement with
chroma upsampling, and JFIF YCbCr→RGB. The encoder (fixture generation)
emits baseline 4:4:4 with the spec's Annex-K Huffman tables.

Validation (two independent layers, tests/test_jpeg.py):

* CONFORMANCE vs the JVM's javax.imageio JPEG codec on Spark's classpath
  (the same independent-reference bar as the GIF LZW decoder): files our
  encoder writes decode through javax.imageio within the IDCT tolerance,
  and files javax.imageio writes (its own tables, 4:2:0 subsampling,
  grayscale single-component) decode through this decoder within the
  same tolerance. JPEG decoders are NOT bit-identical by design — the
  spec (Annex A) standardizes the transform mathematically and bounds
  implementation accuracy (the old IEEE-1180 compliance regime), so
  cross-decoder deltas of ±1 per sample are expected; tests assert that
  bound where chroma is constant and a documented looser bound where the
  reference's fancier chroma-upsampling kernel differs from our
  pixel-replication on 4:2:0 color material.
* EXACT value oracles: for DC-only blocks (solid 8x8 tiles) with flat
  quant tables the whole pipeline collapses to closed-form integer
  arithmetic (DC = 8·(v-128); quantize round-half-away; reconstruct
  2·DCq + 128 for q=16), which a SQL oracle re-derives bit-exactly —
  including the DC *difference* prediction chain across blocks. That is
  the `multimodal_jpeg_stats` query.

Scale: decode runs inside Arrow-batched ``mapInPandas`` (the multimodal
seam) — Python touches payload bytes only, per batch; the Huffman walk is
sequential per image (inherent to the format) but all dequantize/IDCT
math is vectorized over every block of an image at once with numpy. A
production deployment swaps libjpeg-turbo in behind the same
``decode_real`` contract.
"""

from __future__ import annotations

import io
import re
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# DCT-II orthonormal basis: block = C.T @ coef @ C reconstructs.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )

# Annex K (K.3.3) standard Huffman table specs: (BITS counts, values).
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_codes(bits, values):
    """Canonical Huffman code assignment (T.81 Annex C): returns
    {value: (code, length)}."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ANNEXK_CODES: tuple | None = None


def _annexk_codes() -> tuple:
    """The encoder's four Annex-K code tables, built once per process —
    rebuilding them per image was a measurable share of small-image
    encode time."""
    global _ANNEXK_CODES
    if _ANNEXK_CODES is None:
        _ANNEXK_CODES = (
            _build_codes(*DC_LUM),
            _build_codes(*AC_LUM),
            _build_codes(*DC_CHROM),
            _build_codes(*AC_CHROM),
        )
    return _ANNEXK_CODES


# ---------------------------------------------------------------------------
# Bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def raw_marker(self, marker: int) -> None:
        self.align()
        self.out += bytes((0xFF, marker))

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


# scan segmentation: the entropy stream ends at the first marker that is
# neither byte stuffing (FF00) nor a restart (FFD0-D7); restart intervals
# split on the RSTn markers themselves. Doing this ONCE with regex + one
# bytes.replace per interval removes every per-byte Python branch from
# the bit reader's hot path.
_SCAN_END_RE = re.compile(rb"\xff(?![\x00\xd0-\xd7])")
_RST_RE = re.compile(rb"\xff[\xd0-\xd7]")

# (bits, values) -> 16-bit table-driven decoder: val/length lists indexed
# by the next 16 bits of the stream (every extension of a code maps to
# it, so peeking past the true end of data is harmless). Cached globally
# — real corpora reuse the Annex-K tables across millions of images.
_LUT_CACHE: dict[tuple[bytes, bytes], tuple[list[int], list[int]]] = {}


def _build_lut(bits, values) -> tuple[list[int], list[int]]:
    key = (bytes(bits), bytes(values))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    val = [0] * 65536
    ln = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            val[lo:hi] = [values[k]] * (hi - lo)
            ln[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = (val, ln)
    return val, ln


class _FastBits:
    """Bit reader over one UNSTUFFED restart interval. A small integer
    accumulator is refilled four bytes at a time; Huffman decode is
    peek16 -> LUT -> skip(length), magnitude bits are one masked shift —
    no per-bit Python anywhere. Reads past the end are zero-padded, but
    BOUNDED: a well-formed scan consumes at most one speculative peek16
    past its final symbol, while a truncated scan keeps decoding fake
    symbols out of the padding (the Annex-K all-zeros prefix is a VALID
    code, so garbage would otherwise come back silently where the old
    per-bit reader raised) — exceeding the pad budget raises."""

    __slots__ = ("buf", "pos", "acc", "nbits", "pad_bits")

    _PAD_BUDGET = 48  # > one peek16 + one magnitude read; << one fake block

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.pad_bits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            chunk = self.buf[self.pos : self.pos + 4]
            if not chunk:
                self.pad_bits += 16
                if self.pad_bits > self._PAD_BUDGET:
                    raise ValueError("truncated JPEG scan (read past entropy data)")
                chunk = b"\x00\x00"  # zero padding past end (see class doc)
            self.pos += len(chunk)
            self.acc = (self.acc << (8 * len(chunk))) | int.from_bytes(chunk, "big")
            self.nbits += 8 * len(chunk)

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def take(self, n: int) -> int:
        if self.nbits < n:
            self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` magnitude bits to a signed
    coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4, flat or Annex-K-style quant tables)
# ---------------------------------------------------------------------------

_FLAT_Q = np.full(64, 16, dtype=np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range conversion; rounds half-up to integers."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.int64)


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate pad to multiples of 8 and return (n_blocks, 8, 8)
    in raster block order plus the block grid dims."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    by, bx = H // 8, W // 8
    blk = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blk, by, bx

def _encode_blocks(
    bw: _BitWriter, coefs: np.ndarray, dc_codes: dict, ac_codes: dict, dc_pred: int
) -> int:
    """Huffman-encode quantized zigzag coefficient rows; returns the new
    DC predictor."""
    for row in coefs:
        diff = int(row[0]) - dc_pred
        dc_pred = int(row[0])
        size = _category(diff)
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        run = 0
        last_nz = 0
        nz = np.nonzero(row[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(row[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size = _category(v)
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
    return dc_pred


def encode_jpeg(
    width: int, height: int, rgb: bytes, quant: int = 16, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF encoder: 3-component YCbCr, 4:4:4 (no subsampling),
    FLAT quantization tables (all entries = ``quant``) so DC-only blocks
    round-trip in closed form, Annex-K Huffman tables. With
    ``restart_interval`` > 0, emits DRI + RSTn markers every that many
    MCUs (predictor reset + byte alignment per T.81 — the error-
    resilience / parallel-decode feature)."""
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    ycc = _rgb_to_ycbcr(img)
    qtab = np.full(64, quant, dtype=np.int64)

    comp_coefs = []
    grid = None
    for ci in range(3):
        blk, by, bx = _blocks_of(ycc[..., ci])
        grid = (by, bx)
        shifted = blk.astype(np.float64) - 128.0
        coef = np.einsum("kn,bnm,lm->bkl", _C, shifted, _C)
        zz = coef.reshape(-1, 64)[:, ZIGZAG]
        # Exact-math DCT coefficients of integer blocks that land ON an
        # integer (e.g. DC of a solid block = 8·(v-128)) accumulate
        # ~1e-12 float error in the einsum; snap them back so the
        # round-half-away quantizer below can't be flipped across a .5
        # boundary by epsilon — this is what makes DC-only fixtures
        # closed-form-predictable for the SQL oracle.
        near = np.rint(zz)
        zz = np.where(np.abs(zz - near) < 1e-6, near, zz)
        q = np.sign(zz) * np.floor(np.abs(zz) / qtab + 0.5)
        comp_coefs.append(q.astype(np.int64))

    dc_l, ac_l, dc_c, ac_c = _annexk_codes()
    bw = _BitWriter()
    preds = [0, 0, 0]
    by, bx = grid
    # 4:4:4 MCU = one block per component, interleaved in raster order
    rst = 0
    for b in range(by * bx):
        if restart_interval and b and b % restart_interval == 0:
            bw.raw_marker(0xD0 + rst)
            rst = (rst + 1) % 8
            preds = [0, 0, 0]
        for ci in range(3):
            preds[ci] = _encode_blocks(
                bw,
                comp_coefs[ci][b : b + 1],
                dc_l if ci == 0 else dc_c,
                ac_l if ci == 0 else ac_c,
                preds[ci],
            )
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = io.BytesIO()
    out.write(b"\xff\xd8")  # SOI
    out.write(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )  # APP0
    zz_q = np.zeros(64, dtype=np.int64)
    zz_q[:] = qtab  # flat: zigzag order irrelevant but emit spec-shaped
    qt = bytes([0]) + bytes(int(v) for v in zz_q)
    qt2 = bytes([1]) + bytes(int(v) for v in zz_q)
    out.write(seg(0xFFDB, qt + qt2))  # DQT both tables
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # Hi=Vi=1 (4:4:4)
    out.write(seg(0xFFC0, sof))
    dht = b""
    for (cls, tid, (bits, vals)) in (
        (0, 0, DC_LUM), (1, 0, AC_LUM), (0, 1, DC_CHROM), (1, 1, AC_CHROM),
    ):
        dht += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    out.write(seg(0xFFC4, dht))
    if restart_interval:
        out.write(seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out.write(seg(0xFFDA, sos))
    out.write(scan)
    out.write(b"\xff\xd9")  # EOI
    return out.getvalue()


# ---------------------------------------------------------------------------
# Decoder (baseline sequential: 1-3 components, any Hi/Vi up to 2,
# restart markers, multi-table DQT/DHT segments)
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to (width, height, rgb bytes). Grayscale
    decodes replicate Y into all three channels. Progressive (SOF2) and
    arithmetic coding are rejected explicitly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                bpos += 1
                if pq == 0:
                    tab = np.frombuffer(body, np.uint8, 64, bpos).astype(np.int64)
                    bpos += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, bpos).astype(np.int64)
                    bpos += 128
                qtables[tq] = tab
        elif marker == 0xC4:  # DHT (possibly several tables)
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1 : bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + nv])
                htables[(tc, th)] = _build_lut(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}): only "
                "baseline sequential Huffman is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan_comps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            pos += seglen
            return _decode_scan(
                payload, pos, frame, scan_comps, qtables, htables, restart_interval
            )
        # APPn/COM and others: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan_comps, qtables, htables, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = [by_id[s["cs"]] for s in scan_comps]
    for c, s in zip(order, scan_comps):
        c["dc_lut"] = htables[(0, s["td"])]
        c["ac_lut"] = htables[(1, s["ta"])]
        c["coefs"] = []  # list of (bx, by, zigzag list[64])
        c["pred"] = 0
    # segment the scan ONCE: end-of-entropy marker, then restart splits;
    # each interval is unstuffed wholesale (bytes.replace, C speed)
    m = _SCAN_END_RE.search(data, pos)
    entropy = data[pos : m.start() if m else len(data)]
    segs = _RST_RE.split(entropy) if restart_interval else [entropy]
    seg_i = 0
    fb = _FastBits(segs[0].replace(b"\xff\x00", b"\xff"))
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("expected restart marker")
                fb = _FastBits(segs[seg_i].replace(b"\xff\x00", b"\xff"))
                for c in order:
                    c["pred"] = 0
            for c in order:
                dc_val, dc_ln = c["dc_lut"]
                ac_val, ac_ln = c["ac_lut"]
                pred = c["pred"]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = [0] * 64
                        idx = fb.peek16()
                        ln = dc_ln[idx]
                        if ln == 0:
                            raise ValueError("invalid Huffman code in scan")
                        fb.skip(ln)
                        size = dc_val[idx]
                        if size:
                            pred += _extend(fb.take(size), size)
                        zz[0] = pred
                        k = 1
                        while k < 64:
                            idx = fb.peek16()
                            ln = ac_ln[idx]
                            if ln == 0:
                                raise ValueError("invalid Huffman code in scan")
                            fb.skip(ln)
                            rs = ac_val[idx]
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            s_ = rs & 0xF
                            zz[k] = _extend(fb.take(s_), s_)
                            k += 1
                        c["coefs"].append((mx * c["h"] + hh, my * c["v"] + v, zz))
                c["pred"] = pred
            mcu_count += 1

    # Reconstruct each component plane (vectorized over all its blocks:
    # dequantize, dezigzag, IDCT, and block placement are all one-shot
    # numpy over the component's full block set).
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        bw_blocks = mcux * c["h"]
        bh_blocks = mcuy * c["v"]
        zzs = np.array([z for _x, _y, z in c["coefs"]], dtype=np.int64)
        deq = (zzs * q).astype(np.float64)
        blocks8 = np.zeros((len(deq), 64))
        blocks8[:, ZIGZAG] = deq  # inverse zigzag
        blocks8 = blocks8.reshape(-1, 8, 8)
        pix = np.einsum("kn,bkl,lm->bnm", _C, blocks8, _C) + 128.0
        pix = np.clip(np.floor(pix + 0.5), 0, 255)
        xs = np.array([x for x, _y, _z in c["coefs"]], dtype=np.int64)
        ys = np.array([y for _x, y, _z in c["coefs"]], dtype=np.int64)
        grid = np.zeros((bh_blocks, bw_blocks, 8, 8))
        grid[ys, xs] = pix  # scatter all blocks at once
        plane = grid.transpose(0, 2, 1, 3).reshape(bh_blocks * 8, bw_blocks * 8)
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = planes[0]
        rgb = np.stack([y, y, y], axis=-1)
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    else:
        raise ValueError(f"unsupported component count {len(planes)}")
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return w, h, rgb.tobytes()
