"""Pure-Python protobuf WIRE-FORMAT codec (varint + length-delimited
fields only — the subset every protobuf message is built from), used to
exercise binary encode/decode ETL plumbing without the spark-protobuf
jar (absent from the pyspark 4.1.2 distribution — verified: the
TO_PROTOBUF SQL function raises PROTOBUF_NOT_LOADED; COVERAGE.md §gaps).

Wire rules implemented per the public protobuf encoding spec
(protobuf.dev/programming-guides/encoding): a field is a varint tag
``(field_number << 3) | wire_type`` followed by a varint (type 0) or a
varint length + raw bytes (type 2). The canonical spec example —
field 1, value 150 encodes to ``08 96 01`` — is pinned in
tests/test_protowire.py, so the codec is conformance-anchored, not
merely self-consistent.
"""

from __future__ import annotations

VARINT = 0
LEN = 2


def encode_varint(n: int) -> bytes:
    if n < 0:
        raise ValueError("unsigned varints only (use zigzag upstream for negatives)")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            if val >> 64:
                # shift caps at 63 but the final byte can still carry 7
                # bits (a 70-bit encoding) — reject anything past uint64
                raise ValueError("varint exceeds 64 bits")
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def encode_doc(doc_id: int, text: bytes, lang: bytes) -> bytes:
    """message Doc { int64 doc_id = 1; string text = 2; string lang = 3; }"""
    return (
        _tag(1, VARINT)
        + encode_varint(doc_id)
        + _tag(2, LEN)
        + encode_varint(len(text))
        + text
        + _tag(3, LEN)
        + encode_varint(len(lang))
        + lang
    )


def decode_doc(buf: bytes) -> dict:
    pos = 0
    out: dict = {}
    names = {1: "doc_id", 2: "text", 3: "lang"}
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == VARINT:
            val, pos = decode_varint(buf, pos)
        elif wt == LEN:
            ln, pos = decode_varint(buf, pos)
            if pos + ln > len(buf):
                # a silent short slice would mask corrupt/truncated input
                raise ValueError(f"truncated LEN field: need {ln} bytes, have {len(buf) - pos}")
            val = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out[names.get(field, f"f{field}")] = val
    return out


def varint_len(n: int) -> int:
    return len(encode_varint(n))
