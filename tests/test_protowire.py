"""Conformance tests for the pure-Python protobuf wire codec against
byte vectors from the PUBLIC protobuf encoding guide (protobuf.dev):
the codec must produce the spec's exact bytes, not merely roundtrip."""

from fraud_detection_etl_project_spark.functions import protowire as W


def test_spec_canonical_varint_150():
    # the encoding guide's worked example: 150 -> 0x96 0x01
    assert W.encode_varint(150) == bytes([0x96, 0x01])
    assert W.decode_varint(bytes([0x96, 0x01]), 0) == (150, 2)


def test_spec_canonical_field1_150():
    # message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    msg = W._tag(1, W.VARINT) + W.encode_varint(150)
    assert msg == bytes([0x08, 0x96, 0x01])


def test_spec_canonical_string_field2():
    # message Test2 { string b = 2; } with b="testing" -> 12 07 74...67
    msg = W._tag(2, W.LEN) + W.encode_varint(7) + b"testing"
    assert msg == bytes([0x12, 0x07]) + b"testing"


def test_varint_boundaries():
    for n, ln in [(0, 1), (127, 1), (128, 2), (16383, 2), (16384, 3), (2**35 - 1, 5), (2**35, 6)]:
        enc = W.encode_varint(n)
        assert len(enc) == ln == W.varint_len(n)
        assert W.decode_varint(enc, 0) == (n, ln)


def test_doc_roundtrip_and_layout():
    buf = W.encode_doc(150, b"testing", b"en")
    d = W.decode_doc(buf)
    assert d["doc_id"] == 150 and d["text"] == b"testing" and d["lang"] == b"en"
    # layout: tag1 + varint(150) + tag2 + len + text + tag3 + len + lang
    assert len(buf) == 1 + 2 + 1 + 1 + 7 + 1 + 1 + 2


def test_truncated_len_field_raises():
    import pytest

    buf = W.encode_doc(150, b"testing", b"en")
    with pytest.raises(ValueError, match="truncated"):
        W.decode_doc(buf[:-1])


def test_oversized_varint_rejected():
    import pytest

    # 70-bit encoding: ten bytes, the last carrying 7 significant bits —
    # decodes past uint64 and must be rejected, not silently accepted
    evil = bytes([0xFF] * 9 + [0x7F])
    with pytest.raises(ValueError):
        W.decode_varint(evil, 0)
    # a full-range uint64 max still decodes fine
    top = W.encode_varint(2**64 - 1)
    assert W.decode_varint(top, 0) == (2**64 - 1, 10)


def test_varint_len_full_int64_range_matches_oracle_case():
    # mirror of the SQL _PW_VLEN CASE: every 128^k boundary through int64
    for k in range(1, 9):
        lo, hi = 128 ** (k - 1), 128**k - 1
        assert W.varint_len(lo) == k and W.varint_len(hi) == k
    assert W.varint_len(2**63 - 1) == 9
