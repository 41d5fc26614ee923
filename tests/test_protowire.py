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
