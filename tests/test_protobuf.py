"""From-scratch protobuf wire-format codec (functions/protobuf.py):
varint boundaries, ZigZag, unknown-field skipping, truncation errors."""

import pytest

from webscraper_ray.functions.protobuf import (
    decode_record,
    decode_varint,
    encode_record,
    encode_varint,
    zigzag_decode,
    zigzag_encode,
)


@pytest.mark.parametrize(
    "x,wire",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the spec's own worked example
        (16383, b"\xff\x7f"),
        (16384, b"\x80\x80\x01"),
        ((1 << 64) - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    ],
)
def test_varint_spec_vectors(x, wire):
    assert encode_varint(x) == wire
    assert decode_varint(wire, 0) == (x, len(wire))


def test_varint_range_and_truncation():
    with pytest.raises(ValueError):
        encode_varint(-1)
    with pytest.raises(ValueError):
        encode_varint(1 << 64)
    with pytest.raises(ValueError, match="truncated"):
        decode_varint(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="10 bytes"):
        decode_varint(b"\x80" * 11, 0)


@pytest.mark.parametrize(
    "v,u",
    [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4),
     (2147483647, 4294967294), (-2147483648, 4294967295)],
)
def test_zigzag_spec_table(v, u):
    assert zigzag_encode(v) == u
    assert zigzag_decode(u) == v


def test_roundtrip_all_kinds():
    rec = {
        1: ("uint", 12345),
        2: ("sint", -987654321),
        3: ("str", "héllo wörld"),
        4: ("fixed32", 0xDEADBEEF),
        5: ("fixed64", 0x0123456789ABCDEF),
        6: ("bytes", b"\x00\xff\x80"),
    }
    buf = encode_record(rec)
    out = decode_record(
        buf,
        {1: "uint", 2: "sint", 3: "str", 4: "fixed32", 5: "fixed64", 6: "bytes"},
    )
    assert out == {
        1: 12345,
        2: -987654321,
        3: "héllo wörld",
        4: 0xDEADBEEF,
        5: 0x0123456789ABCDEF,
        6: b"\x00\xff\x80",
    }


def test_unknown_fields_skipped_every_wire_type():
    buf = encode_record(
        {
            1: ("uint", 7),
            8: ("uint", 99),        # unknown varint
            9: ("fixed64", 1),      # unknown I64
            10: ("str", "junk"),    # unknown LEN
            11: ("fixed32", 2),     # unknown I32
        }
    )
    assert decode_record(buf, {1: "uint"}) == {1: 7}


def test_wire_type_mismatch_is_loud():
    buf = encode_record({1: ("fixed32", 5)})
    with pytest.raises(ValueError, match="wire type"):
        decode_record(buf, {1: "uint"})


def test_truncated_payloads_are_loud():
    buf = encode_record({3: ("str", "hello")})
    with pytest.raises(ValueError, match="truncated"):
        decode_record(buf[:-2], {3: "str"})
    buf = encode_record({4: ("fixed32", 1)})
    with pytest.raises(ValueError, match="truncated"):
        decode_record(buf[:-1], {4: "fixed32"})


def test_group_wire_types_rejected():
    # wire types 3/4 (groups) are deprecated; tag = (1<<3)|3
    with pytest.raises(ValueError, match="wire type"):
        decode_record(bytes([0x0B]), {1: "uint"})


def test_last_one_wins_merge_rule():
    buf = encode_record({1: ("uint", 1)}) + encode_record({1: ("uint", 2)})
    assert decode_record(buf, {1: "uint"}) == {1: 2}
