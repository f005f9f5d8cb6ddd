"""Avro object-container codec (functions/avro.py) vs the public
Avro 1.11 spec. No Avro library exists in this sandbox, so the byte
layout is pinned by a HAND-ASSEMBLED container file built field by
field from the spec text — both directions must match it exactly, so a
symmetric-but-wrong codec cannot pass."""

import hashlib
import json
import struct

import pyarrow as pa
import pytest

from webscraper_ray.functions.avro import (
    MAGIC,
    _zigzag_encode,
    read_avro,
    schema_for_table,
    write_avro,
)


def test_zigzag_spec_vectors():
    # the spec's own table: 0->00, -1->01, 1->02, -2->03, 2->04
    assert _zigzag_encode(0) == b"\x00"
    assert _zigzag_encode(-1) == b"\x01"
    assert _zigzag_encode(1) == b"\x02"
    assert _zigzag_encode(-2) == b"\x03"
    assert _zigzag_encode(2) == b"\x04"
    # varint continuation: 64 -> zigzag 128 -> 0x80 0x01
    assert _zigzag_encode(64) == b"\x80\x01"
    # 64-bit extremes survive
    assert _zigzag_encode(2**63 - 1)[-1] < 0x80
    assert len(_zigzag_encode(-(2**63))) == 10


def _hand_container(tmp_path):
    """A one-block container file assembled byte by byte from the spec,
    independent of write_avro (only _zigzag_encode shared — itself
    pinned against the spec's table above)."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=True)
    sync = hashlib.md5(
        b"webscraper-ray-avro:" + schema_json.encode() + b"2"
    ).digest()
    body = b""
    for rid, name, score in [(7, "ab", 1.5), (-3, "", -0.25)]:
        body += _zigzag_encode(rid)
        nb = name.encode()
        body += _zigzag_encode(len(nb)) + nb
        body += struct.pack("<d", score)
    raw = MAGIC
    raw += _zigzag_encode(2)  # metadata map: 2 entries
    for k, v in [
        ("avro.schema", schema_json.encode()),
        ("avro.codec", b"null"),
    ]:
        raw += _zigzag_encode(len(k)) + k.encode()
        raw += _zigzag_encode(len(v)) + v
    raw += _zigzag_encode(0)
    raw += sync
    raw += _zigzag_encode(2) + _zigzag_encode(len(body)) + body + sync
    p = tmp_path / "hand.avro"
    p.write_bytes(raw)
    return p, raw


def test_decoder_reads_hand_assembled_spec_file(tmp_path):
    p, _ = _hand_container(tmp_path)
    t = read_avro(str(p))
    assert t.column("id").to_pylist() == [7, -3]
    assert t.column("name").to_pylist() == ["ab", ""]
    assert t.column("score").to_pylist() == [1.5, -0.25]


def test_encoder_reproduces_hand_assembled_bytes(tmp_path):
    p, raw = _hand_container(tmp_path)
    t = pa.table(
        {
            "id": pa.array([7, -3], pa.int64()),
            "name": pa.array(["ab", ""], pa.string()),
            "score": pa.array([1.5, -0.25], pa.float64()),
        }
    )
    out = tmp_path / "ours.avro"
    write_avro(t, str(out))
    assert out.read_bytes() == raw


def test_roundtrip_multiblock_negative_and_unicode(tmp_path):
    n = 1000
    t = pa.table(
        {
            "id": pa.array([i - 500 for i in range(n)], pa.int64()),
            "name": pa.array([f"naïve-{i}•" for i in range(n)], pa.string()),
            "score": pa.array([i / 7.0 for i in range(n)], pa.float64()),
        }
    )
    p = tmp_path / "multi.avro"
    write_avro(t, str(p), block_rows=128)  # 8 blocks
    back = read_avro(str(p))
    assert back.equals(t)


def test_deterministic_output(tmp_path):
    t = pa.table({"id": pa.array([1, 2], pa.int64())})
    a, b = tmp_path / "a.avro", tmp_path / "b.avro"
    write_avro(t, str(a))
    write_avro(t, str(b))
    assert a.read_bytes() == b.read_bytes()


def test_loud_failures(tmp_path):
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64())})
    p = tmp_path / "x.avro"
    write_avro(t, str(p))
    raw = p.read_bytes()

    bad = tmp_path / "bad.avro"
    bad.write_bytes(b"NOPE" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        read_avro(str(bad))

    trunc = tmp_path / "trunc.avro"
    trunc.write_bytes(raw[:-10])
    with pytest.raises(ValueError):
        read_avro(str(trunc))

    # corrupt the trailing sync marker
    syncbad = tmp_path / "sync.avro"
    syncbad.write_bytes(raw[:-16] + bytes(16))
    with pytest.raises(ValueError, match="sync"):
        read_avro(str(syncbad))

    # unsupported schema types refuse loudly at write time
    with pytest.raises(ValueError, match="long/string/double"):
        schema_for_table(pa.table({"b": pa.array([True])}))

    # nulls refuse (no union support claimed)
    with pytest.raises(ValueError, match="null"):
        write_avro(
            pa.table({"id": pa.array([1, None], pa.int64())}), str(tmp_path / "n.avro")
        )

    # deflate codec refuses rather than misdecoding
    defl = tmp_path / "defl.avro"
    defl.write_bytes(raw.replace(b"null", b"zstd", 1))
    with pytest.raises(ValueError, match="codec"):
        read_avro(str(defl))
