"""Minimal deterministic CBOR (RFC 8949) codec — E14.

The reference stores document content as CBOR via ``cborg``
(``src/db/model.ts:69-71``, ``src/api.ts:179``). The ``cbor2`` package is
not available in this environment, so we implement the small subset the
document trees need: null, bool, int, float64, utf-8 strings, byte
strings, arrays, and string-keyed maps. Definite lengths only; map keys
are written in insertion order (cborg encodes JS objects the same way),
which makes encoding deterministic for our trees.

The decoder exists for round-trip tests and read-side queries.
"""

from __future__ import annotations

import struct
from typing import Any

__all__ = ["dumps", "loads"]

_MT_UINT = 0
_MT_NINT = 1
_MT_BYTES = 2
_MT_TEXT = 3
_MT_ARRAY = 4
_MT_MAP = 5
_MT_SIMPLE = 7


def _head(major: int, arg: int) -> bytes:
    mt = major << 5
    if arg < 24:
        return bytes((mt | arg,))
    if arg < 0x100:
        return bytes((mt | 24, arg))
    if arg < 0x10000:
        return struct.pack(">BH", mt | 25, arg)
    if arg < 0x100000000:
        return struct.pack(">BI", mt | 26, arg)
    return struct.pack(">BQ", mt | 27, arg)


def _encode(obj: Any, out: list[bytes]) -> None:
    if obj is None:
        out.append(b"\xf6")
    elif obj is True:
        out.append(b"\xf5")
    elif obj is False:
        out.append(b"\xf4")
    elif isinstance(obj, int):
        if obj >= 0:
            out.append(_head(_MT_UINT, obj))
        else:
            out.append(_head(_MT_NINT, -1 - obj))
    elif isinstance(obj, float):
        out.append(struct.pack(">Bd", (_MT_SIMPLE << 5) | 27, obj))
    elif isinstance(obj, str):
        data = obj.encode("utf-8")
        out.append(_head(_MT_TEXT, len(data)))
        out.append(data)
    elif isinstance(obj, (bytes, bytearray, memoryview)):
        data = bytes(obj)
        out.append(_head(_MT_BYTES, len(data)))
        out.append(data)
    elif isinstance(obj, (list, tuple)):
        out.append(_head(_MT_ARRAY, len(obj)))
        for item in obj:
            _encode(item, out)
    elif isinstance(obj, dict):
        out.append(_head(_MT_MAP, len(obj)))
        for key, value in obj.items():
            if not isinstance(key, str):
                raise TypeError(f"CBOR map keys must be str, got {type(key)!r}")
            _encode(key, out)
            _encode(value, out)
    else:
        raise TypeError(f"cannot CBOR-encode {type(obj)!r}")


def dumps(obj: Any) -> bytes:
    out: list[bytes] = []
    _encode(obj, out)
    return b"".join(out)


def _read_arg(data: bytes, pos: int, info: int) -> tuple[int, int]:
    if info < 24:
        return info, pos
    if info == 24:
        return data[pos], pos + 1
    if info == 25:
        return struct.unpack_from(">H", data, pos)[0], pos + 2
    if info == 26:
        return struct.unpack_from(">I", data, pos)[0], pos + 4
    if info == 27:
        return struct.unpack_from(">Q", data, pos)[0], pos + 8
    raise ValueError(f"indefinite/invalid additional info {info}")


def _decode(data: bytes, pos: int) -> tuple[Any, int]:
    initial = data[pos]
    pos += 1
    major, info = initial >> 5, initial & 0x1F
    if major == _MT_UINT:
        return _read_arg(data, pos, info)
    if major == _MT_NINT:
        arg, pos = _read_arg(data, pos, info)
        return -1 - arg, pos
    if major == _MT_BYTES:
        n, pos = _read_arg(data, pos, info)
        return data[pos : pos + n], pos + n
    if major == _MT_TEXT:
        n, pos = _read_arg(data, pos, info)
        return data[pos : pos + n].decode("utf-8"), pos + n
    if major == _MT_ARRAY:
        n, pos = _read_arg(data, pos, info)
        items = []
        for _ in range(n):
            item, pos = _decode(data, pos)
            items.append(item)
        return items, pos
    if major == _MT_MAP:
        n, pos = _read_arg(data, pos, info)
        obj: dict[str, Any] = {}
        for _ in range(n):
            key, pos = _decode(data, pos)
            value, pos = _decode(data, pos)
            obj[key] = value
        return obj, pos
    if major == _MT_SIMPLE:
        if info == 20:
            return False, pos
        if info == 21:
            return True, pos
        if info == 22 or info == 23:
            return None, pos
        if info == 25:  # float16
            import numpy as np
            return float(np.frombuffer(data[pos : pos + 2], dtype=">f2")[0]), pos + 2
        if info == 26:
            return struct.unpack_from(">f", data, pos)[0], pos + 4
        if info == 27:
            return struct.unpack_from(">d", data, pos)[0], pos + 8
    raise ValueError(f"unsupported CBOR item: major={major} info={info}")


def loads(data: bytes) -> Any:
    obj, pos = _decode(bytes(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after CBOR item ({len(data) - pos})")
    return obj
