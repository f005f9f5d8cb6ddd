"""EXIF metadata — a real TIFF 6.0 IFD walk (the container format EXIF
2.3 embeds in a JPEG APP1 segment), both directions:

- :func:`build_exif` serializes a minimal but spec-true TIFF structure
  (either byte order, inline vs offset-stored values, a chained Exif
  sub-IFD via tag 0x8769).
- :func:`parse_exif` is the operator: a generic IFD walk that honors
  the declared byte order, per-type sizes, the inline-if-<=4-bytes
  value rule, and the sub-IFD pointer — never a fixed-layout peek, so
  it reads files the writer didn't produce.

Image corpora at training scale carry orientation / dimensions /
timestamps exclusively here; a pipeline that can't read EXIF re-decodes
pixels to learn what a 200-byte header already says.

Public spec: CIPA DC-008 (EXIF 2.3) / TIFF 6.0. No reference analog
(the reference pipeline is text-only); task-brief multimodal operator.
"""

from __future__ import annotations

import struct

__all__ = ["build_exif", "parse_exif"]

# tag -> friendly name (the subset the synthesis exercises)
TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x8769: "_exif_ifd",
    0x9003: "datetime_original",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _entry(order: str, tag: int, typ: int, values, data_area: bytearray,
           data_base: int) -> bytes:
    """One 12-byte IFD entry; spills >4-byte payloads to the data area."""
    if typ == 2:  # ASCII, NUL-terminated
        payload = values.encode("ascii") + b"\x00"
        count = len(payload)
    else:
        fmt = {3: "H", 4: "L"}[typ]
        vals = values if isinstance(values, (list, tuple)) else [values]
        count = len(vals)
        payload = b"".join(struct.pack(order + fmt, v) for v in vals)
    if len(payload) <= 4:
        value_bytes = payload + b"\x00" * (4 - len(payload))
    else:
        off = data_base + len(data_area)
        data_area.extend(payload)
        value_bytes = struct.pack(order + "L", off)
    return struct.pack(order + "HHL", tag, typ, count) + value_bytes


def build_exif(
    make: str,
    model: str,
    orientation: int,
    datetime_original: str,
    pixel_x: int,
    pixel_y: int,
    big_endian: bool = False,
) -> bytes:
    """A TIFF blob with IFD0 (Make/Model/Orientation + Exif pointer)
    and an Exif sub-IFD (DateTimeOriginal/PixelX/PixelY)."""
    order = ">" if big_endian else "<"
    header = (b"MM" if big_endian else b"II") + struct.pack(order + "HL", 42, 8)

    # layout: header(8) | IFD0 | IFD0 data | ExifIFD | Exif data
    n0 = 4
    ifd0_start = 8
    ifd0_size = 2 + n0 * 12 + 4
    data0 = bytearray()
    data0_base = ifd0_start + ifd0_size

    # first pass to size IFD0's spill area so the Exif IFD offset is known
    probe = bytearray()
    _entry(order, 0x010F, 2, make, probe, 0)
    _entry(order, 0x0110, 2, model, probe, 0)
    exif_ifd_off = data0_base + len(probe)

    entries0 = [
        _entry(order, 0x010F, 2, make, data0, data0_base),
        _entry(order, 0x0110, 2, model, data0, data0_base),
        _entry(order, 0x0112, 3, orientation, data0, data0_base),
        _entry(order, 0x8769, 4, exif_ifd_off, data0, data0_base),
    ]
    ifd0 = (
        struct.pack(order + "H", n0)
        + b"".join(entries0)
        + struct.pack(order + "L", 0)
    )

    n1 = 3
    exif_size = 2 + n1 * 12 + 4
    data1 = bytearray()
    data1_base = exif_ifd_off + exif_size
    entries1 = [
        _entry(order, 0x9003, 2, datetime_original, data1, data1_base),
        _entry(order, 0xA002, 4, pixel_x, data1, data1_base),
        _entry(order, 0xA003, 4, pixel_y, data1, data1_base),
    ]
    exif_ifd = (
        struct.pack(order + "H", n1)
        + b"".join(entries1)
        + struct.pack(order + "L", 0)
    )
    return header + ifd0 + bytes(data0) + exif_ifd + bytes(data1)


def _read_ifd(data: bytes, order: str, off: int, out: dict) -> None:
    (n,) = struct.unpack_from(order + "H", data, off)
    pos = off + 2
    for _ in range(n):
        tag, typ, count = struct.unpack_from(order + "HHL", data, pos)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            raise ValueError(f"exif: unsupported field type {typ}")
        total = size * count
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(order + "L", data, pos + 8)
        if voff + total > len(data):
            raise ValueError("exif: value offset past end of blob")
        if typ == 2:
            val = data[voff : voff + count].split(b"\x00", 1)[0].decode("ascii")
        else:
            fmt = {1: "B", 3: "H", 4: "L"}[typ]
            vals = list(struct.unpack_from(order + str(count) + fmt, data, voff))
            val = vals[0] if count == 1 else vals
        name = TAGS.get(tag)
        if name == "_exif_ifd":
            _read_ifd(data, order, val, out)
        elif name is not None:
            out[name] = val
        pos += 12


def parse_exif(data: bytes) -> dict:
    """Walk a TIFF/EXIF blob -> {make, model, orientation,
    datetime_original, pixel_x, pixel_y, big_endian}. Raises loudly on
    a bad byte-order mark, magic, type, or out-of-range offset."""
    if len(data) < 8:
        raise ValueError("exif: truncated header")
    bom = data[:2]
    if bom == b"II":
        order, big = "<", False
    elif bom == b"MM":
        order, big = ">", True
    else:
        raise ValueError(f"exif: bad byte-order mark {bom!r}")
    magic, ifd0 = struct.unpack_from(order + "HL", data, 2)
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    out: dict = {"big_endian": big}
    _read_ifd(data, order, ifd0, out)
    return out
