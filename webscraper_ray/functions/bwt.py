"""Burrows–Wheeler transform codec (BWT + move-to-front + RLE) — the
bzip2-family text-compression primitive (Burrows & Wheeler, DEC SRC
report 124, 1994 — public), as a per-doc batch kernel: corpora are
archived through exactly this pipeline shape, and the transform is the
basis of the FM-index used for substring search over compressed text.

Implementation notes:
- BWT via suffix ranking of ``text + sentinel`` (``\\x00``, asserted
  absent) — O(n log² n) doubling-free sorted-rotations build using the
  sentinel's strict ordering; inverse via the standard LF-mapping
  (stable counting sort of the last column).
- MTF over the 256-byte alphabet, then RLE of zero runs (the classic
  post-BWT entropy shaping): runs of k zeros encode as ``0x00 k``
  (k <= 255, longer runs split).
- decode(encode(x)) == x for ALL byte inputs without NULs (guarded
  loudly); the oracle gate runs the full round trip inside one
  streaming map and compares per-source aggregates of the DECODED
  bytes against SQL over the source table — any corruption anywhere in
  the three stages flips the hash.

Scale shape: pure per-doc kernels inside ``map_batches`` (the
PNG/protobuf discipline) — no shuffle, no state; cost is O(n log n)
per doc in numpy (argsort of rotation ranks), never corpus-global.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bwt_encode", "bwt_decode", "mtf_encode", "mtf_decode",
           "rle0_encode", "rle0_decode", "compress", "decompress"]

_SENTINEL = 0


def bwt_encode(data: bytes) -> bytes:
    """Last column of the sorted rotations of ``data + \\x00``."""
    if b"\x00" in data:
        raise ValueError("bwt_encode input must not contain NUL bytes")
    buf = np.frombuffer(data + b"\x00", dtype=np.uint8)
    n = buf.size
    # rank doubling (Manber-Myers): sort suffixes of the sentinel-
    # terminated string = sort rotations (sentinel is unique minimum).
    # Ranks must be DENSE (< n) so the (n+1)-radix composite below
    # cannot collide — raw byte values overflow it for short inputs.
    _, rank = np.unique(buf, return_inverse=True)
    rank = rank.astype(np.int64)
    idx = np.arange(n)
    k = 1
    while k < n:
        pair = rank * (n + 1)
        pair[: n - k] += rank[k:] + 1
        order = np.argsort(pair, kind="stable")
        new_rank = np.empty(n, dtype=np.int64)
        sorted_pair = pair[order]
        new_rank[order] = np.cumsum(
            np.r_[0, (sorted_pair[1:] != sorted_pair[:-1]).astype(np.int64)]
        )
        rank = new_rank
        if rank.max() == n - 1:
            break
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = idx
    last = buf[(sa - 1) % n]
    return last.tobytes()


def bwt_decode(last: bytes) -> bytes:
    """Invert via LF-mapping; strips the sentinel."""
    col = np.frombuffer(last, dtype=np.uint8)
    n = col.size
    if n == 0:
        return b""
    # LF-mapping: order[j] = row in L holding the j-th char of the
    # sorted first column; its inverse maps row i to the row of the
    # rotation one character earlier. Walking backward from row 0 (the
    # rotation that STARTS with the sentinel) emits sentinel+original.
    order = np.argsort(col, kind="stable")
    lf = np.empty(n, dtype=np.int64)
    lf[order] = np.arange(n)
    out = np.empty(n, dtype=np.uint8)
    row = 0
    for k in range(n - 1, -1, -1):
        out[k] = col[row]
        row = int(lf[row])
    if out[0] != _SENTINEL:
        raise ValueError("bwt_decode: input is not a sentinel-terminated BWT")
    return out[1:].tobytes()


def mtf_encode(data: bytes) -> bytes:
    table = list(range(256))
    out = bytearray()
    for b in data:
        i = table.index(b)
        out.append(i)
        table.pop(i)
        table.insert(0, b)
    return bytes(out)


def mtf_decode(data: bytes) -> bytes:
    table = list(range(256))
    out = bytearray()
    for i in data:
        b = table[i]
        out.append(b)
        table.pop(i)
        table.insert(0, b)
    return bytes(out)


def rle0_encode(data: bytes) -> bytes:
    """Zero runs -> ``0x00 <len>`` (len 1..255; longer runs split);
    other bytes pass through."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0:
            j = i
            while j < n and data[j] == 0:
                j += 1
            run = j - i
            while run > 0:
                take = min(run, 255)
                out += bytes((0, take))
                run -= take
            i = j
        else:
            out.append(b)
            i += 1
    return bytes(out)


def rle0_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0:
            if i + 1 >= n:
                raise ValueError("truncated RLE0 zero-run length")
            out += b"\x00" * data[i + 1]
            i += 2
        else:
            out.append(b)
            i += 1
    return bytes(out)


def compress(data: bytes) -> bytes:
    return rle0_encode(mtf_encode(bwt_encode(data)))


def decompress(blob: bytes) -> bytes:
    return bwt_decode(mtf_decode(rle0_decode(blob)))
