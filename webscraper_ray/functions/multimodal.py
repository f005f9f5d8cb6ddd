"""Multimodal column operators — image/audio/video as opaque binary
(task brief §multimodal).

PNG images decode FOR REAL via the from-scratch baseline codec in
:mod:`.png` (chunk parse + CRC, zlib inflate, all five scanline
filters), JPEG via the from-scratch ITU-T T.81 baseline codec in
:mod:`.jpeg` (Huffman + dequant + vectorized IDCT), WAV audio via the
RIFF parser in :mod:`.audio`, and video frames via the documented FVID
container of PNG frames — see :class:`ImageStats`, :class:`AudioStats`,
``FrameSample('real')`` and ``DecodeImage('real')``. Real-world video
codecs (H.264 etc.) need libraries absent from this container, so that
kernel remains a clearly-marked stub (``decode_stub='fake'`` produces a
deterministic fake decode; ``'raise'`` raises NotImplementedError as a
real deploy would until a codec is wired in). Everything around every
decode — the Arrow schema contract, actor-pool stage shape, batch
sizing for large binary payloads, output layout — is real and tested.

Schema contract for a media table::

    media(media_id: int64, kind: string, payload: binary,
          meta: map<string,string>)

Stage shapes (all actor pools: a real decoder loads codecs/models once
per actor in ``__init__``):

- :class:`DecodeImage`  — payload -> (height, width, channels) + feature
- :class:`FrameSample`  — video payload -> N evenly-spaced frame stubs
- :class:`ResizeImage`  — decoded dims -> target dims (metadata math is
  real; pixel work is the stubbed part)

Large-payload batching: callers use small ``batch_size`` (e.g. 16-64)
so batch x concurrency of multi-MB payloads fits worker heaps; columns
are ``large_binary`` to dodge 2 GiB offset overflow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "AudioStats",
    "DecodeImage",
    "FrameSample",
    "ImageStats",
    "ImageAHash",
    "ResizeImage",
    "GifStats",
    "fake_media_table",
    "FAKE_IMG_MAGIC",
    "FVID_MAGIC",
    "encode_fvid",
    "parse_fvid",
    "sniff_media",
    "synth_gif_payload",
    "synth_image_payload",
    "synth_media_payload",
    "synth_jpeg_payload",
    "synth_png_payload",
    "synth_video_payload",
    "synth_avi_payload",
    "synth_wav_payload",
    "parse_fake_image",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.large_binary()),
        ("meta", pa.map_(pa.string(), pa.string())),
    ]
)


def fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    rows = []
    kinds = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]
    for i in range(n):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
        size = 256 + int.from_bytes(h[:2], "little") % 4096
        payload = (h * (size // 8 + 1))[:size]
        rows.append(
            {
                "media_id": i,
                "kind": kinds[i % len(kinds)],
                "payload": payload,
                "meta": [("source", f"s{i % 3}")],
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.blake2b(payload, digest_size=8).digest()
    return 32 + h[0] % 224, 32 + h[1] % 224, 3


# --- deterministic fake image format (documented, byte-parseable) ----------
#
# layout: 4-byte magic 'FIMG' | width:u16 big-endian | height:u16 big-endian
# | filler bytes. The decode stage REALLY parses these bytes; only the
# pixel payload is fake (no codecs in the container). Dims are a pure
# function of the media id so a SQL oracle can gate the whole
# synthesize -> decode -> resize pipeline end-to-end.

FAKE_IMG_MAGIC = b"FIMG"


def synth_image_payload(media_id: int) -> bytes:
    """width = 16 + (id*37) % 1024, height = 16 + (id*91) % 768."""
    w = 16 + (media_id * 37) % 1024
    h = 16 + (media_id * 91) % 768
    header = FAKE_IMG_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big")
    filler = (hashlib.blake2b(header, digest_size=8).digest() * 4)[: media_id % 29]
    return header + filler


def parse_fake_image(payload: bytes) -> tuple[int, int, int]:
    """Parse the fake-image header -> (height, width, channels)."""
    if len(payload) < 8 or payload[:4] != FAKE_IMG_MAGIC:
        raise ValueError("not a FIMG payload")
    w = int.from_bytes(payload[4:6], "big")
    h = int.from_bytes(payload[6:8], "big")
    return h, w, 3


# --- REAL deterministic PNG corpus ------------------------------------------
#
# Unlike FIMG (a header-only fake), these are genuine PNG files: pixel
# values are a pure function of the media id, so the whole
# synthesize -> inflate -> unfilter -> stats pipeline is value-hash
# gated by a SQL oracle that recomputes the stats arithmetically.
#
#   height   = 4 + id % 5          (4..8)
#   width    = 4 + id % 6          (4..9)
#   channels = 1 if id even else 3 (grey / RGB)
#   pixel k (row-major over h*w*ch) = (id*7 + k) % 256
#   per-row filter type = row % 5  (exercises all five PNG filters)


def synth_png_payload(media_id: int) -> bytes:
    """Deterministic REAL PNG bytes for ``media_id`` (formulas above)."""
    from .png import encode_png

    h = 4 + media_id % 5
    w = 4 + media_id % 6
    ch = 1 if media_id % 2 == 0 else 3
    n = h * w * ch
    px = (np.int64(media_id) * 7 + np.arange(n, dtype=np.int64)) % 256
    img = px.astype(np.uint8).reshape((h, w) if ch == 1 else (h, w, ch))
    return encode_png(img)


# --- REAL deterministic JPEG corpus -----------------------------------------
#
# Genuine baseline JPEG files from the from-scratch T.81 codec in
# :mod:`.jpeg`. The images are grids of CONSTANT 8x8 blocks: a constant
# block has only DC energy, and with a DC quantization step of 8 the
# quantized DC is exactly (v - 128), so the decode reproduces every
# pixel EXACTLY and a SQL oracle can recompute the stats
# arithmetically (the general +/-1 lossy path is pinned by unit tests).
#
#   block rows hb = 1 + id % 3, block cols wb = 1 + id % 4
#   height = 8*hb, width = 8*wb, grayscale
#   block k (row-major over hb*wb) value = (id*13 + k*29) % 256


def synth_jpeg_payload(media_id: int) -> bytes:
    """Deterministic REAL baseline-JPEG bytes (formulas above)."""
    from .jpeg import encode_jpeg

    hb = 1 + media_id % 3
    wb = 1 + media_id % 4
    k = np.arange(hb * wb, dtype=np.int64)
    vals = ((np.int64(media_id) * 13 + k * 29) % 256).astype(np.uint8).reshape(hb, wb)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8  # DC step 8 => quantized DC == v - 128 exactly
    return encode_jpeg(img, quant=q)


# --- REAL deterministic WAV corpus -------------------------------------------
#
#   n_samples   = 16 + id % 49
#   sample_rate = 8000 + (id % 5) * 2000
#   sample k    = ((id*31 + k*97) % 4001) - 2000   (16-bit PCM mono)


def synth_wav_payload(media_id: int) -> bytes:
    """Deterministic REAL RIFF/WAVE bytes (formulas above)."""
    from .audio import encode_wav

    n = 16 + media_id % 49
    rate = 8000 + (media_id % 5) * 2000
    k = np.arange(n, dtype=np.int64)
    samples = ((np.int64(media_id) * 31 + k * 97) % 4001 - 2000).astype(np.int16)
    return encode_wav(samples, rate)


# --- REAL deterministic GIF corpus -------------------------------------------
#
# Genuine single-frame GIF87a files from the from-scratch LZW codec in
# :mod:`.gif`. Pixel indices mix runs (LZW-friendly) with ramps
# (dictionary growth) so the variable-width decode paths are exercised;
# every value is a pure function of the media id, so a SQL oracle
# recomputes the index stats AND the palette-mapped RGB sum — a wrong
# byte anywhere (header, color table, LZW width growth) diverges the
# value hash.
#
#   height = 8 + id % 7, width = 8 + id % 9, 16 colors (mcs 4)
#   index at k (row-major) = (id + k) % 16 if (k // 5) % 2 == 0
#                            else id % 16
#   palette i = (11*i % 256, 59*i % 256, 97*i % 256)
#   odd ids are stored INTERLACED (4-pass row layout); the stats
#   include a row-weighted checksum so a wrong de-interlace diverges
#   the value hash (plain sums are permutation-invariant).

_GIF_NCOLORS = 16


def _gif_palette() -> np.ndarray:
    i = np.arange(_GIF_NCOLORS, dtype=np.int64)
    return np.stack([(11 * i) % 256, (59 * i) % 256, (97 * i) % 256], 1).astype(
        np.uint8
    )


def synth_gif_payload(media_id: int) -> bytes:
    """Deterministic REAL GIF87a bytes for ``media_id`` (formulas above)."""
    from .gif import encode_gif

    h = 8 + media_id % 7
    w = 8 + media_id % 9
    k = np.arange(h * w, dtype=np.int64)
    ramp = (np.int64(media_id) + k) % _GIF_NCOLORS
    flat = np.full(h * w, media_id % _GIF_NCOLORS, np.int64)
    idx = np.where((k // 5) % 2 == 0, ramp, flat).astype(np.uint8).reshape(h, w)
    return encode_gif(idx, _gif_palette(), interlaced=media_id % 2 == 1)


class GifStats:
    """Actor-pool stage: REAL GIF payload -> dims + exact integer stats
    over the palette indices plus the palette-mapped RGB sum (proving
    the color-table parse, not just the LZW stream, is correct) and a
    row-weighted checksum (proving de-interlacing restored row order —
    the plain sums are permutation-invariant)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .gif import decode_gif

        hs, ws, ncs, isums, imins, imaxs, rgbs, posws = ([] for _ in range(8))
        for payload in batch.column("payload").to_pylist():
            idx, palette = decode_gif(payload)
            flat = idx.reshape(-1).astype(np.int64)
            rows = np.repeat(np.arange(idx.shape[0], dtype=np.int64), idx.shape[1])
            hs.append(idx.shape[0])
            ws.append(idx.shape[1])
            ncs.append(int(palette.shape[0]))
            isums.append(int(flat.sum()))
            imins.append(int(flat.min()))
            imaxs.append(int(flat.max()))
            rgbs.append(int(palette.astype(np.int64).sum(1)[flat].sum()))
            posws.append(int((rows * flat).sum()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "ncolors": pa.array(ncs, pa.int64()),
                "idx_sum": pa.array(isums, pa.int64()),
                "idx_min": pa.array(imins, pa.int64()),
                "idx_max": pa.array(imaxs, pa.int64()),
                "rgb_sum": pa.array(rgbs, pa.int64()),
                "posw_sum": pa.array(posws, pa.int64()),
            }
        )


# --- magic-byte sniffing ------------------------------------------------------


def sniff_media(payload: bytes) -> str:
    """Classify a media payload from BYTES ALONE (the decoder-dispatch
    step of a multimodal pipeline): png / gif / jpeg / wav / fimg /
    fvid / avi, or 'unknown'. Magic signatures per the public format
    specs (PNG 8-byte signature, GIF87a/89a, JPEG SOI, RIFF+WAVE,
    RIFF+AVI)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:4] == b"GIF8":
        return "gif"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == FAKE_IMG_MAGIC:
        return "fimg"
    if payload[:4] == FVID_MAGIC:
        return "fvid"
    return "unknown"


def synth_media_payload(media_id: int) -> bytes:
    """One REAL payload rotating through the five synthesizers by
    ``media_id % 5`` (png, gif, jpeg, wav, fimg) — the mixed-format
    corpus for routing tests."""
    kind = media_id % 5
    if kind == 0:
        return synth_png_payload(media_id)
    if kind == 1:
        return synth_gif_payload(media_id)
    if kind == 2:
        return synth_jpeg_payload(media_id)
    if kind == 3:
        return synth_wav_payload(media_id)
    return synth_image_payload(media_id)


# --- FVID: a documented length-prefixed video frame container ----------------
#
# Real-world video codecs (H.264 etc.) need libraries absent from this
# container, so the honest stub remains for those — but the *container
# plumbing* and per-frame decode are real: FVID is a trivial public
# layout (magic | u32 frame count | per frame u32 length + PNG bytes)
# whose frames are genuine PNGs decoded by the from-scratch codec.
#
#   n_frames = 2 + id % 5
#   frame j is synth_png_payload(id * 1000 + j)

FVID_MAGIC = b"FVID"


def encode_fvid(frames: "list[bytes]") -> bytes:
    out = bytearray(FVID_MAGIC)
    out += len(frames).to_bytes(4, "big")
    for f in frames:
        out += len(f).to_bytes(4, "big") + f
    return bytes(out)


def parse_fvid(payload: bytes) -> "list[bytes]":
    if payload[:4] != FVID_MAGIC:
        raise ValueError("not an FVID payload")
    n = int.from_bytes(payload[4:8], "big")
    pos = 8
    frames = []
    for _ in range(n):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        pos += 4
        frame = payload[pos : pos + ln]
        if len(frame) < ln:
            raise ValueError("fvid: truncated frame")
        frames.append(frame)
        pos += ln
    return frames


def synth_video_payload(media_id: int) -> bytes:
    """Deterministic REAL FVID container of genuine PNG frames."""
    n_frames = 2 + media_id % 5
    return encode_fvid(
        [synth_png_payload(media_id * 1000 + j) for j in range(n_frames)]
    )


# --- REAL deterministic MJPEG-AVI corpus --------------------------------------
#
# Genuine RIFF-AVI files (functions/avi.py) whose frames are baseline
# JPEGs from the from-scratch T.81 codec — the one real-world VIDEO
# format decodable here with no codec library. Frames use the same
# exact-decode discipline as the JPEG corpus (constant 8x8 blocks, DC
# step 8 => lossless roundtrip), so a SQL oracle recomputes pixel sums
# arithmetically. All frames of a video share its dimensions (an AVI
# stream has one frame size):
#
#   n_frames = 2 + id % 5;  hb = 1 + id % 3, wb = 1 + id % 4
#   height = 8*hb, width = 8*wb, grayscale
#   frame j, block k (row-major): value = (id*13 + j*17 + k*29) % 256


def synth_avi_payload(media_id: int) -> bytes:
    """Deterministic REAL MJPEG-AVI bytes (formulas above)."""
    from .avi import encode_avi_mjpeg
    from .jpeg import encode_jpeg

    hb = 1 + media_id % 3
    wb = 1 + media_id % 4
    n_frames = 2 + media_id % 5
    q = np.full(64, 16, dtype=np.int64)
    q[0] = 8  # DC step 8 => exact decode of constant blocks
    frames = []
    for j in range(n_frames):
        k = np.arange(hb * wb, dtype=np.int64)
        vals = (
            ((np.int64(media_id) * 13 + j * 17 + k * 29) % 256)
            .astype(np.uint8)
            .reshape(hb, wb)
        )
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        frames.append(encode_jpeg(img, quant=q))
    return encode_avi_mjpeg(frames, width=8 * wb, height=8 * hb)


class ImageStats:
    """Actor-pool stage: REAL PNG payload -> dims + integer pixel stats.

    The decode dispatches on the file signature: PNG via the
    from-scratch :func:`~webscraper_ray.functions.png.decode_png` (zlib
    inflate + per-scanline unfilter), JPEG via the from-scratch T.81
    baseline :func:`~webscraper_ray.functions.jpeg.decode_jpeg`
    (Huffman + dequant + vectorized IDCT); stats are exact integers so
    the SQL oracle hashes equal. Other payloads raise — route media by
    ``kind`` upstream.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import JPEG_SIGNATURE, decode_jpeg
        from .png import PNG_SIGNATURE, decode_png

        hs, ws, chs, sums, mins, maxs = [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            if payload[:8] == PNG_SIGNATURE:
                img = decode_png(payload)
            elif payload[:2] == JPEG_SIGNATURE:
                img = decode_jpeg(payload)
            else:
                raise ValueError("ImageStats: payload is neither PNG nor JPEG")
            h, w = img.shape[0], img.shape[1]
            ch = 1 if img.ndim == 2 else img.shape[2]
            flat = img.reshape(-1).astype(np.int64)
            hs.append(h)
            ws.append(w)
            chs.append(ch)
            sums.append(int(flat.sum()))
            mins.append(int(flat.min()))
            maxs.append(int(flat.max()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
            }
        )


class DecodeImage:
    """Actor-pool stage: image payload -> dims + a 16-d feature vector.

    ``__init__`` is where a real build loads the codec + feature model
    ONCE per actor; ``__call__`` only touches batch data.
    """

    def __init__(self, decode_stub: str = "fake"):
        # 'fake'  : dims derived from a payload hash (pure stub)
        # 'header': REAL byte parse of the documented FIMG fake format
        # 'real'  : REAL decode — PNG via the from-scratch codec, FIMG
        #           via the header parse; anything else (JPEG/video)
        #           raises until a codec library is wired in
        # 'raise' : what a production build does until a codec is wired
        if decode_stub not in ("fake", "header", "real", "raise"):
            raise ValueError(decode_stub)
        self.decode_stub = decode_stub
        # real build: self.codec = PIL/cv2; self.model = load_model(...)

    def _decode(self, payload: bytes) -> tuple[int, int, int]:
        if self.decode_stub == "raise":
            raise NotImplementedError(
                "image decode needs an imaging library absent from this "
                "container; wire PIL/cv2 here"
            )
        if self.decode_stub == "real":
            from .jpeg import JPEG_SIGNATURE, decode_jpeg
            from .png import PNG_SIGNATURE, decode_png

            img = None
            if payload[:8] == PNG_SIGNATURE:
                img = decode_png(payload)
            elif payload[:2] == JPEG_SIGNATURE:
                img = decode_jpeg(payload)
            if img is not None:
                ch = 1 if img.ndim == 2 else img.shape[2]
                return img.shape[0], img.shape[1], ch
            if payload[:4] == FAKE_IMG_MAGIC:
                return parse_fake_image(payload)
            raise NotImplementedError(
                "only PNG/JPEG decode natively; video needs a codec "
                "library absent from this container"
            )
        if self.decode_stub == "header":
            return parse_fake_image(payload)
        return _fake_dims(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        dims = [self._decode(p) for p in payloads]
        feats = []
        for p in payloads:
            d = hashlib.blake2b(p, digest_size=16).digest()
            feats.append((np.frombuffer(d, dtype=np.uint8) / 255.0).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "height": pa.array([d[0] for d in dims], pa.int32()),
                "width": pa.array([d[1] for d in dims], pa.int32()),
                "channels": pa.array([d[2] for d in dims], pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class AudioStats:
    """Actor-pool stage: REAL WAV payload -> rate/shape + integer sample
    stats, exact so the SQL oracle hashes equal. Non-WAV payloads raise
    — route media by ``kind`` upstream."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .audio import decode_wav

        ns, rates, chs, sums, mins, maxs = [], [], [], [], [], []
        for payload in batch.column("payload").to_pylist():
            samples, rate = decode_wav(payload)
            flat = samples.reshape(-1).astype(np.int64)
            ns.append(samples.shape[0])
            rates.append(rate)
            chs.append(1 if samples.ndim == 1 else samples.shape[1])
            sums.append(int(flat.sum()))
            mins.append(int(flat.min()))
            maxs.append(int(flat.max()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "sample_sum": pa.array(sums, pa.int64()),
                "sample_min": pa.array(mins, pa.int64()),
                "sample_max": pa.array(maxs, pa.int64()),
            }
        )


class FrameSample:
    """Actor-pool stage: video payload -> n evenly spaced frame records
    (flat output: one row per sampled frame).

    ``decode_stub='real'`` parses the documented FVID container and
    REALLY decodes each sampled PNG frame (exact integer pixel stats,
    SQL-oracle-gated); ``'fake'`` keeps the hash-stub; ``'raise'`` is
    what a production build does for real-world codecs (H.264 etc.)
    until a codec library is wired in.
    """

    def __init__(self, n_frames: int = 4, decode_stub: str = "fake"):
        self.n_frames = n_frames
        self.decode_stub = decode_stub

    def _real(self, batch: pa.Table) -> pa.Table:
        from .avi import parse_avi_mjpeg
        from .jpeg import decode_jpeg
        from .png import decode_png

        ids, ks, fidx, hs, ws, chs, sums = [], [], [], [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            # container dispatch on signature: RIFF-AVI (MJPEG frames,
            # from-scratch T.81 decode) or FVID (PNG frames)
            if payload[:4] == b"RIFF":
                frames = parse_avi_mjpeg(payload)
                frame_decode = decode_jpeg
            else:
                frames = parse_fvid(payload)
                frame_decode = decode_png
            nf = len(frames)
            if nf == 0:
                raise ValueError(
                    f"video container for media {mid} has zero frames"
                )
            for k in range(self.n_frames):
                j = k * nf // self.n_frames
                img = frame_decode(frames[j])
                ids.append(mid)
                ks.append(k)
                fidx.append(j)
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                chs.append(1 if img.ndim == 2 else img.shape[2])
                sums.append(int(img.reshape(-1).astype(np.int64).sum()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_k": pa.array(ks, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_stub == "real":
            return self._real(batch)
        ids, frame_idx, frame_sig = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            if self.decode_stub == "raise":
                raise NotImplementedError("video decode needs a codec library")
            # fake duration derived from payload; evenly spaced sample points
            duration = 1 + len(payload) % 600
            for k in range(self.n_frames):
                ts = k * duration // self.n_frames
                ids.append(mid)
                frame_idx.append(ts)
                frame_sig.append(
                    hashlib.blake2b(payload + ts.to_bytes(4, "little"), digest_size=8).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_ts": pa.array(frame_idx, pa.int32()),
                "frame_sig": pa.array(frame_sig, pa.string()),
            }
        )


class ResizeImage:
    """Actor-pool stage: aspect-preserving resize metadata (real math,
    stubbed pixels)."""

    def __init__(self, max_side: int = 224, decode_stub: str = "fake"):
        self.max_side = max_side
        self.decode_stub = decode_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights = batch.column("height").to_pylist()
        widths = batch.column("width").to_pylist()
        out_h, out_w = [], []
        for h, w in zip(heights, widths):
            # pure integer floor math (deterministic and reproducible in
            # the SQL oracle with //); no-op when already within bounds
            m = max(h, w)
            if m > self.max_side:
                out_h.append(max(1, (h * self.max_side) // m))
                out_w.append(max(1, (w * self.max_side) // m))
            else:
                out_h.append(h)
                out_w.append(w)
        t = batch.drop_columns([c for c in ("height", "width") if c in batch.column_names])
        t = t.append_column("height", pa.array(out_h, pa.int32()))
        return t.append_column("width", pa.array(out_w, pa.int32()))


class ImageAHash:
    """Actor-pool stage: PNG payload -> 64-bit average hash (aHash).

    The perceptual-dedup fingerprint: decode with the REAL from-scratch
    codec, then bit k = (pixel_k * n > pixel_sum) — the strict integer
    form of 'above the mean', exact on both engines. Contract: 64-pixel
    images (8x8, the classic aHash raster) so the hash is one bit per
    pixel; anything else raises loudly."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .png import decode_png

        ids = batch.column("media_id").to_pylist()
        out: list[str] = []
        for payload in batch.column("payload").to_pylist():
            img = decode_png(bytes(payload))
            v = np.asarray(img, dtype=np.int64).ravel()
            if v.size != 64:
                raise ValueError(
                    f"ImageAHash expects 64-pixel images, got {v.size}"
                )
            s = int(v.sum())
            bits = (v * 64 > s).astype(np.uint64)
            h = int((bits << np.arange(64, dtype=np.uint64)).sum())
            out.append(f"{h:016x}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "ahash": pa.array(out, pa.string()),
            }
        )
