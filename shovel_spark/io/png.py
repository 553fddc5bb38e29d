"""Pure-stdlib PNG pixel codec + average-hash — no codec libraries.

The multimodal tier's last stub was pixel-level image decode. For PNG the
whole path is stdlib: IDAT is zlib (RFC 1950/1951, ``zlib`` module) and the
per-scanline filters (None/Sub/Up/Average/Paeth, PNG spec §9) are byte
arithmetic. That is enough to fill the ``phash`` slot of
IMAGE_FEATURES_SCHEMA with a REAL perceptual hash (8x8 average-hash over
decoded pixels) and run image near-dup grouping on it — re-encoded copies
of the same pixels (different filter strategy, different zlib level,
different bytes) hash identically, which byte-level dedup can never see.

Supported: 8-bit grayscale (color type 0) and truecolor (2), optional alpha
(4, 6 — alpha ignored for hashing), non-interlaced. Palette/16-bit/interlaced
return None rather than raise — the curation pipeline treats undecodable
payloads like any other alien bytes (the header-only path still covers them).

JPEG/GIF pixel decode stays environment-gated (DCT/LZW need a codec lib);
their header dimensions come from multimodal.decode_image_header.

Reference: node-shovel has no image operators at all (its payloads are
opaque buffers, reference: src/core/message.js) — this tier is part of the
beyond-reference training-data surface SURVEY.md §2 mandates.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by PNG color type (8-bit depths only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# Decompression-bomb ceiling: the largest raster decode_png_pixels will
# inflate (256 MiB covers a 8192x8192 RGBA image). A crafted IHDR declaring
# more is rejected BEFORE any allocation; a crafted IDAT inflating past the
# declared geometry is cut off at expected+1 bytes by decompressobj.
_MAX_RASTER_BYTES = 256 * 1024 * 1024


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/above/upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply scanline filter ``ftype`` (encode direction)."""
    if ftype == 0:
        return bytes(row)
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        elif ftype == 4:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (x - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse scanline filter ``ftype`` IN PLACE (decode direction) —
    reconstruction must read already-reconstructed left neighbors."""
    if ftype == 0:
        return
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # ftype == 4, validated by caller
            pred = _paeth(a, b, c)
        row[i] = (row[i] + pred) & 0xFF


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 0,
    filter_type: int = 0,
    level: int = 6,
) -> bytes:
    """A REAL, spec-complete PNG (IHDR + one IDAT + IEND, CRCs included)
    from raw 8-bit pixels (row-major, ``_CHANNELS[color_type]`` bytes per
    pixel). ``filter_type`` applies to every scanline — varying it (and
    ``level``) re-encodes identical pixels into different BYTES, which is
    exactly the planted-near-dup shape the phash dedup test needs."""
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def decode_png_pixels(data: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, pixels) from a full PNG, or None for
    anything this decoder doesn't cover (non-PNG, palette, 16-bit,
    interlaced, truncated, corrupt CRC/zlib). Pure stdlib: chunk walk,
    IDAT concat + zlib inflate, per-row unfilter (all five filter types).
    Never raises on hostile input."""
    if len(data) < len(_SIG) + 12 or data[: len(_SIG)] != _SIG:
        return None
    pos = len(_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    n = len(data)
    try:
        while pos + 8 <= n:
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            body_end = pos + 8 + length
            if body_end + 4 > n:
                return None  # truncated chunk
            body = data[pos + 8 : body_end]
            (crc,) = struct.unpack_from(">I", data, body_end)
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                return None
            if tag == b"IHDR":
                if length != 13:
                    return None
                width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or ctype not in _CHANNELS or comp or filt or interlace:
                    return None
                channels = _CHANNELS[ctype]
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos = body_end + 4
        if width is None or not idat or width == 0 or height == 0:
            return None
        # Decompression-bomb fence: the IHDR-declared geometry bounds the
        # inflated size, so (a) reject absurd declared dimensions before
        # allocating anything, and (b) inflate with a hard max_length so a
        # crafted IDAT can never allocate more than the declared raster + 1
        # sentinel byte, whatever the compressed stream claims.
        stride = width * channels
        expected = (stride + 1) * height
        if expected > _MAX_RASTER_BYTES:
            return None
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except (zlib.error, struct.error, MemoryError, OverflowError):
        return None
    if len(raw) != expected or dec.unconsumed_tail:
        return None
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        if ftype > 4:
            return None
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        _unfilter_row(ftype, row, prev, channels)
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return (width, height, channels, bytes(out))


def average_hash64(
    pixels: bytes, width: int, height: int, channels: int = 1
) -> int | None:
    """64-bit average-hash over decoded pixels: 8x8 box-mean downsample,
    then bit k (MSB-first, row-major) set iff cell k's mean EXCEEDS the
    global mean. All comparisons are exact integer cross-multiplications
    (``s_cell * N > S_total * n_cell``) — no float rounding, so any two
    decoders of the same pixels agree bit-for-bit. Returns a SIGNED int64
    (two's complement) to fit LongType / BIGINT. None for images smaller
    than 8x8 (no meaningful downsample).

    Alpha channels are ignored; RGB collapses to integer luma
    ``(r + g + b) // 3`` — deterministic, engine-neutral."""
    if width < 8 or height < 8:
        return None
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    a = a.astype(np.int64)
    if channels >= 3:
        gray = (a[:, :, 0] + a[:, :, 1] + a[:, :, 2]) // 3
    else:  # grayscale (alpha, if present, ignored)
        gray = a[:, :, 0]
    ys = [i * height // 8 for i in range(9)]
    xs = [j * width // 8 for j in range(9)]
    sums = [0] * 64
    counts = [0] * 64
    for i in range(8):
        for j in range(8):
            cell = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]]
            k = i * 8 + j
            sums[k] = int(cell.sum())
            counts[k] = cell.size
    total_s = int(gray.sum())
    total_n = width * height
    h = 0
    for k in range(64):
        # cell mean > global mean, exact: s_k/n_k > S/N  <=>  s_k*N > S*n_k
        if sums[k] * total_n > total_s * counts[k]:
            h |= 1 << (63 - k)
    return h - (1 << 64) if h >= (1 << 63) else h
