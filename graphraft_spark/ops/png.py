"""Pure-stdlib PNG codec: a REAL image decoder for the multimodal
``decode_fn`` seam (ops/multimodal.py).

The container ships no codec libraries (PIL/ffmpeg absent), but PNG is
implementable with nothing beyond ``zlib`` + ``struct``: this module
encodes and decodes 8-bit greyscale / grey+alpha / RGB / RGBA
non-interlaced PNGs with full support for all five scanline filter
types (None/Sub/Up/Average/Paeth, PNG spec §9).  It upgrades the
multimodal decode stage from "deterministic fake" to a genuine
bytes→pixels decode running inside Arrow-batched ``mapInPandas``.

North-star extension — no reference analog (the reference repo is
text/graph only); production swaps in PIL/torchvision via the same
``decode_fn`` signature when available.

Scale note: decode is per-row Python inside ``mapInPandas`` — the cost
model is identical to any real codec (PIL is also per-image C calls
under the Python loop); parallelism comes from input partitioning, and
payload bytes never hit the driver.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_encode(width: int, height: int, pixels: bytes,
               color_type: int = 0, filters: list[int] | None = None) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, ``width * height *
    channels``) into a valid PNG.  ``filters`` optionally fixes the
    filter type per scanline (default: all 0) — used by tests to force
    every de-filter path."""
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match width*height*channels")

    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        ft = filters[y % len(filters)] if filters else 0
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes((line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                         for i in range(stride))
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes((line[i] - ((line[i - ch] if i >= ch else 0)
                                     + prev[i]) // 2) & 0xFF
                         for i in range(stride))
        elif ft == 4:  # Paeth
            raw += bytes((line[i] - _paeth(line[i - ch] if i >= ch else 0,
                                           prev[i],
                                           prev[i - ch] if i >= ch else 0))
                         & 0xFF for i in range(stride))
        else:
            raise ValueError(f"unsupported filter type {ft}")
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def png_decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixel_bytes)``.

    Supports 8-bit depth, color types 0/2/4/6, non-interlaced, any
    number of IDAT chunks.  Raises ``ValueError`` on malformed input or
    unsupported features — loud, never silent garbage."""
    if payload is None or len(payload) < 8 or payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError("truncated chunk")
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size does not match dimensions")

    out = bytearray(stride * height)
    prev = bytes(stride)
    ch = channels
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)


def png_grid_feature(payload: bytes, grid: int = 2) -> list[float]:
    """REAL decode-based feature: decode the PNG, mean-pool luminance
    over a ``grid × grid`` cell partition, normalize to [0, 1].  The
    drop-in replacement for ``deterministic_fake_decode`` wherever the
    payload is a PNG — same ``bytes -> list[float]`` contract."""
    width, height, ch, px = png_decode(payload)
    sums = [0.0] * (grid * grid)
    counts = [0] * (grid * grid)
    for y in range(height):
        cy = min(y * grid // height, grid - 1)
        row = y * width * ch
        for x in range(width):
            v = px[row + x * ch]
            if ch >= 3:  # integer BT.601-ish luma on RGB(A)
                v = (299 * px[row + x * ch] + 587 * px[row + x * ch + 1]
                     + 114 * px[row + x * ch + 2]) // 1000
            cell = cy * grid + min(x * grid // width, grid - 1)
            sums[cell] += v
            counts[cell] += 1
    # images smaller than the grid leave trailing cells empty
    return [s / c / 255.0 if c else 0.0 for s, c in zip(sums, counts)]


def png_resize_nearest(payload: bytes, out_w: int = 4,
                       out_h: int = 4) -> list[float]:
    """REAL decode-based resize: decode the PNG and nearest-neighbor
    resample to ``out_w × out_h`` (standard top-left convention:
    src = floor(dst · in/out), integer arithmetic — exact and
    engine-portable).  Returns the resampled luminance row-major,
    normalized to [0, 1] — the same ``bytes -> list[float]`` decode_fn
    contract as :func:`png_grid_feature`, so it plugs straight into
    ops/multimodal.py extract_features.  This is the thumbnail /
    low-res-tower preprocessing step of a multimodal training
    pipeline, done by the engine's own codec instead of a stubbed
    PIL."""
    width, height, ch, px = png_decode(payload)
    out = []
    for dy in range(out_h):
        sy = dy * height // out_h
        row = sy * width * ch
        for dx in range(out_w):
            sx = dx * width // out_w
            v = px[row + sx * ch]
            if ch >= 3:  # same integer luma as png_grid_feature
                v = (299 * px[row + sx * ch] + 587 * px[row + sx * ch + 1]
                     + 114 * px[row + sx * ch + 2]) // 1000
            out.append(v / 255.0)
    return out
