"""Dependency-free PNG codec: a REAL image decoder for the multimodal
``decode_fn`` seam (ops/multimodal.py).

The container ships no codec libraries (PIL/ffmpeg absent), but PNG is
implementable with nothing beyond ``zlib`` + ``struct`` for the
container framing: this module encodes and decodes 8-bit greyscale /
grey+alpha / RGB / RGBA non-interlaced PNGs with full support for all
five scanline filter types (None/Sub/Up/Average/Paeth, PNG spec §9).
It upgrades the multimodal decode stage from "deterministic fake" to a
genuine bytes→pixels decode running inside Arrow-batched
``mapInPandas``.  Per-pixel hot paths (scanline filtering, luma
pooling, nearest resize) are numpy-vectorized — per-byte Python loops
inside the codec seam were the measured wall
(spark_optimization_guide §4.2); only the Average/Paeth de-filter
recurrences stay scalar, as the spec's in-row dependency demands.

North-star extension — no reference analog (the reference repo is
text/graph only); production swaps in PIL/torchvision via the same
``decode_fn`` signature when available.

Scale note: decode is per-image batched numpy inside ``mapInPandas`` —
the cost model is identical to any real codec (PIL is also per-image C
calls under the Python loop); parallelism comes from input
partitioning, and payload bytes never hit the driver.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


# below this many pixel bytes the scalar de-filter beats the numpy one
# (per-row numpy dispatch overhead; measured crossover ~4 KiB)
_VECTOR_MIN_BYTES = 4096


def _defilter_scalar(raw: bytes, width: int, height: int, stride: int,
                     ch: int) -> bytes:
    """Byte-identical scalar twin of the vectorized de-filter loop in
    :func:`png_decode` — faster for tiny images, where per-row numpy
    dispatch costs more than short Python loops."""
    out = bytearray(stride * height)
    prev = bytes(stride)
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
    return bytes(out)


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

    fts = [(filters[y % len(filters)] if filters else 0)
           for y in range(height)]
    bad = [ft for ft in fts if ft not in (0, 1, 2, 3, 4)]
    if bad:
        raise ValueError(f"unsupported filter type {bad[0]}")
    # vectorized scanline filtering (numpy): every filter references the
    # ORIGINAL bytes of the current/previous line, so all five forms
    # compute in one pass — uint8 subtraction wraps mod 256, which IS
    # the spec's & 0xFF
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    left = np.zeros_like(arr)
    left[:, ch:] = arr[:, :-ch]
    up = np.zeros_like(arr)
    up[1:] = arr[:-1]
    upleft = np.zeros_like(arr)
    upleft[1:, ch:] = arr[:-1, :-ch]
    a16, b16 = left.astype(np.int16), up.astype(np.int16)
    c16 = upleft.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    paeth = np.where((pa <= pb) & (pa <= pc), left,
                     np.where(pb <= pc, up, upleft))
    cand = np.stack([arr, arr - left, arr - up,
                     arr - ((a16 + b16) // 2).astype(np.uint8),
                     arr - paeth])
    ft_arr = np.asarray(fts, dtype=np.intp)
    out = np.empty((height, stride + 1), dtype=np.uint8)
    out[:, 0] = ft_arr
    out[:, 1:] = cand[ft_arr, np.arange(height)]
    raw = out.tobytes()

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

    ch = channels
    if stride * height < _VECTOR_MIN_BYTES:
        return width, height, channels, _defilter_scalar(
            raw, width, height, stride, ch)
    # de-filter (numpy where the recurrence allows: Sub is a per-channel
    # prefix sum, Up a vector add — uint8 wraps mod 256; Average/Paeth
    # keep the in-row scalar recurrence the spec demands).  Tiny images
    # route through the scalar twin above: per-row numpy dispatch costs
    # more than short Python loops (measured 3x slower at 16x16).
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = int(rows[y, 0])
        line = rows[y, 1:].copy()
        if ft == 1:  # Sub: prefix sum down each channel column
            line = (line.reshape(width, ch).astype(np.int64)
                    .cumsum(axis=0) % 256).astype(np.uint8).ravel()
        elif ft == 2:  # Up
            line += prev
        elif ft == 3:  # Average
            lb = bytearray(line.tobytes())
            pb = prev.tolist()
            for i in range(stride):
                a = lb[i - ch] if i >= ch else 0
                lb[i] = (lb[i] + (a + pb[i]) // 2) & 0xFF
            line = np.frombuffer(bytes(lb), dtype=np.uint8)
        elif ft == 4:  # Paeth
            lb = bytearray(line.tobytes())
            pb = prev.tolist()
            for i in range(stride):
                a = lb[i - ch] if i >= ch else 0
                c = pb[i - ch] if i >= ch else 0
                lb[i] = (lb[i] + _paeth(a, pb[i], c)) & 0xFF
            line = np.frombuffer(bytes(lb), dtype=np.uint8)
        elif ft != 0:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = line
        prev = line
    return width, height, channels, out.tobytes()


def png_grid_feature(payload: bytes, grid: int = 2) -> list[float]:
    """REAL decode-based feature: decode the PNG, mean-pool luminance
    over a ``grid × grid`` cell partition, normalize to [0, 1].  The
    drop-in replacement for ``deterministic_fake_decode`` wherever the
    payload is a PNG — same ``bytes -> list[float]`` contract."""
    width, height, ch, px = png_decode(payload)
    if len(px) < _VECTOR_MIN_BYTES:  # tiny images: loops beat numpy
        sums = [0.0] * (grid * grid)
        counts = [0] * (grid * grid)
        for y in range(height):
            cy = min(y * grid // height, grid - 1)
            row = y * width * ch
            for x in range(width):
                v = px[row + x * ch]
                if ch >= 3:  # integer BT.601-ish luma on RGB(A)
                    v = (299 * px[row + x * ch]
                         + 587 * px[row + x * ch + 1]
                         + 114 * px[row + x * ch + 2]) // 1000
                cell = cy * grid + min(x * grid // width, grid - 1)
                sums[cell] += v
                counts[cell] += 1
        return [s / c / 255.0 if c else 0.0
                for s, c in zip(sums, counts)]
    arr = np.frombuffer(px, dtype=np.uint8).reshape(height, width, ch) \
        .astype(np.int64)
    if ch >= 3:  # integer BT.601-ish luma on RGB(A)
        luma = (299 * arr[:, :, 0] + 587 * arr[:, :, 1]
                + 114 * arr[:, :, 2]) // 1000
    else:
        luma = arr[:, :, 0]
    cy = np.minimum(np.arange(height) * grid // height, grid - 1)
    cx = np.minimum(np.arange(width) * grid // width, grid - 1)
    cell = (cy[:, None] * grid + cx).ravel()
    sums = np.bincount(cell, weights=luma.ravel(), minlength=grid * grid)
    counts = np.bincount(cell, minlength=grid * grid)
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
    if out_w * out_h < 1024:  # output-bound: loops beat numpy when small
        out = []
        for dy in range(out_h):
            sy = dy * height // out_h
            row = sy * width * ch
            for dx in range(out_w):
                sx = dx * width // out_w
                v = px[row + sx * ch]
                if ch >= 3:  # same integer luma as png_grid_feature
                    v = (299 * px[row + sx * ch]
                         + 587 * px[row + sx * ch + 1]
                         + 114 * px[row + sx * ch + 2]) // 1000
                out.append(v / 255.0)
        return out
    arr = np.frombuffer(px, dtype=np.uint8).reshape(height, width, ch)
    sy = np.arange(out_h) * height // out_h
    sx = np.arange(out_w) * width // out_w
    sel = arr[sy[:, None], sx].astype(np.int64)   # (out_h, out_w, ch)
    if ch >= 3:  # same integer luma as png_grid_feature
        v = (299 * sel[:, :, 0] + 587 * sel[:, :, 1]
             + 114 * sel[:, :, 2]) // 1000
    else:
        v = sel[:, :, 0]
    return (v / 255.0).ravel().tolist()
