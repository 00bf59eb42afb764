"""Dependency-free AVI (RIFF) codec for UNCOMPRESSED video: the third
modality behind the multimodal ``decode_fn`` seam (after PNG images,
ops/png.py, and WAV audio, ops/wav.py).  Container framing uses
``struct`` alone; the per-pixel hot paths (DIB<->RGB, thumbnail
sampling) are numpy-vectorized — the codec runs inside Arrow-batched
mapInPandas, where per-pixel Python loops were the measured wall
(spark_optimization_guide §4.2: hand whole batches to vectorized
native libraries).

AVI is a RIFF container: ``LIST hdrl`` holds the ``avih`` main header
(frame timing + dimensions) and a ``LIST strl`` stream header; ``LIST
movi`` holds one ``00db`` chunk per uncompressed frame.  Frames are
device-independent bitmaps — BOTTOM-UP rows of BGR24 pixels, each row
padded to a 4-byte boundary — which this module converts to/from
top-down RGB.  That is a real, documented video format decodable with
``struct`` alone; compressed codecs (the ``00dc`` chunk flavor) are
rejected loudly and remain the production-ffmpeg seam.

``avi_frame_iter`` walks the container WITHOUT materializing every
frame, so frame sampling reads only the sampled chunks — the honest
analog of keyframe-seeking at scale.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def avi_encode(frames: list[bytes], width: int, height: int,
               fps: int = 25) -> bytes:
    """Top-down RGB24 frame buffers (``width*height*3`` bytes each) →
    uncompressed AVI bytes."""
    stride = _row_stride(width)
    dibs = []
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame buffer does not match width*height*3")
        # vectorized top-down RGB -> bottom-up BGR with 4-byte row pad
        rgb = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        dib = np.zeros((height, stride), dtype=np.uint8)
        dib[:, :width * 3] = rgb[::-1, :, ::-1].reshape(height, width * 3)
        dibs.append(dib.tobytes())

    frame_bytes = stride * height
    avih = struct.pack("<IIIIIIIIIIIIII",
                       1_000_000 // fps, frame_bytes * fps, 0, 0,
                       len(frames), 0, 1, frame_bytes,
                       width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh",
                       b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0,
                       len(frames), frame_bytes, 0xFFFFFFFF, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       0, frame_bytes, 0, 0, 0, 0)  # BI_RGB
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(payload: bytes) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    """Parse headers; return (width, height, fps, n_frames,
    [(offset, length)] of the 00db frame chunks) without reading pixel
    data."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = usec = None

    frames: list[tuple[int, int]] = []

    def scan(pos: int, end: int) -> None:
        nonlocal width, height, usec
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            if pos + 8 + length > end:
                raise ValueError(f"truncated {tag!r} chunk")
            if tag == b"LIST":
                scan(pos + 12, pos + 8 + length)
            elif tag == b"avih":
                usec, _, _, _, _, _, _, _, width, height = struct.unpack(
                    "<IIIIIIIIII", payload[pos + 8:pos + 48])
            elif tag == b"00db":
                frames.append((pos + 8, length))
            elif tag == b"00dc":
                raise ValueError(
                    "compressed AVI frames (00dc) unsupported — decode "
                    "with ffmpeg behind the same decode_fn seam")
            pos += 8 + length + (length & 1)

    scan(12, len(payload))
    if width is None:
        raise ValueError("missing avih header")
    if usec is None or usec == 0:
        raise ValueError("missing frame timing")
    return width, height, round(1_000_000 / usec), len(frames), frames


def _dib_to_rgb(dib: bytes, width: int, height: int) -> bytes:
    stride = _row_stride(width)
    if len(dib) != stride * height:
        raise ValueError("frame chunk does not match dimensions")
    # vectorized bottom-up BGR (padded rows) -> top-down RGB
    rows = np.frombuffer(dib, dtype=np.uint8).reshape(height, stride)
    rgb = rows[::-1, :width * 3].reshape(height, width, 3)[:, :, ::-1]
    return rgb.tobytes()


def avi_decode(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """→ ``(width, height, fps, [top-down RGB24 frame, ...])``."""
    width, height, fps, _, frames = _walk(payload)
    return width, height, fps, [
        _dib_to_rgb(payload[off:off + ln], width, height)
        for off, ln in frames]


def avi_frame_iter(payload: bytes, every_n: int = 1
                   ) -> Iterator[tuple[int, bytes]]:
    """Yield ``(frame_idx, rgb_bytes)`` for every ``every_n``-th frame,
    decoding ONLY the sampled chunks (the container walk itself reads
    headers + chunk sizes, never skipped pixel data)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    width, height, _, _, frames = _walk(payload)
    for idx in range(0, len(frames), every_n):
        off, ln = frames[idx]
        yield idx, _dib_to_rgb(payload[off:off + ln], width, height)


def avi_clip_thumbs(payload: bytes, every_n: int = 2, tw: int = 8,
                    th: int = 8, max_frames: int | None = None
                    ) -> list[float]:
    """Sampled-frame luma thumbnails with the standard ``bytes ->
    list[float]`` decode-seam contract: every ``every_n``-th frame is
    nearest-neighbor resampled (src = floor(dst*in/out), the
    ops/png.py png_resize_nearest convention) to a ``tw``×``th`` luma
    plane; the planes concatenate row-major in frame order, each value
    normalized to [0, 1].  Luma is the integer mean (r+g+b)//3 —
    EXACT for greyscale content (r=g=b), which is what the
    fingerprinting recipes feed it.  ``max_frames`` bounds the output
    length (a clip fingerprint wants a FIXED width; extra sampled
    frames are ignored, and the caller is responsible for clips long
    enough to fill it — see video_ahash_words' size guard).  Skipped
    frames' pixel data is never decoded (avi_frame_iter)."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    width, height, _, _, frames = _walk(payload)
    stride = _row_stride(width)
    # vectorized: sample luma straight off each DIB chunk — the 3-channel
    # sum is channel-order-invariant, so no BGR->RGB swizzle is needed,
    # and skipped frames' pixel data is still never touched
    sy = (np.arange(th) * height) // th           # top-down row index
    sx3 = ((np.arange(tw) * width) // tw) * 3
    col = sx3[:, None] + np.arange(3)             # (tw, 3) byte columns
    out: list[float] = []
    taken = 0
    for idx in range(0, len(frames), every_n):
        if max_frames is not None and taken >= max_frames:
            break
        off, ln = frames[idx]
        if ln != stride * height:
            raise ValueError("frame chunk does not match dimensions")
        rows = np.frombuffer(payload, dtype=np.uint8,
                             count=ln, offset=off).reshape(height, stride)
        pix = rows[height - 1 - sy][:, col].astype(np.int64)
        luma = pix.sum(axis=-1) // 3              # (th, tw) ints
        out.extend((luma / 255.0).ravel().tolist())
        taken += 1
    return out


def avi_frame_energy(payload: bytes, every_n: int = 2) -> list[float]:
    """Decode-based video feature with the standard ``bytes ->
    list[float]`` seam contract: mean pixel intensity of each sampled
    frame, normalized to [0, 1]."""
    out = []
    for _, rgb in avi_frame_iter(payload, every_n):
        out.append(sum(rgb) / len(rgb) / 255.0 if rgb else 0.0)
    return out
