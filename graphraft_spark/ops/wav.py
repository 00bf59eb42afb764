"""Pure-stdlib WAV (RIFF/PCM) codec: a REAL audio decoder for the
multimodal ``decode_fn`` seam (ops/multimodal.py), companion to the PNG
codec (ops/png.py).

Encodes and decodes PCM16 mono/stereo WAV files with nothing beyond
``struct``: RIFF container parse, fmt /data chunk walk (unknown chunks
skipped per spec), interleaved sample extraction.  Upgrades the audio
half of the multimodal decode stage from "deterministic fake" to a
genuine bytes→samples decode inside Arrow-batched ``mapInPandas``.

North-star extension — no reference analog; production swaps in
torchaudio/ffmpeg via the same ``decode_fn`` signature.  Video decode
remains the one stub (no pure-python codec exists for any real video
format).
"""

from __future__ import annotations

import struct


def wav_encode(samples: list[int], rate: int = 16000,
               channels: int = 1) -> bytes:
    """Interleaved PCM16 samples → RIFF/WAVE bytes."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE bytes → ``(rate, channels, interleaved samples)``.

    PCM16 only (format tag 1, 16-bit); unknown chunks are skipped
    (word-aligned per RIFF spec).  Raises ``ValueError`` on malformed or
    unsupported input — loud, never silent garbage."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos = 12
    rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt_tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt_tag != 1:
                raise ValueError(f"unsupported format tag {fmt_tag} "
                                 "(PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return rate, channels, list(struct.unpack(f"<{len(data) // 2}h", data))


def wav_window_energy(payload: bytes, n_windows: int = 4) -> list[float]:
    """REAL decode-based audio feature: decode, mix channels to mono by
    sample-sum, partition into ``n_windows`` equal-index windows, return
    mean squared energy per window normalized by 32768².  Same
    ``bytes -> list[float]`` contract as every ``decode_fn``."""
    _, channels, samples = wav_decode(payload)
    n_frames = len(samples) // channels
    if n_frames == 0:
        return [0.0] * n_windows
    sums = [0] * n_windows
    counts = [0] * n_windows
    for f in range(n_frames):
        v = sum(samples[f * channels:(f + 1) * channels])
        w = min(f * n_windows // n_frames, n_windows - 1)
        sums[w] += v * v
        counts[w] += 1
    return [s / c / (32768.0 * 32768.0) if c else 0.0
            for s, c in zip(sums, counts)]


def wav_resample_nearest(payload: bytes, out_n: int = 16) -> list[float]:
    """REAL decode-based resample: decode the WAV and nearest-neighbor
    decimate the (first-channel) sample stream to ``out_n`` frames
    (src = floor(dst · n/out_n), integer arithmetic — the same
    top-left convention as the image resize in ops/png.py).  Returns
    samples normalized to [-1, 1] — the ``bytes -> list[float]``
    decode_fn contract, so it plugs into extract_features.  Sample-rate
    conversion is the audio twin of image thumbnailing in a multimodal
    preprocessing pipeline; a production resampler adds an
    anti-aliasing filter, which is a kernel choice BEHIND this same
    seam, not a different dataflow."""
    _, ch, samples = wav_decode(payload)
    frames = len(samples) // ch
    if frames == 0:
        return [0.0] * out_n
    return [samples[(d * frames // out_n) * ch] / 32768.0
            for d in range(out_n)]
