"""Minimal WAV (RIFF) reader/writer in pure numpy.

The reference CLI uses the `hound` crate for WAV I/O
(reference: resample/src/main.rs:85-156, 198-211).  This is the
dependency-free equivalent: PCM int 8/16/24/32 and IEEE float32, any
channel count; integers are normalized to f32 by the signed maximum the
same way the reference does (``sample / 2^(bits-1)``).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

__all__ = ["WavInfo", "read_wav", "write_wav"]

_FORMAT_PCM = 1
_FORMAT_IEEE_FLOAT = 3
_FORMAT_EXTENSIBLE = 0xFFFE


@dataclass(frozen=True)
class WavInfo:
    sample_rate: int
    channels: int
    bits_per_sample: int
    sample_format: str  # "int" | "float"


def read_wav(path, *, prefer_native: bool = True) -> tuple[np.ndarray, WavInfo]:
    """Read a WAV file.

    Returns ``(samples, info)`` where ``samples`` is interleaved float32
    in [-1, 1] (ints normalized by ``2^(bits-1)``).  Uses the native C++
    decoder (csrc/resampler_host.cpp) when built; numpy fallback otherwise
    (both are differentially tested in tests/test_native.py).
    """
    if prefer_native:
        from . import native

        if native.is_available():
            try:
                samples, rate, channels, bits, fmt = native.wav_read_native(
                    path
                )
            except ValueError:
                pass  # unsupported variant: fall through to python decoder
            else:
                return samples, WavInfo(rate, channels, bits, fmt)

    with open(path, "rb") as f:
        data = f.read()

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")

    fmt = None
    raw = None
    pos = 12
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = body
        elif chunk_id == b"data":
            raw = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks are word-aligned

    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    (audio_format, channels, sample_rate, _byte_rate, _block_align,
     bits) = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == _FORMAT_EXTENSIBLE and len(fmt) >= 26:
        (audio_format,) = struct.unpack_from("<H", fmt, 24)

    if audio_format == _FORMAT_IEEE_FLOAT:
        if bits != 32:
            raise ValueError(f"unsupported float bit depth: {bits}")
        samples = np.frombuffer(raw, "<f4").astype(np.float32)
        sample_format = "float"
    elif audio_format == _FORMAT_PCM:
        if bits == 16:
            ints = np.frombuffer(raw, "<i2").astype(np.int32)
        elif bits == 32:
            ints = np.frombuffer(raw, "<i4").astype(np.int64)
        elif bits == 8:
            # 8-bit WAV is unsigned, midpoint 128
            ints = np.frombuffer(raw, "u1").astype(np.int32) - 128
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            ints = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            ints = (ints << 8) >> 8  # sign-extend 24 -> 32
        else:
            raise ValueError(f"unsupported PCM bit depth: {bits}")
        samples = (ints / float(1 << (bits - 1))).astype(np.float32)
        sample_format = "int"
    else:
        raise ValueError(f"unsupported WAV format code: {audio_format}")

    # truncate to whole frames
    n_frames = samples.size // channels
    samples = samples[: n_frames * channels]
    return samples, WavInfo(sample_rate, channels, bits, sample_format)


def write_wav(path, samples: np.ndarray, sample_rate: int, channels: int) -> None:
    """Write interleaved float32 samples as a 32-bit IEEE-float WAV (the
    reference CLI's output format, reference: resample/src/main.rs:198-204)."""
    samples = np.asarray(samples, dtype="<f4")
    data_bytes = samples.tobytes()
    bits = 32
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8

    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data_bytes)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(
            struct.pack(
                "<IHHIIHH",
                16,
                _FORMAT_IEEE_FLOAT,
                channels,
                sample_rate,
                byte_rate,
                block_align,
                bits,
            )
        )
        f.write(b"data")
        f.write(struct.pack("<I", len(data_bytes)))
        f.write(data_bytes)
