"""Host-side PCM utilities: conversion, WAV IO, resampling.

The reference does float->int16 conversion on the torch device tensor
(/root/reference/src/tts_streaming.py:149-155) and loads/resamples reference
wavs with librosa/soxr (:362-363). Here conversion is a vectorized numpy op on
the host (audio chunks are small), WAV IO is a self-contained RIFF codec, and
resampling is polyphase via scipy (with a C++ fast path planned in native/).
"""
from __future__ import annotations

import struct
from math import gcd
from typing import Tuple

import numpy as np


def float_to_pcm16(audio: np.ndarray) -> bytes:
    """Clamp float waveform to [-1, 1] and convert to little-endian int16 bytes
    (same contract as reference tts_streaming.py:149-155). Uses the native
    audiokit when built; numpy otherwise."""
    audio = np.asarray(audio, dtype=np.float32)
    from .. import native

    out = native.float_to_pcm16(audio)
    if out is not None:
        return out
    clipped = np.clip(audio, -1.0, 1.0)
    return (clipped * 32767.0).astype("<i2").tobytes()


def pcm16_to_float(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0


def make_wav_header(
    sample_rate: int,
    channels: int = 1,
    bit_depth: int = 16,
    data_size: int = 0xFFFFFFFF,
) -> bytes:
    """RIFF/WAVE header; data_size=0xFFFFFFFF signals an unbounded stream
    (same bytes as reference audio_encoding.py:97-115)."""
    byte_rate = sample_rate * channels * bit_depth // 8
    block_align = channels * bit_depth // 8
    riff_size = data_size + 36 if data_size != 0xFFFFFFFF else 0xFFFFFFFF
    header = struct.pack("<4sL4s", b"RIFF", riff_size, b"WAVE")
    header += struct.pack(
        "<4sLHHLLHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, block_align, bit_depth
    )
    header += struct.pack("<4sL", b"data", data_size)
    return header


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    data = float_to_pcm16(audio)
    with open(path, "wb") as fh:
        fh.write(make_wav_header(sample_rate, data_size=len(data)))
        fh.write(data)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file to mono float32 in [-1, 1].

    Supports PCM 8/16/24/32-bit and IEEE float32/64. Multi-channel audio is
    downmixed by averaging. Returns (samples, sample_rate).
    """
    with open(path, "rb") as fh:
        blob = fh.read()
    if len(blob) < 12 or blob[0:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")

    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    while pos + 8 <= len(blob):
        cid, csize = struct.unpack_from("<4sL", blob, pos)
        body = blob[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHLLHH", body, 0)
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format code is the first 2 bytes
        # of the SubFormat GUID at offset 24 of the fmt chunk
        if len(fmt_body) >= 26:
            audio_format = struct.unpack_from("<H", fmt_body, 24)[0]
        else:
            raise ValueError(f"{path}: malformed WAVE_FORMAT_EXTENSIBLE fmt chunk")

    if audio_format == 1:  # integer PCM
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        dtype = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(data, dtype=dtype).astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported WAV format code {audio_format}")

    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels).mean(axis=1)
    return np.ascontiguousarray(x, dtype=np.float32), int(sample_rate)


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (band-limited), e.g. 24 kHz -> 16 kHz for voice
    conditioning (reference uses librosa/soxr, tts_streaming.py:363). Native
    audiokit (Kaiser-sinc polyphase, C++) when built; scipy otherwise."""
    if orig_sr == target_sr:
        return np.asarray(audio, dtype=np.float32)
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g

    from .. import native

    out = native.resample_poly(np.asarray(audio, dtype=np.float32), up, down)
    if out is not None:
        return out
    from scipy.signal import resample_poly

    out = resample_poly(np.asarray(audio, dtype=np.float64), up, down)
    return np.ascontiguousarray(out, dtype=np.float32)
