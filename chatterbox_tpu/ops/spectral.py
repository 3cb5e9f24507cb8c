"""Spectral ops in pure JAX: framing, STFT, inverse STFT (overlap-add), mel.

Used by S3Gen's mel conditioning, the HiFT vocoder's ISTFT head, the speech
tokenizer and the voice/speaker encoders. Everything is static-shape and
XLA-friendly; FFTs lower to XLA's FFT HLO.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def frame_signal(x: jnp.ndarray, frame_len: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Slice [B, L] into overlapping frames [B, N, frame_len]."""
    if center:
        pad = frame_len // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    B, L = x.shape
    n_frames = 1 + (L - frame_len) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[:, idx]


def stft(x: jnp.ndarray, n_fft: int, hop: int, win: jnp.ndarray, center: bool = True) -> jnp.ndarray:
    """[B, L] → complex [B, N, n_fft//2+1]."""
    frames = frame_signal(x, n_fft, hop, center) * win[None, None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """[B, N, frame_len] → [B, (N-1)*hop + frame_len] by overlap-add.

    Requires frame_len % hop == 0 (true for the vocoder's 16/4 head).
    Vectorized: each frame is cut into frame_len//hop hop-sized strips; strip
    j of every frame lands at offset j*hop — so the whole OLA is r shifted
    adds of reshaped arrays, no scatters.
    """
    B, N, F = frames.shape
    assert F % hop == 0, "overlap_add requires frame_len divisible by hop"
    r = F // hop
    out_len = (N - 1) * hop + F
    out = jnp.zeros((B, out_len), frames.dtype)
    strips = frames.reshape(B, N, r, hop)
    for j in range(r):
        piece = strips[:, :, j, :].reshape(B, N * hop)
        out = out.at[:, j * hop : j * hop + N * hop].add(piece)
    return out


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop: int,
    win: jnp.ndarray,
    length: int | None = None,
    center: bool = True,
) -> jnp.ndarray:
    """complex [B, N, n_fft//2+1] → [B, L] with window-square normalization.

    With ``center=True`` the first n_fft//2 samples (the analysis pad that a
    centered STFT added) are dropped, so stft→istft is sample-aligned.
    """
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win[None, None, :]
    x = overlap_add(frames, hop)
    # normalization by summed squared window
    N = spec.shape[1]
    wsq = overlap_add(jnp.broadcast_to(win[None, None, :] ** 2, (1, N, n_fft)), hop)
    x = x / jnp.maximum(wsq, 1e-8)
    if center:
        x = x[:, n_fft // 2 :]
    if length is not None:
        x = x[:, :length]
    return x


@lru_cache(maxsize=8)
def _mel_matrix(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (host-precomputed)."""

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = 3 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
        return f

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sr / 2, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lower, center, upper = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lower) / max(center - lower, 1e-9)
        down = (upper - fft_freqs) / max(upper - center, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        # Slaney area normalization
        fb[i] *= 2.0 / max(upper - lower, 1e-9)
    return fb.astype(np.float32)


def log_mel_spectrogram(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    log_offset: float = 1e-5,
) -> jnp.ndarray:
    """[B, L] waveform → [B, N, n_mels] natural-log mel spectrogram."""
    fmax = fmax or sr / 2
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32), dtype=x.dtype)
    spec = stft(x, n_fft, hop, win)
    power = jnp.abs(spec)
    mel = power @ jnp.asarray(_mel_matrix(sr, n_fft, n_mels, fmin, fmax)).T
    return jnp.log(jnp.maximum(mel, log_offset))
