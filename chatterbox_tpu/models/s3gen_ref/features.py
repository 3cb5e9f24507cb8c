"""Feature front-ends for the checkpoint-compatible S3Gen stack.

Three exact-spec extractors (all pure JAX, static shapes, batch + valid-length
masked so padded batches reproduce unpadded computation):

* ``hifigan_log_mel`` — 24 kHz HiFiGAN-style mel (n_fft 1920 / hop 480 /
  80 slaney-mel bins, natural log, 1e-5 floor, center=False with reflect
  padding) — the flow decoder's prompt-mel conditioning features.
* ``whisper_log_mel`` — 16 kHz whisper front-end (n_fft 400 / hop 160 /
  128 mel bins, power spectrum, log10, per-utterance max-8 clamp, (x+4)/4)
  feeding the S3TokenizerV2 encoder.
* ``kaldi_fbank`` — torchaudio-kaldi-compatible 80-bin fbank (povey window,
  DC removal, pre-emphasis 0.97, snip-edges, natural log, per-utterance CMN)
  feeding the CAMPPlus speaker encoder.

These mirror the feature extractors bundled with the reference's model
package (consumed via embed_ref / tokenizer.forward / speaker encoder at
/root/reference/src/tts_streaming.py:365-375).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

import jax.numpy as jnp

from ...ops.spectral import _mel_matrix

_KALDI_EPS = 1.1920928955078125e-07  # torchaudio.compliance.kaldi.EPSILON


def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def _frame(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    """[B, L] → [B, N, frame_len] with N = 1 + (L - frame_len)//hop."""
    L = x.shape[1]
    n_frames = 1 + (L - frame_len) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_len)[None, :]
    return x[:, idx]


def _mask_wav(wav: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.arange(wav.shape[1])[None, :] < lens[:, None], wav, 0.0)


def reflect_tail(wav: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Fill the padding past each row's valid length with the reflection of
    its tail: sample i >= len reads 2*len - 2 - i (librosa/torch 'reflect').
    A framed feature whose last window crosses the valid end then sees the
    same samples it would on the true-length, reflect-padded waveform."""
    idx = jnp.arange(wav.shape[1])[None, :]
    refl = jnp.clip(2 * lens[:, None] - 2 - idx, 0, wav.shape[1] - 1)
    return jnp.where(idx < lens[:, None], wav, jnp.take_along_axis(wav, refl, axis=1))


# ------------------------------------------------------------------- hifigan
def hifigan_log_mel(wav24: jnp.ndarray) -> jnp.ndarray:
    """[B, L] 24 kHz → [B, L//480, 80] natural-log mel (floor 1e-5).

    HiFiGAN extractor semantics: reflect-pad (n_fft-hop)/2 each side,
    center=False framing, magnitude (not power) spectrum, slaney mel
    (fmin 0, fmax 8000), log(clamp(·, 1e-5))."""
    n_fft, hop, n_mels = 1920, 480, 80
    pad = (n_fft - hop) // 2
    x = jnp.pad(wav24.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(x, n_fft, hop) * jnp.asarray(_hann_periodic(n_fft))
    mag = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    mel = mag @ jnp.asarray(_mel_matrix(24000, n_fft, n_mels, 0.0, 8000.0)).T
    return jnp.log(jnp.maximum(mel, 1e-5))


# ------------------------------------------------------------------- whisper
def whisper_log_mel(
    wav16: jnp.ndarray, lens: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, L] 16 kHz → ([B, L//160, 128], valid frame counts).

    Whisper front-end: n_fft 400, hop 160, centered (reflect), power
    spectrum, slaney mel, log10 with 1e-10 floor, clamp to (max over the
    utterance's VALID frames) - 8, then (x+4)/4. Padded frames are zeroed
    and excluded from the max so tokens are padding-invariant."""
    n_fft, hop, n_mels = 400, 160, 128
    x = _mask_wav(wav16.astype(jnp.float32), lens)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(x, n_fft, hop) * jnp.asarray(_hann_periodic(n_fft))
    # whisper drops the final frame: keep L//160 of the 1 + L//160 frames
    n_out = wav16.shape[1] // hop
    frames = frames[:, :n_out]
    power = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1)) ** 2
    mel = power @ jnp.asarray(_mel_matrix(16000, n_fft, n_mels, 0.0, 8000.0)).T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    n_frames = jnp.minimum(lens // hop, n_out)
    valid = jnp.arange(n_out)[None, :] < n_frames[:, None]
    vmax = jnp.max(
        jnp.where(valid[:, :, None], log_spec, -jnp.inf), axis=(1, 2), keepdims=True
    )
    log_spec = jnp.maximum(log_spec, vmax - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    log_spec = jnp.where(valid[:, :, None], log_spec, 0.0)
    return log_spec, n_frames.astype(jnp.int32)


# --------------------------------------------------------------------- kaldi
@lru_cache(maxsize=2)
def _kaldi_mel_banks(n_bins: int, padded: int, sr: int, low: float, high: float) -> np.ndarray:
    """Kaldi-style mel filterbank [n_bins, padded//2+1] (triangles computed in
    the mel domain, no area normalization — torchaudio get_mel_banks)."""

    def mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    fft_bin_width = sr / padded
    mel_low, mel_high = mel(low), mel(high)
    mel_delta = (mel_high - mel_low) / (n_bins + 1)
    bin_mels = mel(fft_bin_width * np.arange(padded // 2 + 1))
    banks = np.zeros((n_bins, padded // 2 + 1))
    for i in range(n_bins):
        left, center, right = (mel_low + d * mel_delta for d in (i, i + 1, i + 2))
        up = (bin_mels - left) / (center - left)
        down = (right - bin_mels) / (right - center)
        banks[i] = np.maximum(0.0, np.minimum(up, down))
    banks[:, -1] = 0.0  # kaldi excludes the nyquist bin
    return banks.astype(np.float32)


def kaldi_fbank(
    wav16: jnp.ndarray, lens: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, L] 16 kHz → ([B, 1+(L-400)//160, 80] CMN'd log-fbank, valid counts).

    torchaudio.compliance.kaldi.fbank(num_mel_bins=80, dither=0) semantics:
    snip-edges framing (25 ms / 10 ms), per-frame DC removal, pre-emphasis
    0.97 (first sample duplicated), povey window, FFT padded to 512, power
    spectrum, kaldi mel banks (20 Hz – nyquist), ln with 1.19e-7 floor —
    followed by the speaker encoder's per-utterance mean subtraction over
    valid frames."""
    frame_len, hop, padded, n_bins = 400, 160, 512, 80
    x = _mask_wav(wav16.astype(jnp.float32), lens)
    frames = _frame(x, frame_len, hop)  # [B, N, 400]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    first = frames[:, :, :1] - 0.97 * frames[:, :, :1]
    rest = frames[:, :, 1:] - 0.97 * frames[:, :, :-1]
    frames = jnp.concatenate([first, rest], axis=-1)
    povey = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_len) / (frame_len - 1))) ** 0.85
    frames = frames * jnp.asarray(povey.astype(np.float32))
    power = jnp.abs(jnp.fft.rfft(frames, n=padded, axis=-1)) ** 2
    banks = jnp.asarray(_kaldi_mel_banks(n_bins, padded, 16000, 20.0, 8000.0))
    fb = jnp.log(jnp.maximum(power @ banks.T, _KALDI_EPS))
    n_frames = jnp.maximum(1 + (lens - frame_len) // hop, 0)
    valid = jnp.arange(fb.shape[1])[None, :] < n_frames[:, None]
    denom = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None, None]
    mean = jnp.sum(jnp.where(valid[:, :, None], fb, 0.0), axis=1, keepdims=True) / denom
    fb = jnp.where(valid[:, :, None], fb - mean, 0.0)
    return fb, n_frames.astype(jnp.int32)
