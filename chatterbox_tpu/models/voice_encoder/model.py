"""VoiceEncoder: utterance-level speaker embedding for T3 conditioning.

The reference calls ``ve.embeds_from_wavs([ref_16k_wav], sample_rate=16000)``
and mean-pools to a (1, 256) speaker embedding
(/root/reference/src/tts_streaming.py:374-375). Lineage is a GE2E LSTM
speaker encoder (SURVEY.md §2b): 40-bin log-mel → 3-layer LSTM(256) → linear
→ L2 norm. The recurrence runs as a ``lax.scan`` per layer; windows of 160
frames with 50% overlap are embedded and mean-pooled, matching the partial-
utterance scheme of that lineage.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.spectral import log_mel_spectrogram


@dataclass(frozen=True)
class VoiceEncoderConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160
    n_mels: int = 40
    hidden: int = 256
    layers: int = 3
    embed_dim: int = 256
    window_frames: int = 160
    window_hop: int = 80

    @staticmethod
    def tiny() -> "VoiceEncoderConfig":
        return VoiceEncoderConfig(hidden=32, layers=1, embed_dim=32, window_frames=16, window_hop=8)


def _dense(rng, shape, dtype, scale=None):
    from ...ops.initializers import dense_init

    return dense_init(rng, shape, dtype, scale)


def init_voice_encoder_params(key: jax.Array, cfg: VoiceEncoderConfig, dtype=jnp.float32) -> Dict:
    from ...ops.initializers import rng_stream
    ks = rng_stream(key)
    layers = []
    in_dim = cfg.n_mels
    for _ in range(cfg.layers):
        layers.append(
            {
                "wx": _dense(next(ks), (in_dim, 4 * cfg.hidden), dtype),
                "wh": _dense(next(ks), (cfg.hidden, 4 * cfg.hidden), dtype),
                "b": jnp.zeros((4 * cfg.hidden,), dtype),
            }
        )
        in_dim = cfg.hidden
    return {
        "lstm": layers,
        "proj": {"w": _dense(next(ks), (cfg.hidden, cfg.embed_dim), dtype), "b": jnp.zeros((cfg.embed_dim,), dtype)},
    }


def _lstm_layer(p: Dict, x: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """x: [B, T, Din] → [B, T, hidden]."""
    B = x.shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt @ p["wx"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((B, hidden), x.dtype), jnp.zeros((B, hidden), x.dtype))
    _, hs = jax.lax.scan(step, init, x.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def _embed_frames(params: Dict, cfg: VoiceEncoderConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → normalized embedding [B, embed_dim] (final state)."""
    h = mel
    for layer in params["lstm"]:
        h = _lstm_layer(layer, h, cfg.hidden)
    emb = jax.nn.relu(h[:, -1] @ params["proj"]["w"] + params["proj"]["b"])
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)


def voice_embed(
    params: Dict,
    cfg: VoiceEncoderConfig,
    wav_16k: jnp.ndarray,
    wav_len: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, L] → [B, embed_dim]: windowed partial embeddings, mean, re-norm.

    wav_len masks windows that fall past the valid samples (reference clips
    are zero-padded to a static length; averaging silence windows would pull
    the embedding toward a silence centroid)."""
    mel = log_mel_spectrogram(wav_16k, cfg.sample_rate, cfg.n_fft, cfg.hop, cfg.n_mels)
    B, T, M = mel.shape
    W, Hp = cfg.window_frames, cfg.window_hop
    if T < W:
        mel = jnp.pad(mel, ((0, 0), (0, W - T), (0, 0)))
        T = W
    n_win = 1 + (T - W) // Hp
    idx = jnp.arange(n_win)[:, None] * Hp + jnp.arange(W)[None, :]
    windows = mel[:, idx]                      # [B, n_win, W, M]
    flat = windows.reshape(B * n_win, W, M)
    embs = _embed_frames(params, cfg, flat).reshape(B, n_win, -1)
    if wav_len is not None:
        frame_len = wav_len // cfg.hop
        starts = jnp.arange(n_win) * Hp
        win_valid = starts[None, :] < jnp.maximum(frame_len[:, None] - W // 2, 1)
        win_valid = win_valid | (jnp.arange(n_win)[None, :] == 0)  # ≥1 window
        w = win_valid[:, :, None].astype(embs.dtype)
        mean = (embs * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1.0)
    else:
        mean = embs.mean(axis=1)
    return mean / jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-6)
