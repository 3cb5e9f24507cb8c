"""S3Tokenizer: 16 kHz speech → 25 Hz semantic tokens (codebook 6561 = 3^8).

Used for voice-prompt conditioning: the reference calls
``s3gen.tokenizer.forward([ref_16k_wav[:6s]], max_len=...)`` when preparing
voice conditionals (/root/reference/src/tts_streaming.py:369-372) and filters
generated tokens with ``drop_invalid_tokens`` + ``< 6561`` masks (:667-668).

Architecture (TPU-native): 128-bin log-mel (hop 10 ms, 100 fps) → two
stride-2 convs (→ 25 fps) → bidirectional transformer blocks → 8-dim
projection → finite scalar quantization with 3 levels per dim; the token id
is the base-3 digit string. FSQ keeps the codebook implicit — no nearest-
neighbor search, pure elementwise rounding: ideal for XLA.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.nn import causal_attention, linear, rms_norm, rope_frequencies, apply_rope
from ...ops.spectral import log_mel_spectrogram

S3_SR = 16000


@dataclass(frozen=True)
class S3TokConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160           # 100 fps
    n_mels: int = 128
    dim: int = 256
    layers: int = 4
    heads: int = 4
    ffn: int = 1024
    fsq_dims: int = 8
    fsq_levels: int = 3      # 3^8 = 6561 codes
    token_rate: int = 25

    @staticmethod
    def tiny() -> "S3TokConfig":
        return S3TokConfig(dim=32, layers=1, heads=2, ffn=64)


def _dense(rng, shape, dtype, scale=None):
    from ...ops.initializers import dense_init

    return dense_init(rng, shape, dtype, scale)


def init_s3tok_params(key: jax.Array, cfg: S3TokConfig, dtype=jnp.float32) -> Dict:
    D, L, F = cfg.dim, cfg.layers, cfg.ffn
    from ...ops.initializers import rng_stream
    ks = rng_stream(key)
    dense = lambda shape, scale=None: _dense(next(ks), shape, dtype, scale)
    return {
        "down1": {"w": dense((5, cfg.n_mels, D)), "b": jnp.zeros((D,), dtype)},
        "down2": {"w": dense((5, D, D)), "b": jnp.zeros((D,), dtype)},
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "wq": dense((L, D, D)),
            "wk": dense((L, D, D)),
            "wv": dense((L, D, D)),
            "wo": dense((L, D, D)),
            "w1": dense((L, D, F)),
            "w2": dense((L, F, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
        "fsq_proj": {"w": dense((D, cfg.fsq_dims)), "b": jnp.zeros((cfg.fsq_dims,), dtype)},
    }


def s3tok_tokenize(
    params: Dict,
    cfg: S3TokConfig,
    wav_16k: jnp.ndarray,   # [B, L]
    wav_len: jnp.ndarray,   # [B] valid samples
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, T25] int32, token_len [B])."""
    mel = log_mel_spectrogram(wav_16k, cfg.sample_rate, cfg.n_fft, cfg.hop, cfg.n_mels)
    B, T100, _ = mel.shape
    h = jax.nn.gelu(conv1d(mel, params["down1"]["w"], params["down1"]["b"], stride=2))
    h = jax.nn.gelu(conv1d(h, params["down2"]["w"], params["down2"]["b"], stride=2))
    B, T, D = h.shape
    Dh = D // cfg.heads
    cos, sin = rope_frequencies(Dh, 4096)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    frame_len = wav_len // (cfg.hop * 4)
    valid = jnp.arange(T)[None, :] < frame_len[:, None]
    mask = valid[:, None, :, None] & valid[:, None, None, :]
    mask = mask.transpose(0, 1, 3, 2)

    def layer(h, lp):
        x = rms_norm(h, lp["attn_norm"])
        q = apply_rope(linear(x, lp["wq"]).reshape(B, T, cfg.heads, Dh), cos, sin, positions)
        k = apply_rope(linear(x, lp["wk"]).reshape(B, T, cfg.heads, Dh), cos, sin, positions)
        v = linear(x, lp["wv"]).reshape(B, T, cfg.heads, Dh)
        o = causal_attention(q, k, v, mask)
        h = h + linear(o.reshape(B, T, D), lp["wo"])
        x = rms_norm(h, lp["mlp_norm"])
        h = h + linear(jax.nn.gelu(linear(x, lp["w1"])), lp["w2"])
        return h, None

    h, _ = jax.lax.scan(layer, h, params["layers"])
    h = rms_norm(h, params["final_norm"])

    # FSQ: bound to (-1, 1), round to {-1, 0, 1}, read as base-3 digits.
    z = jnp.tanh(linear(h, params["fsq_proj"]["w"], params["fsq_proj"]["b"]))
    digits = jnp.round(z).astype(jnp.int32) + 1  # {0,1,2}
    powers = (cfg.fsq_levels ** jnp.arange(cfg.fsq_dims)).astype(jnp.int32)
    tokens = jnp.sum(digits * powers[None, None, :], axis=-1)
    tokens = jnp.where(valid, tokens, 0)
    return tokens.astype(jnp.int32), frame_len.astype(jnp.int32)


def drop_invalid_tokens(tokens: jnp.ndarray, vocab_size: int = 6561) -> jnp.ndarray:
    """Boolean mask of in-codebook tokens (host applies the compaction) —
    same contract as the reference helper (tts_streaming.py:667-668)."""
    return tokens < vocab_size
