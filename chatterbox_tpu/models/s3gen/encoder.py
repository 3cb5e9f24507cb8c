"""S3Gen token encoder: speech tokens (25 Hz) → mel-rate feature track (50 Hz).

A bidirectional transformer over [prompt tokens | generated tokens] followed
by 2× upsampling (nearest + smoothing conv) and a projection to the mel bins,
producing the `mu` conditioning track for the flow-matching decoder. Plays
the role of the reference's upsampling conformer encoder (SURVEY.md §2b)
in an MXU-friendly, static-shape form.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.nn import causal_attention, linear, rms_norm, rope_frequencies, apply_rope
from .config import S3GenConfig


def _dense(rng, shape, dtype, scale=None):
    from ...ops.initializers import dense_init

    return dense_init(rng, shape, dtype, scale)


def init_encoder_params(key: jax.Array, cfg: S3GenConfig, dtype=jnp.float32) -> Dict:
    D, L, F = cfg.enc_dim, cfg.enc_layers, cfg.enc_ffn
    from ...ops.initializers import rng_stream
    ks = rng_stream(key)
    dense = lambda shape, scale=None: _dense(next(ks), shape, dtype, scale)
    return {
        "token_emb": dense((cfg.vocab_size + 1, D), 0.02),  # +1: pad id = vocab_size
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
        "up_conv": {"w": dense((3, D, D)), "b": jnp.zeros((D,), dtype)},
        "out_proj": {"w": dense((D, cfg.n_mels)), "b": jnp.zeros((cfg.n_mels,), dtype)},
    }


def encode_tokens(
    params: Dict,
    cfg: S3GenConfig,
    tokens: jnp.ndarray,      # [B, T] int32 (pad with cfg.vocab_size)
    valid: jnp.ndarray,       # [B, T] bool
) -> jnp.ndarray:
    """→ mu [B, 2T, n_mels] (mel-rate conditioning track)."""
    B, T = tokens.shape
    D = cfg.enc_dim
    Dh = D // cfg.enc_heads
    h = params["token_emb"][tokens]
    cos, sin = rope_frequencies(Dh, 4096)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    mask = (valid[:, None, :, None] & valid[:, None, None, :]).transpose(0, 1, 3, 2)  # [B,1,T,T]

    def layer(h, lp):
        x = rms_norm(h, lp["attn_norm"])
        q = apply_rope(linear(x, lp["wq"]).reshape(B, T, cfg.enc_heads, Dh), cos, sin, positions)
        k = apply_rope(linear(x, lp["wk"]).reshape(B, T, cfg.enc_heads, Dh), cos, sin, positions)
        v = linear(x, lp["wv"]).reshape(B, T, cfg.enc_heads, Dh)
        o = causal_attention(q, k, v, mask)  # bidirectional via explicit mask
        h = h + linear(o.reshape(B, T, D), lp["wo"])
        x = rms_norm(h, lp["mlp_norm"])
        h = h + linear(jax.nn.gelu(linear(x, lp["w1"])), lp["w2"])
        return h, None

    h, _ = jax.lax.scan(layer, h, params["layers"])
    h = rms_norm(h, params["final_norm"])
    # zero pad positions so the smoothing conv can't bleed garbage inward
    h = jnp.where(valid[:, :, None], h, 0.0)

    # 2× upsample: nearest-neighbor repeat then smoothing conv
    up = jnp.repeat(h, cfg.frames_per_token, axis=1)
    up = up + conv1d(up, params["up_conv"]["w"], params["up_conv"]["b"])
    mu = linear(up, params["out_proj"]["w"], params["out_proj"]["b"])
    return mu
