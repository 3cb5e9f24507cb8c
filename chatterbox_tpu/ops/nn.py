"""Core neural ops shared by all models.

Pure jnp functions designed for XLA/TPU: static shapes, fused-friendly
elementwise chains, matmuls with explicit preferred_element_type so the MXU
accumulates in float32 even when weights/activations are bfloat16.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask value (finite: safe for softmax in bf16)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * scale).astype(dtype) * weight


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(dtype) * weight + bias


def swiglu(x: jnp.ndarray, w_gate: jnp.ndarray, w_up: jnp.ndarray, w_down: jnp.ndarray) -> jnp.ndarray:
    g = jax.nn.silu(linear(x, w_gate))
    return linear(g * linear(x, w_up), w_down)


# ----------------------------------------------------------------------- RoPE
def rope_frequencies(head_dim: int, max_len: int, theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin) tables of shape [max_len, head_dim//2], float32."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, head_dim//2]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Rotate q/k. x: [B, S, H, Dh]; positions: [B, S] absolute positions."""
    c = cos[positions][:, :, None, :]  # [B, S, 1, Dh/2]
    s = sin[positions][:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return rotated.astype(x.dtype)


# ------------------------------------------------------------------ attention
def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full (prefill) attention. q,k,v: [B, S, H, Dh]; mask: [B, 1, Sq, Sk]
    additive or boolean (True = attend). Causal by default."""
    B, Sq, H, Dh = q.shape
    Sk = k.shape[1]
    scale = 1.0 / jnp.sqrt(Dh).astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if mask is None:
        causal = jnp.tril(jnp.ones((Sq, Sk), dtype=bool), k=Sk - Sq)
        scores = jnp.where(causal[None, None], scores, NEG_INF)
    else:
        if mask.dtype == jnp.bool_:
            scores = jnp.where(mask, scores, NEG_INF)
        else:
            scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


# NOTE: single-step decode attention lives with the model (the T3 decode step
# fuses the cache scores with the current token's self term and left-pad
# masking — see models/t3/model.py) and as a Pallas kernel in
# ops/pallas_attention_v3.py. No generic helper is exported to avoid a
# second, subtly different implementation.
