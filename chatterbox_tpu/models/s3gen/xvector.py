"""Speaker x-vector embedder (CAMPPlus-equivalent) for S3Gen conditioning.

A compact dilated-TDNN over 80-bin fbanks (16 kHz) with statistics pooling →
192-d embedding, playing the role of the reference's CAMPPlus x-vector inside
``embed_ref`` (SURVEY.md §2b). Architecture is our own TPU-friendly design.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from .config import S3GenConfig


def _dense(rng, shape, dtype, scale=None):
    from ...ops.initializers import dense_init

    return dense_init(rng, shape, dtype, scale)


def init_xvector_params(key: jax.Array, cfg: S3GenConfig, n_mels: int = 80, dtype=jnp.float32) -> Dict:
    from ...ops.initializers import rng_stream
    ks = rng_stream(key)
    dense = lambda shape: _dense(next(ks), shape, dtype)
    C = 512
    return {
        "c1": {"w": dense((5, n_mels, C)), "b": jnp.zeros((C,), dtype)},
        "c2": {"w": dense((3, C, C)), "b": jnp.zeros((C,), dtype)},
        "c3": {"w": dense((3, C, C)), "b": jnp.zeros((C,), dtype)},
        "c4": {"w": dense((1, C, C * 3)), "b": jnp.zeros((C * 3,), dtype)},
        "out": {"w": dense((C * 6, cfg.spk_dim)), "b": jnp.zeros((cfg.spk_dim,), dtype)},
    }


def xvector_embed(params: Dict, fbank: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """fbank [B, T, n_mels] → [B, spk_dim], length-masked stats pooling."""
    h = jax.nn.relu(conv1d(fbank, params["c1"]["w"], params["c1"]["b"]))
    h = h + jax.nn.relu(conv1d(h, params["c2"]["w"], params["c2"]["b"], dilation=2))
    h = h + jax.nn.relu(conv1d(h, params["c3"]["w"], params["c3"]["b"], dilation=3))
    h = jax.nn.relu(conv1d(h, params["c4"]["w"], params["c4"]["b"]))
    if valid is None:
        valid = jnp.ones(h.shape[:2], dtype=bool)
    w = valid[:, :, None].astype(h.dtype)
    n = jnp.maximum(w.sum(axis=1), 1.0)
    mean = (h * w).sum(axis=1) / n
    var = (jnp.square(h) * w).sum(axis=1) / n - jnp.square(mean)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-6))], axis=-1)
    emb = stats @ params["out"]["w"] + params["out"]["b"]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
