"""CFM estimator: causal-UNet ConditionalDecoder (matcha layout) + Euler/CFG.

Checkpoint-compatible with ``flow.decoder.estimator.*`` of the reference's
``s3gen.safetensors`` (publicly known matcha-TTS decoder layout used by the
CosyVoice2 family): sinusoidal time embedding (scale 1000) → MLP; one
down level [resnet → transformer×n → conv k3], N mid levels, one up level
with the skip concat; final block + 1×1 projection.

The solver is the cosine-warped Euler CFM with classifier-free guidance
(rate 0.7): the uncond lane zeroes mu/spk/cond, both lanes batched into ONE
estimator call per step so the scan stays a single XLA graph.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.initializers import dense_init, rng_stream
from ...ops.nn import NEG_INF, layer_norm, linear
from ...ops.pallas_mha import flash_mha
from .config import FlowRefConfig

# test hook: force the flash path in interpret mode on CPU
_FLASH_INTERPRET = False


def _flash_active() -> bool:
    """Use the flash MHA kernel for the estimator's transformer blocks (TPU
    backend; CHATTERBOX_FLASH=0 opts out). The XLA path materializes
    [B, H, T, T] f32 scores in HBM — ~1 GB of traffic per estimator eval at
    production shapes across the 16 blocks; flash keeps them in VMEM."""
    import os

    if _FLASH_INTERPRET:
        return True
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("CHATTERBOX_FLASH", "1") == "1"
    )

# fixed noise-buffer length (frames) for chunk-stable CFM initial noise; the
# reference uses a 15000-frame buffer (50 Hz × 300 s) — far above any chunk
_NOISE_FRAMES = 2048


def _group_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, groups: int = 8,
                eps: float = 1e-5, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """torch GroupNorm over [B, T, C] (normalizes per group over (T, C/g)).

    ``valid`` ([B, T] bool) restricts the statistics to valid frames so a
    padded batch reproduces the reference's unpadded computation exactly."""
    B, T, C = x.shape
    g = x.astype(jnp.float32).reshape(B, T, groups, C // groups)
    if valid is None:
        mean = jnp.mean(g, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
    else:
        vm = valid[:, :, None, None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(vm, axis=1, keepdims=True), 1.0) * (C // groups)
        mean = jnp.sum(g * vm, axis=(1, 3), keepdims=True) / denom
        var = jnp.sum(jnp.square(g - mean) * vm, axis=(1, 3), keepdims=True) / denom
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, T, C).astype(x.dtype) * w + b


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x.astype(jnp.float32))).astype(x.dtype)


def init_estimator_params(key: jax.Array, cfg: FlowRefConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)
    ch = cfg.dec_channels[0]
    tdim = ch * 4
    inner = cfg.dec_num_heads * cfg.dec_attention_head_dim

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    def mk_resnet(cin: int):
        return {
            "mlp": {"w": mk(tdim, ch), "b": mk(ch)},
            "block1": {"conv": {"w": mk(3, cin, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
            "block2": {"conv": {"w": mk(3, ch, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
            "res": {"w": mk(1, cin, ch), "b": mk(ch)},
        }

    def mk_tf():
        return {
            "norm1": {"w": mk(ch), "b": mk(ch)},
            "to_q": {"w": mk(ch, inner)},
            "to_k": {"w": mk(ch, inner)},
            "to_v": {"w": mk(ch, inner)},
            "to_out": {"w": mk(inner, ch), "b": mk(ch)},
            "norm3": {"w": mk(ch), "b": mk(ch)},
            "ff1": {"w": mk(ch, 4 * ch), "b": mk(4 * ch)},
            "ff2": {"w": mk(4 * ch, ch), "b": mk(ch)},
        }

    def mk_level(cin: int):
        return {
            "resnet": mk_resnet(cin),
            "tf": [mk_tf() for _ in range(cfg.dec_n_blocks)],
            "conv": {"w": mk(3, ch, ch), "b": mk(ch)},
        }

    return {
        "time_mlp": {
            "lin1": {"w": mk(cfg.dec_time_dim, tdim), "b": mk(tdim)},
            "lin2": {"w": mk(tdim, tdim), "b": mk(tdim)},
        },
        "down": mk_level(cfg.dec_in_channels),
        "mid": [
            {"resnet": mk_resnet(ch), "tf": [mk_tf() for _ in range(cfg.dec_n_blocks)]}
            for _ in range(cfg.dec_num_mid_blocks)
        ],
        "up": mk_level(2 * ch),
        "final": {"conv": {"w": mk(3, ch, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
        "proj": {"w": mk(1, ch, cfg.output_size), "b": mk(cfg.output_size)},
    }


def _time_embedding(p: Dict, cfg: FlowRefConfig, t: jnp.ndarray) -> jnp.ndarray:
    """t: [B] in [0,1] → [B, 4*ch] (sinusoid scale 1000, matcha convention)."""
    half = cfg.dec_time_dim // 2
    freq = jnp.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    h = jax.nn.silu(linear(emb, p["lin1"]["w"], p["lin1"]["b"]))
    return linear(h, p["lin2"]["w"], p["lin2"]["b"])


def _resnet(p: Dict, x: jnp.ndarray, mask: jnp.ndarray, valid: jnp.ndarray,
            temb: jnp.ndarray) -> jnp.ndarray:
    xm = x * mask
    h = conv1d(xm, p["block1"]["conv"]["w"], p["block1"]["conv"]["b"], padding="SAME_TORCH")
    h = _mish(_group_norm(h, p["block1"]["gn"]["w"], p["block1"]["gn"]["b"], valid=valid))
    h = h + linear(_mish(temb), p["mlp"]["w"], p["mlp"]["b"])[:, None]
    h = conv1d(h * mask, p["block2"]["conv"]["w"], p["block2"]["conv"]["b"], padding="SAME_TORCH")
    h = _mish(_group_norm(h, p["block2"]["gn"]["w"], p["block2"]["gn"]["b"], valid=valid))
    return h + conv1d(xm, p["res"]["w"], p["res"]["b"])


def _tf_block(p: Dict, cfg: FlowRefConfig, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    B, T, C = x.shape
    H, dh = cfg.dec_num_heads, cfg.dec_attention_head_dim
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    q = linear(h, p["to_q"]["w"]).reshape(B, T, H, dh)
    k = linear(h, p["to_k"]["w"]).reshape(B, T, H, dh)
    v = linear(h, p["to_v"]["w"]).reshape(B, T, H, dh)
    if _flash_active():
        o = flash_mha(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), valid,
            scale=float(1.0 / np.sqrt(dh)), interpret=_FLASH_INTERPRET,
        )
        out = o.transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32) / np.sqrt(dh)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v, preferred_element_type=jnp.float32)
    x = x + linear(out.reshape(B, T, H * dh).astype(x.dtype), p["to_out"]["w"], p["to_out"]["b"])
    h = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"])
    h = linear(jax.nn.gelu(linear(h, p["ff1"]["w"], p["ff1"]["b"])), p["ff2"]["w"], p["ff2"]["b"])
    return x + h


def estimator_forward(
    params: Dict,
    cfg: FlowRefConfig,
    x: jnp.ndarray,       # [B, T, M] current sample
    mu: jnp.ndarray,      # [B, T, M] encoder output
    spk: jnp.ndarray,     # [B, M'] projected speaker embedding (80-d)
    cond: jnp.ndarray,    # [B, T, M] prompt-mel conditioning track
    t: jnp.ndarray,       # [B] flow time
    valid: jnp.ndarray,   # [B, T] bool
) -> jnp.ndarray:
    """One vector-field evaluation → [B, T, M]."""
    B, T, _ = x.shape
    mask = valid[:, :, None].astype(x.dtype)
    temb = _time_embedding(params["time_mlp"], cfg, t)
    spk_track = jnp.broadcast_to(spk[:, None, :], (B, T, spk.shape[-1]))
    h = jnp.concatenate([x, mu, spk_track.astype(x.dtype), cond], axis=-1)

    d = params["down"]
    h = _resnet(d["resnet"], h, mask, valid, temb)
    for tf in d["tf"]:
        h = _tf_block(tf, cfg, h * mask, valid)
    skip = h
    h = conv1d(h * mask, d["conv"]["w"], d["conv"]["b"], padding="SAME_TORCH")

    for m in params["mid"]:
        h = _resnet(m["resnet"], h, mask, valid, temb)
        for tf in m["tf"]:
            h = _tf_block(tf, cfg, h * mask, valid)

    u = params["up"]
    h = _resnet(u["resnet"], jnp.concatenate([h, skip], axis=-1), mask, valid, temb)
    for tf in u["tf"]:
        h = _tf_block(tf, cfg, h * mask, valid)
    h = conv1d(h * mask, u["conv"]["w"], u["conv"]["b"], padding="SAME_TORCH")

    f = params["final"]
    h = conv1d(h * mask, f["conv"]["w"], f["conv"]["b"], padding="SAME_TORCH")
    h = _mish(_group_norm(h, f["gn"]["w"], f["gn"]["b"], valid=valid))
    out = conv1d(h * mask, params["proj"]["w"], params["proj"]["b"])
    return out * mask


def cfm_generate(
    params: Dict,
    cfg: FlowRefConfig,
    key: jax.Array,
    mu: jnp.ndarray,      # [B, T, M]
    spk: jnp.ndarray,     # [B, 80]
    cond: jnp.ndarray,    # [B, T, M]
    valid: jnp.ndarray,   # [B, T]
) -> jnp.ndarray:
    """Cosine-warped Euler CFM sampling with CFG (inference_cfg_rate).

    The initial noise is sliced from a fixed-length buffer keyed per request,
    mirroring the reference's fixed ``rand_noise`` buffer: the noise at frame
    t is the same whatever the chunk length, so "full"-overlap re-synthesis
    of accumulated tokens reproduces earlier frames (seam stability)."""
    B, T, M = mu.shape
    if T <= _NOISE_FRAMES:
        x = jax.random.normal(key, (B, _NOISE_FRAMES, M), jnp.float32)[:, :T]
    else:
        x = jax.random.normal(key, (B, T, M), jnp.float32)
    steps = np.arange(cfg.n_timesteps + 1, dtype=np.float64) / cfg.n_timesteps
    t_span = (1.0 - np.cos(steps * 0.5 * np.pi)).astype(np.float32)
    w = cfg.inference_cfg_rate

    # CFG lanes batched together: [cond | uncond]
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    valid2 = jnp.concatenate([valid, valid], axis=0)

    def step(x, t_dt):
        t_i, dt = t_dt
        t = jnp.full((2 * B,), t_i)
        x2 = jnp.concatenate([x, x], axis=0).astype(mu.dtype)
        v = estimator_forward(params, cfg, x2, mu2, spk2, cond2, t, valid2)
        v = v.astype(jnp.float32)
        vc, vu = v[:B], v[B:]
        v = (1.0 + w) * vc - w * vu
        return x + dt * v, None

    xs = (jnp.asarray(t_span[:-1]), jnp.asarray(t_span[1:] - t_span[:-1]))
    x, _ = jax.lax.scan(step, x, xs)
    return x.astype(mu.dtype)
