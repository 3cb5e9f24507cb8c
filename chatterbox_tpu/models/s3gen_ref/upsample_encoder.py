"""UpsampleConformerEncoder: the flow's token encoder (checkpoint-compatible).

Publicly known CosyVoice2 layout (``flow.encoder.*`` of ``s3gen.safetensors``):
linear embed (×√D scale, ESPnet rel-pos convention) → pre-lookahead conv
(look-ahead 3 + causal k3, residual) → N conformer blocks (rel-pos self-attn
with pos_bias_u/v, SiLU feed-forward, pre-norm) → nearest ×2 upsample +
causal k5 conv → second linear embed → M conformer blocks → final LayerNorm.

The ESPnet relative-position term is implemented as a static-shape GATHER
over an ascending sinusoid table instead of the reference's pad-and-shift
trick; tests/test_s3gen_ref.py::test_rel_pos_attention_matches_espnet_shift
proves the two formulations equal.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.initializers import dense_init, rng_stream
from ...ops.nn import NEG_INF, layer_norm, linear
from .config import FlowRefConfig


@lru_cache(maxsize=32)
def _rel_pos_table_np(T: int, d: int) -> np.ndarray:
    """[2T-1, d] sinusoid table, ascending in relative distance
    r = k - (T-1) ∈ [-(T-1), T-1] (the flip of ESPnet's descending pe)."""
    r = (np.arange(2 * T - 1) - (T - 1))[:, None].astype(np.float64)
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    table = np.zeros((2 * T - 1, d))
    table[:, 0::2] = np.sin(r * div)
    table[:, 1::2] = np.cos(r * div)
    return table.astype(np.float32)


def _rel_pos_table(T: int, d: int) -> np.ndarray:
    return _rel_pos_table_np(T, d)


def init_conformer_block(rngs, D: int, H: int, units: int, dtype) -> Dict:
    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    dk = D // H
    return {
        "attn": {
            "q": {"w": mk(D, D), "b": mk(D)},
            "k": {"w": mk(D, D), "b": mk(D)},
            "v": {"w": mk(D, D), "b": mk(D)},
            "out": {"w": mk(D, D), "b": mk(D)},
            "pos": {"w": mk(D, D)},
            "bias_u": mk(H, dk),
            "bias_v": mk(H, dk),
        },
        "norm_mha": {"w": mk(D), "b": mk(D)},
        "ff": {"w1": {"w": mk(D, units), "b": mk(units)}, "w2": {"w": mk(units, D), "b": mk(D)}},
        "norm_ff": {"w": mk(D), "b": mk(D)},
    }


def init_upsample_encoder_params(key: jax.Array, cfg: FlowRefConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)
    E = cfg.input_size

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    def mk_embed():
        return {"lin": {"w": mk(E, E), "b": mk(E)}, "ln": {"w": mk(E), "b": mk(E)}}

    return {
        "embed": mk_embed(),
        "lookahead": {
            "conv1": {"w": mk(cfg.pre_lookahead_len + 1, E, E), "b": mk(E)},
            "conv2": {"w": mk(3, E, E), "b": mk(E)},
        },
        "blocks": [
            init_conformer_block(rngs, E, cfg.attention_heads, cfg.linear_units, dtype)
            for _ in range(cfg.num_blocks)
        ],
        "up_conv": {"w": mk(2 * cfg.up_stride + 1, E, E), "b": mk(E)},
        "up_embed": mk_embed(),
        "up_blocks": [
            init_conformer_block(rngs, E, cfg.attention_heads, cfg.linear_units, dtype)
            for _ in range(cfg.num_up_blocks)
        ],
        "after_norm": {"w": mk(E), "b": mk(E)},
    }


def _rel_pos_attention(
    p: Dict, cfg: FlowRefConfig, x: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """ESPnet RelPositionMultiHeadedAttention, gather-based bd term.

    scores[i,j] = ((q_i+u)·k_j + (q_i+v)·pos[(T-1)+(i-j)]) / √dk, keys masked.
    """
    B, T, E = x.shape
    H = cfg.attention_heads
    dk = E // H
    q = linear(x, p["q"]["w"], p["q"]["b"]).reshape(B, T, H, dk)
    k = linear(x, p["k"]["w"], p["k"]["b"]).reshape(B, T, H, dk)
    v = linear(x, p["v"]["w"], p["v"]["b"]).reshape(B, T, H, dk)
    table = jnp.asarray(_rel_pos_table_np(T, E), x.dtype)
    pos = linear(table, p["pos"]["w"]).reshape(2 * T - 1, H, dk)

    qu = q + p["bias_u"][None, None]
    qv = q + p["bias_v"][None, None]
    ac = jnp.einsum("bihd,bjhd->bhij", qu, k, preferred_element_type=jnp.float32)
    # bd[i, j] = qv_i · pos[(T-1) + (i-j)] via the ESPnet pad-and-shift trick
    # (pure pad/reshape/slice — a take_along_axis gather here lowers to
    # element-wise TPU gathers and dominated the whole chunk at ~25x the
    # matmul cost; equivalence proven in test_rel_pos_attention_matches_espnet_shift)
    pos_desc = pos[::-1]  # descending in r, the ESPnet table order
    bd_full = jnp.einsum("bihd,khd->bhik", qv, pos_desc, preferred_element_type=jnp.float32)
    x_p = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))        # [B,H,T,2T]
    x_p = x_p.reshape(B, H, 2 * T, T)[:, :, 1:]                     # drop row
    bd = x_p.reshape(B, H, T, 2 * T - 1)[..., :T]
    scores = (ac + bd) / np.sqrt(dk)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", probs, v, preferred_element_type=jnp.float32)
    return linear(out.reshape(B, T, E).astype(x.dtype), p["out"]["w"], p["out"]["b"])


def _conformer_stack(
    blocks: List[Dict], cfg: FlowRefConfig, x: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    for blk in blocks:
        h = layer_norm(x, blk["norm_mha"]["w"], blk["norm_mha"]["b"])
        x = x + _rel_pos_attention(blk["attn"], cfg, h, valid)
        h = layer_norm(x, blk["norm_ff"]["w"], blk["norm_ff"]["b"])
        h = linear(jax.nn.silu(linear(h, blk["ff"]["w1"]["w"], blk["ff"]["w1"]["b"])),
                   blk["ff"]["w2"]["w"], blk["ff"]["w2"]["b"])
        x = x + h
    return x


def _embed(p: Dict, x: jnp.ndarray, keep_dtype: bool = False) -> jnp.ndarray:
    """LinearNoSubsampling + the rel-pos encoder's ×√D input scale.

    The f32 scale constant is the site that promotes the whole downstream
    flow chain to f32 when weights are bf16 (linear/layer_norm follow their
    input's dtype). ``keep_dtype`` (cfg.bf16_activations) applies the scale
    in the chain's own dtype instead — the bf16-flow serving lever."""
    h = layer_norm(linear(x, p["lin"]["w"], p["lin"]["b"]), p["ln"]["w"], p["ln"]["b"])
    scale = np.sqrt(h.shape[-1])
    if keep_dtype:
        return h * jnp.asarray(scale, h.dtype)
    return h * scale.astype(np.float32)


def upsample_encode(
    params: Dict,
    cfg: FlowRefConfig,
    x: jnp.ndarray,       # [B, T, E] embedded tokens (invalid positions zeroed)
    valid: jnp.ndarray,   # [B, T] bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ ([B, T*up_stride, E], upsampled valid mask)."""
    x = jnp.where(
        valid[:, :, None], _embed(params["embed"], x, cfg.bf16_activations), 0.0
    )

    # pre-lookahead: conv1 sees `pre_lookahead_len` future frames, conv2 causal
    la = params["lookahead"]
    h = jnp.pad(x, ((0, 0), (0, cfg.pre_lookahead_len), (0, 0)))
    h = jax.nn.leaky_relu(conv1d(h, la["conv1"]["w"], la["conv1"]["b"], padding="VALID"), 0.01)
    h = conv1d(h, la["conv2"]["w"], la["conv2"]["b"], padding="CAUSAL")
    x = x + h
    x = jnp.where(valid[:, :, None], x, 0.0)

    x = _conformer_stack(params["blocks"], cfg, x, valid)

    # nearest ×stride upsample → left-pad 2·stride → conv (k = 2·stride+1)
    s = cfg.up_stride
    B, T, E = x.shape
    x = jnp.where(valid[:, :, None], x, 0.0)
    up = jnp.repeat(x, s, axis=1)
    up = jnp.pad(up, ((0, 0), (2 * s, 0), (0, 0)))
    up = conv1d(up, params["up_conv"]["w"], params["up_conv"]["b"], padding="VALID")
    valid_up = jnp.repeat(valid, s, axis=1)

    up = jnp.where(
        valid_up[:, :, None], _embed(params["up_embed"], up, cfg.bf16_activations), 0.0
    )
    up = _conformer_stack(params["up_blocks"], cfg, up, valid_up)
    up = layer_norm(up, params["after_norm"]["w"], params["after_norm"]["b"])
    return up, valid_up
