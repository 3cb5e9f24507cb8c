"""Pallas TPU kernel: fused decode attention against a static KV cache.

One decode step attends a single query token per (batch row, head) to the
row's cache [S, Dh] plus the freshly-computed K/V of the current token. The
kernel streams the cache in S-blocks with an online (flash-style) softmax —
masking, score scaling, softmax and the weighted V-sum all happen in VMEM in
one pass, so the [B, H, S] score tensor never materializes in HBM.

Grid: (B, H, S_blocks), sequential on TPU; per-(b,h) accumulators live in
VMEM scratch and persist across the S_block dimension (the innermost,
sequential grid axis). The "self" term (current token) folds in at the last
block, and the output is written once.

Used by the T3 decode step when CHATTERBOX_PALLAS=1 (see models/t3/model.py);
the jnp path remains the fallback and the numerical reference.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _decode_attn_kernel(
    start_ref,   # SMEM [1]
    pos_ref,     # SMEM [1]
    q_ref,       # VMEM [1, 1, Dh]
    k_ref,       # VMEM [1, Sb, Dh]  (head-sliced cache block)
    v_ref,       # VMEM [1, Sb, Dh]
    knew_ref,    # VMEM [1, 1, Dh]
    vnew_ref,    # VMEM [1, 1, Dh]
    o_ref,       # VMEM [1, 1, Dh]
    m_ref,       # scratch [1, 1] running max
    l_ref,       # scratch [1, 1] running denom
    acc_ref,     # scratch [1, Dh] running numerator
    *,
    block_s: int,
    scale: float,
):
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)

    @pl.when(sb == 0)
    def _init():
        m_ref[0, 0] = NEG_INF
        l_ref[0, 0] = 0.0
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)          # [1, Dh]
    k = k_ref[0, :, 0, :].astype(jnp.float32)  # [Sb, Dh]
    s = jax.lax.dot_general(                  # [1, Sb]
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    # mask: absolute cache index must be in [start, pos)
    base = sb * block_s
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    valid = (idx >= start_ref[0]) & (idx < pos_ref[0])
    s = jnp.where(valid, s, NEG_INF)

    # online softmax update
    m_prev = m_ref[0, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                    # [1, Sb]
    l_ref[0, 0] = l_ref[0, 0] * alpha + jnp.sum(p)
    v = v_ref[0, :, 0, :].astype(jnp.float32)  # [Sb, Dh]
    pv = jax.lax.dot_general(                 # [1, Dh]
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[:, :] = acc_ref[:, :] * alpha + pv
    m_ref[0, 0] = m_new

    @pl.when(sb == n_sb - 1)
    def _finish():
        # fold in the current token's own K/V (always attended)
        kn = knew_ref[0].astype(jnp.float32)  # [1, Dh]
        s_self = jnp.sum(q * kn) * scale
        m_prev2 = m_ref[0, 0]
        m_fin = jnp.maximum(m_prev2, s_self)
        alpha2 = jnp.exp(m_prev2 - m_fin)
        p_self = jnp.exp(s_self - m_fin)
        l_fin = l_ref[0, 0] * alpha2 + p_self
        vn = vnew_ref[0].astype(jnp.float32)  # [1, Dh]
        num = acc_ref[:, :] * alpha2 + p_self * vn
        o_ref[0, :, :] = (num / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def pallas_decode_attention(
    q: jnp.ndarray,        # [B, H, Dh] (single decode step, squeezed)
    k_cache: jnp.ndarray,  # [B, S, H, Dh]
    v_cache: jnp.ndarray,  # [B, S, H, Dh]
    k_new: jnp.ndarray,    # [B, H, Dh]
    v_new: jnp.ndarray,    # [B, H, Dh]
    start: jnp.ndarray,    # [B] int32
    pos: jnp.ndarray,      # [B] int32
    block_s: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ attention output [B, H, Dh]."""
    B, H, Dh = q.shape
    S = k_cache.shape[1]
    if S % block_s != 0:
        pad = block_s - S % block_s
        padw = ((0, 0), (0, pad), (0, 0), (0, 0))
        k_cache = jnp.pad(k_cache, padw)
        v_cache = jnp.pad(v_cache, padw)
        S += pad
    n_sb = S // block_s
    scale = 1.0 / (Dh ** 0.5)

    grid = (B, H, n_sb)
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, block_s=block_s, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1,), lambda b, h, sb: (b,), memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda b, h, sb: (b,), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, Dh), lambda b, h, sb: (b, h, 0)),
                pl.BlockSpec((1, block_s, 1, Dh), lambda b, h, sb: (b, sb, h, 0)),
                pl.BlockSpec((1, block_s, 1, Dh), lambda b, h, sb: (b, sb, h, 0)),
                pl.BlockSpec((1, 1, Dh), lambda b, h, sb: (b, h, 0)),
                pl.BlockSpec((1, 1, Dh), lambda b, h, sb: (b, h, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, Dh), lambda b, h, sb: (b, h, 0)),
            scratch_shapes=[
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.SMEM((1, 1), jnp.float32),
                pltpu.VMEM((1, Dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        interpret=interpret,
    )(start, pos, q, k_cache, v_cache, k_new, v_new)
    return out


def pallas_enabled() -> bool:
    return os.environ.get("CHATTERBOX_PALLAS", "0") == "1"
