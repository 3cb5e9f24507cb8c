"""Pallas TPU kernel: fused decode attention against a static KV cache.

One decode step attends a single query token per batch row to the row's cache
plus the freshly-computed K/V of the current token. The kernel streams the
cache in S-blocks with an online (flash-style) softmax — masking, score
scaling, softmax and the weighted V-sum all happen in VMEM in one pass, so
the [B, H, S] score tensor never materializes in HBM.

Layout: grid (B, S_blocks), sequential on TPU; each program processes ALL
heads of one batch row for one cache block (blocks must cover the trailing
[H, Dh] dims to satisfy TPU tiling rules). Per-row accumulators live in VMEM
scratch and persist across the S_block axis (the innermost, sequential grid
dimension). The "self" term (current token) folds in at the last block.

``s_view`` bounds the read to the first s_view cache entries by SHRINKING THE
GRID — no slice, no copy: the DMA never touches blocks past the view. This is
the copy-free form of view bucketing (an XLA slice materializes the sliced
cache every step — measured 2-3x slower at batch 32).

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
    start_ref,   # SMEM [B]
    pos_ref,     # SMEM [B]
    q_ref,       # VMEM [1, H, Dh]
    k_ref,       # VMEM [1, Sb, H, Dh]
    v_ref,       # VMEM [1, Sb, H, Dh]
    knew_ref,    # VMEM [1, H, Dh]
    vnew_ref,    # VMEM [1, H, Dh]
    o_ref,       # VMEM [1, H, Dh]
    m_ref,       # scratch VMEM [H, 1] running max
    l_ref,       # scratch VMEM [H, 1] running denom
    acc_ref,     # scratch VMEM [H, Dh] running numerator
    *,
    block_s: int,
    scale: float,
):
    b = pl.program_id(0)
    sb = pl.program_id(1)
    n_sb = pl.num_programs(1)

    @pl.when(sb == 0)
    def _init():
        m_ref[:, :] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:, :] = jnp.zeros_like(l_ref)
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)                    # [H, Dh]
    k = k_ref[0].astype(jnp.float32)                    # [Sb, H, Dh]
    kT = jnp.transpose(k, (1, 0, 2))                    # [H, Sb, Dh]
    # per-head scores: [H, 1, Sb] → [H, Sb]
    s = jax.lax.dot_general(
        q[:, None, :], kT, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :] * scale

    idx = sb * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    valid = (idx >= start_ref[b]) & (idx < pos_ref[b])  # [1, Sb]
    s = jnp.where(valid, s, NEG_INF)

    # online softmax update (per head)
    m_prev = m_ref[:, 0]                                # [H]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, None])                     # [H, Sb]
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    vT = jnp.transpose(v_ref[0].astype(jnp.float32), (1, 0, 2))  # [H, Sb, Dh]
    pv = jax.lax.dot_general(
        p[:, None, :], vT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]                                          # [H, Dh]
    acc_ref[:, :] = acc_ref[:, :] * alpha[:, None] + pv
    m_ref[:, 0] = m_new

    @pl.when(sb == n_sb - 1)
    def _finish():
        # fold in the current token's own K/V (always attended)
        kn = knew_ref[0].astype(jnp.float32)            # [H, Dh]
        s_self = jnp.sum(q * kn, axis=1) * scale        # [H]
        m_prev2 = m_ref[:, 0]
        m_fin = jnp.maximum(m_prev2, s_self)
        alpha2 = jnp.exp(m_prev2 - m_fin)
        p_self = jnp.exp(s_self - m_fin)
        l_fin = l_ref[:, 0] * alpha2 + p_self
        vn = vnew_ref[0].astype(jnp.float32)            # [H, Dh]
        num = acc_ref[:, :] * alpha2[:, None] + p_self[:, None] * vn
        o_ref[0, :, :] = (num / jnp.maximum(l_fin, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret", "s_view"))
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
    s_view: int | None = None,
) -> jnp.ndarray:
    """→ attention output [B, H, Dh]. Caller guarantees max(pos) <= s_view."""
    B, H, Dh = q.shape
    S = k_cache.shape[1]
    view = min(s_view, S) if s_view is not None else S
    if S % block_s != 0 and view > (S // block_s) * block_s:
        # partial tail block would clamp+misalign; pad (copy) as a fallback.
        # Hot paths avoid this: T3Config.max_seq_len is a block multiple.
        pad = block_s - S % block_s
        padw = ((0, 0), (0, pad), (0, 0), (0, 0))
        k_cache = jnp.pad(k_cache, padw)
        v_cache = jnp.pad(v_cache, padw)
        S += pad
        view = min(view + pad, S)
    n_sb = max(1, (view + block_s - 1) // block_s)

    grid = (B, n_sb)
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, block_s=block_s, scale=1.0 / (Dh ** 0.5)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, H, Dh), lambda b, sb: (b, 0, 0)),
                pl.BlockSpec((1, block_s, H, Dh), lambda b, sb: (b, sb, 0, 0)),
                pl.BlockSpec((1, block_s, H, Dh), lambda b, sb: (b, sb, 0, 0)),
                pl.BlockSpec((1, H, Dh), lambda b, sb: (b, 0, 0)),
                pl.BlockSpec((1, H, Dh), lambda b, sb: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, Dh), lambda b, sb: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, Dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
        interpret=interpret,
    )(start, pos, q, k_cache, v_cache, k_new, v_new)
    return out


def pallas_enabled() -> bool:
    return os.environ.get("CHATTERBOX_PALLAS", "0") == "1"
