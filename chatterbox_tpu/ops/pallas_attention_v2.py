"""Pallas decode attention v2: head-major cache layout, zero transposes.

v1 (pallas_attention.py) keeps the cache in the XLA-friendly [B, S, H, Dh]
layout and pays an in-kernel relayout per block. v2 expects the cache stored
head-major — [B, H, S, Dh] — so every block the kernel touches is already a
contiguous [block_s, Dh] tile: the score and value dots hit the MXU directly
and the DMA stream is strictly sequential per (batch, head).

Grid: (B, H, S_blocks); accumulators persist across the sequential S_blocks
axis in VMEM scratch. ``s_view`` bounds the grid — reading only the filled
cache prefix costs nothing.

Singleton-dim inputs (q, k_new, v_new, out) travel as [B, H, 1, Dh] so all
block shapes satisfy the TPU tiling rules (trailing dims equal array dims).

Status (measured on TPU v5e, chained-loop benchmark, B=32 H=16 S=1280 bf16):
XLA's fused attention: 0.81 ms/step (207 GB/s effective); this kernel:
1.11 ms full / 0.85 ms at a 640-entry view. Both are overhead-bound, not
bandwidth-bound (~25% of HBM peak) — per-(b,h) streams are only 64 lanes
wide (Dh=64 of 128). A head-paired prototype (blocks spanning the full 128
lanes via a block-diagonal q expansion) was also measured: 0.73 ms/step —
only ~10% over XLA, i.e. every variant (XLA included) plateaus ~200-230 GB/s
on this runtime, so the step is latency-bound somewhere above the kernel.
Until that ceiling is understood, the XLA path remains the production
default and this kernel is experimental.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(
    start_ref,   # SMEM [B]
    pos_ref,     # SMEM [B]
    q_ref,       # VMEM [1, 1, 1, Dh]
    k_ref,       # VMEM [1, 1, block_s, Dh]
    v_ref,       # VMEM [1, 1, block_s, Dh]
    knew_ref,    # VMEM [1, 1, 1, Dh]
    vnew_ref,    # VMEM [1, 1, 1, Dh]
    o_ref,       # VMEM [1, 1, 1, Dh]
    m_ref,       # scratch SMEM [1]
    l_ref,       # scratch SMEM [1]
    acc_ref,     # scratch VMEM [8, Dh] (row 0 used; 8 for sublane tiling)
    *,
    block_s: int,
    scale: float,
):
    b = pl.program_id(0)
    sb = pl.program_id(2)
    n_sb = pl.num_programs(2)

    @pl.when(sb == 0)
    def _init():
        m_ref[0] = NEG_INF
        l_ref[0] = 0.0
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)                 # [1, Dh]
    k = k_ref[0, 0].astype(jnp.float32)                 # [Sb, Dh]
    s = jax.lax.dot_general(                            # [1, Sb]
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    idx = sb * block_s + jax.lax.broadcasted_iota(jnp.int32, (1, block_s), 1)
    valid = (idx >= start_ref[b]) & (idx < pos_ref[b])
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[0]
    m_new = jnp.maximum(m_prev, jnp.max(s))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                              # [1, Sb]
    l_ref[0] = l_ref[0] * alpha + jnp.sum(p)
    v = v_ref[0, 0].astype(jnp.float32)                 # [Sb, Dh]
    pv = jax.lax.dot_general(                           # [1, Dh]
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_ref[0:1, :] = acc_ref[0:1, :] * alpha + pv
    m_ref[0] = m_new

    @pl.when(sb == n_sb - 1)
    def _finish():
        kn = knew_ref[0, 0].astype(jnp.float32)         # [1, Dh]
        s_self = jnp.sum(q * kn) * scale
        m_prev2 = m_ref[0]
        m_fin = jnp.maximum(m_prev2, s_self)
        alpha2 = jnp.exp(m_prev2 - m_fin)
        p_self = jnp.exp(s_self - m_fin)
        l_fin = l_ref[0] * alpha2 + p_self
        vn = vnew_ref[0, 0].astype(jnp.float32)         # [1, Dh]
        num = acc_ref[0:1, :] * alpha2 + p_self * vn
        o_ref[0, 0, :, :] = (num / jnp.maximum(l_fin, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret", "s_view"))
def pallas_decode_attention_hmajor(
    q: jnp.ndarray,        # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, H, S, Dh]  (head-major!)
    v_cache: jnp.ndarray,  # [B, H, S, Dh]
    k_new: jnp.ndarray,    # [B, H, Dh]
    v_new: jnp.ndarray,    # [B, H, Dh]
    start: jnp.ndarray,    # [B] int32
    pos: jnp.ndarray,      # [B] int32
    block_s: int = 256,
    interpret: bool = False,
    s_view: int | None = None,
) -> jnp.ndarray:
    """→ [B, H, Dh]. Requires S % block_s == 0 OR view within full blocks."""
    B, H, Dh = q.shape
    S = k_cache.shape[2]
    view = min(s_view, S) if s_view is not None else S
    n_sb = max(1, (view + block_s - 1) // block_s)
    assert n_sb * block_s <= S or S % block_s == 0, (
        "cache length must be a block multiple (see T3Config.max_seq_len)"
    )

    q4 = q[:, :, None, :]
    kn4 = k_new[:, :, None, :]
    vn4 = v_new[:, :, None, :]
    grid = (B, H, n_sb)
    out = pl.pallas_call(
        functools.partial(_kernel, block_s=block_s, scale=1.0 / (Dh ** 0.5)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, Dh), lambda b, h, sb: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_s, Dh), lambda b, h, sb: (b, h, sb, 0)),
                pl.BlockSpec((1, 1, block_s, Dh), lambda b, h, sb: (b, h, sb, 0)),
                pl.BlockSpec((1, 1, 1, Dh), lambda b, h, sb: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, Dh), lambda b, h, sb: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, Dh), lambda b, h, sb: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.float32),
                pltpu.SMEM((1,), jnp.float32),
                pltpu.VMEM((8, Dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, Dh), q.dtype),
        interpret=interpret,
    )(start, pos, q4, k_cache, v_cache, kn4, vn4)
    return out[:, :, 0, :]
