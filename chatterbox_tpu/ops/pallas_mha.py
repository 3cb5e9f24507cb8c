"""Pallas flash (tiled online-softmax) bidirectional MHA for TPU.

Why: the CFM estimator's transformer blocks (models/s3gen_ref/decoder.py)
and the upsample-conformer attention materialize [B, H, T, T] f32 score
tensors in HBM — at production shapes (T = 640–2,700 frames, 16 blocks × 20
estimator evals per chunk) that is ~1 GB of HBM traffic per estimator eval,
dominating S3Gen stage time. A flash kernel keeps every intermediate in
VMEM: traffic drops to the q/k/v/out tensors themselves.

Semantics match the XLA path in decoder._tf_block exactly (modulo fp
reassociation): bidirectional attention with a KEY-validity mask; rows whose
key set is empty return 0. f32 accumulation, bf16-safe inputs.

Grid (B, H, nq, nk): the kv axis iterates fastest; running max/sum and the
output accumulator live in VMEM scratch across the nk sweep and the
rescaled result is written once at the last kv block (classic
flash-attention recurrence, computed in f32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _mha_kernel(
    valid_ref,   # VMEM [1, 1, bk] int32 key validity for this kv block
    q_ref,       # VMEM [1, 1, bq, dh]
    k_ref,       # VMEM [1, 1, bk, dh]
    v_ref,       # VMEM [1, 1, bk, dh]
    o_ref,       # VMEM [1, 1, bq, dh]
    m_scr,       # scratch VMEM [bq, 128] f32 running max
    l_scr,       # scratch VMEM [bq, 128] f32 running denom
    acc_scr,     # scratch VMEM [bq, dh] f32 running numerator
    *,
    n_k: int,
    scale: float,
):
    jk = pl.program_id(3)

    @pl.when(jk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)                    # [bq, dh]
    k = k_ref[0, 0].astype(jnp.float32)                    # [bk, dh]
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(                               # [bq, bk]
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    kmask = (valid_ref[0, 0] > 0)[None, :]                 # [1, bk]
    s = jnp.where(kmask, s, NEG_INF)

    m_prev = m_scr[:, :1]                                  # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)              # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.where(kmask, jnp.exp(s - m_new), 0.0)          # [bq, bk]
    alpha = jnp.exp(m_prev - m_new)                        # [bq, 1]
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc = acc_scr[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[...] = acc

    @pl.when(jk == n_k - 1)
    def _finish():
        # fully-masked rows (key set empty) → 0, matching "garbage rows are
        # zeroed by the caller's mask" without producing inf/nan here
        denom = jnp.maximum(l_scr[:, :1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_mha(
    q: jnp.ndarray,        # [B, H, T, dh]
    k: jnp.ndarray,        # [B, H, T, dh]
    v: jnp.ndarray,        # [B, H, T, dh]
    valid: jnp.ndarray,    # [B, T] bool key validity
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ [B, H, T, dh]. Bidirectional masked attention, zero HBM
    intermediates. T is padded to the block size internally; padded keys are
    masked off, padded query rows are dropped on return."""
    B, H, T, dh = q.shape
    if scale is None:
        scale = 1.0 / (dh ** 0.5)
    # pad to a common multiple of BOTH block sizes: n_q/n_k below truncate,
    # so a max()-only pad would silently drop trailing kv blocks whenever
    # the two sizes aren't mutually divisible
    import math

    step = math.lcm(block_q, block_k)
    Tp = -(-T // step) * step
    if Tp != T:
        pad = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    # [B, 1, Tp]: Mosaic requires each block's trailing two dims be divisible
    # by (8, 128) or equal to the array's — a (1, block_k) block on a 2-D
    # [B, Tp] mask violates the sublane rule (1 ∤ 8, 1 ≠ B) and only passed
    # in interpret mode; the singleton middle axis makes the block dims
    # (1, block_k) legal against array dims (1, Tp)
    vmask = (
        jnp.zeros((B, 1, Tp), jnp.int32).at[:, 0, :T].set(valid.astype(jnp.int32))
    )

    n_q = Tp // block_q
    n_k = Tp // block_k
    grid = (B, H, n_q, n_k)
    qo_spec = pl.BlockSpec((1, 1, block_q, dh), lambda b, h, iq, jk: (b, h, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, block_k, dh), lambda b, h, iq, jk: (b, h, jk, 0))
    valid_spec = pl.BlockSpec((1, 1, block_k), lambda b, h, iq, jk: (b, 0, jk))
    out = pl.pallas_call(
        functools.partial(_mha_kernel, n_k=n_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[valid_spec, qo_spec, kv_spec, kv_spec],
            out_specs=qo_spec,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, dh), q.dtype),
        interpret=interpret,
    )(vmask, q, k, v)
    return out[:, :, :T]
