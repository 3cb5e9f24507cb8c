"""Pallas decode attention v3: head-paired lanes + grid-bounded cache reads.

Why v3 (measured on this chip, scripts/decode_scaling_probe.py): the batched
decode step is ~86% linear in CACHE DEPTH — every step reads the full
S_max-deep KV cache regardless of fill, and all full-view kernels (XLA
included) plateau at the same ~200-300 GB/s. The only real lever is reading
fewer bytes. XLA cannot view-slice without materializing a copy
(BENCH_NOTES.md finding 1); a Pallas grid can simply stop at the filled
prefix.

Design (each point measured, see BENCH_NOTES.md r2):
* cache layout [B, Hp, S, 128]: adjacent kv-head PAIRS share a block's 128
  lanes (Dh=64 each), so every DMA tile is full-width — v2's half-lane
  [block_s, 64] tiles were one reason it lost to XLA. The paired cache is a
  FREE reshape of the seq-major per-token projections.
* grid (B, pair-groups): all pairs of a group travel in ONE BlockSpec block
  (≈1-2.6 MB DMA). A first v3 used a (B, Hp, S-blocks) grid of 128 KB tiles
  and was DMA-issue-bound (~0.55 ms fixed at 256 programs).
* ZERO relayout ops outside the kernel: q enters as [B, Hp, 2G, 64] and the
  output leaves the same way — both pure-metadata reshapes of the model's
  [B, H, Dh] tensors. (A block-diagonal-q variant needed 4 concats + a
  stack around the call; those small-tensor relayouts alone cost ~0.5 ms on
  this chip — more than the whole kernel.) The pair's two 64-lane halves
  are split INSIDE the kernel, where VMEM slicing is free.
* GQA-aware: the G query heads of a kv head ride extra rows of the same
  dot — the cache is never repeated (ADVICE r1 fix).
* the view fits VMEM, so softmax is single-pass; the current token's k/v
  fold in before normalization.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def pallas_enabled() -> bool:
    """Opt-in gate for the Pallas decode-attention path (CHATTERBOX_PALLAS=1).

    Keep-rationale (VERDICT r2 weak-3): v3 beats the XLA fused einsum by ~17%
    at full view in the microbench, but a ~0.5 ms per-invocation floor caps
    the grid-bounded-view win inside the 30-layer scan (601 vs 682 ms/slice —
    far short of a genuinely shallow cache), and it has no int8 path while
    int8 KV is the serving default. It stays opt-in for bf16-cache serving
    and as the base for future in-kernel int8; the v1/v2 studies were retired
    to docs/kernel_studies.md (history: git log ops/pallas_attention*.py).
    """
    return os.environ.get("CHATTERBOX_PALLAS", "0") == "1"

# target VMEM per k/v block (bytes); double-buffered by the pipeline
_BLOCK_BYTES = 1_100_000


def _kernel(
    start_ref,   # SMEM [B]
    pos_ref,     # SMEM [B]
    q_ref,       # VMEM [1, HpG, 2G, 64]  rows: [even-head queries | odd-head]
    k_ref,       # VMEM [1, HpG, view, 128]
    v_ref,       # VMEM [1, HpG, view, 128]
    kn_ref,      # VMEM [1, HpG, 1, 128]  current token's k (paired lanes)
    vn_ref,      # VMEM [1, HpG, 1, 128]
    o_ref,       # VMEM [1, HpG, 2G, 64]
    *,
    n_pairs: int,
    n_g: int,
    view: int,
    scale: float,
):
    b = pl.program_id(0)
    G = n_g
    start = start_ref[b]
    pos = pos_ref[b]
    idx = jax.lax.broadcasted_iota(jnp.int32, (2 * G, view), 1)
    valid = (idx >= start) & (idx < pos)

    for j in range(n_pairs):  # static unroll: n_pairs is small (≤ 8)
        q2 = q_ref[0, j].astype(jnp.float32)                 # [2G, 64]
        k = k_ref[0, j].astype(jnp.float32)                  # [view, 128]
        kn = kn_ref[0, j].astype(jnp.float32)                # [1, 128]
        vv = v_ref[0, j].astype(jnp.float32)                 # [view, 128]
        vn = vn_ref[0, j].astype(jnp.float32)                # [1, 128]

        def dots(qh, kh, knh):                               # per 64-lane half
            s = jax.lax.dot_general(                         # [G, view]
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ss = jax.lax.dot_general(                        # [G, 1]
                qh, knh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            return s * scale, ss * scale

        dh = q_ref.shape[-1]
        s_e, ss_e = dots(q2[:G], k[:, :dh], kn[:, :dh])
        s_o, ss_o = dots(q2[G:], k[:, dh:], kn[:, dh:])
        s = jnp.concatenate([s_e, s_o], axis=0)              # [2G, view]
        s_self = jnp.concatenate([ss_e, ss_o], axis=0)       # [2G, 1]
        s = jnp.where(valid, s, NEG_INF)

        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_self)   # [2G, 1]
        p = jnp.where(valid, jnp.exp(s - m), 0.0)            # [2G, view]
        p_self = jnp.exp(s_self - m)                         # [2G, 1]
        l = jnp.sum(p, axis=1, keepdims=True) + p_self       # [2G, 1]

        pv_e = jax.lax.dot_general(                          # [G, Dh]
            p[:G], vv[:, :dh], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + p_self[:G] * vn[:, :dh]
        pv_o = jax.lax.dot_general(
            p[G:], vv[:, dh:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) + p_self[G:] * vn[:, dh:]
        num = jnp.concatenate([pv_e, pv_o], axis=0)          # [2G, 64]
        o_ref[0, j, :, :] = (num / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "s_view", "pairs_per_block")
)
def paired_decode_attention(
    q: jnp.ndarray,        # [B, H, Dh] current-step queries (H = query heads)
    k_cache: jnp.ndarray,  # [B, Hp, S, 2*Dh] paired head-major cache
    v_cache: jnp.ndarray,  # [B, Hp, S, 2*Dh]
    k_new: jnp.ndarray,    # [B, Hk, Dh] current token's k (kv heads)
    v_new: jnp.ndarray,    # [B, Hk, Dh]
    start: jnp.ndarray,    # [B] int32 attention window start
    pos: jnp.ndarray,      # [B] int32 filled length (current token at pos)
    s_view: int | None = None,
    interpret: bool = False,
    pairs_per_block: int | None = None,
) -> jnp.ndarray:
    """→ [B, H, Dh]. Grid-bounded single-pass decode over the paired cache.

    Supports MHA (Hk == H) and GQA (H = G·Hk): the G query heads of each kv
    head ride extra rows — the cache is never repeated.
    """
    B, H, Dh = q.shape
    Hp = k_cache.shape[1]
    S = k_cache.shape[2]
    Hk = 2 * Hp
    assert H % Hk == 0, (H, Hk)
    G = H // Hk

    view = min(s_view, S) if s_view is not None else S
    per_pair = view * 2 * Dh * k_cache.dtype.itemsize
    if pairs_per_block is None:
        pairs_per_block = max(1, min(Hp, _BLOCK_BYTES // max(per_pair, 1)))
    while Hp % pairs_per_block:
        pairs_per_block -= 1
    n_groups = Hp // pairs_per_block

    # free metadata reshapes — no relayout ops around the kernel
    q_rows = q.reshape(B, Hp, 2 * G, Dh)
    kn = k_new.reshape(B, Hp, 1, 2 * Dh)
    vn = v_new.reshape(B, Hp, 1, 2 * Dh)

    grid = (B, n_groups)
    hpg = pairs_per_block
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_pairs=hpg, n_g=G, view=view, scale=1.0 / (Dh ** 0.5)
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, hpg, 2 * G, Dh), lambda b, g: (b, g, 0, 0)),
                pl.BlockSpec((1, hpg, view, 2 * Dh), lambda b, g: (b, g, 0, 0)),
                pl.BlockSpec((1, hpg, view, 2 * Dh), lambda b, g: (b, g, 0, 0)),
                pl.BlockSpec((1, hpg, 1, 2 * Dh), lambda b, g: (b, g, 0, 0)),
                pl.BlockSpec((1, hpg, 1, 2 * Dh), lambda b, g: (b, g, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hpg, 2 * G, Dh), lambda b, g: (b, g, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, 2 * G, Dh), q.dtype),
        interpret=interpret,
    )(start, pos, q_rows, k_cache, v_cache, kn, vn)

    return out.reshape(B, H, Dh)  # row order (pair, even/odd, group) == head order


def pack_cache_paired(kv: jnp.ndarray) -> jnp.ndarray:
    """[..., S, Hk, Dh] seq-major → [..., Hk//2, S, 2*Dh] paired head-major."""
    *lead, S, Hk, Dh = kv.shape
    x = jnp.moveaxis(kv.reshape(*lead, S, Hk // 2, 2 * Dh), -2, -3)
    return x


def new_token_paired(kv: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, Hk, Dh] current-token projection → [B, Hk//2, Dh*2] pairs."""
    B = kv.shape[0]
    Hk, Dh = kv.shape[2], kv.shape[3]
    return kv.reshape(B, Hk // 2, 2 * Dh)


# --------------------------------------------------------------------------
# Pipelined variant: manual multi-slot DMA ring.
#
# The BlockSpec pipeline above keeps only 2 buffers in flight, so at short
# views the 32 sequential per-batch-row DMAs serialize on issue latency
# (~0.55 ms floor regardless of bytes). This variant streams the cache
# itself: grid (1,), one DMA descriptor per batch row covering ALL pairs,
# NBUF rows in flight.
# --------------------------------------------------------------------------
def _pipelined_kernel(
    start_ref,   # SMEM [B]
    pos_ref,     # SMEM [B]
    q_ref,       # VMEM [B, Hp, 2G, 64]
    k_hbm,       # ANY  [B, Hp, S, 128]
    v_hbm,       # ANY  [B, Hp, S, 128]
    kn_ref,      # VMEM [B, Hp, 1, 128]
    vn_ref,      # VMEM [B, Hp, 1, 128]
    o_ref,       # VMEM [B, Hp, 2G, 64]
    kbuf,        # scratch VMEM [NBUF, Hp, view, 128]
    vbuf,        # scratch VMEM [NBUF, Hp, view, 128]
    sems,        # scratch DMA sems [NBUF, 2]
    *,
    n_batch: int,
    n_pairs: int,
    n_g: int,
    view: int,
    n_buf: int,
    scale: float,
):
    G = n_g

    def issue(b, slot):
        pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(0, view), :], kbuf.at[slot], sems.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(0, view), :], vbuf.at[slot], sems.at[slot, 1]
        ).start()

    def wait(b, slot):
        pltpu.make_async_copy(
            k_hbm.at[b, :, pl.ds(0, view), :], kbuf.at[slot], sems.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[b, :, pl.ds(0, view), :], vbuf.at[slot], sems.at[slot, 1]
        ).wait()

    # keep n_buf-1 DMAs in flight: the slot written by issue(b + n_buf - 1)
    # was consumed at iteration b-1, never the one being computed now
    for w in range(min(n_buf - 1, n_batch)):
        issue(w, w)

    def body(b, _):
        slot = jax.lax.rem(b, n_buf)

        @pl.when(b + n_buf - 1 < n_batch)
        def _():
            issue(b + n_buf - 1, jax.lax.rem(b + n_buf - 1, n_buf))

        wait(b, slot)

        start = start_ref[b]
        pos = pos_ref[b]
        idx = jax.lax.broadcasted_iota(jnp.int32, (2 * G, view), 1)
        valid = (idx >= start) & (idx < pos)
        for j in range(n_pairs):
            q2 = q_ref[b, j].astype(jnp.float32)             # [2G, 64]
            k = kbuf[slot, j].astype(jnp.float32)            # [view, 128]
            kn = kn_ref[b, j].astype(jnp.float32)            # [1, 128]
            vv = vbuf[slot, j].astype(jnp.float32)
            vn = vn_ref[b, j].astype(jnp.float32)

            def dots(qh, kh, knh):
                s = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                ss = jax.lax.dot_general(
                    qh, knh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                return s * scale, ss * scale

            dh = q_ref.shape[-1]
            s_e, ss_e = dots(q2[:G], k[:, :dh], kn[:, :dh])
            s_o, ss_o = dots(q2[G:], k[:, dh:], kn[:, dh:])
            s = jnp.concatenate([s_e, s_o], axis=0)
            s_self = jnp.concatenate([ss_e, ss_o], axis=0)
            s = jnp.where(valid, s, NEG_INF)
            m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_self)
            p = jnp.where(valid, jnp.exp(s - m), 0.0)
            p_self = jnp.exp(s_self - m)
            l = jnp.sum(p, axis=1, keepdims=True) + p_self
            pv_e = jax.lax.dot_general(
                p[:G], vv[:, :dh], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) + p_self[:G] * vn[:, :dh]
            pv_o = jax.lax.dot_general(
                p[G:], vv[:, dh:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) + p_self[G:] * vn[:, dh:]
            num = jnp.concatenate([pv_e, pv_o], axis=0)
            o_ref[b, j, :, :] = (num / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        return ()

    jax.lax.fori_loop(0, n_batch, body, ())


@functools.partial(
    jax.jit, static_argnames=("s_view", "n_buf", "interpret")
)
def paired_decode_attention_pipelined(
    q: jnp.ndarray,        # [B, H, Dh]
    k_cache: jnp.ndarray,  # [B, Hp, S, 2*Dh] paired head-major cache
    v_cache: jnp.ndarray,  # [B, Hp, S, 2*Dh]
    k_new: jnp.ndarray,    # [B, Hk, Dh]
    v_new: jnp.ndarray,    # [B, Hk, Dh]
    start: jnp.ndarray,    # [B] int32
    pos: jnp.ndarray,      # [B] int32
    s_view: int | None = None,
    n_buf: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    B, H, Dh = q.shape
    Hp = k_cache.shape[1]
    S = k_cache.shape[2]
    Hk = 2 * Hp
    assert H % Hk == 0
    G = H // Hk
    view = min(s_view, S) if s_view is not None else S
    # keep the ring within ~8 MB of VMEM (k+v)
    while n_buf > 2 and n_buf * Hp * view * 2 * Dh * k_cache.dtype.itemsize * 2 > 8_400_000:
        n_buf -= 1

    q_rows = q.reshape(B, Hp, 2 * G, Dh)
    kn = k_new.reshape(B, Hp, 1, 2 * Dh)
    vn = v_new.reshape(B, Hp, 1, 2 * Dh)

    out = pl.pallas_call(
        functools.partial(
            _pipelined_kernel,
            n_batch=B, n_pairs=Hp, n_g=G, view=view, n_buf=n_buf,
            scale=1.0 / (Dh ** 0.5),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_buf, Hp, view, 2 * Dh), k_cache.dtype),
                pltpu.VMEM((n_buf, Hp, view, 2 * Dh), v_cache.dtype),
                pltpu.SemaphoreType.DMA((n_buf, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, 2 * G, Dh), q.dtype),
        interpret=interpret,
    )(start, pos, q_rows, k_cache, v_cache, kn, vn)
    return out.reshape(B, H, Dh)
