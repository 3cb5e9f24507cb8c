#!/usr/bin/env python
"""Microbenchmark decode-attention implementations on the local accelerator.

Uses a chained jitted loop (each iteration's output feeds the next query) so
per-call latency is measured with ONE dispatch and ONE sync — host-synced
harnesses measure the tunnel round-trip (~30 ms here), and pipelined
harnesses under-report (the runtime acks before completion on this platform).

Usage: python scripts/kernel_bench.py [--slots 16] [--seq 1280] [--reps 64]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1280)
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from chatterbox_tpu.models.t3.model import _quantize_kv
    from chatterbox_tpu.ops.pallas_attention_v3 import (
        pack_cache_paired,
        pack_scales_paired,
        paired_decode_attention,
    )

    # v1/v2 retired to docs/kernel_studies.md (r3); their numbers are recorded
    # there and in BENCH_NOTES.md.

    B, H, Dh, S = 2 * args.slots, 16, 64, args.seq
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q0 = jax.random.normal(ks[0], (B, H, Dh), jnp.bfloat16)
    kc_sh = jax.random.normal(ks[1], (B, S, H, Dh), jnp.bfloat16)   # seq-major
    vc_sh = jax.random.normal(ks[2], (B, S, H, Dh), jnp.bfloat16)
    kn = jax.random.normal(ks[3], (B, H, Dh), jnp.bfloat16)
    vn = jax.random.normal(ks[4], (B, H, Dh), jnp.bfloat16)
    start = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), min(500, S), jnp.int32)

    def ref_xla(q):
        sc = jnp.einsum("bhd,bshd->bhs", q, kc_sh, preferred_element_type=jnp.float32) / (Dh ** 0.5)
        idx = jnp.arange(S)[None, None, :]
        sc = jnp.where((idx >= start[:, None, None]) & (idx < pos[:, None, None]), sc, -1e9)
        ss = jnp.einsum("bhd,bhd->bh", q, kn, preferred_element_type=jnp.float32)[..., None] / (Dh ** 0.5)
        p = jax.nn.softmax(jnp.concatenate([sc, ss], -1), -1)
        o = jnp.einsum("bhs,bshd->bhd", p[..., :S].astype(jnp.bfloat16), vc_sh, preferred_element_type=jnp.float32)
        return (o + p[..., S:] * vn.astype(jnp.float32)).astype(jnp.bfloat16)

    def chain(fn):
        @jax.jit
        def run(q):
            def body(i, qq):
                return qq + fn(qq).astype(qq.dtype) * 1e-6

            return jax.lax.fori_loop(0, args.reps, body, q)

        return run

    cases = [
        ("xla fused (seq-major)", ref_xla),
    ]
    kc_pr = pack_cache_paired(kc_sh)
    vc_pr = pack_cache_paired(vc_sh)
    for view in (None, 512, 256):
        cases.append((
            f"pallas v3 (paired, view={view})",
            functools.partial(
                lambda q, v: paired_decode_attention(
                    q, kc_pr, vc_pr, kn, vn, start, pos, s_view=v
                ),
                v=view,
            ),
        ))
    kq, ksc = _quantize_kv(kc_sh)
    vq, vsc = _quantize_kv(vc_sh)
    kq_pr, vq_pr = pack_cache_paired(kq), pack_cache_paired(vq)
    ks_pr, vs_pr = pack_scales_paired(ksc), pack_scales_paired(vsc)

    def xla_int8(q):
        # the production scale-factored XLA path, shapes matched to the model
        sc = jnp.einsum("bhd,bshd->bhs", q, kq, preferred_element_type=jnp.float32)
        sc = sc * jnp.moveaxis(ksc, 1, 2) / (Dh ** 0.5)
        idx = jnp.arange(S)[None, None, :]
        sc = jnp.where((idx >= start[:, None, None]) & (idx < pos[:, None, None]), sc, -1e9)
        ss = jnp.einsum("bhd,bhd->bh", q, kn, preferred_element_type=jnp.float32)[..., None] / (Dh ** 0.5)
        p = jax.nn.softmax(jnp.concatenate([sc, ss], -1), -1)
        pv = p[..., :S] * jnp.moveaxis(vsc, 1, 2)
        o = jnp.einsum("bhs,bshd->bhd", pv, vq.astype(jnp.float32), preferred_element_type=jnp.float32)
        return (o + p[..., S:] * vn.astype(jnp.float32)).astype(jnp.bfloat16)

    cases.append(("xla int8 scale-factored", xla_int8))
    for view in (None, 512, 256):
        cases.append((
            f"pallas v3 int8 (view={view})",
            functools.partial(
                lambda q, v: paired_decode_attention(
                    q, kq_pr, vq_pr, kn, vn, start, pos,
                    k_scale=ks_pr, v_scale=vs_pr, s_view=v,
                ),
                v=view,
            ),
        ))
    # rows_per_block sweep at the short production view: fewer, bigger grid
    # programs vs per-program overhead (BENCH_NOTES r2 floor finding)
    for rows in (2, 4, 8):
        if B % rows:
            continue
        cases.append((
            f"pallas v3 int8 (view=256, rows={rows})",
            functools.partial(
                lambda q, r: paired_decode_attention(
                    q, kq_pr, vq_pr, kn, vn, start, pos,
                    k_scale=ks_pr, v_scale=vs_pr, s_view=256,
                    rows_per_block=r,
                ),
                r=rows,
            ),
        ))
    bytes_per = 2 * B * H * S * Dh * 2
    for name, fn in cases:
        try:
            run = chain(fn)
            jax.block_until_ready(run(q0))
            t0 = time.perf_counter()
            jax.block_until_ready(run(q0))
            dt = (time.perf_counter() - t0) / args.reps
            print(f"{name:32s} {dt*1e3:8.3f} ms/step  {bytes_per/dt/1e9:6.0f} GB/s")
        except Exception as exc:
            print(f"{name:32s} FAILED: {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
