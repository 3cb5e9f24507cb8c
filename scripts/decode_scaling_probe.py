#!/usr/bin/env python
"""Scaling probe for the batched T3 decode slice: what sets 19.4 ms/step?

Times t3_decode_slice across S_max (cache depth), slot count, and slice
length. If time scales with S_max -> cache traffic (attention reads or cache
copies). If with slots -> lane-proportional compute. If constant -> per-step
overhead (dispatch, sampling, scan fixed cost).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_tpu.models.t3 import T3Config, init_t3_params, make_decode_state, t3_decode_slice


def bench_case(t3_params, t3c, n_slots, slice_tokens, pos0, n=3, s_view=None):
    Bb = 2 * n_slots
    S_max = t3c.max_seq_len
    L, Hk, Dh = t3c.num_layers, t3c.num_kv_heads, t3c.head_dim
    dtype = jnp.bfloat16
    cache = {
        "start": jnp.zeros((Bb,), jnp.int32),
        "pos": jnp.full((Bb,), pos0, jnp.int32),
    }
    paired = t3c.kv_cache_layout == "paired"
    int8 = t3c.kv_cache_dtype == "int8"
    kv_dt = jnp.int8 if int8 else dtype
    if paired:
        cache.update(
            k=jnp.zeros((L, Bb, Hk // 2, S_max, 2 * Dh), kv_dt),
            v=jnp.zeros((L, Bb, Hk // 2, S_max, 2 * Dh), kv_dt),
        )
        if int8:
            cache.update(
                k_scale=jnp.zeros((L, Bb, Hk // 2, 2, S_max), jnp.float32),
                v_scale=jnp.zeros((L, Bb, Hk // 2, 2, S_max), jnp.float32),
            )
    else:
        cache.update(
            k=jnp.zeros((L, Bb, S_max, Hk, Dh), kv_dt),
            v=jnp.zeros((L, Bb, S_max, Hk, Dh), kv_dt),
        )
        if int8:
            cache.update(
                k_scale=jnp.zeros((L, Bb, S_max, Hk), jnp.float32),
                v_scale=jnp.zeros((L, Bb, S_max, Hk), jnp.float32),
            )
    state = make_decode_state(jax.random.PRNGKey(4), t3c, n_slots, 0.8, 0.95, 0.5, 1.2)
    toks, cache, state = t3_decode_slice(t3_params, t3c, cache, state, slice_tokens, s_view)
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    for _ in range(n):
        toks, cache, state = t3_decode_slice(t3_params, t3c, cache, state, slice_tokens, s_view)
    jax.block_until_ready(toks)
    dt = (time.perf_counter() - t0) / n
    del cache, state
    return dt


def main():
    dtype = jnp.bfloat16
    base = T3Config()
    params = jax.device_put(init_t3_params(jax.random.PRNGKey(0), base, dtype))
    print(f"base: L={base.num_layers} H={base.num_heads} S_max={base.max_seq_len}")

    # max_seq_len is derived: cond_len + max_text_tokens + 1 + max_speech_tokens
    half = base.with_(max_speech_tokens=1024 - 640)
    quarter = base.with_(max_speech_tokens=1024 - 960, max_text_tokens=96)
    int8 = base.with_(kv_cache_dtype="int8")
    int8_paired = base.with_(kv_cache_dtype="int8", kv_cache_layout="paired")
    bf16_paired = base.with_(kv_cache_layout="paired")
    cases = [
        ("S=full slots=16 slice=35", base, 16, 35, 128),
        ("int8   slots=16 slice=35", int8, 16, 35, 128),
        ("int8-paired (pallas)     ", int8_paired, 16, 35, 128),
        ("bf16-paired (pallas)     ", bf16_paired, 16, 35, 128),
        ("int8-paired view=256     ", int8_paired, 16, 35, 128, 256),
        ("bf16-paired view=256     ", bf16_paired, 16, 35, 128, 256),
        ("S=-640 slots=16 slice=35", half, 16, 35, 128),
        ("S=-960 slots=16 slice=35", quarter, 16, 35, 128),
        ("S=full slots=8  slice=35", base, 8, 35, 128),
        ("S=full slots=4  slice=35", base, 4, 35, 128),
        ("S=full slots=16 slice=70", base, 16, 70, 128),
    ]
    print("S_max per case:", [c[1].max_seq_len for c in cases])
    for name, cfg, slots, slice_tokens, pos0, *rest in cases:
        dt = bench_case(params, cfg, slots, slice_tokens, pos0,
                        s_view=rest[0] if rest else None)
        print(f"{name}: {dt*1e3:7.1f} ms  ({dt/slice_tokens*1e3:6.2f} ms/step)")


if __name__ == "__main__":
    main()
