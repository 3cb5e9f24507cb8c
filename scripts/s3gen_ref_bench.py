#!/usr/bin/env python
"""Stage decomposition of the checkpoint-compatible S3Gen chunk on the chip.

Times, at production shapes (P prompt tokens + T generated tokens):
encoder / one estimator eval / full CFM scan (10 Euler x CFG) / HiFT —
so optimization effort lands where the milliseconds are.

Env: BENCH_T (gen tokens, default 70), BENCH_PROMPT (prompt tokens, 250),
BENCH_B (streams batched, 1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import S3GenRefConfig, init_s3gen_ref_params
from chatterbox_tpu.models.s3gen_ref.decoder import cfm_generate, estimator_forward
from chatterbox_tpu.models.s3gen_ref.hift import hift_decode, make_source, predict_f0
from chatterbox_tpu.models.s3gen_ref.upsample_encoder import upsample_encode
from chatterbox_tpu.ops.nn import linear


def timed(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:28s} {dt*1e3:8.1f} ms")
    return out, dt


def main():
    dtype = jnp.bfloat16
    T = int(os.environ.get("BENCH_T", "70"))
    P = int(os.environ.get("BENCH_PROMPT", "250"))
    B = int(os.environ.get("BENCH_B", "1"))
    import dataclasses
    cfg = S3GenRefConfig()
    if P != cfg.max_prompt_tokens:
        cfg = dataclasses.replace(cfg, max_prompt_tokens=P, max_prompt_mel=2 * P)
    fl, hf = cfg.flow, cfg.hift
    params = jax.device_put(init_s3gen_ref_params(jax.random.PRNGKey(0), cfg, dtype))
    fp = params["flow"]

    S = P + T
    F = S * fl.up_stride
    spt = cfg.samples_per_token
    print(f"P={P} T={T} B={B}: seq {S} tokens / {F} frames / {T*spt} samples")

    tokens = jnp.zeros((B, S), jnp.int32)
    valid = jnp.ones((B, S), bool)
    emb = fp["input_emb"][tokens]

    enc = jax.jit(lambda p, e, v: upsample_encode(p, fl, e, v))
    (h, valid_f), t_enc = timed("encoder (1x/chunk)", enc, fp["encoder"], emb, valid)

    mu = linear(h, fp["encoder_proj"]["w"], fp["encoder_proj"]["b"])
    spk = jnp.zeros((B, fl.output_size), dtype)
    cond = jnp.zeros((B, F, fl.output_size), dtype)

    mu2 = jnp.concatenate([mu, mu], 0)
    spk2 = jnp.concatenate([spk, spk], 0)
    cond2 = jnp.concatenate([cond, cond], 0)
    valid2 = jnp.concatenate([valid_f, valid_f], 0)
    x2 = jnp.zeros((2 * B, F, fl.output_size), dtype)
    t2 = jnp.zeros((2 * B,), jnp.float32)
    est = jax.jit(lambda pr, x, m, s, c, t, v: estimator_forward(pr, fl, x, m, s, c, t, v))
    _, t_est = timed("estimator (x10/chunk)", est, fp["estimator"], x2, mu2, spk2, cond2, t2, valid2)

    cfm = jax.jit(lambda pr, k, m, s, c, v: cfm_generate(pr, fl, k, m, s, c, v))
    mel_full, t_cfm = timed("CFM scan (1x/chunk)", cfm, fp["estimator"], jax.random.PRNGKey(1), mu, spk, cond, valid_f)

    mel_gen = mel_full[:, 2 * P:].astype(dtype)
    f0j = jax.jit(lambda pr, m: predict_f0(pr, hf, m))
    f0, t_f0 = timed("hift f0 (1x/chunk)", f0j, params["mel2wav"], mel_gen)
    srcj = jax.jit(lambda pr, f, k: make_source(pr, hf, f, k))
    src, t_src = timed("hift source (1x/chunk)", srcj, params["mel2wav"], f0, jax.random.PRNGKey(2))
    decj = jax.jit(lambda pr, m, s: hift_decode(pr, hf, m, s))
    _, t_dec = timed("hift decode (1x/chunk)", decj, params["mel2wav"], mel_gen, src.astype(jnp.float32))

    total = t_enc + t_cfm + t_f0 + t_src + t_dec
    print(f"{'sum of stages':28s} {total*1e3:8.1f} ms "
          f"(estimator share {10*t_est/total*100:.0f}% if linear)")

    # tail-windowed vocode (the scheduler's full-overlap fast path): the
    # decode window is constant (tail + 2·margin) regardless of the
    # accumulated length T — run with BENCH_T=256/512 to see the full-overlap
    # re-synthesis delta (s3gen_ref_inference_tail)
    from chatterbox_tpu.models.s3gen_ref.hift import hift_receptive_margin
    from chatterbox_tpu.runtime.s3gen_scheduler import MAX_TAIL_TOKENS

    margin_tok = -(-hift_receptive_margin(hf) // spt) + 1
    win_tok = min(T, MAX_TAIL_TOKENS + 2 * margin_tok)
    if win_tok < T:
        mel_w = mel_gen[:, : win_tok * fl.up_stride]
        src_w = src[:, : win_tok * spt].astype(jnp.float32)
        _, t_dec_w = timed(f"hift decode (win {win_tok} tok)",
                           decj, params["mel2wav"], mel_w, src_w)
        total_w = t_enc + t_cfm + t_f0 + t_src + t_dec_w
        print(f"{'sum w/ tail vocode':28s} {total_w*1e3:8.1f} ms "
              f"(full-overlap slice at acc={T} tokens)")


if __name__ == "__main__":
    main()
