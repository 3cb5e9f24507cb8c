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

if os.environ.get("CHATTERBOX_FORCE_CPU") == "1":
    # JAX_PLATFORMS is ignored under the axon plugin (CLAUDE.md) — this is
    # the only reliable CPU pin on this machine
    jax.config.update("jax_platforms", "cpu")
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
    if os.environ.get("CHATTERBOX_FLOW_BF16", "0") == "1":
        cfg = dataclasses.replace(
            cfg, flow=dataclasses.replace(cfg.flow, bf16_activations=True))
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


if __name__ == "__main__" and os.environ.get("BENCH_CACHED") != "1" \
        and os.environ.get("BENCH_STREAM") != "1":
    main()

# appended: cached-vs-uncached chunk comparison (CFM prompt cache)
def main_cached():
    """BENCH_CACHED=1: time the full chunk graph with and without the frozen
    prompt context (s3gen_ref_prompt_prefill / CHATTERBOX_CFM_PROMPT_CACHE),
    plus the one-time prefill cost, at production shapes."""
    import dataclasses
    dtype = jnp.bfloat16
    T = int(os.environ.get("BENCH_T", "70"))
    P = int(os.environ.get("BENCH_PROMPT", "250"))
    B = int(os.environ.get("BENCH_B", "1"))
    cfg = S3GenRefConfig()
    if P != cfg.max_prompt_tokens:
        cfg = dataclasses.replace(cfg, max_prompt_tokens=P, max_prompt_mel=2 * P)
    if os.environ.get("CHATTERBOX_FLOW_BF16", "0") == "1":
        cfg = dataclasses.replace(
            cfg, flow=dataclasses.replace(cfg.flow, bf16_activations=True))
    from chatterbox_tpu.models.s3gen_ref import (
        s3gen_ref_inference, s3gen_ref_prompt_prefill,
    )
    params = jax.device_put(init_s3gen_ref_params(jax.random.PRNGKey(0), cfg, dtype))
    spt = cfg.samples_per_token
    ref = {
        "spk_emb": jnp.zeros((1, cfg.spk_dim), dtype),
        "prompt_tokens": jnp.ones((1, P), jnp.int32),
        "prompt_len": jnp.array([P], jnp.int32),
        "prompt_mel": jnp.zeros((1, 2 * P, cfg.n_mels), jnp.float32),
        "prompt_mel_len": jnp.array([2 * P], jnp.int32),
    }
    print(f"P={P} T={T} B={B} (vmapped lanes share one cache)")

    prefill = jax.jit(lambda p, r, k: s3gen_ref_prompt_prefill(p, cfg, r, k))
    cache, t_pre = timed("prompt prefill (1x/voice)", prefill, params,
                         ref, jax.random.PRNGKey(777))
    sz = sum(a.size * a.dtype.itemsize for a in jax.tree.leaves(cache)) / 1e6
    print(f"{'cache size':28s} {sz:8.1f} MB")

    tokens = jnp.zeros((B, 1, T), jnp.int32)
    tlen = jnp.full((B, 1), T, jnp.int32)
    refB = jax.tree.map(lambda x: jnp.stack([x] * B), ref)
    src = jnp.zeros((B, 1, T * spt), jnp.float32)
    clen = jnp.zeros((B, 1), jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])

    def chunk(p, tk, tl, rf, sr, cl, ky, cache):
        def one(tk, tl, rf, sr, cl, ky):
            return s3gen_ref_inference(p, cfg, tk, tl, rf, sr, cl, ky,
                                       cfm_cache=cache)
        return jax.vmap(one)(tk, tl, rf, sr, cl, ky)

    cached_j = jax.jit(lambda p, tk, tl, rf, sr, cl, ky, c:
                       chunk(p, tk, tl, rf, sr, cl, ky, c))
    un_j = jax.jit(lambda p, tk, tl, rf, sr, cl, ky:
                   chunk(p, tk, tl, rf, sr, cl, ky, None))
    _, t_u = timed("chunk UNCACHED", un_j, params, tokens, tlen, refB, src,
                   clen, keys)
    _, t_c = timed("chunk CACHED", cached_j, params, tokens, tlen, refB, src,
                   clen, keys, cache)
    static = {"est": jax.tree.map(lambda a: a[-1:], cache["est"]), "pv": cache["pv"]}
    _, t_s = timed("chunk CACHED static", cached_j, params, tokens, tlen, refB,
                   src, clen, keys, static)
    print(f"speedup: step {t_u/t_c:.2f}x  static {t_u/t_s:.2f}x  "
          f"(prefill amortizes over slices: breakeven after "
          f"{t_pre/max(t_u-t_c,1e-9):.1f} slices)")


if __name__ == "__main__" and os.environ.get("BENCH_CACHED") == "1":
    main_cached()
    sys.exit(0)


# appended: streaming full-overlap stage decomposition (round 5)
def main_stream():
    """BENCH_STREAM=1: split the streaming full-overlap slice
    (s3gen_ref_inference_streaming — the serving default's hot S3Gen graph)
    into its four stages at SERVING shapes, so the full-mode capacity attack
    lands where the milliseconds are:

      encode_mu    — conformer over the full accumulated track (scales with T)
      cfm_stream   — Euler solve of the new block vs the frozen K/V ring
      f0+source    — excitation over the full accumulated mel (scales with T)
      vocode tail  — HiFT over the constant receptive-field window
      dispatch     — empty-graph call + tail fetch (per-call fixed cost)

    Env: BENCH_T (accumulated bucket, default 256), BENCH_B (batch, 8),
    BENCH_NB (new block tokens, 36), BENCH_PROMPT (250),
    BENCH_WINDOW (K/V ring frames, 512). BENCH_TINY=1 swaps in the tiny
    config (CPU smoke test of the harness itself, not a measurement)."""
    import dataclasses
    dtype = jnp.bfloat16
    tiny = os.environ.get("BENCH_TINY") == "1"
    T = int(os.environ.get("BENCH_T", "16" if tiny else "256"))
    B = int(os.environ.get("BENCH_B", "2" if tiny else "8"))
    NB = int(os.environ.get("BENCH_NB", "8" if tiny else "36"))
    WIN = int(os.environ.get("BENCH_WINDOW", "32" if tiny else "512"))
    cfg = S3GenRefConfig.tiny() if tiny else S3GenRefConfig()
    P = int(os.environ.get("BENCH_PROMPT",
                           str(cfg.max_prompt_tokens) if tiny else "250"))
    if P != cfg.max_prompt_tokens:
        cfg = dataclasses.replace(cfg, max_prompt_tokens=P, max_prompt_mel=2 * P)
    if os.environ.get("CHATTERBOX_FLOW_BF16", "0") == "1":
        cfg = dataclasses.replace(
            cfg, flow=dataclasses.replace(cfg.flow, bf16_activations=True))
    from chatterbox_tpu.models.s3gen_ref import (
        s3gen_ref_prompt_prefill,
    )
    from chatterbox_tpu.models.s3gen_ref.model import (
        _encode_mu, _source_with_cache, _vocode_tail_window,
        init_s3gen_stream_state, s3gen_ref_inference_streaming,
    )
    from chatterbox_tpu.models.s3gen_ref.decoder import cfm_generate_streaming
    from chatterbox_tpu.runtime.s3gen_scheduler import MAX_TAIL_TOKENS

    fl = cfg.flow
    fpt = fl.up_stride
    spt = cfg.samples_per_token
    params = jax.device_put(init_s3gen_ref_params(jax.random.PRNGKey(0), cfg, dtype))
    ref1 = {
        "spk_emb": jnp.zeros((1, cfg.spk_dim), dtype),
        "prompt_tokens": jnp.ones((1, P), jnp.int32),
        "prompt_len": jnp.array([P], jnp.int32),
        "prompt_mel": jnp.zeros((1, 2 * P, cfg.n_mels), jnp.float32),
        "prompt_mel_len": jnp.array([2 * P], jnp.int32),
    }
    cache = jax.jit(lambda p, r, k: s3gen_ref_prompt_prefill(p, cfg, r, k))(
        params, ref1, jax.random.PRNGKey(777))
    state1 = jax.jit(lambda c: init_s3gen_stream_state(cfg, c, WIN, T))(cache)
    rstates = [state1] * B

    tail = min(MAX_TAIL_TOKENS, T) * spt
    # operands mirror S3GenScheduler._infer_fn_stream: [B, 1, ...] rows,
    # per-request state trees stacked INSIDE the jit, vmap over rows
    tokens = jnp.ones((B, 1, T), jnp.int32)
    tlen = jnp.full((B, 1), T - 5, jnp.int32)
    nlen = jnp.full((B, 1), min(NB, T), jnp.int32)
    refB = jax.tree.map(lambda x: jnp.stack([x] * B, 0), ref1)
    src = jnp.zeros((B, 1, T * spt), jnp.float32)
    clen = jnp.full((B, 1), (T - 5 - min(NB, T)) * spt, jnp.int32)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])
    starts = jnp.zeros((B, 1), jnp.int32)
    print(f"T={T} B={B} NB={NB} P={P} WIN={WIN}: tail {tail} samples")

    @jax.jit
    def full_j(p, tk, tl, nl, rf, sr, cl, ky, st, rs, c):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *rs)

        def one(tk, tl, nl, rf, sr, cl, ky, strt, r):
            return s3gen_ref_inference_streaming(
                p, cfg, tk, tl, nl, rf, sr, cl, ky, strt, tail, r, NB,
                cfm_cache=c)
        return jax.vmap(one)(tk, tl, nl, rf, sr, cl, ky, st, stacked)

    (_, _, _), t_full = timed("stream slice (composed)", full_j, params,
                              tokens, tlen, nlen, refB, src, clen, keys,
                              starts, rstates, cache)

    @jax.jit
    def enc_j(p, tk, tl, rf):
        return jax.vmap(lambda a, b, r: _encode_mu(p, cfg, a, b, r))(tk, tl, rf)

    (mu, valid_f, spk), t_enc = timed("encode_mu (full track)", enc_j,
                                      params, tokens, tlen, refB)

    TgF = NB * fpt
    mu_new = jnp.zeros((B, 1, TgF, fl.output_size), mu.dtype)
    nframes = nlen.astype(jnp.int32) * fpt

    @jax.jit
    def cfm_j(pr, ks, m, s, nf, c, rs):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *rs)

        def one(k, m1, s1, nf1, r):
            return cfm_generate_streaming(pr, fl, k, m1, s1, nf1, c, r["cfm"])
        return jax.vmap(one)(ks, m, s, nf, stacked)

    (_, _), t_cfm = timed("cfm_stream (new block)", cfm_j,
                          params["flow"]["estimator"], keys, mu_new, spk,
                          nframes, cache, rstates)

    mel_gen = jnp.zeros((B, 1, T * fpt, cfg.n_mels), jnp.float32)

    @jax.jit
    def srcj(p, m, sc, cl, ks):
        return jax.vmap(lambda a, b, d, k: _source_with_cache(p, cfg, a, b, d, k))(
            m, sc, cl, ks)

    source, t_src = timed("f0+source (full track)", srcj, params, mel_gen,
                          src, clen, keys)

    @jax.jit
    def voc_j(p, m, s, st):
        return jax.vmap(lambda a, b, d: _vocode_tail_window(p, cfg, a, b, d, tail))(
            m, s, st)

    _, t_voc = timed("vocode tail (window)", voc_j, params, mel_gen,
                     source, starts)

    # per-call fixed cost: trivial graph + host fetch of the tails buffer
    nop_j = jax.jit(lambda tk, sr: (tk.sum(), sr[:, 0, :tail] + 1.0))
    def nop_fetch(tk, sr):
        a, b = nop_j(tk, sr)
        return np.asarray(b)
    _, t_nop = timed("dispatch+fetch (fixed)", nop_fetch, tokens, src)

    known = t_enc + t_cfm + t_src + t_voc
    print(f"{'sum of stages':28s} {known*1e3:8.1f} ms "
          f"(composed {t_full*1e3:.1f} ms; enc {t_enc/known*100:.0f}% / "
          f"cfm {t_cfm/known*100:.0f}% / src {t_src/known*100:.0f}% / "
          f"voc {t_voc/known*100:.0f}%)")


if __name__ == "__main__" and os.environ.get("BENCH_STREAM") == "1":
    main_stream()
    sys.exit(0)
