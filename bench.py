#!/usr/bin/env python
"""Benchmark: full-size model pipeline on the local accelerator.

Measures the two hot stages at production shapes and derives the headline
serving metric (BASELINE.md north star: concurrent real-time streams per
chip, RTF < 1, target ≥ 16):

  * T3 decode throughput (520M llama, CFG 2-lane, 35-token jitted slices)
  * S3Gen chunk synthesis (encoder + 10-step CFM + vocoder, one XLA graph)

RTF(stream) = seconds-of-compute per second-of-audio. Audio advances 25
tokens/s, so rtf = 25/tok_rate_t3 + t_s3gen_chunk/1.4s. Streams/chip =
floor(1/rtf) — stage interleaving shares the chip across requests.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _device_alive(timeout_s: int | None = None) -> bool:
    """Probe the accelerator in a subprocess so a wedged runtime cannot hang
    the benchmark itself. BENCH_PROBE_TIMEOUT (seconds, default 600) tunes
    the patience — the tunneled runtime can take minutes to come back after
    heavy HBM churn, and killing a probe mid-device_put wedges it further."""
    import subprocess

    if timeout_s is None:
        timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT", "600"))

    code = (
        "import jax, numpy as np;"
        "x = jax.device_put(np.ones((4,4), np.float32));"
        "print(np.asarray(x).sum())"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _load_measured() -> dict | None:
    """Latest persisted measured-under-load result (scripts/serve_bench.py).

    When present and non-tiny, the MEASURED number is the headline — the
    analytic device-budget figure can no longer mask a failing load test
    (VERDICT r2 items 1/8)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "serve_bench_results.json")) as f:
            data = json.load(f)
        if data.get("tiny"):
            return None
        all_rows = [r for r in data.get("results", []) if "overlap" in r]
        cap = next(
            (r["capacity_streams"] for r in data.get("results", [])
             if "capacity_streams" in r),
            None,
        )
        # best full-overlap wave: the one sustaining the most real-time
        # streams (covers partial capacity sweeps cut short by an outage —
        # the ladder's last row is otherwise the first FAILING wave)
        full_rows = [r for r in all_rows if r["overlap"] == "full"]
        row = (
            max(full_rows, key=lambda r: (r["realtime_streams"], r["streams"]))
            if full_rows else (all_rows[-1] if all_rows else None)
        )
        # aggregate throughput (audio seconds produced per wall second) over
        # the full-overlap waves where EVERY stream held real time — the
        # sustainable steady-state bound. Over-capacity waves are excluded:
        # their peak audio/wall is throughput-under-overload, not capacity
        # (ADVICE r3). Lockstep waves make every stream's wall = the wave's
        # wall, so the all-realtime capacity is the harshest reading;
        # staggered production arrivals sustain ~aggregate_x streams.
        def _agg(rows):
            return max(
                (r["audio_s_total"] / r["wall_s"] for r in rows
                 if r.get("wall_s")),
                default=None,
            )

        full_ok = [r for r in all_rows if r["overlap"] == "full"
                   and r.get("realtime_streams") == r.get("streams")]
        agg = _agg(full_ok)
        agg_overload = False
        if agg is None:
            agg = _agg([r for r in all_rows if r["overlap"] == "full"])
            agg_overload = agg is not None
        if cap is not None:
            # capacity sweep: the largest all-realtime simultaneous wave.
            # Stats must come from the capacity wave itself, not the last
            # emitted row — the sweep stops one wave PAST capacity, so the
            # last row per overlap is the first failing one.
            cap_full = cap.get("full", 0)
            cap_row = next(
                (r for r in data.get("results", [])
                 if r.get("overlap") == "full" and r.get("streams") == cap_full
                 and r.get("realtime_streams") == cap_full),
                row,
            )
            return {
                "measured_at": data.get("measured_at"),
                "overlap": "full",
                "streams": cap_full,
                "realtime_streams": cap_full,
                "capacity": cap,
                "ttfa_p50_ms": cap_row["ttfa_p50_ms"] if cap_row else None,
                "ttfa_audio_p50_ms": (cap_row or {}).get("ttfa_audio_p50_ms"),
                "rtf_p50": cap_row["rtf_p50"] if cap_row else None,
                "aggregate_x": round(agg, 2) if agg is not None else None,
                "aggregate_overload": agg_overload,
            }
        if row:
            return {
                "measured_at": data.get("measured_at"),
                "overlap": row["overlap"],
                "streams": row["streams"],
                "realtime_streams": row["realtime_streams"],
                "ttfa_p50_ms": row["ttfa_p50_ms"],
                "ttfa_audio_p50_ms": row.get("ttfa_audio_p50_ms"),
                "rtf_p50": row["rtf_p50"],
                "aggregate_x": round(agg, 2) if agg is not None else None,
                "aggregate_overload": agg_overload,
            }
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        pass
    return None


def _measured_unit(measured: dict, extra: str) -> str:
    """Human-readable unit string for a persisted measured result. The
    aggregate clause is omitted when no wave produced one, and labelled as
    overload throughput when only over-capacity waves exist (ADVICE r3)."""
    parts = [
        f"overlap={measured['overlap']}",
        f"rtf_p50={measured['rtf_p50']}",
        f"ttfa_p50={measured['ttfa_p50_ms']}ms",
    ]
    if measured.get("capacity"):
        cap = measured["capacity"]
        parts.append("capacity=" + "/".join(
            f"{k}:{v}" for k, v in sorted(cap.items())))
    if measured.get("ttfa_audio_p50_ms") is not None:
        parts.append(f"ttfa_audio_p50={measured['ttfa_audio_p50_ms']}ms")
    if measured.get("aggregate_x") is not None:
        label = ("peak_overload" if measured.get("aggregate_overload")
                 else "aggregate")
        parts.append(f"{label}={measured['aggregate_x']}x realtime")
    parts.append(extra)
    return (f"streams MEASURED@{measured['measured_at']} "
            f"({', '.join(parts)})")


def _emit_fallback(reason: str) -> None:
    """Emit the persisted measured result (or zero) as the headline when the
    live device path cannot run — the tunneled runtime has multi-hour outages
    and can also fail MID-bench (remote_compile connection drops, r3)."""
    measured = _load_measured()
    if measured is not None:
        sys.stderr.write(f"{reason}; emitting last measured result\n")
        value = measured["realtime_streams"]
        print(json.dumps({
            "metric": "concurrent_realtime_streams_per_chip",
            "value": value,
            "unit": _measured_unit(
                measured, f"{reason} — persisted serve_bench result"),
            "vs_baseline": round(value / 16.0, 3),
        }))
        return
    sys.stderr.write(f"{reason}; emitting zero result\n")
    print(json.dumps({
        "metric": "concurrent_realtime_streams_per_chip",
        "value": 0,
        "unit": f"streams ({reason})",
        "vs_baseline": 0.0,
    }))


def main() -> None:
    if not _device_alive():
        _emit_fallback("DEVICE UNAVAILABLE at bench time")
        return
    try:
        _main_live()
    except Exception as exc:  # tunnel drops mid-compile leave no JSON at all
        sys.stderr.write(f"bench crashed mid-measurement: {exc}\n")
        _emit_fallback(f"DEVICE FAILED MID-BENCH ({type(exc).__name__})")


def _main_live() -> None:
    import jax
    import jax.numpy as jnp

    from chatterbox_tpu.models.s3gen import S3GenConfig, init_s3gen_params, s3gen_inference
    from chatterbox_tpu.models.s3gen_ref import (
        S3GenRefConfig,
        init_s3gen_ref_params,
        s3gen_ref_inference,
    )
    from chatterbox_tpu.models.t3 import (
        T3Config,
        init_t3_params,
        make_decode_state,
        t3_decode_slice,
        t3_prefill,
    )

    # BENCH_TINY=1: tiny configs for an off-TPU smoke test of the bench's own
    # code paths (numbers are meaningless; the driver never sets it)
    tiny = os.environ.get("BENCH_TINY", "0") == "1"
    dtype = jnp.float32 if tiny else jnp.bfloat16
    slice_tokens = 8 if tiny else 35
    # int8 KV matches the serving default (scale-factored attention)
    t3c = (T3Config.tiny() if tiny else T3Config()).with_(
        kv_cache_dtype=os.environ.get("BENCH_KV", "int8"))
    # default-on for TPU, mirroring the engine (int8-paired: in-kernel
    # scale-factored dequant + grid-bounded reads)
    from chatterbox_tpu.ops.pallas_attention_v3 import pallas_enabled

    use_pallas = pallas_enabled() and jax.default_backend() == "tpu"
    if use_pallas and t3c.num_kv_heads % 2 == 0:
        t3c = t3c.with_(kv_cache_layout="paired")
    # BENCH_KV_HEADS=N measures a grouped-query variant (smaller KV cache →
    # more decode bandwidth headroom). Serving the pretrained checkpoint needs
    # its 16 KV heads; this knob quantifies what GQA distillation would buy.
    kv_heads = int(os.environ.get("BENCH_KV_HEADS", "0") or 0)
    if kv_heads:
        t3c = t3c.with_(num_kv_heads=kv_heads)
    # S3Gen architecture: measure what production serves (EngineConfig.full
    # defaults to the checkpoint-compatible "ref" stack; "dit" is the
    # TPU-first redesign that needs its own weights).
    arch = os.environ.get("CHATTERBOX_S3GEN_ARCH", "ref")
    if arch == "ref":
        s3c = S3GenRefConfig.tiny() if tiny else S3GenRefConfig()
        # same flow-prompt budget knob the engine honors
        ptoks = int(os.environ.get("CHATTERBOX_FLOW_PROMPT_TOKENS", "0") or 0)
        if 0 < ptoks < s3c.max_prompt_tokens:
            import dataclasses

            s3c = dataclasses.replace(s3c, max_prompt_tokens=ptoks, max_prompt_mel=2 * ptoks)
        s3gen_infer = s3gen_ref_inference
        s3_params = jax.device_put(init_s3gen_ref_params(jax.random.PRNGKey(1), s3c, dtype))
    else:
        s3c = S3GenConfig.tiny() if tiny else S3GenConfig()
        s3gen_infer = s3gen_inference
        s3_params = jax.device_put(init_s3gen_params(jax.random.PRNGKey(1), s3c, dtype))

    t3_params = jax.device_put(init_t3_params(jax.random.PRNGKey(0), t3c, dtype))

    # ---------------- T3: prefill + sliced decode (2 CFG lanes) -------------
    C, D = t3c.cond_len, t3c.hidden_size
    cond = jnp.zeros((2, C, D), dtype)
    T_text = min(64, t3c.max_text_tokens)
    text = jnp.zeros((2, T_text), jnp.int32)
    tlen = jnp.full((2,), T_text - 4, jnp.int32)

    prefill = jax.jit(lambda p, c, t, l: t3_prefill(p, t3c, c, t, l))
    cache = prefill(t3_params, cond, text, tlen)
    jax.block_until_ready(cache["k"])
    t0 = time.perf_counter()
    cache = prefill(t3_params, cond, text, tlen)
    jax.block_until_ready(cache["k"])
    prefill_s = time.perf_counter() - t0

    state = make_decode_state(jax.random.PRNGKey(2), t3c, 1, 0.8, 0.95, 0.5, 1.2)
    # compile + warm
    toks, cache, state = t3_decode_slice(t3_params, t3c, cache, state, slice_tokens)
    jax.block_until_ready(toks)
    n_slices = 4
    t0 = time.perf_counter()
    for _ in range(n_slices):
        toks, cache, state = t3_decode_slice(t3_params, t3c, cache, state, slice_tokens)
    jax.block_until_ready(toks)
    t3_slice_s = (time.perf_counter() - t0) / n_slices
    t3_tok_rate = slice_tokens / t3_slice_s

    # ------------- T3 batched decode: N slots share the weights -------------
    from chatterbox_tpu.utils import safe_delete_buffers

    safe_delete_buffers(cache, state)  # free the single-stream cache first
    n_slots = int(os.environ.get("BENCH_SLOTS", "16"))
    Bb = 2 * n_slots
    S_max = t3c.max_seq_len
    L, Hk, Dh = t3c.num_layers, t3c.num_kv_heads, t3c.head_dim
    cache_b = {
        "start": jnp.zeros((Bb,), jnp.int32),
        "pos": jnp.full((Bb,), 128, jnp.int32),
    }
    kv_dt = jnp.int8 if t3c.kv_cache_dtype == "int8" else dtype
    if t3c.kv_cache_layout == "paired":
        cache_b.update(
            k=jnp.zeros((L, Bb, Hk // 2, S_max, 2 * Dh), kv_dt),
            v=jnp.zeros((L, Bb, Hk // 2, S_max, 2 * Dh), kv_dt),
        )
        if t3c.kv_cache_dtype == "int8":
            cache_b.update(
                k_scale=jnp.zeros((L, Bb, Hk // 2, 2, S_max), jnp.float32),
                v_scale=jnp.zeros((L, Bb, Hk // 2, 2, S_max), jnp.float32),
            )
    else:
        cache_b.update(
            k=jnp.zeros((L, Bb, S_max, Hk, Dh), kv_dt),
            v=jnp.zeros((L, Bb, S_max, Hk, Dh), kv_dt),
        )
        if t3c.kv_cache_dtype == "int8":
            cache_b.update(
                k_scale=jnp.zeros((L, Bb, S_max, Hk), jnp.float32),
                v_scale=jnp.zeros((L, Bb, S_max, Hk), jnp.float32),
            )
    state_b = make_decode_state(jax.random.PRNGKey(4), t3c, n_slots, 0.8, 0.95, 0.5, 1.2)
    # View bucketing is only copy-free through the paired Pallas kernel
    # (grid-bounded read); the XLA path must use the full view. The bucket
    # matches the scheduler's steady-state rule (max fill across slots).
    bench_view = int(os.environ.get("BENCH_VIEW", "768"))
    s_view = min(S_max, bench_view) if t3c.kv_cache_layout == "paired" else None
    toks, cache_b, state_b = t3_decode_slice(
        t3_params, t3c, cache_b, state_b, slice_tokens, s_view
    )
    jax.block_until_ready(toks)
    t0 = time.perf_counter()
    for _ in range(n_slices):
        toks, cache_b, state_b = t3_decode_slice(
            t3_params, t3c, cache_b, state_b, slice_tokens, s_view
        )
    jax.block_until_ready(toks)
    t3_batched_slice_s = (time.perf_counter() - t0) / n_slices

    # ---------------- S3Gen: one chunk at the typical accumulated size ------
    T_chunk = 2 * slice_tokens  # typical "full"-overlap accumulated length
    spt = s3c.samples_per_token
    ref = {
        "spk_emb": jnp.zeros((1, s3c.spk_dim), jnp.float32),
        "prompt_tokens": jnp.zeros((1, s3c.max_prompt_tokens), jnp.int32),
        "prompt_len": jnp.array([min(100, s3c.max_prompt_tokens)], jnp.int32),
        "prompt_mel": jnp.zeros((1, s3c.max_prompt_mel, s3c.n_mels), jnp.float32),
        "prompt_mel_len": jnp.array([min(200, s3c.max_prompt_mel)], jnp.int32),
    }
    tokens = jnp.zeros((1, T_chunk), jnp.int32)
    src = jnp.zeros((1, T_chunk * spt), jnp.float32)
    infer = jax.jit(
        lambda p, t, l, r, s, cl, k: s3gen_infer(p, s3c, t, l, r, s, cl, k)
    )
    args = (s3_params, tokens, jnp.array([T_chunk], jnp.int32), ref, src,
            jnp.array([0], jnp.int32), jax.random.PRNGKey(3))
    wav, _ = infer(*args)
    jax.block_until_ready(wav)
    t0 = time.perf_counter()
    for _ in range(3):
        wav, _ = infer(*args)
    jax.block_until_ready(wav)
    s3_chunk_s = (time.perf_counter() - t0) / 3
    chunk_audio_s = slice_tokens / s3c.token_rate  # new audio per slice (1.4 s)

    # Batched synthesis (what S3GenScheduler coalesces under load): per-stream
    # chunk cost drops when B chunks share one weight pass.
    s3_batch = int(os.environ.get("BENCH_S3_BATCH", "4"))
    s3_chunk_batched_s = None
    if s3_batch > 1:
        refB = {k: jnp.repeat(v, s3_batch, axis=0) for k, v in ref.items()}
        argsB = (
            s3_params, jnp.repeat(tokens, s3_batch, 0),
            jnp.full((s3_batch,), T_chunk, jnp.int32), refB,
            jnp.repeat(src, s3_batch, 0), jnp.zeros((s3_batch,), jnp.int32),
            jax.random.PRNGKey(3),
        )
        wav, _ = infer(*argsB)
        jax.block_until_ready(wav)
        t0 = time.perf_counter()
        for _ in range(3):
            wav, _ = infer(*argsB)
        jax.block_until_ready(wav)
        s3_chunk_batched_s = (time.perf_counter() - t0) / 3

    # ---------------- headline metric --------------------------------------
    # Single-stream figures
    rtf_single = (s3c.token_rate / t3_tok_rate) + (s3_chunk_s / chunk_audio_s)
    ttfa_s = prefill_s + t3_slice_s + s3_chunk_s

    # Batched serving: per 1.4 s audio window, the chip spends one batched
    # decode slice (covers ALL slots) + one s3gen chunk PER stream. Real-time
    # for N streams needs t3_batched_slice + N*s3_chunk <= slice audio length.
    budget = chunk_audio_s
    # per-stream synthesis cost under the S3GenScheduler's micro-batching
    s3_per_stream_s = s3_chunk_s
    if s3_chunk_batched_s is not None:
        s3_per_stream_s = min(s3_chunk_s, s3_chunk_batched_s / s3_batch)
    streams_batched = int(min(
        n_slots, max(0.0, (budget - t3_batched_slice_s) / s3_per_stream_s)
    ))
    streams_single = int(np.floor(1.0 / rtf_single)) if rtf_single < 1 else 0
    streams = max(streams_batched, streams_single)

    sys.stderr.write(
        f"t3: prefill {prefill_s*1e3:.1f} ms, {t3_tok_rate:.1f} tok/s single "
        f"(slice {t3_slice_s*1e3:.1f} ms), batched[{n_slots} slots] slice "
        f"{t3_batched_slice_s*1e3:.1f} ms; s3gen[{arch}] chunk {s3_chunk_s*1e3:.1f} ms"
        + (f" (batched x{s3_batch}: {s3_chunk_batched_s*1e3:.1f} ms, "
           f"{s3_chunk_batched_s/s3_batch*1e3:.1f} ms/stream)" if s3_chunk_batched_s else "")
        + "; "
        f"rtf_single {rtf_single:.3f}; ttfa {ttfa_s*1e3:.0f} ms; "
        f"streams single={streams_single} batched={streams_batched}; "
        f"device {jax.devices()[0]}\n"
    )
    measured = _load_measured()

    if measured is not None:
        value = measured["realtime_streams"]
        unit = _measured_unit(measured, f"analytic={streams}")
    else:
        value = streams
        unit = (
            f"streams ANALYTIC, no measured serve_bench result on this box "
            f"(rtf_single={rtf_single:.3f}, ttfa_ms={ttfa_s*1e3:.0f})"
        )
    print(json.dumps({
        "metric": "concurrent_realtime_streams_per_chip",
        "value": value,
        "unit": unit,
        "vs_baseline": round(value / 16.0, 3),
    }))


if __name__ == "__main__":
    main()
