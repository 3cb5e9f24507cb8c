#!/usr/bin/env python
"""Quantify THIS BOX's host↔device overhead: round-trip latency, per-op
launch cost, and transfer bandwidth through the tunneled TPU runtime.

The measured serving capacity (scripts/serve_bench.py) is gated by a fixed
per-call cost on every batched S3Gen dispatch (~0.6 s at small buckets,
r3 Run B) that dwarfs the graph's device compute. This probe separates that
cost into its parts so BENCH_NOTES can state how much of the serving gap is
tunnel overhead a real TPU-VM host (local PCIe, 100+ cores) would not pay:

  rtt_ms          blocking dispatch+fetch of a trivial jitted graph
  launch_ms       amortized per-dispatch cost of K pipelined tiny ops
  fetch_mb_s      device→host bandwidth (4 MB block fetch)
  put_mb_s        host→device bandwidth (4 MB device_put)
  s3gen_like_ms   dispatch+fetch of a [4, 97k] f32 tail-sized output
                  (the serving fetch shape at full-mode buckets)

Usage: python scripts/overhead_probe.py   # prints one JSON line
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _p50(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    from chatterbox_tpu.runtime.engine import ensure_backend_initialized

    ensure_backend_initialized()
    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()

    # 1) blocking round trip: trivial graph, tiny operand, blocking fetch
    tiny = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    np.asarray(tiny(x))  # compile
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        rtts.append(time.perf_counter() - t0)

    # 2) per-dispatch launch cost, pipelined: K async dispatches, one block.
    # If dispatches pipeline, total ≈ rtt + K·launch; if they serialize,
    # total ≈ K·rtt.
    K = 32
    launch = []
    for _ in range(5):
        t0 = time.perf_counter()
        y = x
        for _ in range(K):
            y = tiny(y)
        np.asarray(y)
        launch.append(time.perf_counter() - t0)

    # 3) device→host bandwidth: 4 MB block fetch of a FRESH output each time
    # (np.asarray on the same jax.Array caches the host copy — fetching the
    # same buffer twice measures the cache, not the tunnel)
    mk_big = jax.jit(lambda s: jnp.zeros((1024 * 1024,), jnp.float32) + s)
    np.asarray(mk_big(0.0))
    fetches = []
    for i in range(5):
        y = mk_big(float(i + 1))
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        np.asarray(y)
        fetches.append(time.perf_counter() - t0)

    # 4) host→device bandwidth: 4 MB put (block on completion)
    host = np.zeros((1024 * 1024,), np.float32)
    puts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host))
        puts.append(time.perf_counter() - t0)

    # 5) the serving fetch shape: one batched-S3Gen-sized output
    # (B=4 lanes × 101 tokens × 960 samples ≈ 1.5 MB f32) produced by a
    # near-empty graph — isolates dispatch+fetch from model compute
    tail_like = jax.jit(lambda s: jnp.zeros((4, 101 * 960), jnp.float32) + s)
    np.asarray(tail_like(0.0))
    tails = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(tail_like(0.0))
        tails.append(time.perf_counter() - t0)
    # and its int16 counterpart (half the bytes): measures what a device-side
    # PCM16 tail conversion would save per call
    tail_i16 = jax.jit(lambda s: jnp.zeros((4, 101 * 960), jnp.int16) + s)
    np.asarray(tail_i16(0))
    tails16 = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(tail_i16(0))
        tails16.append(time.perf_counter() - t0)

    rtt = _p50(rtts)
    k_total = _p50(launch)
    print(json.dumps({
        "backend": backend,
        "rtt_ms": round(rtt * 1e3, 1),
        "launch_ms": round(max(0.0, (k_total - rtt)) / K * 1e3, 2),
        "fetch_mb_s": round(4.0 / _p50(fetches), 1),
        "put_mb_s": round(4.0 / _p50(puts), 1),
        "s3gen_like_f32_ms": round(_p50(tails) * 1e3, 1),
        "s3gen_like_i16_ms": round(_p50(tails16) * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
