#!/usr/bin/env python
"""Measured serving benchmark: real server, N concurrent streams, real TTFA.

VERDICT r1 item 4: the headline numbers must be measured under load, not
derived. This starts the actual aiohttp app (full model by default) in-process,
fires warm-up waves until the compile caches are hot, then N concurrent
/tts/generate requests, and reports per-request TTFA (first body chunk, the
reference's probe — /root/reference/src/tts_streaming.py:953-955) and
streaming RTF (wall / audio seconds) from the client's side of the socket.

Usage (TPU):
    python scripts/serve_bench.py [--streams 16] [--warmup-waves 2] [--tiny]
Prints one JSON line:
    {"streams": N, "realtime_streams": M, "ttfa_p50_ms": ..., "ttfa_p99_ms":
     ..., "rtf_p50": ..., "rtf_max": ..., "audio_s_total": ..., "wall_s": ...}
"""
import argparse
import asyncio
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = (
    "The quick brown fox jumps over the lazy dog while the orchestra plays "
    "a long and winding melody that never quite resolves, keeping every "
    "listener waiting for the final chord."
)


async def _one_request(session, url: str, idx: int, overlap: str = "full") -> dict:
    t0 = time.perf_counter()
    ttfa = None
    n_bytes = 0
    params = {
        "text": TEXT,
        "format": "wav",
        "request_id": f"serve-bench-{idx}",
        "chunk_overlap_strategy": overlap,
    }
    if os.environ.get("SERVE_BENCH_SLICE"):
        params["audio_tokens_per_slice"] = os.environ["SERVE_BENCH_SLICE"]
    ttfa_audio = None
    async with session.get(url, params=params) as resp:
        assert resp.status == 200, f"status {resp.status}"
        async for chunk in resp.content.iter_chunked(65536):
            if ttfa is None and chunk:
                ttfa = time.perf_counter() - t0
            n_bytes += len(chunk)
            # first bytes past the 44-byte WAV header = first actual audio;
            # at low load the first-body-chunk probe (reference methodology)
            # measures only the header flush
            if ttfa_audio is None and n_bytes > 44:
                ttfa_audio = time.perf_counter() - t0
    wall = time.perf_counter() - t0
    audio_s = max(n_bytes - 44, 0) / 2 / 24000  # 16-bit mono 24 kHz after header
    return {"ttfa": ttfa or wall, "ttfa_audio": ttfa_audio or wall,
            "wall": wall, "audio_s": audio_s}


async def run(args) -> None:
    import aiohttp
    from aiohttp import web

    from chatterbox_tpu.serve.app import create_app

    app = create_app(warm_voices=False)
    runner = web.AppRunner(app)
    await runner.setup()
    port = int(os.environ.get("PORT", "8046"))
    site = web.TCPSite(runner, "127.0.0.1", port)
    await site.start()

    engine = app["engine"]
    t0 = time.perf_counter()
    while engine.get_initialization_status()["state"] != "ready":
        await asyncio.sleep(1.0)
        if time.perf_counter() - t0 > 3600:
            raise TimeoutError("engine never became ready")
    sys.stderr.write(f"engine ready in {time.perf_counter()-t0:.0f}s\n")
    # wait out the background precompilation: it compiles every (bucket,
    # batch) graph variant on the single host CPU — measuring waves while it
    # runs records compile stalls as device time and starves the event loop
    if engine._precompile_task is not None:
        t0 = time.perf_counter()
        await engine._precompile_task
        sys.stderr.write(f"precompile finished in {time.perf_counter()-t0:.0f}s\n")

    url = f"http://127.0.0.1:{port}/tts/generate"
    headers = {"X-API-Key": os.environ.get("API_KEY", "bench")}
    conn = aiohttp.TCPConnector(limit=args.streams * 2)
    # no client timeout: the first warm-up wave may sit behind request-time
    # graph compiles far longer than aiohttp's 300 s default
    timeout = aiohttp.ClientTimeout(total=None)
    async with aiohttp.ClientSession(headers=headers, connector=conn, timeout=timeout) as session:
        # warm BOTH overlap modes: zero-overlap slices carry different token
        # counts than full, so a full-only warmup leaves the first measured
        # zero wave paying request-time compiles (seen as a 3.7 s mid-wave
        # stall in the r3 tiny run)
        for wave in range(args.warmup_waves):
            for overlap in ("full", "zero"):
                t0 = time.perf_counter()
                r = await asyncio.gather(*[
                    _one_request(session, url, 10_000 * (wave + 1) + i, overlap)
                    for i in range(args.streams)
                ])
                sys.stderr.write(
                    f"warmup wave {wave} ({overlap}): "
                    f"{time.perf_counter()-t0:.1f}s wall, "
                    f"{sum(x['audio_s'] for x in r):.1f}s audio\n"
                )
        async def stage_snapshot() -> dict:
            async with session.get(
                f"http://127.0.0.1:{port}/system-status"
            ) as resp:
                data = await resp.json()
            return data.get("metrics", {}).get("stages", {})

        async def run_wave(n: int, overlap: str, idx0: int) -> dict:
            stages0 = await stage_snapshot()
            t0 = time.perf_counter()
            results = await asyncio.gather(*[
                _one_request(session, url, idx0 + i, overlap) for i in range(n)
            ])
            wall = time.perf_counter() - t0
            stages1 = await stage_snapshot()
            breakdown = {}
            for name, s1 in stages1.items():
                dt = round(s1["time_s"] - stages0.get(name, {}).get("time_s", 0.0), 2)
                dn = s1["count"] - stages0.get(name, {}).get("count", 0)
                if dn:
                    breakdown[name] = {"time_s": dt, "count": dn}
            ttfas = sorted(r["ttfa"] for r in results)
            ttfas_audio = sorted(r["ttfa_audio"] for r in results)
            rtfs = sorted(r["wall"] / max(r["audio_s"], 1e-6) for r in results)
            return {
                "overlap": overlap,
                "streams": n,
                "realtime_streams": sum(1 for r in rtfs if r < 1.0),
                "ttfa_p50_ms": round(statistics.median(ttfas) * 1e3, 1),
                "ttfa_audio_p50_ms": round(statistics.median(ttfas_audio) * 1e3, 1),
                "ttfa_p99_ms": round(ttfas[min(len(ttfas) - 1, int(0.99 * len(ttfas)))] * 1e3, 1),
                "rtf_p50": round(statistics.median(rtfs), 4),
                "rtf_max": round(rtfs[-1], 4),
                "audio_s_total": round(sum(r["audio_s"] for r in results), 1),
                "wall_s": round(wall, 1),
                "stages": breakdown,
            }

        results_out = []
        out_path = os.environ.get(
            "SERVE_BENCH_OUT",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "serve_bench_results.json"),
        )

        def persist(partial: bool) -> None:
            # persist for bench.py to embed (VERDICT r2 item 8) — after EVERY
            # wave, not only at the end: the tunneled runtime has multi-hour
            # outages mid-run, and a partial sweep is still an honest
            # measurement (rows carry which waves ran)
            if out_path and out_path != "0":
                with open(out_path, "w") as f:
                    json.dump(
                        {"measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                         "tiny": bool(args.tiny), "partial": partial,
                         "results": results_out},
                        f, indent=1,
                    )

        if args.capacity:
            # Capacity sweep: the N-stream simultaneous wave is lockstep (all
            # requests share the batched decode and finish together), so
            # realtime_streams is all-or-nothing per wave. The honest measured
            # capacity is the largest N whose N-stream wave holds RTF < 1 for
            # every stream.
            capacity = {}
            for overlap in ("full", "zero"):
                cap, base, misses = 0, 3000, 0
                # start at 2 so a sub-6-stream capacity still measures as a
                # nonzero honest number; coarsen toward the 16-stream target.
                # A single failed rung does NOT stop the ladder: a non-pow2
                # wave (10, 12) pads the batched S3Gen graphs to the next
                # power of two (37%+ wasted lanes at 10) and can fail while
                # the exact-fit 16-stream wave passes — capacity is the MAX
                # passing rung; two consecutive misses end the sweep.
                for n in (2, 4, 6, 8, 10, 12, 16, 20, 24, 28, 32):
                    if n > args.streams:
                        break
                    out = await run_wave(n, overlap, base + 100 * n)
                    print(json.dumps(out), flush=True)
                    results_out.append(out)
                    persist(partial=True)
                    if out["realtime_streams"] == n:
                        cap, misses = n, 0
                    else:
                        misses += 1
                        if misses >= 2:
                            break
                capacity[overlap] = cap
            cap_row = {"capacity_streams": capacity}
            print(json.dumps(cap_row), flush=True)
            results_out.append(cap_row)
        elif args.churn:
            # Admission-churn cost of the first-audio dispatch gate (VERDICT
            # r4 item 7): many SHORT staggered requests (high admission rate)
            # so the decode loop hits the gate's bounded wait constantly.
            # A/B: run once with CHATTERBOX_FIRST_AUDIO_GATE=1 (default) and
            # once =0; the row records the gate setting. Short requests come
            # from CHATTERBOX_MAX_NEW_TOKENS (main() sets 75 ≈ 3 s audio).
            gate = os.environ.get("CHATTERBOX_FIRST_AUDIO_GATE", "1")
            n = args.streams
            stagger_s = args.churn_stagger_ms / 1e3

            async def staggered(i: int):
                await asyncio.sleep(i * stagger_s)
                return await _one_request(session, url, 20_000 + i, "full")

            stages0 = await stage_snapshot()
            t0 = time.perf_counter()
            results = await asyncio.gather(*[staggered(i) for i in range(n)])
            wall = time.perf_counter() - t0
            stages1 = await stage_snapshot()
            breakdown = {
                name: {"time_s": round(s1["time_s"] - stages0.get(name, {}).get("time_s", 0.0), 2),
                       "count": s1["count"] - stages0.get(name, {}).get("count", 0)}
                for name, s1 in stages1.items()
                if s1["count"] != stages0.get(name, {}).get("count", 0)
            }
            ttfas_audio = sorted(r["ttfa_audio"] for r in results)
            rtfs = sorted(r["wall"] / max(r["audio_s"], 1e-6) for r in results)
            audio_total = sum(r["audio_s"] for r in results)
            out = {
                "mode": "churn",
                "first_audio_gate": gate,
                "streams": n,
                "stagger_ms": args.churn_stagger_ms,
                "realtime_streams": sum(1 for r in rtfs if r < 1.0),
                "ttfa_audio_p50_ms": round(statistics.median(ttfas_audio) * 1e3, 1),
                "ttfa_audio_p99_ms": round(ttfas_audio[min(len(ttfas_audio) - 1, int(0.99 * len(ttfas_audio)))] * 1e3, 1),
                "rtf_p50": round(statistics.median(rtfs), 4),
                "rtf_max": round(rtfs[-1], 4),
                "audio_s_total": round(audio_total, 1),
                "wall_s": round(wall, 1),
                "aggregate_x": round(audio_total / wall, 2),
                "stages": breakdown,
            }
            print(json.dumps(out), flush=True)
            # merge with prior churn rows (the gate A/B is two invocations)
            if out_path and out_path != "0":
                prior = []
                if os.path.exists(out_path):
                    try:
                        with open(out_path) as f:
                            prior = json.load(f).get("results", [])
                    except (OSError, ValueError):
                        prior = []
                with open(out_path, "w") as f:
                    json.dump({"measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                               "tiny": bool(args.tiny), "partial": False,
                               "results": prior + [out]}, f, indent=1)
            out_path = "0"  # already persisted; skip the trailing persist()
        else:
            # host-vs-device breakdown (VERDICT r2 item 1): stage seconds
            # accumulated by the engine during each wave (device stages time
            # blocking dispatch+fetch; host stages time numpy/stitch work)
            for overlap in ("full", "zero"):
                out = await run_wave(args.streams, overlap, 1000)
                results_out.append(out)
                print(json.dumps(out), flush=True)
                persist(partial=True)
        persist(partial=False)
    await runner.cleanup()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--warmup-waves", type=int, default=2)
    ap.add_argument("--capacity", action="store_true",
                    help="sweep wave sizes upward and report the largest "
                         "all-realtime wave per overlap mode")
    ap.add_argument("--churn", action="store_true",
                    help="staggered SHORT requests (high admission rate) — "
                         "measures the first-audio dispatch gate's cost; A/B "
                         "via CHATTERBOX_FIRST_AUDIO_GATE=1/0")
    ap.add_argument("--churn-stagger-ms", type=float, default=200.0)
    ap.add_argument("--tiny", action="store_true", help="tiny random model (CI/CPU)")
    args = ap.parse_args()
    os.environ.setdefault("API_KEY", "bench")
    if args.churn:
        # short requests: ~3 s audio per text chunk so admissions dominate
        os.environ.setdefault("CHATTERBOX_MAX_NEW_TOKENS", "75")
        # churn rows go to their own file: the capacity sweep's
        # serve_bench_results.json is bench.py's headline source
        os.environ.setdefault(
            "SERVE_BENCH_OUT",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "churn_bench_results.json"),
        )
    # the reference default caps in-flight synthesis at 1 per worker
    # (config.py CONCURRENT_REQUESTS_PER_WORKER) — a load test must lift it
    # or it measures queue wait, not serving capacity
    os.environ.setdefault("CONCURRENT_REQUESTS_PER_WORKER", str(args.streams))
    # random weights never emit EOS, so cap decode at ~10 s audio per text
    # chunk — matches real-checkpoint EOS behavior (BENCH_NOTES r2); without
    # it the "full"-overlap quadratic re-synthesis dwarfs any real workload
    os.environ.setdefault("CHATTERBOX_MAX_NEW_TOKENS", "250")
    if args.tiny:
        os.environ.setdefault("CHATTERBOX_TINY_MODEL", "1")
    # the TPU backend must be touched on the main thread BEFORE any asyncio
    # loop exists (CLAUDE.md: blocking device waits take ~20 s otherwise)
    from chatterbox_tpu.runtime.engine import ensure_backend_initialized

    ensure_backend_initialized()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
