"""Precompile coverage: every jit variant the serving path can request must
be in TTSEngine._precompile_plan().

Motivation (r3 serving bench): variants missing from the precompile
enumeration compile at first traffic INSIDE a measured wave — minutes-long
batched-S3Gen compiles and ~12 s/view decode compiles turned a 16-stream
warmup wave into 1105 s of wall. This test simulates the live demand
formulas (scheduler view bucketing, stitcher token accumulation, insert
text buckets) exhaustively over reachable request parameters and asserts
demand ⊆ plan, so enumeration drift fails fast on CPU instead of stalling
a TPU wave."""
import asyncio
import dataclasses

import pytest

from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import EngineConfig, TTSEngine
from chatterbox_tpu.runtime.engine import (
    SLICE_SIZE_SNAP,
    _bucket,
    _lookahead_size,
    _snap_slice_size,
    _token_bucket_sizes,
)
from chatterbox_tpu.runtime.scheduler import LOOKAHEAD_STEPS


@pytest.fixture(scope="module")
def engine():
    import os

    os.environ["MAX_DECODE_SLOTS"] = "4"
    # conftest disables background precompile suite-wide; this module tests
    # exactly that path, so re-enable it for this engine
    os.environ["CHATTERBOX_PRECOMPILE"] = "1"
    # the TPU serving default: int8 KV in the paired (kernel) layout
    reset_config_cache()
    cfg = EngineConfig.tiny()
    # max_new_tokens=24 shrinks the S3Gen bucket ladder the fixture must
    # actually WARM (1-CPU box; full-size plan coverage is tested separately
    # on a stub engine below) while keeping >1 bucket + batched variants live
    cfg = dataclasses.replace(
        cfg,
        max_new_tokens=24,
        t3=cfg.t3.with_(kv_cache_dtype="int8", kv_cache_layout="paired"),
    )
    eng = TTSEngine(cfg)

    async def boot():
        await eng.ainit()
        # precompile is a background task on ainit's loop: await it here so
        # the dispatch-cache assertions below see the warmed variants
        if eng._precompile_task is not None:
            await eng._precompile_task

    asyncio.run(boot())
    yield eng
    eng.shutdown()
    os.environ.pop("MAX_DECODE_SLOTS", None)
    os.environ["CHATTERBOX_PRECOMPILE"] = "0"
    reset_config_cache()


def test_decode_views_covered(engine):
    """Every (n_steps, s_view) the batched scheduler can request is planned."""
    plan = set(engine._precompile_plan()["decode"])
    t3c = engine.cfg.t3
    dec = engine.decoder
    cap = engine.cfg.max_new_tokens
    lengths = set(LOOKAHEAD_STEPS) | {dec.slice_size}
    # worst admitted position: largest text bucket, slot held until its
    # produced count crosses the engine cap (pos_host advances by n per slice)
    p_max = t3c.cond_len + t3c.max_text_tokens
    for n in lengths:
        for pos in range(t3c.cond_len + engine.cfg.text_bucket, p_max + cap):
            need = pos + n + 1
            view = min(t3c.max_seq_len, ((need + 255) // 256) * 256)
            assert (n, view) in plan, (
                f"decode variant (n={n}, view={view}) reachable at pos={pos} "
                "but not precompiled"
            )


def test_insert_buckets_covered(engine):
    """Every prefill-insert text bucket is planned."""
    plan = set(engine._precompile_plan()["insert"])
    t3c = engine.cfg.t3
    for n_text in range(1, t3c.max_text_tokens + 1):
        t_pad = _bucket(n_text, engine.cfg.text_bucket, t3c.max_text_tokens)
        assert t_pad in plan, f"insert T_pad={t_pad} (len {n_text}) not precompiled"


def test_s3gen_buckets_and_batches_covered(engine):
    """Every (bucket, batch) the stitcher + scheduler can form is planned."""
    p = engine._precompile_plan()
    plan_T = set(p["s3gen"])
    plan_TB = set(p["s3gen_batched"])
    cap = engine._reachable_token_cap()
    sch = engine.s3gen_scheduler
    for req in range(1, 201):  # any raw audio_tokens_per_slice knob value
        s = _snap_slice_size(req, engine.cfg.max_new_tokens)
        buckets = _token_bucket_sizes(s, cap)
        # accumulated full-overlap counts reach max_new_tokens + 1 (EOS code)
        for c in range(3, min(cap, engine.cfg.max_new_tokens + 1) + 1):
            T = next((b for b in buckets if b >= c), None)
            assert T is not None, f"no bucket for count {c} at slice {s}"
            assert T in plan_T, f"S3Gen bucket {T} (count {c}) not precompiled"
            b = 1
            while b <= sch.allowed_batch(T):
                assert (T, b) in plan_TB, (
                    f"S3Gen batched variant (T={T}, B={b}) not precompiled"
                )
                b *= 2


def _fake_full_engine(max_new_tokens=250):
    """Full-size serving config on a stub engine: _precompile_plan reads only
    cfg + decoder.slice_size + s3gen_scheduler.allowed_batch, so the FULL
    config's coverage is checkable without touching JAX (the r3 gaps were
    full-config-only; the tiny config has a single view bucket)."""
    import types

    from chatterbox_tpu.config import get_tts_config
    from chatterbox_tpu.runtime.s3gen_scheduler import S3GenScheduler

    cfg = EngineConfig.full()
    # the engine constructor flips to the paired layout when the Pallas
    # kernel is active (TPU serving default) — model that explicitly here
    cfg = dataclasses.replace(
        cfg,
        max_new_tokens=max_new_tokens,
        t3=cfg.t3.with_(kv_cache_dtype="int8", kv_cache_layout="paired"),
    )
    eng = types.SimpleNamespace(cfg=cfg)
    eng.decoder = types.SimpleNamespace(
        slice_size=get_tts_config().AUDIO_TOKENS_PER_SLICE
    )
    sched = S3GenScheduler.__new__(S3GenScheduler)
    sched.max_batch = 16
    sched.batch_token_budget = 4096
    sched._batch_cap = {}
    eng.s3gen_scheduler = sched
    eng._reachable_token_cap = lambda: TTSEngine._reachable_token_cap(eng)
    eng._reachable_view_cap = lambda d, s: TTSEngine._reachable_view_cap(eng, d, s)
    eng._precompile_plan = lambda: TTSEngine._precompile_plan(eng)
    return eng


@pytest.mark.parametrize("max_new", [250, 1000])
def test_full_config_decode_views_covered(max_new):
    eng = _fake_full_engine(max_new)
    plan = set(eng._precompile_plan()["decode"])
    t3c = eng.cfg.t3
    lengths = set(LOOKAHEAD_STEPS) | {eng.decoder.slice_size}
    p_max = t3c.cond_len + t3c.max_text_tokens
    for n in lengths:
        for pos in range(t3c.cond_len + eng.cfg.text_bucket, p_max + eng.cfg.max_new_tokens):
            need = pos + n + 1
            view = min(t3c.max_seq_len, ((need + 255) // 256) * 256)
            assert (n, view) in plan, (n, view, pos)


@pytest.mark.parametrize("max_new", [250, 1000])
def test_full_config_s3gen_covered(max_new):
    eng = _fake_full_engine(max_new)
    p = eng._precompile_plan()
    plan_T, plan_TB = set(p["s3gen"]), set(p["s3gen_batched"])
    cap = eng._reachable_token_cap()
    for req in range(1, 201):
        s = _snap_slice_size(req, eng.cfg.max_new_tokens)
        buckets = _token_bucket_sizes(s, cap)
        for c in range(3, min(cap, eng.cfg.max_new_tokens + 1) + 1):
            T = next((b for b in buckets if b >= c), None)
            assert T is not None and T in plan_T, (s, c, T)
            b = 1
            while b <= eng.s3gen_scheduler.allowed_batch(T):
                assert (T, b) in plan_TB, (T, b)
                b *= 2


def test_precompile_populates_dispatch_caches(engine):
    """Precompile must warm the jit DISPATCH caches with real dispatches —
    lower().compile() fills only the persistent XLA cache, so first traffic
    re-traced every variant (the r3 serving wave paid ~10-60 s per variant
    of single-CPU re-trace, starving the thread pool into 49 s/slice)."""
    from chatterbox_tpu.models.t3 import t3_decode_slice

    plan = engine._precompile_plan()
    # every planned decode variant traced+compiled (global cache: >= holds
    # even if other tests added entries)
    assert t3_decode_slice._cache_size() >= len(plan["decode"])
    # every insert text bucket has its jit built
    assert set(engine.decoder._insert_jit) >= set(plan["insert"])
    # every (bucket, batch) S3Gen variant the scheduler can form is built.
    # _jit keys are (T, B, cached) for re-solve and (T, B, nb, "stream") for
    # streaming: project to (T, B) / (T, B, nb) per mode — which cached flag
    # live traffic uses depends on the voice's CFM cache, and precompile
    # warms the same flag it will see.
    built = {k[:2] for k in engine.s3gen_scheduler._jit if len(k) == 3}
    assert built >= set(plan["s3gen_batched"])
    built_stream = {
        k[:3] for k in engine.s3gen_scheduler._jit
        if len(k) == 4 and k[3] == "stream"
    }
    assert built_stream >= set(plan["s3gen_stream"])


def test_plan_is_bounded(engine):
    """The r3 lesson cuts both ways: unreachable variants burn ~10-60 s of
    single-CPU trace+lower each (2019 s of precompile measured). Keep the
    plan tight."""
    p = engine._precompile_plan()
    assert len(p["decode"]) <= 60
    assert len(p["s3gen"]) + len(p["s3gen_batched"]) <= 120
    assert len(p["insert"]) <= 32


@pytest.mark.parametrize("max_new", [250, 1000])
def test_full_config_s3gen_stream_covered(max_new):
    """With streaming full-overlap active (ref arch + step prompt cache),
    accumulated-bucket demand rides the STREAM graphs and the plain re-solve
    graphs stay reachable only through zero-overlap slices — the plan must
    cover both demand sets."""
    from chatterbox_tpu.runtime.s3gen_scheduler import stream_block_tokens

    eng = _fake_full_engine(max_new)
    eng.s3gen_scheduler._stream_infer = object()   # as the ref arch wires it
    p = eng._precompile_plan()
    plan_stream, plan_TB = set(p["s3gen_stream"]), set(p["s3gen_batched"])
    cap = eng._reachable_token_cap()
    for req in range(1, 201):
        s = _snap_slice_size(req, eng.cfg.max_new_tokens)
        buckets = _token_bucket_sizes(s, cap)
        # full-overlap accumulated counts → stream graphs; the dispatcher
        # sizes the static block to the batch's max new_len (≤ slice + EOS)
        nb_demand = {stream_block_tokens(n, 10**9)
                     for n in range(1, min(s + 1, cap) + 1)}
        for c in range(3, min(cap, eng.cfg.max_new_tokens + 1) + 1):
            T = next((b for b in buckets if b >= c), None)
            b = 1
            while b <= eng.s3gen_scheduler.allowed_batch(T):
                for nb in nb_demand:
                    assert (T, b, min(nb, T)) in plan_stream, (T, b, nb)
                b *= 2
        # zero-overlap counts (≤ slice+EOS, min-3 pad) → re-solve graphs
        for c in range(3, min(s + 1, cap) + 1):
            T = next((b for b in buckets if b >= c), None)
            b = 1
            while b <= eng.s3gen_scheduler.allowed_batch(T):
                assert (T, b) in plan_TB, (T, b)
                b *= 2


def test_precompile_slices_env_restricts_plan(monkeypatch):
    """CHATTERBOX_PRECOMPILE_SLICES=35 keeps only the default slice ladder:
    bench runs pin the one slice size they exercise, because the full 7-slice
    plan costs hours of single-CPU compile (r5: OOM-walked a 125 GB host).
    The restricted plan must stay a subset of the full plan, and the full
    ladder for the kept slice must survive intact."""
    eng = _fake_full_engine(250)
    eng.s3gen_scheduler._stream_infer = object()
    full = eng._precompile_plan()
    monkeypatch.setenv("CHATTERBOX_PRECOMPILE_SLICES", "35")
    slim = eng._precompile_plan()
    for key in ("s3gen", "s3gen_batched", "s3gen_stream", "decode", "insert"):
        assert set(slim[key]) <= set(full[key]), key
    cap = eng._reachable_token_cap()
    assert set(slim["s3gen"]) == set(_token_bucket_sizes(35, cap))
    # exotic exact-fit buckets are gone; the shared doubling ladder stays
    assert 8 not in slim["s3gen"] and 100 not in slim["s3gen"]
    # a bogus value falls back to the full snap set rather than an empty plan
    monkeypatch.setenv("CHATTERBOX_PRECOMPILE_SLICES", "999")
    assert set(eng._precompile_plan()["s3gen"]) == set(full["s3gen"])
