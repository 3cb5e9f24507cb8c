"""S3Gen micro-batching scheduler tests (device-resident state contract)."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.models.s3gen import S3GenConfig, init_s3gen_params, s3gen_inference
from chatterbox_tpu.runtime.s3gen_scheduler import S3GenScheduler

CFG = S3GenConfig.tiny()
STATE_TOKENS = 16


@pytest.fixture(scope="module")
def setup():
    params = init_s3gen_params(jax.random.PRNGKey(0), CFG)
    ref = {
        "spk_emb": jnp.zeros((1, CFG.spk_dim), jnp.float32),
        "prompt_tokens": jnp.ones((1, CFG.max_prompt_tokens), jnp.int32),
        "prompt_len": jnp.array([4], jnp.int32),
        "prompt_mel": jnp.zeros((1, CFG.max_prompt_mel, CFG.n_mels), jnp.float32),
        "prompt_mel_len": jnp.array([8], jnp.int32),
    }
    return params, ref


def test_batched_matches_direct_call(setup):
    """A co-batched request must produce exactly what a direct call produces
    (per-request keys are preserved through the vmap). The scheduler returns
    only the audio TAIL plus a device-resident source-state row."""
    params, ref = setup
    T = 6
    spt = CFG.samples_per_token
    tokens = np.arange(T, dtype=np.int32)
    key = jax.random.PRNGKey(11)

    direct_wav, direct_src = s3gen_inference(
        params, CFG, jnp.asarray(tokens[None]), jnp.array([T], jnp.int32),
        ref, jnp.zeros((1, T * spt)), jnp.array([0], jnp.int32), key,
    )

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=4, state_tokens=STATE_TOKENS)
        try:
            # 4 jobs = one power-of-two batch (the scheduler slices queues
            # into power-of-two batches to bound the compiled-variant set)
            results = await asyncio.gather(
                *[sched.synthesize(tokens, T, ref, None, 0, key) for _ in range(4)]
            )
            return results
        finally:
            sched.stop()

    results = asyncio.run(run())
    # T < MAX_TAIL_TOKENS → the tail is the full waveform, start = 0
    for tail, start, state in results[1:]:
        assert start == 0
        np.testing.assert_array_equal(tail, results[0][0])
        np.testing.assert_array_equal(np.asarray(state), np.asarray(results[0][2]))
    tail0, _, state0 = results[0]
    assert tail0.shape == (T * spt,)
    state0 = np.asarray(state0)
    assert state0.shape == (STATE_TOKENS * spt,)
    # state row = new source, zero-padded to capacity
    np.testing.assert_allclose(state0[: T * spt], np.asarray(direct_src[0]), atol=1e-4)
    np.testing.assert_array_equal(state0[T * spt:], 0.0)
    # and the tail agrees with the direct (non-vmapped) call up to f32
    # reassociation — loose bound because the random-init vocoder's exp head
    # amplifies reordering noise; the excitation path is tanh-bounded
    corr = np.corrcoef(tail0, np.asarray(direct_wav[0]))[0, 1]
    assert corr > 0.99, corr


def test_state_roundtrip_and_shift(setup):
    """A second slice fed the returned state row (with a window shift) must
    see the source prefix: cache_len samples of the shifted state equal the
    new call's source overlay (the excitation-continuity contract)."""
    params, ref = setup
    spt = CFG.samples_per_token
    T = 6
    tokens = np.arange(T, dtype=np.int32)
    key = jax.random.PRNGKey(3)

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=4, state_tokens=STATE_TOKENS)
        try:
            tail1, _, state1 = await sched.synthesize(tokens, T, ref, None, 0, key)
            # re-synthesize with the cached source (cache_len = full prior
            # audio, shift = 1 token): deterministic given identical inputs
            a = await sched.synthesize(
                tokens, T, ref, state1, (T - 1) * spt, key,
                shift=spt, prev_rel=(T - 1) * spt,
            )
            b = await sched.synthesize(
                tokens, T, ref, state1, (T - 1) * spt, key,
                shift=spt, prev_rel=(T - 1) * spt,
            )
            return tail1, a, b
        finally:
            sched.stop()

    tail1, a, b = asyncio.run(run())
    # determinism: same inputs → identical tails and states
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    # tail windowing: start = min(prev_rel, T*spt - tail_len) = 0 here
    # (tail_len = T*spt when T < MAX_TAIL_TOKENS), so prev_rel indexes into it
    assert a[1] == 0
    assert np.isfinite(a[0]).all()


def test_mixed_buckets(setup):
    params, ref = setup
    spt = CFG.samples_per_token

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=4, state_tokens=STATE_TOKENS)
        try:
            jobs = []
            for T in (4, 8, 4, 8):
                tokens = np.zeros((T,), np.int32)
                jobs.append(
                    sched.synthesize(tokens, T, ref, None, 0, jax.random.PRNGKey(T))
                )
            return await asyncio.gather(*jobs)
        finally:
            sched.stop()

    results = asyncio.run(run())
    assert [len(t) for t, _, _ in results] == [4 * spt, 8 * spt, 4 * spt, 8 * spt]
    for t, _, _ in results:
        assert np.isfinite(t).all()


def test_error_propagates(setup):
    params, ref = setup

    async def run():
        sched = S3GenScheduler("BROKEN", CFG, state_tokens=STATE_TOKENS)
        try:
            with pytest.raises(Exception):
                await sched.synthesize(
                    np.zeros((4,), np.int32), 4, ref, None, 0, jax.random.PRNGKey(0)
                )
        finally:
            sched.stop()

    asyncio.run(run())


def test_allowed_batch_token_product_cap(setup):
    """HBM guard: batch×bucket is capped by the token-product budget
    (measured r3: batch 16 at the 1032-token bucket compiles to 18.85 GB on
    a 15.75 GB v5e), and compile/dispatch failures ratchet the cap down."""
    params, ref = setup
    sched = S3GenScheduler(params, CFG, max_batch=16, state_tokens=STATE_TOKENS)
    sched.batch_token_budget = 4096
    assert sched.allowed_batch(256) == 16
    assert sched.allowed_batch(264) == 8
    assert sched.allowed_batch(512) == 8
    assert sched.allowed_batch(1032) == 2
    sched.ban_batch(1032, 2)
    assert sched.allowed_batch(1032) == 1
    sched.ban_batch(256, 16)
    assert sched.allowed_batch(256) == 8


def test_batch_failure_retries_smaller(setup):
    """A failing batch>1 dispatch must re-queue the jobs at a smaller batch
    instead of failing the requests (only batch=1 failures are fatal)."""
    params, ref = setup

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=4, state_tokens=STATE_TOKENS)
        # poison the batch-4 variant with a stub that always raises
        sched._jit[(4, 4, False)] = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("synthetic OOM"))
        try:
            outs = await asyncio.gather(*[
                sched.synthesize(
                    np.zeros((4,), np.int32), 4, ref, None, 0,
                    jax.random.PRNGKey(i),
                )
                for i in range(4)
            ])
            assert len(outs) == 4
            for tail, start, state in outs:
                assert np.asarray(tail).ndim == 1
            # the failed variant is banned for the rest of the process
            assert sched.allowed_batch(4) <= 2
        finally:
            sched.stop()

    asyncio.run(run())


def test_tail_vocode_through_scheduler_matches_full():
    """With the ref arch's tail_infer, a full-overlap slice whose bucket
    exceeds the vocoder window (T > MAX_TAIL_TOKENS + 2·margin) must emit
    byte-identical audio to the full-vocode scheduler (exactness of the
    windowed fast path through the REAL batch/vmap/state plumbing)."""
    from chatterbox_tpu.models.s3gen_ref import (
        S3GenRefConfig,
        init_s3gen_ref_params,
        s3gen_ref_embed_ref,
        s3gen_ref_inference,
        s3gen_ref_inference_tail,
    )
    from chatterbox_tpu.runtime.s3gen_scheduler import MAX_TAIL_TOKENS

    cfg = S3GenRefConfig.tiny()
    spt = cfg.samples_per_token
    params = init_s3gen_ref_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    wav24 = jnp.asarray(rng.standard_normal((1, 2400)) * 0.1, jnp.float32)
    wav16 = jnp.asarray(rng.standard_normal((1, 1600)) * 0.1, jnp.float32)
    ref = s3gen_ref_embed_ref(params, cfg, wav24, jnp.array([2400]), wav16, jnp.array([1600]))

    def infer(p, tk, tl, rf, sr, cl, ky):
        return s3gen_ref_inference(p, cfg, tk, tl, rf, sr, cl, ky)

    def tail_infer(p, tk, tl, rf, sr, cl, ky, start, tail_len):
        return s3gen_ref_inference_tail(p, cfg, tk, tl, rf, sr, cl, ky, start, tail_len)

    # full-overlap slice 2 of a chunk: 160 accumulated tokens (> window),
    # 100 previously emitted; prev_rel inside the bucket
    T = 192
    acc = 160
    prev = 100 * spt
    assert T > MAX_TAIL_TOKENS  # windowing actually engages
    tokens = np.zeros((T,), np.int32)
    tokens[:acc] = rng.integers(0, 50, acc)
    key = jax.random.PRNGKey(21)
    state0 = jnp.zeros((T * spt + 64 * spt,), jnp.float32)

    prev2 = 60 * spt  # second stream at a different window position

    async def run(tail_fn):
        sched = S3GenScheduler(
            params, cfg, max_batch=2, infer=infer,
            state_tokens=T + 64, tail_infer=tail_fn,
        )
        try:
            # two concurrent jobs coalesce into ONE B=2 batch: the tail path
            # must window correctly per-row under vmap (different starts)
            return await asyncio.gather(
                sched.synthesize(tokens, acc, ref, state0, prev, key,
                                 shift=0, prev_rel=prev),
                sched.synthesize(tokens, acc, ref, state0, prev2, key,
                                 shift=0, prev_rel=prev2),
            )
        finally:
            sched.stop()

    res_w = asyncio.run(run(tail_infer))
    res_f = asyncio.run(run(None))
    for (tail_w, start_w, state_w), (tail_f, start_f, state_f) in zip(res_w, res_f):
        assert start_w == start_f
        valid = acc * spt - start_w  # samples of real audio inside the tail
        np.testing.assert_allclose(
            np.asarray(tail_w)[:valid], np.asarray(tail_f)[:valid], rtol=0, atol=2e-6
        )
        np.testing.assert_allclose(np.asarray(state_w), np.asarray(state_f), atol=0)


def test_odd_batch_pads_to_power_of_two(setup):
    """3 queued jobs must go out as ONE padded B=4 call (not 2+1): splitting
    a round doubles the per-call fixed dispatch cost (r3 Run B). Padded lanes
    repeat the last job and their outputs are dropped."""
    params, ref = setup
    T = 6
    tokens = np.arange(T, dtype=np.int32)
    key = jax.random.PRNGKey(3)

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=8, state_tokens=STATE_TOKENS)
        calls = []
        real_fn = sched._infer_fn

        def spy(Tb, B):
            calls.append((Tb, B))
            return real_fn(Tb, B)

        sched._infer_fn = spy
        try:
            res = await asyncio.gather(
                *[sched.synthesize(tokens, T, ref, None, 0, key) for _ in range(3)]
            )
            return calls, res
        finally:
            sched.stop()

    calls, res = asyncio.run(run())
    assert calls == [(T, 4)], calls  # one padded call, not (T,2)+(T,1)
    assert len(res) == 3
    for tail, start, _ in res:
        assert start == 0
        np.testing.assert_array_equal(tail, res[0][0])


def test_keep_state_false_returns_none(setup):
    """Zero-overlap callers discard the source row; the scheduler must skip
    the per-row device gather and hand back None."""
    params, ref = setup
    T = 6
    tokens = np.arange(T, dtype=np.int32)
    key = jax.random.PRNGKey(5)

    async def run():
        sched = S3GenScheduler(params, CFG, max_batch=4, state_tokens=STATE_TOKENS)
        try:
            keep = sched.synthesize(tokens, T, ref, None, 0, key, keep_state=True)
            drop = sched.synthesize(tokens, T, ref, None, 0, key, keep_state=False)
            return await asyncio.gather(keep, drop)
        finally:
            sched.stop()

    (tail_k, _, state_k), (tail_d, _, state_d) = asyncio.run(run())
    assert state_d is None
    assert state_k is not None
    np.testing.assert_array_equal(tail_k, tail_d)


def test_streaming_jobs_coalesce_and_carry_state():
    """Streaming full-overlap jobs (rstate in, rstate out): two concurrent
    jobs sharing one CFM prompt cache coalesce into a B=2 stream batch, each
    future carries its own new state tree, and the batched result matches
    the direct model-level call per lane."""
    from chatterbox_tpu.models.s3gen_ref import (
        S3GenRefConfig,
        init_s3gen_ref_params,
        init_s3gen_stream_state,
        s3gen_ref_embed_ref,
        s3gen_ref_inference_streaming,
        s3gen_ref_prompt_prefill,
    )
    from chatterbox_tpu.runtime.s3gen_scheduler import MAX_TAIL_TOKENS

    cfg = S3GenRefConfig.tiny()
    spt = cfg.samples_per_token
    fpt = cfg.flow.up_stride
    params = init_s3gen_ref_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    wav24 = jnp.asarray(rng.standard_normal((1, 2400)) * 0.1, jnp.float32)
    wav16 = jnp.asarray(rng.standard_normal((1, 1600)) * 0.1, jnp.float32)
    ref = s3gen_ref_embed_ref(params, cfg, wav24, jnp.array([2400]), wav16,
                              jnp.array([1600]))
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))

    T = 16
    new_block = min(MAX_TAIL_TOKENS, T)

    def stream_infer(p, tk, tl, nl, rf, sr, cl, ky, start, tail_len, rs,
                     nb, cache=None):
        return s3gen_ref_inference_streaming(
            p, cfg, tk, tl, nl, rf, sr, cl, ky, start, tail_len, rs, nb,
            cfm_cache=cache)

    st0 = init_s3gen_stream_state(cfg, cache, window=32, cap_tokens=T)
    tokens_a = np.zeros((T,), np.int32)
    tokens_a[:8] = rng.integers(0, 50, 8)
    tokens_b = np.zeros((T,), np.int32)
    tokens_b[:6] = rng.integers(0, 50, 6)
    key_a, key_b = jax.random.PRNGKey(21), jax.random.PRNGKey(22)
    state0 = jnp.zeros(((T + 64) * spt,), jnp.float32)

    async def run():
        sched = S3GenScheduler(
            params, cfg, max_batch=2,
            infer=lambda *a, **k: (_ for _ in ()).throw(AssertionError),
            state_tokens=T + 64, stream_infer=stream_infer,
        )
        try:
            return await asyncio.gather(
                sched.synthesize(tokens_a, 8, ref, state0, 0, key_a,
                                 prev_rel=0, cache=cache, new_len=8,
                                 rstate=st0),
                sched.synthesize(tokens_b, 6, ref, state0, 0, key_b,
                                 prev_rel=0, cache=cache, new_len=6,
                                 rstate=st0),
            )
        finally:
            sched.stop()

    (tail_a, start_a, src_a, rs_a), (tail_b, start_b, src_b, rs_b) = (
        asyncio.run(run())
    )
    assert int(jnp.asarray(rs_a["cfm"]["frames"])[0]) == 8 * fpt
    assert int(jnp.asarray(rs_b["cfm"]["frames"])[0]) == 6 * fpt

    # per-lane equality vs the direct model call (same graph inputs). The
    # state (mel buffer) and excitation compare at fp32-noise tolerance; the
    # WAV only loosely — the random-weight vocoder saturates at ±0.99 and
    # amplifies ~1e-7 jit-vs-eager float reorderings to ~1e-2 (measured).
    for toks, n, key, tail, start, src, rs in (
        (tokens_a, 8, key_a, tail_a, start_a, src_a, rs_a),
        (tokens_b, 6, key_b, tail_b, start_b, src_b, rs_b),
    ):
        want_tail, want_src, want_rs = s3gen_ref_inference_streaming(
            params, cfg, jnp.asarray(toks)[None], jnp.array([n]),
            jnp.array([n]), ref, jnp.zeros((1, T * spt), jnp.float32),
            jnp.array([0]), key, jnp.array([start]),
            min(MAX_TAIL_TOKENS, T) * spt, st0, new_block, cfm_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(rs["mel"]), np.asarray(want_rs["mel"]),
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(src)[: T * spt], np.asarray(want_src)[0],
            rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(tail), np.asarray(want_tail)[0], rtol=0, atol=5e-2)
