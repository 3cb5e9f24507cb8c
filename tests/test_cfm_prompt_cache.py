"""CFM prompt-cache (s3gen_ref_prompt_prefill / cfm_generate_cached) tests.

The cache freezes the voice-prompt region's per-Euler-step context (K/V,
conv boundary frames, GroupNorm statistics) so per-slice synthesis solves
only the generated frames (BENCH_NOTES r3 lever 4; reference counterpart:
the full [prompt | accumulated] re-encode at
/root/reference/src/tts_streaming.py:655-659, 681-688).

Proof structure:
* each caching mechanism is EXACT by construction — unit-tested here
  (conv halo, GroupNorm sufficient-statistics merge, cross-attention
  against frozen K/V);
* with an EMPTY prompt the whole cached pipeline must equal the uncached
  one bit-for-bit (up to fp reassociation) — the end-to-end plumbing test;
* with a real prompt the remaining difference is the documented one-way
  deviation (prompt frames never see generated frames), quantified at full
  size by scripts/quality_study.py.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    s3gen_ref_inference,
    s3gen_ref_prompt_prefill,
)
from chatterbox_tpu.models.s3gen_ref.decoder import (
    _conv_h,
    _group_norm,
    _tf_block,
    init_estimator_params,
)
from chatterbox_tpu.ops.conv import conv1d


@pytest.fixture(scope="module")
def cfg():
    return S3GenRefConfig.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_s3gen_ref_params(jax.random.PRNGKey(0), cfg)


def _ref_dict(cfg, key, prompt_len: int):
    """Synthetic conditioning dict with `prompt_len` valid prompt tokens."""
    P, Pm = cfg.max_prompt_tokens, cfg.max_prompt_mel
    up = cfg.flow.up_stride
    k1, k2, k3 = jax.random.split(key, 3)
    tokens = jax.random.randint(k1, (1, P), 0, cfg.vocab_size)
    tokens = jnp.where(jnp.arange(P)[None] < prompt_len, tokens, 0)
    mel_len = prompt_len * up
    mel = jax.random.normal(k2, (1, Pm, cfg.n_mels), jnp.float32)
    mel = jnp.where(jnp.arange(Pm)[None, :, None] < mel_len, mel, 0.0)
    return {
        "spk_emb": jax.random.normal(k3, (1, cfg.spk_dim), jnp.float32),
        "prompt_tokens": tokens.astype(jnp.int32),
        "prompt_len": jnp.array([prompt_len], jnp.int32),
        "prompt_mel": mel,
        "prompt_mel_len": jnp.array([mel_len], jnp.int32),
    }


def _run_inference(params, cfg, ref, cache, key, T=8, token_len=6):
    tokens = jnp.asarray(
        np.random.RandomState(7).randint(0, cfg.vocab_size, (1, T)), jnp.int32
    )
    spt = cfg.samples_per_token
    wav, src = s3gen_ref_inference(
        params, cfg, tokens, jnp.array([token_len], jnp.int32), ref,
        jnp.zeros((1, T * spt), jnp.float32), jnp.array([0], jnp.int32),
        key, cfm_cache=cache,
    )
    return np.asarray(wav), np.asarray(src)


def test_empty_prompt_cached_path_is_exact(params, cfg):
    """With zero valid prompt tokens the cached solve must equal the
    uncached one: the frozen context is entirely masked, the generated
    region's noise comes from the same buffer positions, and every merge
    degenerates to the plain computation. The mel track is exact to fp
    reassociation (~1e-6, measured 5e-7: the merged-stats GroupNorm formula
    vs the two-pass one); the HiFT ISTFT amplifies that into a few 1e-3
    samples of the waveform, so the wav tolerance is looser."""
    from chatterbox_tpu.models.s3gen_ref.model import _mel_and_source

    ref = _ref_dict(cfg, jax.random.PRNGKey(1), prompt_len=0)
    key = jax.random.PRNGKey(42)
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))

    T, spt = 8, cfg.samples_per_token
    tokens = jnp.asarray(
        np.random.RandomState(7).randint(0, cfg.vocab_size, (1, T)), jnp.int32
    )
    args = (params, cfg, tokens, jnp.array([6], jnp.int32), ref,
            jnp.zeros((1, T * spt), jnp.float32), jnp.array([0], jnp.int32), key)
    mel_c, src_c = _mel_and_source(*args, cfm_cache=cache)
    mel_u, src_u = _mel_and_source(*args)
    np.testing.assert_allclose(np.asarray(mel_c), np.asarray(mel_u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(src_c), np.asarray(src_u), atol=1e-6)

    wav_c, _ = _run_inference(params, cfg, ref, cache, key)
    wav_u, _ = _run_inference(params, cfg, ref, None, key)
    np.testing.assert_allclose(wav_c, wav_u, atol=2e-2)


def test_real_prompt_cached_path_differs_but_is_finite(params, cfg):
    """With a real prompt the one-way deviation makes cached ≠ uncached;
    both must be finite and the cached output must actually USE the cache
    (a different voice prompt changes the cached output)."""
    ref = _ref_dict(cfg, jax.random.PRNGKey(2), prompt_len=cfg.max_prompt_tokens)
    key = jax.random.PRNGKey(43)
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))
    wav_c, _ = _run_inference(params, cfg, ref, cache, key)
    wav_u, _ = _run_inference(params, cfg, ref, None, key)
    assert np.all(np.isfinite(wav_c))
    assert not np.allclose(wav_c, wav_u, atol=1e-6)

    ref2 = _ref_dict(cfg, jax.random.PRNGKey(5), prompt_len=cfg.max_prompt_tokens)
    cache2 = s3gen_ref_prompt_prefill(params, cfg, ref2, jax.random.PRNGKey(777))
    wav_c2, _ = _run_inference(params, cfg, ref2, cache2, key)
    assert not np.allclose(wav_c, wav_c2, atol=1e-6)


def test_cached_path_is_deterministic(params, cfg):
    ref = _ref_dict(cfg, jax.random.PRNGKey(3), prompt_len=4)
    key = jax.random.PRNGKey(44)
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))
    wav_a, _ = _run_inference(params, cfg, ref, cache, key)
    wav_b, _ = _run_inference(params, cfg, ref, cache, key)
    np.testing.assert_array_equal(wav_a, wav_b)


def test_static_cache_mode_runs(params, cfg):
    """S=1 cache (one context reused every Euler step) is a further
    documented deviation; it must run and stay finite."""
    ref = _ref_dict(cfg, jax.random.PRNGKey(4), prompt_len=cfg.max_prompt_tokens)
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))
    static = {
        "est": jax.tree.map(lambda a: a[-1:], cache["est"]),
        "pv": cache["pv"],
    }
    wav, _ = _run_inference(params, cfg, ref, static, jax.random.PRNGKey(45))
    assert np.all(np.isfinite(wav))


def test_per_step_cache_alignment_matters(params, cfg):
    """Reversing the cache's step axis must change the output — proves the
    per-step context is consumed in step order, not ignored."""
    ref = _ref_dict(cfg, jax.random.PRNGKey(6), prompt_len=cfg.max_prompt_tokens)
    key = jax.random.PRNGKey(46)
    cache = s3gen_ref_prompt_prefill(params, cfg, ref, jax.random.PRNGKey(777))
    rev = {
        "est": jax.tree.map(lambda a: a[::-1], cache["est"]),
        "pv": cache["pv"],
    }
    wav, _ = _run_inference(params, cfg, ref, cache, key)
    wav_r, _ = _run_inference(params, cfg, ref, rev, key)
    assert not np.allclose(wav, wav_r, atol=1e-6)


# ----------------------------------------------------- mechanism unit tests
def test_conv_halo_matches_concat():
    """_conv_h with a cached boundary frame == the gen rows of a SAME_TORCH
    conv over the concatenated [prompt | gen] sequence (k=3)."""
    rs = np.random.RandomState(0)
    p = jnp.asarray(rs.randn(2, 5, 4), jnp.float32)   # prompt region
    g = jnp.asarray(rs.randn(2, 7, 4), jnp.float32)   # generated region
    conv = {
        "w": jnp.asarray(rs.randn(3, 4, 6), jnp.float32),
        "b": jnp.asarray(rs.randn(6), jnp.float32),
    }
    full = conv1d(jnp.concatenate([p, g], axis=1), conv["w"], conv["b"],
                  padding="SAME_TORCH")
    cached = _conv_h(g, conv, pc=p[:, -1:])
    np.testing.assert_allclose(np.asarray(full[:, 5:]), np.asarray(cached),
                               atol=1e-5, rtol=1e-5)


def test_conv_halo_capture_roundtrip():
    rs = np.random.RandomState(1)
    p = jnp.asarray(rs.randn(1, 5, 4), jnp.float32)
    conv = {
        "w": jnp.asarray(rs.randn(3, 4, 4), jnp.float32),
        "b": jnp.asarray(rs.randn(4), jnp.float32),
    }
    _, rec = _conv_h(p, conv, cap=True)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(p[:, -1:]))


def test_group_norm_stats_merge_matches_joint():
    """GroupNorm over gen frames with the prompt's cached sufficient
    statistics == GroupNorm over the concatenated sequence (gen rows)."""
    rs = np.random.RandomState(2)
    B, Tp, Tg, C, G = 2, 6, 9, 16, 4
    p = jnp.asarray(rs.randn(B, Tp, C), jnp.float32)
    g = jnp.asarray(rs.randn(B, Tg, C), jnp.float32)
    w = jnp.asarray(rs.randn(C), jnp.float32)
    b = jnp.asarray(rs.randn(C), jnp.float32)
    vp = jnp.asarray([[1, 1, 1, 1, 0, 0], [1] * 6], bool)
    vg = jnp.asarray([[1] * 7 + [0, 0], [1] * 9], bool)

    _, stats = _group_norm(p, w, b, groups=G, valid=vp, cap=True)
    merged = _group_norm(g, w, b, groups=G, valid=vg, extra=stats)
    joint = _group_norm(jnp.concatenate([p, g], axis=1), w, b, groups=G,
                        valid=jnp.concatenate([vp, vg], axis=1))
    np.testing.assert_allclose(np.asarray(joint[:, Tp:]), np.asarray(merged),
                               atol=1e-5, rtol=1e-4)


def test_prompt_cache_default_is_step(monkeypatch):
    """The shipping default is the frozen per-voice prompt context ("step"):
    a documented deviation from the reference's per-slice full re-encode
    (/root/reference/src/tts_streaming.py:655-659), quality-measured at the
    sampling-noise floor (BENCH_NOTES Run E) for a measured 5.9-8.9x
    per-call speedup (Run D). CHATTERBOX_CFM_PROMPT_CACHE=0 reverts."""
    from chatterbox_tpu.runtime import EngineConfig, TTSEngine

    monkeypatch.delenv("CHATTERBOX_CFM_PROMPT_CACHE", raising=False)
    eng = TTSEngine.__new__(TTSEngine)
    eng.cfg = EngineConfig.tiny_ref()
    assert eng._cfm_cache_mode() == "step"
    monkeypatch.setenv("CHATTERBOX_CFM_PROMPT_CACHE", "0")
    assert eng._cfm_cache_mode() == "0"
    # the DiT arch has no ref-style prompt region: always off
    eng.cfg = EngineConfig.tiny()
    monkeypatch.delenv("CHATTERBOX_CFM_PROMPT_CACHE", raising=False)
    assert eng._cfm_cache_mode() == "0"


def test_engine_streams_with_prompt_cache(tmp_path, monkeypatch):
    """CHATTERBOX_CFM_PROMPT_CACHE=step: voice prep builds the per-voice
    cache, the scheduler coalesces cached jobs, and streaming produces
    audio end to end."""
    import asyncio

    from chatterbox_tpu.config import reset_config_cache
    from chatterbox_tpu.runtime import CancellationToken, EngineConfig, TTSEngine

    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "voices"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "models"))
    monkeypatch.setenv("CHATTERBOX_CFM_PROMPT_CACHE", "step")
    monkeypatch.setenv("CHATTERBOX_PRECOMPILE", "0")
    reset_config_cache()
    try:
        eng = TTSEngine(EngineConfig.tiny_ref(), seed=3)
        asyncio.run(eng.ainit())
        # warmup built the default voice's frozen context into the LRU
        assert "default" in eng._cfm_cache_lru

        async def run():
            out = b""
            async for chunk in eng.stream(
                text="Hello world.", output_format="wav", voice_id=None,
                cfg_guidance_weight=0.5, synthesis_temperature=0.8,
                text_processing_chunk_size=50, audio_tokens_per_slice=8,
                remove_trailing_milliseconds=0, remove_leading_milliseconds=0,
                chunk_overlap_strategy="full",
                crossfade_duration_milliseconds=10,
                request_id="pc-req", cancellation_token=CancellationToken(),
            ):
                out += chunk
            return out

        out = asyncio.run(run())
        assert len(out) > 1000  # WAV header + real PCM
        eng.shutdown()
    finally:
        reset_config_cache()


def test_tf_block_cached_cross_attention_matches_concat(cfg):
    """_tf_block per-frame ops (LN, projections, FF) make the prompt rows'
    K/V independent of the generated rows, so the generated rows of a
    concatenated call must EXACTLY equal the cached cross-attention call."""
    fl = cfg.flow
    est = init_estimator_params(jax.random.PRNGKey(9), fl)
    tf = est["mid"][0]["tf"][0]
    ch = fl.dec_channels[0]
    rs = np.random.RandomState(3)
    xp = jnp.asarray(rs.randn(2, 5, ch), jnp.float32)
    xg = jnp.asarray(rs.randn(2, 4, ch), jnp.float32)
    vp = jnp.asarray([[1, 1, 1, 0, 0], [1] * 5], bool)
    vg = jnp.asarray([[1, 1, 1, 1], [1, 1, 0, 0]], bool)

    _, rec = _tf_block(tf, fl, xp, vp, cap=True)
    cached = _tf_block(tf, fl, xg, vg, pc=rec, pvalid=vp)
    joint = _tf_block(tf, fl, jnp.concatenate([xp, xg], axis=1),
                      jnp.concatenate([vp, vg], axis=1))
    np.testing.assert_allclose(np.asarray(joint[:, 5:]), np.asarray(cached),
                               atol=1e-5, rtol=1e-4)
