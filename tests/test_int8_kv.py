"""int8 KV-cache decode: accuracy vs the native cache, and scheduler compat."""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.models.t3 import (
    T3Config,
    cond_embeddings,
    init_t3_params,
    make_decode_state,
    t3_decode_slice,
    t3_prefill,
)

CFG_N = T3Config.tiny()
CFG_Q = CFG_N.with_(kv_cache_dtype="int8")


@pytest.fixture(scope="module")
def setup():
    params = init_t3_params(jax.random.PRNGKey(0), CFG_N)
    spk = jnp.ones((1, CFG_N.speaker_embed_dim)) * 0.1
    prompt = jnp.zeros((1, CFG_N.speech_cond_prompt_len), jnp.int32)
    cond = cond_embeddings(params, CFG_N, spk, prompt, jnp.full((1,), 0.5))
    lanes = jnp.repeat(cond, 2, axis=0)
    text = jnp.array([[255, 9, 10, 11, 0, 0, 0, 0]], jnp.int32)
    lanes_text = jnp.repeat(text, 2, axis=0)
    tlen = jnp.full((2,), 5, jnp.int32)
    return params, lanes, lanes_text, tlen


def _greedy_tokens(params, cfg, lanes, text, tlen, n=24):
    cache = t3_prefill(params, cfg, lanes, text, tlen)
    assert ("k_scale" in cache) == (cfg.kv_cache_dtype == "int8")
    state = make_decode_state(jax.random.PRNGKey(3), cfg, 1, 0.0, 1.0, 0.0, 1.0)
    toks, cache, state = t3_decode_slice(params, cfg, cache, state, n)
    return np.asarray(toks)[0]


def test_int8_greedy_decode_close_to_native(setup):
    """Greedy decode with the int8 cache should track the native cache for a
    meaningful prefix (quantization noise eventually diverges paths — that is
    expected for AR sampling; the onset must not be immediate)."""
    params, lanes, text, tlen = setup
    a = _greedy_tokens(params, CFG_N, lanes, text, tlen)
    b = _greedy_tokens(params, CFG_Q, lanes, text, tlen)
    agree = 0
    for x, y in zip(a, b):
        if x != y:
            break
        agree += 1
    assert agree >= 4, (a[:8], b[:8])


def test_int8_cache_memory_layout(setup):
    params, lanes, text, tlen = setup
    cache = t3_prefill(params, CFG_Q, lanes, text, tlen)
    assert cache["k"].dtype == jnp.int8
    assert cache["v"].dtype == jnp.int8
    assert cache["k_scale"].shape == cache["k"].shape[:-1]


def test_int8_hidden_state_error_bound(setup):
    """Quantitative quality gate for the int8 serving default (VERDICT r2
    item 5): the full layer-stack decode step over an int8 cache must stay
    within a small relative error of the native-cache step.

    Waveform-level MCD between int8 and native *runs* is ill-posed — AR
    sampling amplifies any epsilon into a different token path (true even for
    bf16 vs f32), so the comparison would measure path divergence, not
    quantization quality. The meaningful quantity is the perturbation int8
    injects into the pre-sampling computation: identical cache content,
    identical query, full scan over all layers — bound the relative L2 error
    of the hidden state (and the resulting logits). Fails if quantization is
    ever made lossier."""
    from chatterbox_tpu.models.t3.model import _backbone_decode_step
    from chatterbox_tpu.ops.nn import linear

    params, lanes, text, tlen = setup
    cache_n = t3_prefill(params, CFG_N, lanes, text, tlen)
    cache_q = t3_prefill(params, CFG_Q, lanes, text, tlen)
    h = jax.random.normal(jax.random.PRNGKey(5), (2, 1, CFG_N.hidden_size)) * 0.3

    hn, _, _ = _backbone_decode_step(
        params, CFG_N, h, cache_n["k"], cache_n["v"], cache_n["start"], cache_n["pos"]
    )
    hq, _, _ = _backbone_decode_step(
        params, CFG_Q, h, cache_q["k"], cache_q["v"], cache_q["start"], cache_q["pos"],
        k_scale=cache_q["k_scale"], v_scale=cache_q["v_scale"],
    )
    err = float(jnp.linalg.norm(hq - hn) / jnp.linalg.norm(hn))
    assert err < 0.02, f"int8 hidden-state relative error {err:.4f} exceeds 2%"

    ln = linear(hn[:, 0], params["speech_head"]["w"], params["speech_head"]["b"])
    lq = linear(hq[:, 0], params["speech_head"]["w"], params["speech_head"]["b"])
    lerr = float(jnp.linalg.norm(lq - ln) / jnp.linalg.norm(ln))
    assert lerr < 0.02, f"int8 logits relative error {lerr:.4f} exceeds 2%"


def test_int8_paired_layout_matches_seq(setup):
    """paired+int8 (in-kernel scale-factored dequant) must reproduce the
    seq-major int8 decode: identical quantization, so greedy tokens match
    exactly over a short horizon (interpret-mode kernel on CPU)."""
    params, lanes, text, tlen = setup
    cfg_p = CFG_Q.with_(kv_cache_layout="paired")
    a = _greedy_tokens(params, CFG_Q, lanes, text, tlen, n=8)
    b = _greedy_tokens(params, cfg_p, lanes, text, tlen, n=8)
    np.testing.assert_array_equal(a, b)


def test_int8_paired_scheduler_end_to_end(setup):
    from chatterbox_tpu.runtime.scheduler import BatchedT3Decoder

    params, lanes, text, tlen = setup
    cfg_p = CFG_Q.with_(kv_cache_layout="paired")

    async def run():
        dec = BatchedT3Decoder(params, cfg_p, n_slots=2, slice_size=6)
        try:
            assert dec.cache["k"].dtype == jnp.int8
            assert dec.cache["k"].shape[2] == cfg_p.num_kv_heads // 2
            rows = []
            async for row in dec.decode_chunk(
                np.asarray(lanes), np.asarray(text), 5, 0.8, 0.95, 0.0, 1.0, 18
            ):
                rows.append(row)
            return np.concatenate(rows) if rows else np.zeros((0,), np.int32)
        finally:
            dec.stop()

    toks = asyncio.run(run())
    assert 1 <= len(toks) <= 18
    assert (toks < cfg_p.num_speech_codes).all()


def test_int8_scheduler_end_to_end(setup):
    from chatterbox_tpu.runtime.scheduler import BatchedT3Decoder

    params, lanes, text, tlen = setup

    async def run():
        dec = BatchedT3Decoder(params, CFG_Q, n_slots=2, slice_size=6)
        try:
            assert dec.cache["k"].dtype == jnp.int8
            rows = []
            async for row in dec.decode_chunk(
                np.asarray(lanes), np.asarray(text), 5, 0.8, 0.95, 0.0, 1.0, 18
            ):
                rows.append(row)
            return np.concatenate(rows) if rows else np.zeros((0,), np.int32)
        finally:
            dec.stop()

    toks = asyncio.run(run())
    assert 1 <= len(toks) <= 18
    assert (toks < CFG_Q.num_speech_codes).all()
