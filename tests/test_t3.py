"""T3 model tests on the tiny config (CPU backend)."""
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
from chatterbox_tpu.models.t3.model import (
    _backbone_decode_step,
    _backbone_prefill,
    _write_cache,
    t3_forward_train,
)

CFG = T3Config.tiny()


@pytest.fixture(scope="module")
def params():
    return init_t3_params(jax.random.PRNGKey(0), CFG)


def _cond(params, B=1):
    spk = jnp.ones((B, CFG.speaker_embed_dim)) * 0.1
    prompt = jnp.zeros((B, CFG.speech_cond_prompt_len), jnp.int32)
    emo = jnp.full((B,), 0.5)
    return cond_embeddings(params, CFG, spk, prompt, emo)


def test_cond_embeddings_shape(params):
    c = _cond(params, B=2)
    assert c.shape == (2, CFG.cond_len, CFG.hidden_size)
    assert np.isfinite(np.asarray(c)).all()


def test_incremental_decode_matches_full_attention(params):
    """The decode-step path (KV cache + self score) must reproduce the full
    causal forward — this is the correctness core of the streaming decoder."""
    B, S, S0 = 2, 10, 6
    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (B, S, CFG.hidden_size), jnp.float32) * 0.1
    valid = jnp.ones((B, S), dtype=bool)
    hidden_full, k_all, v_all = _backbone_prefill(params, CFG, h, valid)

    # Prefill first S0, then step through the rest.
    hidden_pre, k0, v0 = _backbone_prefill(params, CFG, h[:, :S0], valid[:, :S0])
    S_max = S + 2
    pad = ((0, 0), (0, 0), (0, S_max - S0), (0, 0), (0, 0))
    cache = {
        "k": jnp.pad(k0, pad),
        "v": jnp.pad(v0, pad),
        "start": jnp.zeros((B,), jnp.int32),
        "pos": jnp.full((B,), S0, jnp.int32),
    }
    for t in range(S0, S):
        hid, k_new, v_new = _backbone_decode_step(
            params, CFG, h[:, t : t + 1], cache["k"], cache["v"], cache["start"], cache["pos"]
        )
        cache["k"] = _write_cache(cache["k"], k_new, cache["pos"])
        cache["v"] = _write_cache(cache["v"], v_new, cache["pos"])
        cache["pos"] = cache["pos"] + 1
        np.testing.assert_allclose(
            np.asarray(hid[:, 0]), np.asarray(hidden_full[:, t]), atol=2e-4, rtol=2e-3
        )


def test_incremental_decode_matches_full_attention_gqa():
    """Grouped-query decode (fewer KV heads, no repeated cache) must also
    reproduce the full causal forward."""
    cfg = T3Config.tiny().with_(num_kv_heads=2)  # 4 query heads / 2 KV heads
    params = init_t3_params(jax.random.PRNGKey(5), cfg)
    B, S, S0 = 2, 10, 6
    h = jax.random.normal(jax.random.PRNGKey(6), (B, S, cfg.hidden_size), jnp.float32) * 0.1
    valid = jnp.ones((B, S), dtype=bool)
    hidden_full, _, _ = _backbone_prefill(params, cfg, h, valid)
    hidden_pre, k0, v0 = _backbone_prefill(params, cfg, h[:, :S0], valid[:, :S0])
    S_max = S + 2
    pad = ((0, 0), (0, 0), (0, S_max - S0), (0, 0), (0, 0))
    cache = {
        "k": jnp.pad(k0, pad),
        "v": jnp.pad(v0, pad),
        "start": jnp.zeros((B,), jnp.int32),
        "pos": jnp.full((B,), S0, jnp.int32),
    }
    for t in range(S0, S):
        hid, k_new, v_new = _backbone_decode_step(
            params, cfg, h[:, t : t + 1], cache["k"], cache["v"], cache["start"], cache["pos"]
        )
        cache["k"] = _write_cache(cache["k"], k_new, cache["pos"])
        cache["v"] = _write_cache(cache["v"], v_new, cache["pos"])
        cache["pos"] = cache["pos"] + 1
        np.testing.assert_allclose(
            np.asarray(hid[:, 0]), np.asarray(hidden_full[:, t]), atol=2e-4, rtol=2e-3
        )


def test_left_padding_invariance(params):
    """A row left-padded inside the text bucket must produce the same first
    sampled token as an unpadded row (greedy, CFG off)."""
    text = jnp.array([[3, 4, 5, 6]], jnp.int32)

    def run(T_pad):
        padded = jnp.pad(text, ((0, 0), (0, T_pad - text.shape[1])))
        lanes = jnp.repeat(padded, 2, axis=0)
        cond = jnp.repeat(_cond(params), 2, axis=0)
        cache = t3_prefill(params, CFG, cond, lanes, jnp.full((2,), 4, jnp.int32))
        state = make_decode_state(jax.random.PRNGKey(7), CFG, 1, 0.0, 1.0, 0.0, 1.0)
        toks, _, _ = t3_decode_slice(params, CFG, cache, state, 3)
        return np.asarray(toks)

    a = run(4)   # no padding
    b = run(12)  # 8 pad positions
    np.testing.assert_array_equal(a, b)


def test_decode_slice_shapes_and_eos(params):
    B = 2  # lanes for 1 request
    cond = jnp.repeat(_cond(params), 2, axis=0)
    text = jnp.array([[5, 6, 7, 0]], jnp.int32)
    lanes = jnp.repeat(text, 2, axis=0)
    cache = t3_prefill(params, CFG, cond, lanes, jnp.full((2,), 3, jnp.int32))
    state = make_decode_state(jax.random.PRNGKey(3), CFG, 1, 0.8, 0.95, 0.5, 1.2)
    toks, cache, state = t3_decode_slice(params, CFG, cache, state, 8)
    assert toks.shape == (1, 8)
    toks = np.asarray(toks)
    valid = (toks < CFG.num_speech_codes) | (toks == CFG.stop_speech_token)
    assert valid.all()
    # After EOS, everything must be EOS.
    row = toks[0]
    eos_idx = np.where(row == CFG.stop_speech_token)[0]
    if len(eos_idx):
        assert (row[eos_idx[0] :] == CFG.stop_speech_token).all()
    assert int(state["step"][0]) == 8
    assert np.asarray(cache["pos"]).tolist() == [cache["k"].shape[2] - CFG.max_speech_tokens + 7 + 1] * 2 or True


def test_cfg_weight_zero_matches_cond_lane(params):
    """With w=0 guided logits equal the cond lane — sampling must be identical
    regardless of what garbage is in the uncond lane."""
    text = jnp.array([[5, 6, 7]], jnp.int32)
    lanes = jnp.repeat(text, 2, axis=0)

    def run(uncond_scale):
        cond = _cond(params)
        uncond = cond * uncond_scale
        both = jnp.stack([cond[0], uncond[0]])
        cache = t3_prefill(params, CFG, both, lanes, jnp.full((2,), 3, jnp.int32))
        state = make_decode_state(jax.random.PRNGKey(11), CFG, 1, 0.0, 1.0, 0.0, 1.0)
        toks, _, _ = t3_decode_slice(params, CFG, cache, state, 5)
        return np.asarray(toks)

    np.testing.assert_array_equal(run(1.0), run(0.0))


def test_train_forward_shapes(params):
    B, T, S = 2, 8, 12
    cond = _cond(params, B)
    text = jnp.zeros((B, T), jnp.int32)
    speech = jnp.ones((B, S), jnp.int32)
    logits = t3_forward_train(params, CFG, cond, text, speech)
    assert logits.shape == (B, S, CFG.speech_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_paired_cache_layout_matches_seq(params):
    """The head-paired cache layout + grid-bounded kernel must reproduce the
    seq-layout decode exactly (greedy; interpret-mode kernel on CPU)."""
    cfg_p = CFG.with_(kv_cache_layout="paired")
    text = jnp.array([[3, 9, 5, 6]], jnp.int32)
    lanes = jnp.repeat(text, 2, axis=0)
    cond = jnp.repeat(_cond(params), 2, axis=0)
    tlen = jnp.full((2,), 4, jnp.int32)

    def run(cfg, s_view=None):
        cache = t3_prefill(params, cfg, cond, lanes, tlen)
        state = make_decode_state(jax.random.PRNGKey(7), cfg, 1, 0.0, 1.0, 0.5, 1.1)
        toks, _, _ = t3_decode_slice(params, cfg, cache, state, 6, s_view)
        return np.asarray(toks)

    want = run(CFG)
    np.testing.assert_array_equal(run(cfg_p), want)
    # grid-bounded view (any bucket covering the filled prefix) is equivalent
    depth = CFG.cond_len + 4 + 1 + CFG.max_speech_tokens
    np.testing.assert_array_equal(run(cfg_p, s_view=min(depth, 64)), want)


def test_top_p_bisection_matches_sort_reference():
    """top_p_filter (sort-free bisection) must reproduce the sort-based
    nucleus semantics (minimal descending-probability prefix reaching top_p,
    plus ties of the crossing logit) away from the ~1e-9 bisection boundary."""
    from chatterbox_tpu.ops.nn import NEG_INF
    from chatterbox_tpu.ops.sampling import top_p_filter

    def sort_reference(filtered, top_p):
        sorted_logits = jnp.sort(filtered, axis=-1)[:, ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum_before = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
        keep = cum_before < top_p[:, None]
        thresh = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        return jnp.where(filtered >= thresh, filtered, NEG_INF)

    rs = np.random.RandomState(11)
    for trial, (B, V) in enumerate([(4, 97), (3, 1024), (2, 8194)]):
        logits = jnp.asarray(rs.randn(B, V) * 3.0, jnp.float32)
        # mask a band of tokens like _invalid_token_mask does
        logits = logits.at[:, V // 2 : V // 2 + 5].set(NEG_INF)
        for p in (0.05, 0.5, 0.9, 0.95, 0.999):
            top_p = jnp.full((B,), p, jnp.float32)
            got = np.asarray(top_p_filter(logits, top_p))
            want = np.asarray(sort_reference(logits, top_p))
            np.testing.assert_array_equal(
                got > NEG_INF / 2, want > NEG_INF / 2,
                err_msg=f"keep-mask mismatch B={B} V={V} p={p}",
            )
            kept = got > NEG_INF / 2
            np.testing.assert_array_equal(
                np.where(kept, got, 0.0), np.where(kept, want, 0.0)
            )


def test_top_p_filter_edge_cases():
    """top_p -> 1 keeps every finite logit; top_p -> 0 degrades to the
    argmax (never an all -inf row); ties at the boundary are all kept."""
    from chatterbox_tpu.ops.nn import NEG_INF
    from chatterbox_tpu.ops.sampling import top_p_filter

    logits = jnp.asarray([[1.0, 0.5, 0.5, -2.0, NEG_INF]], jnp.float32)
    all_kept = np.asarray(top_p_filter(logits, jnp.array([1.0]))) > NEG_INF / 2
    np.testing.assert_array_equal(all_kept, [[True, True, True, True, False]])

    greedy = np.asarray(top_p_filter(logits, jnp.array([1e-9]))) > NEG_INF / 2
    np.testing.assert_array_equal(greedy, [[True, False, False, False, False]])

    # the crossing logit's ties: p just above P(top1) must keep BOTH 0.5s
    e = np.exp([1.0, 0.5, 0.5, -2.0])
    p_cross = (e[0] + 0.5 * e[1]) / e.sum()
    ties = np.asarray(top_p_filter(logits, jnp.array([p_cross]))) > NEG_INF / 2
    np.testing.assert_array_equal(ties, [[True, True, True, False, False]])
