"""Model-level streaming full-overlap inference (s3gen_ref_inference_streaming).

Contract under test (see model.py docstring): a chunk's FIRST slice must
equal s3gen_ref_inference_tail (the accumulated re-solve path) bit-for-bit —
fresh stream state degenerates to the per-voice prompt cache; later slices
freeze earlier frames (documented one-way deviation, decoder-tested in
test_cfm_streaming.py) while the excitation cache-override and the frozen
mel buffer keep emitted audio continuous across slices.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    init_s3gen_stream_state,
    s3gen_ref_embed_ref,
    s3gen_ref_inference_streaming,
    s3gen_ref_inference_tail,
    s3gen_ref_prompt_prefill,
)

CFG = S3GenRefConfig.tiny()
SPT = CFG.samples_per_token
FPT = CFG.flow.up_stride
CAP = 12              # accumulated-token bucket used throughout
NEW_BLOCK = 6         # static per-slice new-token bound
TAIL = 6 * SPT


@pytest.fixture(scope="module")
def params():
    return init_s3gen_ref_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def ref(params):
    rng = np.random.default_rng(1)
    wav24 = jnp.asarray(rng.standard_normal((1, 24000)) * 0.1, jnp.float32)
    wav16 = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    return s3gen_ref_embed_ref(
        params, CFG, wav24, jnp.array([24000]), wav16, jnp.array([16000])
    )


@pytest.fixture(scope="module")
def cache(params, ref):
    return s3gen_ref_prompt_prefill(params, CFG, ref, jax.random.PRNGKey(777))


@pytest.fixture(scope="module")
def tokens():
    rng = np.random.default_rng(5)
    return jnp.asarray(rng.integers(0, 50, (1, CAP)), jnp.int32)


def _stream(params, ref, cache, tokens, tlen, nlen, src, clen, key, start, rstate):
    return s3gen_ref_inference_streaming(
        params, CFG, tokens, jnp.array([tlen]), jnp.array([nlen]), ref,
        src, jnp.array([clen]), key, jnp.array([start]), TAIL, rstate,
        NEW_BLOCK, cfm_cache=cache,
    )


def test_first_slice_matches_tail_path(params, ref, cache, tokens):
    """Slice 0 (fresh state, new_len == token_len) must reproduce
    s3gen_ref_inference_tail: same CFM solve (decoder-tested), same
    frozen-mel masking, same excitation, same windowed vocode. The streaming
    CFM runs on the small right-packed block while the tail path solves the
    full bucket — masking makes the block layout semantically irrelevant,
    but float summation ORDER differs (GroupNorm/attention reductions), so
    equality is to fp32-accumulation tolerance, not bitwise."""
    n0 = 4
    src0 = jnp.zeros((1, CAP * SPT), jnp.float32)
    key = jax.random.PRNGKey(9)
    st0 = init_s3gen_stream_state(CFG, cache, window=32, cap_tokens=CAP)

    tail_ref, src_ref = s3gen_ref_inference_tail(
        params, CFG, tokens, jnp.array([n0]), ref, src0, jnp.array([0]), key,
        jnp.array([0]), TAIL, cfm_cache=cache,
    )
    tail_s, src_s, st1 = _stream(
        params, ref, cache, tokens, n0, n0, src0, 0, key, 0, st0)

    np.testing.assert_allclose(
        np.asarray(tail_s), np.asarray(tail_ref), rtol=0, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(src_s), np.asarray(src_ref), rtol=0, atol=1e-3)
    assert int(st1["cfm"]["frames"][0]) == n0 * FPT
    # buffer rows beyond the solved frames stay zero (template freeze)
    assert np.all(np.asarray(st1["mel"])[0, n0 * FPT:] == 0.0)


def test_slice_sequence_continuity(params, ref, cache, tokens):
    """Three slices of one chunk: the mel buffer's emitted prefix is frozen
    (bit-unchanged between slices), the excitation prefix is cache-override
    continuous, and the per-slice emitted audio is finite and non-silent."""
    key = jax.random.PRNGKey(9)
    st = init_s3gen_stream_state(CFG, cache, window=32, cap_tokens=CAP)
    src = jnp.zeros((1, CAP * SPT), jnp.float32)
    prev = 0
    slices = [4, 4, 4]
    tlen = 0
    audio = []
    for n in slices:
        tlen += n
        start = min(prev, CAP * SPT - TAIL)
        tail, src_new, st_new = _stream(
            params, ref, cache, tokens, tlen, n, src, prev, key, start, st)
        a = np.asarray(tail)[0, prev - start: tlen * SPT - start]
        assert np.isfinite(a).all() and np.abs(a).max() > 0
        audio.append(a)
        if prev:
            # frozen prefix: earlier frames' mel identical across slices
            np.testing.assert_array_equal(
                np.asarray(st_new["mel"])[0, : (tlen - n) * FPT],
                np.asarray(st["mel"])[0, : (tlen - n) * FPT],
            )
            # excitation continuity (reference cache_source contract)
            np.testing.assert_allclose(
                np.asarray(src_new)[0, :prev], np.asarray(src)[0, :prev], atol=0)
        st = st_new
        src = src_new
        prev = tlen * SPT
    assert int(st["cfm"]["frames"][0]) == sum(slices) * FPT
    assert sum(a.size for a in audio) == CAP * SPT


def test_streaming_jits(params, ref, cache, tokens):
    fn = jax.jit(
        lambda tk, tl, nl, sr, cl, ky, strt, rs: s3gen_ref_inference_streaming(
            params, CFG, tk, tl, nl, ref, sr, cl, ky, strt, TAIL, rs,
            NEW_BLOCK, cfm_cache=cache,
        )
    )
    st0 = init_s3gen_stream_state(CFG, cache, window=32, cap_tokens=CAP)
    src0 = jnp.zeros((1, CAP * SPT), jnp.float32)
    t1, s1, r1 = fn(tokens, jnp.array([4]), jnp.array([4]), src0,
                    jnp.array([0]), jax.random.PRNGKey(3), jnp.array([0]), st0)
    t2, s2, r2 = fn(tokens, jnp.array([4]), jnp.array([4]), src0,
                    jnp.array([0]), jax.random.PRNGKey(3), jnp.array([0]), st0)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    for a, b in zip(jax.tree.leaves(r1), jax.tree.leaves(r2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
