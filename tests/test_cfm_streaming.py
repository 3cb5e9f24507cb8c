"""Streaming full-overlap CFM (cfm_generate_streaming) tests.

The streaming state freezes each slice's frames as context for the next, so
slice k solves ONLY its new frames against [voice prompt | previous generated
frames] — replacing the reference full-overlap strategy's per-slice re-solve
of the ACCUMULATED token stream (/root/reference/src/tts_streaming.py:655-659)
whose cost grows with utterance length (BENCH_NOTES Run G).

Proof structure (mirrors test_cfm_prompt_cache.py):
* a chunk's FIRST slice must equal the prompt-cached solve exactly (fresh
  state degenerates to the prompt cache: same halos, zero extra GN stats,
  empty ring, same noise buffer positions);
* later slices are the documented one-way deviation (earlier frames frozen) —
  tested for finiteness, state-advancement, and that the frozen context is
  actually consumed (perturbing it changes the output);
* padding lanes (tg == 0) of a batched slice must pass their state through
  bit-unchanged.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import S3GenRefConfig
from chatterbox_tpu.models.s3gen_ref.decoder import (
    cfm_generate_cached,
    cfm_generate_streaming,
    cfm_prompt_prefill,
    init_estimator_params,
    init_stream_state,
)


@pytest.fixture(scope="module")
def cfg():
    return S3GenRefConfig.tiny().flow


@pytest.fixture(scope="module")
def params(cfg):
    return init_estimator_params(jax.random.PRNGKey(0), cfg)


@pytest.fixture(scope="module")
def vcache(params, cfg):
    """Per-voice prompt cache at batch 1 (lanes [cond, uncond])."""
    P, M = 12, cfg.output_size
    rs = np.random.RandomState(11)
    mu_p = jnp.asarray(rs.randn(1, P, M), jnp.float32)
    spk = jnp.asarray(rs.randn(1, M), jnp.float32)
    cond_p = jnp.asarray(rs.randn(1, P, M), jnp.float32)
    valid_p = jnp.ones((1, P), bool)
    return cfm_prompt_prefill(params, cfg, jax.random.PRNGKey(777),
                              mu_p, spk, cond_p, valid_p)


def _mu(key, B, Tg, M):
    return jax.random.normal(key, (B, Tg, M), jnp.float32)


def _spk(key, B, M):
    return jax.random.normal(key, (B, M), jnp.float32)


@pytest.mark.parametrize("tg", [8, 5])
def test_first_slice_matches_cached(params, cfg, vcache, tg):
    """Fresh streaming state + first slice == cfm_generate_cached on the
    same frames: identical frozen context (prompt halos, prompt GN stats,
    empty ring) and identical noise positions; only the packing differs
    (cached: left-packed, streaming: right-packed)."""
    M = cfg.output_size
    Tg, B = 8, 1
    key = jax.random.PRNGKey(5)
    mu_l = _mu(jax.random.PRNGKey(6), B, Tg, M)
    spk = _spk(jax.random.PRNGKey(7), B, M)

    valid_l = jnp.arange(Tg)[None, :] < tg
    mel_c = cfm_generate_cached(params, cfg, key, mu_l, spk, valid_l, vcache)

    # right-pack the same tg frames
    mu_r = jnp.roll(mu_l, Tg - tg, axis=1)
    mu_r = jnp.where(jnp.arange(Tg)[None, :, None] >= (Tg - tg), mu_r, 0.0)
    st = init_stream_state(cfg, vcache, window=16, batch=B)
    mel_s, st2 = cfm_generate_streaming(
        params, cfg, key, mu_r, spk, jnp.array([tg], jnp.int32), vcache, st)

    np.testing.assert_allclose(
        np.asarray(mel_c[0, :tg]), np.asarray(mel_s[0, Tg - tg:]),
        atol=2e-4, rtol=1e-3,
    )
    assert int(st2["frames"][0]) == tg
    assert int(st2["klen"][0]) == tg


def test_second_slice_uses_frozen_context(params, cfg, vcache):
    """Slice 2 must consume slice 1's frozen context: zeroing the ring's
    valid length (as if slice 1 never happened) changes the output, and the
    state advances cumulatively."""
    M = cfg.output_size
    Tg, B, tg = 8, 1, 8
    spk = _spk(jax.random.PRNGKey(7), B, M)
    key = jax.random.PRNGKey(9)
    tgj = jnp.array([tg], jnp.int32)

    st = init_stream_state(cfg, vcache, window=16, batch=B)
    mel1, st1 = cfm_generate_streaming(
        params, cfg, key, _mu(jax.random.PRNGKey(1), B, Tg, M), spk, tgj,
        vcache, st)
    mu2 = _mu(jax.random.PRNGKey(2), B, Tg, M)
    mel2, st2 = cfm_generate_streaming(
        params, cfg, key, mu2, spk, tgj, vcache, st1)
    assert np.all(np.isfinite(np.asarray(mel2)))
    assert int(st2["frames"][0]) == 2 * tg
    assert int(st2["klen"][0]) == 16  # window-capped

    # amnesia probe: discard slice 1's ring (klen=0) → different output
    st1_amnesic = dict(st1, klen=jnp.zeros_like(st1["klen"]))
    mel2_a, _ = cfm_generate_streaming(
        params, cfg, key, mu2, spk, tgj, vcache, st1_amnesic)
    assert not np.allclose(np.asarray(mel2), np.asarray(mel2_a), atol=1e-6)

    # the second slice's noise must come from fresh buffer positions:
    # replaying slice 2's mu with a FRESH state gives a different solve
    mel2_f, _ = cfm_generate_streaming(
        params, cfg, key, mu2, spk, tgj, vcache,
        init_stream_state(cfg, vcache, window=16, batch=B))
    assert not np.allclose(np.asarray(mel2), np.asarray(mel2_f), atol=1e-6)


def test_ring_eviction_keeps_window(params, cfg, vcache):
    """Three 8-frame slices into a 16-frame ring: klen stays at the window,
    output stays finite (the oldest slice was evicted by pure gathers)."""
    M = cfg.output_size
    Tg, B, tg = 8, 1, 8
    spk = _spk(jax.random.PRNGKey(7), B, M)
    tgj = jnp.array([tg], jnp.int32)
    st = init_stream_state(cfg, vcache, window=16, batch=B)
    mel = None
    for i in range(3):
        mel, st = cfm_generate_streaming(
            params, cfg, jax.random.PRNGKey(20 + i),
            _mu(jax.random.PRNGKey(30 + i), B, Tg, M), spk, tgj, vcache, st)
    assert np.all(np.isfinite(np.asarray(mel)))
    assert int(st["klen"][0]) == 16
    assert int(st["frames"][0]) == 24


def test_padding_lane_state_passthrough(params, cfg, vcache):
    """A batched slice where lane 1 has tg=0: lane 1's ring, klen, frames
    and GN stats come out bit-identical; lane 0 advances."""
    M = cfg.output_size
    Tg, B = 8, 2
    spk = _spk(jax.random.PRNGKey(7), B, M)
    st = init_stream_state(cfg, vcache, window=16, batch=B)
    # seed both lanes with one real slice
    mel, st1 = cfm_generate_streaming(
        params, cfg, jax.random.PRNGKey(40), _mu(jax.random.PRNGKey(41), B, Tg, M),
        spk, jnp.array([8, 8], jnp.int32), vcache, st)
    # now lane 1 idles
    mel2, st2 = cfm_generate_streaming(
        params, cfg, jax.random.PRNGKey(42), _mu(jax.random.PRNGKey(43), B, Tg, M),
        spk, jnp.array([8, 0], jnp.int32), vcache, st1)

    assert int(st2["frames"][0]) == 16 and int(st2["frames"][1]) == 8
    assert int(st2["klen"][1]) == 8

    def lane(tree, i):
        # ring leaves are [2B, ...] with lanes [cond×B, uncond×B]
        return jax.tree.map(lambda a: np.asarray(a)[np.array([i, B + i])]
                            if a.shape[0] == 2 * B
                            else np.asarray(a)[:, np.array([i, B + i])], tree)

    a, b = lane(st1["ring"], 1), lane(st2["ring"], 1)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(x, y)
    # GN running stats of the idle lane unchanged (zero-sum capture)
    for x, y in zip(jax.tree.leaves(lane(st1["hg"], 1)),
                    jax.tree.leaves(lane(st2["hg"], 1))):
        np.testing.assert_allclose(x, y, atol=0.0)


def test_streaming_jits_and_is_deterministic(params, cfg, vcache):
    M = cfg.output_size
    Tg, B = 8, 1
    spk = _spk(jax.random.PRNGKey(7), B, M)
    tgj = jnp.array([6], jnp.int32)
    mu = _mu(jax.random.PRNGKey(50), B, Tg, M)
    st = init_stream_state(cfg, vcache, window=16, batch=B)

    fn = jax.jit(lambda k, m, s, t, rs: cfm_generate_streaming(
        params, cfg, k, m, s, t, vcache, rs))
    mel_a, st_a = fn(jax.random.PRNGKey(51), mu, spk, tgj, st)
    mel_b, st_b = fn(jax.random.PRNGKey(51), mu, spk, tgj, st)
    np.testing.assert_array_equal(np.asarray(mel_a), np.asarray(mel_b))
    np.testing.assert_array_equal(np.asarray(st_a["frames"]),
                                  np.asarray(st_b["frames"]))
