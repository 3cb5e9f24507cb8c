"""Pallas decode-attention kernel vs the jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.ops.pallas_attention import pallas_decode_attention

NEG_INF = -1e9


def _reference(q, k_cache, v_cache, k_new, v_new, start, pos):
    """Straightforward jnp computation of the same attention."""
    B, H, Dh = q.shape
    S = k_cache.shape[1]
    scale = 1.0 / np.sqrt(Dh)
    s_cache = jnp.einsum("bhd,bshd->bhs", q, k_cache) * scale
    idx = jnp.arange(S)[None, None, :]
    valid = (idx >= start[:, None, None]) & (idx < pos[:, None, None])
    s_cache = jnp.where(valid, s_cache, NEG_INF)
    s_self = jnp.einsum("bhd,bhd->bh", q, k_new)[..., None] * scale
    s = jnp.concatenate([s_cache, s_self], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", p[..., :S], v_cache) + p[..., S:] * v_new
    return out


@pytest.mark.parametrize("B,H,Dh,S", [(2, 4, 64, 512), (3, 2, 32, 300)])
def test_pallas_decode_attention_matches_reference(B, H, Dh, S):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, H, Dh), jnp.float32)
    k_cache = jax.random.normal(ks[1], (B, S, H, Dh), jnp.float32)
    v_cache = jax.random.normal(ks[2], (B, S, H, Dh), jnp.float32)
    k_new = jax.random.normal(ks[3], (B, H, Dh), jnp.float32)
    v_new = jax.random.normal(ks[4], (B, H, Dh), jnp.float32)
    start = jnp.array([3] * B, jnp.int32)
    pos = jnp.array([min(200 + 37 * b, S) for b in range(B)], jnp.int32)

    ref = np.asarray(_reference(q, k_cache, v_cache, k_new, v_new, start, pos))
    got = np.asarray(
        pallas_decode_attention(
            q, k_cache, v_cache, k_new, v_new, start, pos,
            block_s=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_pallas_s_view_matches_full_view():
    """Grid-bounded view must equal the full-cache result when all valid
    entries fit inside the view."""
    B, H, Dh, S = 2, 2, 32, 512
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    q = jax.random.normal(ks[0], (B, H, Dh), jnp.float32)
    k_cache = jax.random.normal(ks[1], (B, S, H, Dh), jnp.float32)
    v_cache = jax.random.normal(ks[2], (B, S, H, Dh), jnp.float32)
    k_new = jax.random.normal(ks[3], (B, H, Dh), jnp.float32)
    v_new = jax.random.normal(ks[4], (B, H, Dh), jnp.float32)
    start = jnp.array([0, 2], jnp.int32)
    pos = jnp.array([100, 120], jnp.int32)  # all inside the first 128-block pair
    full = pallas_decode_attention(
        q, k_cache, v_cache, k_new, v_new, start, pos, block_s=128, interpret=True
    )
    viewed = pallas_decode_attention(
        q, k_cache, v_cache, k_new, v_new, start, pos, block_s=128, interpret=True,
        s_view=128,
    )
    np.testing.assert_allclose(np.asarray(viewed), np.asarray(full), atol=1e-6)


def test_pallas_decode_attention_empty_cache():
    """pos == start → only the self token is attended."""
    B, H, Dh, S = 1, 2, 32, 128
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (B, H, Dh), jnp.float32)
    k_cache = jax.random.normal(ks[1], (B, S, H, Dh), jnp.float32)
    v_cache = jax.random.normal(ks[2], (B, S, H, Dh), jnp.float32)
    k_new = jax.random.normal(ks[3], (B, H, Dh), jnp.float32)
    v_new = jax.random.normal(ks[4], (B, H, Dh), jnp.float32)
    start = jnp.zeros((B,), jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)
    got = np.asarray(
        pallas_decode_attention(
            q, k_cache, v_cache, k_new, v_new, start, pos,
            block_s=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got, np.asarray(v_new), atol=1e-5)
