"""Flash MHA kernel vs reference math (interpret mode, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.pallas_mha import flash_mha


def _reference(q, k, v, valid, scale):
    B, H, T, dh = q.shape
    s = np.einsum("bhid,bhjd->bhij", q, k).astype(np.float64) * scale
    s = np.where(valid[:, None, None, :], s, -1e9)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / np.maximum(p.sum(axis=-1, keepdims=True), 1e-30)
    return np.einsum("bhij,bhjd->bhid", p, v)


@pytest.mark.parametrize("T", [640, 256, 100])  # unaligned T exercises padding
@pytest.mark.parametrize("blocks", [(256, 256), (128, 256)])
def test_flash_mha_matches_reference(T, blocks):
    bq, bk = blocks
    B, H, dh = 2, 3, 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    valid = np.ones((B, T), bool)
    valid[1, T - T // 3 :] = False  # padded tail on row 1

    want = _reference(q, k, v, valid, 0.125)
    got = flash_mha(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
        scale=0.125, block_q=bq, block_k=bk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_flash_mha_fully_masked_rows_are_zero():
    B, H, T, dh = 1, 2, 256, 64
    rng = np.random.default_rng(3)
    q = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    valid = np.zeros((B, T), bool)  # empty key set
    got = flash_mha(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(valid),
        interpret=True,
    )
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=0)


def test_flash_mha_bf16_inputs():
    B, H, T, dh = 1, 2, 384, 64
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    k = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    v = rng.standard_normal((B, H, T, dh)).astype(np.float32)
    valid = np.ones((B, T), bool)
    valid[:, 300:] = False
    want = _reference(
        q.astype(jnp.bfloat16).astype(np.float32),
        k.astype(jnp.bfloat16).astype(np.float32),
        v.astype(jnp.bfloat16).astype(np.float32),
        valid, 0.125,
    )
    got = flash_mha(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(valid),
        scale=0.125, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), want, atol=3e-2, rtol=3e-2
    )


def test_estimator_tf_block_flash_matches_xla(monkeypatch):
    """decoder._tf_block must produce the same output through the flash
    branch (interpret) and the XLA scores path — the branch is
    backend-selected, so the equivalence is the serving-correctness gate."""
    from chatterbox_tpu.models.s3gen_ref import decoder
    from chatterbox_tpu.models.s3gen_ref.config import FlowRefConfig

    cfg = FlowRefConfig.tiny()
    p = decoder.init_estimator_params(jax.random.PRNGKey(0), cfg)
    tf = p["mid"][0]["tf"][0]
    B, T, C = 2, 70, cfg.dec_channels[0]
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    valid = np.ones((B, T), bool)
    valid[1, 50:] = False
    valid = jnp.asarray(valid)

    base = decoder._tf_block(tf, cfg, x, valid)
    monkeypatch.setattr(decoder, "_FLASH_INTERPRET", True)
    flash = decoder._tf_block(tf, cfg, x, valid)
    np.testing.assert_allclose(
        np.asarray(flash), np.asarray(base), atol=2e-5, rtol=2e-5
    )
