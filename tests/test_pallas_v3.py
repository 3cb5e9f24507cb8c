"""Paired grid-bounded decode attention (v3) vs reference math (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.ops.pallas_attention_v3 import (
    new_token_paired,
    pack_cache_paired,
    pack_scales_paired,
    paired_decode_attention,
)


def _reference(q, k_cache_smajor, v_cache_smajor, k_new, v_new, start, pos):
    """Masked decode attention, [B,S,Hk,Dh] seq-major cache, GQA-aware."""
    B, H, Dh = q.shape
    Hk = k_new.shape[1]
    G = H // Hk
    S = k_cache_smajor.shape[1]
    out = np.zeros((B, H, Dh), np.float32)
    for b in range(B):
        for h in range(H):
            hk = h // G
            k = np.concatenate([k_cache_smajor[b, :, hk], k_new[b, hk][None]], 0)
            v = np.concatenate([v_cache_smajor[b, :, hk], v_new[b, hk][None]], 0)
            s = (k @ q[b, h]) / np.sqrt(Dh)
            idx = np.arange(S + 1)
            valid = ((idx >= start[b]) & (idx < pos[b])) | (idx == S)
            s = np.where(valid, s, -1e9)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ v
    return out


@pytest.mark.parametrize("heads", [(4, 4), (8, 2)])  # (H, Hk): MHA and GQA
@pytest.mark.parametrize("s_view", [None, 256])
@pytest.mark.parametrize("rows", [1, 3])  # 3 = whole batch in one program
def test_paired_matches_reference(heads, s_view, rows):
    H, Hk = heads
    B, S, Dh = 3, 512, 64
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    kn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    vn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    start = np.array([0, 5, 17], np.int32)
    pos = np.array([40, 200, 255 if s_view else 400], np.int32)

    want = _reference(q, kc, vc, kn, vn, start, pos)

    kp = pack_cache_paired(jnp.asarray(kc))
    vp = pack_cache_paired(jnp.asarray(vc))
    got = paired_decode_attention(
        jnp.asarray(q), kp, vp, jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(start), jnp.asarray(pos),
        s_view=s_view, interpret=True, rows_per_block=rows,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def _quantize(x):
    """Per-token-per-head symmetric int8 along the last axis (matches
    models/t3/model._quantize_kv)."""
    scale = np.maximum(np.abs(x).max(axis=-1), 1e-8) / 127.0
    q = np.clip(np.round(x / scale[..., None]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


@pytest.mark.parametrize("heads", [(4, 4), (8, 2)])  # MHA and GQA
@pytest.mark.parametrize("s_view", [None, 256])
@pytest.mark.parametrize("rows", [1, 3])
def test_paired_int8_matches_dequantized_reference(heads, s_view, rows):
    """The in-kernel scale-factored int8 path must equal attention over the
    explicitly dequantized cache (the current token stays unquantized)."""
    H, Hk = heads
    B, S, Dh = 3, 512, 64
    rng = np.random.default_rng(11)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    kn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    vn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    start = np.array([0, 5, 17], np.int32)
    pos = np.array([40, 200, 255 if s_view else 400], np.int32)

    kq, ks = _quantize(kc)
    vq, vs = _quantize(vc)
    want = _reference(
        q, kq.astype(np.float32) * ks[..., None],
        vq.astype(np.float32) * vs[..., None], kn, vn, start, pos,
    )

    got = paired_decode_attention(
        jnp.asarray(q),
        pack_cache_paired(jnp.asarray(kq)),
        pack_cache_paired(jnp.asarray(vq)),
        jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(start), jnp.asarray(pos),
        k_scale=pack_scales_paired(jnp.asarray(ks)),
        v_scale=pack_scales_paired(jnp.asarray(vs)),
        s_view=s_view, interpret=True, rows_per_block=rows,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_pack_scales_roundtrip():
    rng = np.random.default_rng(4)
    s = rng.standard_normal((5, 7, 6)).astype(np.float32)  # [B?, S, Hk]
    packed = np.asarray(pack_scales_paired(jnp.asarray(s)))
    assert packed.shape == (5, 3, 2, 7)
    # pair p row 0 == head 2p, row 1 == head 2p+1, seq-last
    np.testing.assert_array_equal(packed[:, 1, 0], s[:, :, 2])
    np.testing.assert_array_equal(packed[:, 1, 1], s[:, :, 3])


def test_view_ignores_tail_garbage():
    """Entries beyond s_view must not affect the result (pos <= s_view)."""
    B, H, Hk, S, Dh = 2, 4, 4, 512, 64
    rng = np.random.default_rng(1)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    kc2 = kc.copy(); kc2[:, 256:] = 1e4
    vc2 = vc.copy(); vc2[:, 256:] = -1e4
    kn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    vn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    start = np.zeros(B, np.int32)
    pos = np.array([100, 256], np.int32)
    args = lambda k_, v_: (
        jnp.asarray(q), pack_cache_paired(jnp.asarray(k_)), pack_cache_paired(jnp.asarray(v_)),
        jnp.asarray(kn), jnp.asarray(vn), jnp.asarray(start), jnp.asarray(pos),
    )
    a = paired_decode_attention(*args(kc, vc), s_view=256, interpret=True)
    b = paired_decode_attention(*args(kc2, vc2), s_view=256, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_pack_roundtrip():
    rng = np.random.default_rng(2)
    kv = rng.standard_normal((5, 7, 6, 64)).astype(np.float32)  # [L?, S, Hk, Dh]
    packed = np.asarray(pack_cache_paired(jnp.asarray(kv)))
    assert packed.shape == (5, 3, 7, 128)
    # pair p lanes [:64] == head 2p, lanes [64:] == head 2p+1
    np.testing.assert_array_equal(packed[:, 1, :, :64], kv[:, :, 2])
    np.testing.assert_array_equal(packed[:, 1, :, 64:], kv[:, :, 3])


def test_new_token_paired():
    rng = np.random.default_rng(3)
    kv = rng.standard_normal((4, 1, 6, 64)).astype(np.float32)  # [B, 1, Hk, Dh]
    nt = np.asarray(new_token_paired(jnp.asarray(kv)))
    assert nt.shape == (4, 3, 128)
    np.testing.assert_array_equal(nt[:, 2, :64], kv[:, 0, 4])
    np.testing.assert_array_equal(nt[:, 2, 64:], kv[:, 0, 5])


@pytest.mark.parametrize("heads", [(4, 4), (8, 2)])
def test_pipelined_matches_reference(heads):
    from chatterbox_tpu.ops.pallas_attention_v3 import paired_decode_attention_pipelined

    H, Hk = heads
    B, S, Dh = 4, 512, 64
    rng = np.random.default_rng(5)
    q = rng.standard_normal((B, H, Dh)).astype(np.float32)
    kc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    vc = rng.standard_normal((B, S, Hk, Dh)).astype(np.float32)
    kn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    vn = rng.standard_normal((B, Hk, Dh)).astype(np.float32)
    start = np.array([0, 5, 17, 2], np.int32)
    pos = np.array([40, 200, 255, 9], np.int32)
    want = _reference(q, kc, vc, kn, vn, start, pos)
    got = paired_decode_attention_pipelined(
        jnp.asarray(q), pack_cache_paired(jnp.asarray(kc)), pack_cache_paired(jnp.asarray(vc)),
        jnp.asarray(kn), jnp.asarray(vn), jnp.asarray(start), jnp.asarray(pos),
        s_view=256, n_buf=3, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)
