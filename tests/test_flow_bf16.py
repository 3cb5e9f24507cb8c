"""CHATTERBOX_FLOW_BF16 lever (FlowRefConfig.bf16_activations).

The flow chain's dtype is set by its input (ops/nn.py linear/layer_norm
follow x.dtype); the one site that used to force f32 everywhere is the
encoder _embed's scale constant. The lever applies the scale in the chain's
own dtype, so bf16 weights give bf16 activations through encoder + CFM while
HiFT stays pinned to f32 (model.py _mel_and_source).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    s3gen_ref_embed_ref,
    s3gen_ref_inference,
)
from chatterbox_tpu.models.s3gen_ref.upsample_encoder import upsample_encode

CFG = S3GenRefConfig.tiny()
CFG_BF16 = dataclasses.replace(
    CFG, flow=dataclasses.replace(CFG.flow, bf16_activations=True)
)


def _embed_ref(params, cfg):
    rng = np.random.default_rng(1)
    wav24 = jnp.asarray(rng.standard_normal((1, 24000)) * 0.1, jnp.float32)
    wav16 = jnp.asarray(rng.standard_normal((1, 16000)) * 0.1, jnp.float32)
    return s3gen_ref_embed_ref(
        params, cfg, wav24, jnp.array([24000]), wav16, jnp.array([16000])
    )


def _infer(params, cfg, T=6):
    ref = _embed_ref(params, cfg)
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.flow.vocab_size, (1, T)), jnp.int32)
    spt = cfg.samples_per_token
    wav, src = s3gen_ref_inference(
        params, cfg, tokens, jnp.array([T]), ref,
        jnp.zeros((1, T * spt), jnp.float32), jnp.array([0]),
        jax.random.PRNGKey(7),
    )
    return np.asarray(wav), np.asarray(src)


def test_flag_is_noop_on_f32_chain():
    """With f32 weights the scale is f32 either way — bit-identical output,
    proving the lever touches nothing but the activation dtype."""
    params = init_s3gen_ref_params(jax.random.PRNGKey(0), CFG)
    wav_a, src_a = _infer(params, CFG)
    wav_b, src_b = _infer(params, CFG_BF16)
    np.testing.assert_array_equal(wav_a, wav_b)
    np.testing.assert_array_equal(src_a, src_b)


def test_encoder_dtype_follows_flag():
    params = init_s3gen_ref_params(jax.random.PRNGKey(0), CFG, jnp.bfloat16)
    fl = CFG.flow
    x = jnp.ones((1, 4, fl.input_size), jnp.bfloat16)
    valid = jnp.ones((1, 4), bool)
    h32, _ = upsample_encode(params["flow"]["encoder"], fl, x, valid)
    hbf, _ = upsample_encode(
        params["flow"]["encoder"], CFG_BF16.flow, x, valid
    )
    assert h32.dtype == jnp.float32   # legacy: scale constant promotes
    assert hbf.dtype == jnp.bfloat16  # lever: chain keeps the weights' dtype


def test_bf16_inference_finite_and_close():
    """bf16 weights + bf16 activations: finite, non-degenerate audio, and a
    flow output (CFM mel) that tracks the f32-activation chain of the same
    bf16 weights. The gate is on the MEL, not the waveform: the ISTFT head
    predicts phase, and phase wrap makes waveform correlation meaningless
    under infinitesimal input perturbation (measured here: mel corr
    0.99999+ while wav corr ~0.4 on the tiny random net)."""
    from chatterbox_tpu.models.s3gen_ref.model import _mel_and_source

    params = init_s3gen_ref_params(jax.random.PRNGKey(0), CFG, jnp.bfloat16)
    wavbf, _ = _infer(params, CFG_BF16)
    assert np.isfinite(wavbf).all()
    assert wavbf.std() > 0

    ref = _embed_ref(params, CFG)
    rng = np.random.default_rng(2)
    T = 6
    tokens = jnp.asarray(rng.integers(0, CFG.flow.vocab_size, (1, T)), jnp.int32)
    spt = CFG.samples_per_token

    def mel_of(cfg):
        mel, src = _mel_and_source(
            params, cfg, tokens, jnp.array([T]), ref,
            jnp.zeros((1, T * spt), jnp.float32), jnp.array([0]),
            jax.random.PRNGKey(7),
        )
        return np.asarray(mel, np.float32), np.asarray(src, np.float32)

    m32, s32 = mel_of(CFG)
    mbf, sbf = mel_of(CFG_BF16)
    a, b = m32.ravel(), mbf.ravel()
    corr = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert corr > 0.995, corr
    np.testing.assert_allclose(s32, sbf, atol=1e-3)  # NSF source: f0-driven
