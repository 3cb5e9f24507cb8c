"""S3Gen / S3Tokenizer / VoiceEncoder tests (tiny configs, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatterbox_tpu.models.s3gen import (
    S3GenConfig,
    init_s3gen_params,
    s3gen_embed_ref,
    s3gen_inference,
)
from chatterbox_tpu.models.s3tok import S3TokConfig, init_s3tok_params, s3tok_tokenize
from chatterbox_tpu.models.voice_encoder import (
    VoiceEncoderConfig,
    init_voice_encoder_params,
    voice_embed,
)
from chatterbox_tpu.ops.spectral import istft, log_mel_spectrogram, overlap_add, stft

CFG = S3GenConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_s3gen_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def ref(params):
    wav24 = jnp.zeros((1, 24000))
    fbank = jnp.zeros((1, 50, 80))
    prompt = jnp.ones((1, CFG.max_prompt_tokens), jnp.int32)
    plen = jnp.array([5], jnp.int32)
    return s3gen_embed_ref(params, CFG, wav24, fbank, prompt, plen)


# ---------------------------------------------------------------- spectral
def test_stft_istft_roundtrip():
    t = np.arange(4096) / 24000
    x = jnp.asarray(np.sin(2 * np.pi * 440 * t)[None].astype(np.float32))
    win = jnp.asarray(np.hanning(320).astype(np.float32))
    spec = stft(x, 320, 80, win)
    y = istft(spec, 320, 80, win, length=4096)
    err = np.abs(np.asarray(y[0, 400:3600]) - np.asarray(x[0, 400:3600])).max()
    assert err < 1e-3


def test_overlap_add_constant():
    frames = jnp.ones((1, 10, 8))
    out = overlap_add(frames, 4)
    # interior samples get 8/4 = 2 overlapping contributions
    assert np.allclose(np.asarray(out)[0, 8:-8], 2.0)


def test_log_mel_shape():
    x = jnp.zeros((2, 16000))
    mel = log_mel_spectrogram(x, 16000, 400, 160, 80)
    assert mel.shape[0] == 2 and mel.shape[2] == 80
    assert abs(mel.shape[1] - 101) <= 1


# ---------------------------------------------------------------- s3gen
def test_s3gen_inference_shapes(params, ref):
    B, T = 1, 6
    tokens = jnp.arange(T, dtype=jnp.int32)[None] % CFG.vocab_size
    token_len = jnp.array([T], jnp.int32)
    src_cache = jnp.zeros((B, T * CFG.samples_per_token))
    wav, new_src = s3gen_inference(
        params, CFG, tokens, token_len, ref, src_cache, jnp.array([0]), jax.random.PRNGKey(5)
    )
    assert wav.shape == (B, T * CFG.samples_per_token)
    assert new_src.shape == src_cache.shape
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


def test_s3gen_source_cache_prefix_exact(params, ref):
    """The excitation (cache_source) prefix must be reused bit-exactly when
    re-synthesizing accumulated tokens — the continuity contract behind the
    reference's 'full' overlap strategy (tts_streaming.py:604,694-699).
    (The *waveform* prefix legitimately shifts slightly: the encoder is
    bidirectional, which is why the pipeline crossfades seams.)"""
    key = jax.random.PRNGKey(7)
    spt = CFG.samples_per_token
    t4 = jnp.array([[1, 2, 3, 4]], jnp.int32)
    wav4, src4 = s3gen_inference(
        params, CFG, t4, jnp.array([4]), ref, jnp.zeros((1, 4 * spt)), jnp.array([0]), key
    )
    t6 = jnp.array([[1, 2, 3, 4, 5, 6]], jnp.int32)
    cache = jnp.zeros((1, 6 * spt)).at[:, : 4 * spt].set(src4)
    wav6, src6 = s3gen_inference(
        params, CFG, t6, jnp.array([6]), ref, cache, jnp.array([4 * spt]), key
    )
    # excitation prefix is exactly the cached excitation
    np.testing.assert_array_equal(np.asarray(src6)[0, : 4 * spt], np.asarray(src4)[0])
    assert np.isfinite(np.asarray(wav6)).all()
    # and the same call with the same inputs is deterministic
    wav6b, _ = s3gen_inference(
        params, CFG, t6, jnp.array([6]), ref, cache, jnp.array([4 * spt]), key
    )
    np.testing.assert_array_equal(np.asarray(wav6), np.asarray(wav6b))


def test_s3gen_pad_content_invariance(params, ref):
    """Within one static bucket, the values sitting in the padded tail must
    not influence the valid output region (masking correctness)."""
    key = jax.random.PRNGKey(9)
    spt = CFG.samples_per_token
    base = jnp.array([[7, 8, 9, 0, 0, 0]], jnp.int32)
    junk = jnp.array([[7, 8, 9, 123, 456, 789]], jnp.int32)
    w1, _ = s3gen_inference(
        params, CFG, base, jnp.array([3]), ref, jnp.zeros((1, 6 * spt)), jnp.array([0]), key
    )
    w2, _ = s3gen_inference(
        params, CFG, junk, jnp.array([3]), ref, jnp.zeros((1, 6 * spt)), jnp.array([0]), key
    )
    np.testing.assert_array_equal(
        np.asarray(w1)[0, : 3 * spt], np.asarray(w2)[0, : 3 * spt]
    )


# ---------------------------------------------------------------- s3tok
def test_s3tok_tokens_in_range():
    cfg = S3TokConfig.tiny()
    params = init_s3tok_params(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 16000)) * 0.1
    toks, tlen = s3tok_tokenize(params, cfg, wav, jnp.array([16000, 8000]))
    assert toks.shape[0] == 2
    t = np.asarray(toks)
    assert (t >= 0).all() and (t < 6561).all()
    assert np.asarray(tlen).tolist() == [25, 12]


def test_s3tok_deterministic():
    cfg = S3TokConfig.tiny()
    params = init_s3tok_params(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(1), (1, 8000)) * 0.1
    a, _ = s3tok_tokenize(params, cfg, wav, jnp.array([8000]))
    b, _ = s3tok_tokenize(params, cfg, wav, jnp.array([8000]))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------- voice enc
def test_voice_encoder_embedding():
    cfg = VoiceEncoderConfig.tiny()
    params = init_voice_encoder_params(jax.random.PRNGKey(0), cfg)
    wav = jax.random.normal(jax.random.PRNGKey(2), (2, 16000)) * 0.1
    emb = voice_embed(params, cfg, wav)
    assert emb.shape == (2, cfg.embed_dim)
    norms = np.linalg.norm(np.asarray(emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
