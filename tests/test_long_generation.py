"""Regression tests for decode across s_view bucket boundaries and for
pipeline error propagation."""
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

# config whose cache depth crosses the 256 s_view bucket boundary
CFG = T3Config.tiny().with_(max_speech_tokens=300)


def test_decode_across_view_buckets():
    """Generating past the first 256-entry attention view must not crash and
    must keep producing valid tokens (reproduces the s_view > cache-depth
    crash scenario)."""
    params = init_t3_params(jax.random.PRNGKey(0), CFG)
    spk = jnp.ones((1, CFG.speaker_embed_dim)) * 0.1
    prompt = jnp.zeros((1, CFG.speech_cond_prompt_len), jnp.int32)
    cond = cond_embeddings(params, CFG, spk, prompt, jnp.full((1,), 0.5))
    lanes = jnp.repeat(cond, 2, axis=0)
    text = jnp.zeros((2, 8), jnp.int32)
    cache = t3_prefill(params, CFG, lanes, text, jnp.full((2,), 4, jnp.int32))
    depth = cache["k"].shape[2]
    assert depth > 256, "test requires crossing the first bucket"

    state = make_decode_state(jax.random.PRNGKey(1), CFG, 1, 0.9, 1.0, 0.0, 1.0)
    pos0 = CFG.cond_len + 8
    produced = 0
    n = 20
    while produced < 280:
        need = pos0 + produced + n + 1
        s_view = min(depth, ((need + 255) // 256) * 256)
        toks, cache, state = t3_decode_slice(params, CFG, cache, state, n, s_view)
        toks = np.asarray(toks)
        valid = (toks < CFG.num_speech_codes) | (toks == CFG.stop_speech_token)
        assert valid.all()
        produced += n
    assert int(np.asarray(cache["pos"])[0]) <= depth


def test_engine_propagates_pipeline_error(tmp_path, monkeypatch):
    """A crash inside the T3 producer must surface as a stream error, not a
    silent truncation."""
    from chatterbox_tpu.config import reset_config_cache
    from chatterbox_tpu.runtime import CancellationToken, EngineConfig, TTSEngine

    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "v"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "p"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "m"))
    monkeypatch.setenv("MAX_DECODE_SLOTS", "1")
    reset_config_cache()
    try:
        engine = TTSEngine(EngineConfig.tiny())
        asyncio.run(engine.ainit())
        engine.tokenizer = None  # force the T3 producer to crash

        async def run():
            out = b""
            gen = engine.stream(
                text="This will fail.", output_format="raw_pcm", voice_id=None,
                cfg_guidance_weight=0.0, synthesis_temperature=0.8,
                text_processing_chunk_size=50, audio_tokens_per_slice=8,
                remove_trailing_milliseconds=0, remove_leading_milliseconds=0,
                chunk_overlap_strategy="full", crossfade_duration_milliseconds=10,
                request_id="err-req", cancellation_token=CancellationToken(),
            )
            with pytest.raises(RuntimeError, match="synthesis pipeline failed"):
                async for chunk in gen:
                    out += chunk
            return out

        asyncio.run(run())
    finally:
        reset_config_cache()
