"""bfloat16 end-to-end: the production dtype policy must work on CPU too
(catches float32 promotion leaks that otherwise only surface on TPU)."""
import asyncio
import dataclasses

import numpy as np
import pytest

from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import CancellationToken, EngineConfig, TTSEngine


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "v"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "p"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "m"))
    reset_config_cache()
    yield
    reset_config_cache()


def test_bf16_stream_end_to_end(env):
    cfg = dataclasses.replace(EngineConfig.tiny(), param_dtype="bfloat16")
    engine = TTSEngine(cfg)
    asyncio.run(engine.ainit())
    import jax

    assert jax.tree.leaves(engine.params["t3"])[0].dtype.name == "bfloat16"

    async def run():
        out = b""
        async for c in engine.stream(
            text="Bfloat sixteen pipeline check.", output_format="wav",
            voice_id=None, cfg_guidance_weight=0.5, synthesis_temperature=0.8,
            text_processing_chunk_size=60, audio_tokens_per_slice=8,
            remove_trailing_milliseconds=0, remove_leading_milliseconds=0,
            chunk_overlap_strategy="full", crossfade_duration_milliseconds=10,
            request_id="bf16", cancellation_token=CancellationToken(),
        ):
            out += c
        return out

    data = asyncio.run(run())
    assert data[:4] == b"RIFF" and len(data) > 44
