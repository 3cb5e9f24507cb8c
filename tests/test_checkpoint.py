"""Native checkpoint round-trip and TP-sharded engine serving tests."""
import asyncio
import json

import numpy as np
import pytest

from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import EngineConfig, TTSEngine
from chatterbox_tpu.runtime.checkpoint import (
    NATIVE_MANIFEST,
    is_native_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "voices"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "models"))
    reset_config_cache()
    yield tmp_path
    reset_config_cache()


def test_checkpoint_roundtrip(env, tmp_path):
    import jax
    import jax.numpy as jnp

    from chatterbox_tpu.models.t3 import init_t3_params
    from chatterbox_tpu.models.s3gen import init_s3gen_params
    from chatterbox_tpu.models.s3tok import init_s3tok_params
    from chatterbox_tpu.models.voice_encoder import init_voice_encoder_params

    cfg = EngineConfig.tiny()
    key = jax.random.PRNGKey(42)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "t3": init_t3_params(k1, cfg.t3),
        "s3gen": init_s3gen_params(k2, cfg.s3gen),
        "s3tok": init_s3tok_params(k3, cfg.s3tok),
        "ve": init_voice_encoder_params(k4, cfg.ve),
    }
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, params, cfg)
    assert is_native_checkpoint(ckpt)
    manifest = json.loads((ckpt / NATIVE_MANIFEST).read_text())
    assert manifest["format"] == "chatterbox_tpu/v1"
    assert manifest["models"] == ["s3gen", "s3tok", "t3", "ve"]

    loaded = load_checkpoint(ckpt, cfg, jnp.float32)
    for name in params:
        a = jax.tree.leaves(params[name])
        b = jax.tree.leaves(loaded[name])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_engine_loads_native_checkpoint(env, tmp_path, monkeypatch):
    """Engine boots from a native checkpoint and the weights actually differ
    from random init (deterministic synthesis across two engines)."""
    cfg = EngineConfig.tiny()
    e1 = TTSEngine(cfg, seed=7)
    asyncio.run(e1.ainit())
    ckpt = tmp_path / "models"  # MODEL_PATH
    host_params = e1.params
    save_checkpoint(ckpt, host_params, cfg)

    e2 = TTSEngine(cfg, seed=99)  # different seed: random init would differ
    asyncio.run(e2.ainit())
    import jax

    a = np.asarray(jax.tree.leaves(e1.params["t3"])[0])
    b = np.asarray(jax.tree.leaves(e2.params["t3"])[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_tp_sharded_engine_stream(env, monkeypatch):
    """Engine with CHATTERBOX_TP=4 shards T3 over the virtual mesh and still
    synthesizes end to end."""
    monkeypatch.setenv("CHATTERBOX_TP", "4")
    from chatterbox_tpu.runtime.cancellation import CancellationToken

    engine = TTSEngine(EngineConfig.tiny())
    asyncio.run(engine.ainit())
    assert hasattr(engine, "mesh")

    async def run():
        out = b""
        async for chunk in engine.stream(
            text="Sharded decode test.",
            output_format="wav",
            voice_id=None,
            cfg_guidance_weight=0.5,
            synthesis_temperature=0.8,
            text_processing_chunk_size=50,
            audio_tokens_per_slice=8,
            remove_trailing_milliseconds=0,
            remove_leading_milliseconds=0,
            chunk_overlap_strategy="full",
            crossfade_duration_milliseconds=10,
            request_id="tp-req",
            cancellation_token=CancellationToken(),
        ):
            out += chunk
        return out

    data = asyncio.run(run())
    assert data[:4] == b"RIFF" and len(data) > 44
