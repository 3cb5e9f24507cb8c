"""End-to-end engine tests with the checkpoint-compatible (ref) S3Gen arch.

One module-scoped tiny_ref engine serves the stream + checkpoint tests
(each TTSEngine boot re-jits its closures — suite-runtime, VERDICT r2).
"""
import asyncio

import numpy as np
import pytest

from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import CancellationToken, EngineConfig, TTSEngine


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ref_arch_env")
    mp = pytest.MonkeyPatch()
    mp.setenv("VOICES_DIR", str(tmp_path / "voices"))
    mp.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    mp.setenv("MODEL_PATH", str(tmp_path / "models"))
    reset_config_cache()
    yield tmp_path
    mp.undo()
    reset_config_cache()


@pytest.fixture(scope="module")
def engine(env):
    eng = TTSEngine(EngineConfig.tiny_ref(), seed=3)
    asyncio.run(eng.ainit())
    yield eng
    eng.shutdown()


async def _collect(engine, **kw):
    token = kw.pop("cancellation_token", CancellationToken())
    defaults = dict(
        text="Hello world.",
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
        request_id="ref-arch-req",
        cancellation_token=token,
    )
    defaults.update(kw)
    out = b""
    async for chunk in engine.stream(**defaults):
        out += chunk
    return out


def test_ref_arch_engine_stream(env, engine):
    """The reference-architecture S3Gen serves end to end through the same
    engine pipeline (wav container, non-empty audio)."""
    data = asyncio.run(_collect(engine))
    assert data[:4] == b"RIFF"
    assert len(data) > 44


def test_ref_arch_loads_synthetic_reference_checkpoint(env, tmp_path, monkeypatch):
    """A model dir holding the reference safetensors files loads cleanly into
    the ref arch (s3gen.safetensors fully converted), and the engine streams."""
    from safetensors.numpy import save_file

    from tests.test_s3gen_ref_convert import _synth_checkpoint
    from chatterbox_tpu.models.s3gen_ref import S3GenRefConfig

    cfg = EngineConfig.tiny_ref()
    model_dir = tmp_path / "models"
    model_dir.mkdir(parents=True, exist_ok=True)
    save_file(_synth_checkpoint(cfg.s3gen_ref), str(model_dir / "s3gen.safetensors"))

    monkeypatch.setenv("MODEL_PATH", str(model_dir))
    reset_config_cache()
    try:
        engine = TTSEngine(cfg)
        asyncio.run(engine.ainit())
        data = asyncio.run(_collect(engine))
        assert data[:4] == b"RIFF" and len(data) > 44
        engine.shutdown()
    finally:
        reset_config_cache()


def test_ref_arch_native_checkpoint_roundtrip(env, engine, tmp_path):
    """Native save/load round-trips the ref-arch params (arch recorded in
    the manifest; loading with the right config restores identical weights)."""
    import jax

    from chatterbox_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    cfg = EngineConfig.tiny_ref()
    ckpt = tmp_path / "native"
    save_checkpoint(ckpt, engine.params, cfg)
    loaded = load_checkpoint(ckpt, cfg, np.float32)
    a = np.asarray(jax.tree.leaves(engine.params["s3gen"])[0])
    b = np.asarray(jax.tree.leaves(loaded["s3gen"])[0])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ref_arch_checkpoint_arch_mismatch_rejected(env, engine, tmp_path):
    from chatterbox_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    cfg_ref = EngineConfig.tiny_ref()
    ckpt = tmp_path / "native"
    save_checkpoint(ckpt, engine.params, cfg_ref)
    with pytest.raises(ValueError, match="s3gen_arch"):
        load_checkpoint(ckpt, EngineConfig.tiny(), np.float32)


def test_full_overlap_uses_streaming_graph(env, engine):
    """Full-overlap requests run the streaming CFM path by default
    (CHATTERBOX_CFM_STREAM=1 + the "step" prompt cache): the scheduler must
    have compiled a (bucket, B, new_block, "stream") graph, and the emitted
    audio span must match the non-streaming full-overlap contract (one sample
    per token-time, wav container)."""
    data = asyncio.run(_collect(engine, request_id="stream-graph-req"))
    assert data[:4] == b"RIFF" and len(data) > 44
    keys = list(engine.s3gen_scheduler._jit)
    assert any(len(k) == 4 and k[3] == "stream" for k in keys), keys


def test_zero_overlap_unaffected_by_streaming(env, engine):
    """Zero-overlap requests never carry stream state (rstate is a
    full-overlap feature): the request streams fine and compiles no new
    graph kind."""
    data = asyncio.run(
        _collect(engine, chunk_overlap_strategy="zero", request_id="zero-req")
    )
    assert data[:4] == b"RIFF" and len(data) > 44


def test_streaming_multi_chunk_state_reset(env, engine):
    """A 2-chunk request resets the streaming state at the chunk boundary
    (rstate ← the voice's fresh template): both chunks stream, audio is
    produced for each, and the container stays well-formed."""
    text = ("The first sentence fills chunk one nicely. "
            "And the second sentence makes chunk two.")
    data = asyncio.run(
        _collect(engine, text=text, request_id="stream-2chunk-req")
    )
    assert data[:4] == b"RIFF" and len(data) > 44


def test_progressive_slice_targets():
    """The progressive ladder doubles through SLICE_SIZE_SNAP and caps at
    PROGRESSIVE_SLICE_CAP; it never shrinks below the request's slice."""
    from chatterbox_tpu.runtime.engine import (
        PROGRESSIVE_SLICE_CAP, _next_slice_target,
    )

    cap = 1000
    seq, cur = [], 35
    for _ in range(5):
        cur = _next_slice_target(cur, 35, cap)
        seq.append(cur)
    assert seq == [70, 100, 100, 100, 100]
    assert _next_slice_target(8, 8, cap) == 16
    assert _next_slice_target(100, 100, cap) == PROGRESSIVE_SLICE_CAP
    # the snap cap (tiny configs) bounds the ladder below the global cap
    assert _next_slice_target(8, 8, 12) <= 12


def test_progressive_slices_grow_and_account_seams(env, engine, monkeypatch):
    """CHATTERBOX_PROGRESSIVE_SLICES=1 re-chunks the SAME token stream
    (same request_id ⇒ same _stable_seed ⇒ same tokens) into growing slices.
    Each crossfaded seam consumes fade_len samples (CrossfadeStitcher mixes
    2·fl into fl — the reference's per-slice fade, tts_streaming.py:709-758),
    so fewer, larger slices must yield AT LEAST the fixed-slice length and at
    most seam-count·fade_len more."""
    fade_ms = 10
    fl = engine.sr * fade_ms // 1000
    base = asyncio.run(_collect(engine, request_id="prog-ab-req",
                                crossfade_duration_milliseconds=fade_ms))
    monkeypatch.setenv("CHATTERBOX_PROGRESSIVE_SLICES", "1")
    try:
        prog = asyncio.run(_collect(engine, request_id="prog-ab-req",
                                    crossfade_duration_milliseconds=fade_ms))
    finally:
        monkeypatch.delenv("CHATTERBOX_PROGRESSIVE_SLICES", raising=False)
    assert prog[:4] == b"RIFF"
    extra = len(prog) - len(base)
    # 2 bytes/sample; progressive saves some seams but never loses audio
    assert 0 <= extra <= 16 * fl * 2, (len(base), len(prog))
    assert extra % (fl * 2) == 0, extra
