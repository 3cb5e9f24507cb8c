"""End-to-end engine tests with the tiny random-weight model (CPU).

One module-scoped engine serves every test that doesn't need a special
env knob (suite-runtime: each TTSEngine boot re-jits its closures, ~10 s
on this 1-CPU box; VERDICT r2 asked for module-scoped fixtures here).
"""
import asyncio

import numpy as np
import pytest

from chatterbox_tpu.audio.pcm import pcm16_to_float, write_wav
from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import CancellationToken, EngineConfig, TTSEngine


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("engine_env")
    mp = pytest.MonkeyPatch()
    mp.setenv("VOICES_DIR", str(tmp_path / "voices"))
    mp.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    mp.setenv("MODEL_PATH", str(tmp_path / "models"))
    reset_config_cache()
    yield tmp_path
    mp.undo()
    reset_config_cache()


@pytest.fixture(scope="module")
def engine_cfg():
    return EngineConfig.tiny()


def _make_engine(engine_cfg):
    engine = TTSEngine(engine_cfg)
    asyncio.run(engine.ainit())
    return engine


@pytest.fixture(scope="module")
def engine(env, engine_cfg):
    eng = _make_engine(engine_cfg)
    yield eng
    eng.shutdown()


async def _collect_stream(engine, **kw):
    token = kw.pop("cancellation_token", CancellationToken())
    defaults = dict(
        text="Hello world. This is a test.",
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
        request_id="test-req",
        cancellation_token=token,
    )
    defaults.update(kw)
    out = b""
    async for chunk in engine.stream(**defaults):
        out += chunk
    return out


def test_stream_wav_end_to_end(env, engine):
    data = asyncio.run(_collect_stream(engine))
    assert data[:4] == b"RIFF"
    pcm = data[44:]
    assert len(pcm) > 0 and len(pcm) % 2 == 0
    audio = pcm16_to_float(pcm)
    assert np.isfinite(audio).all()
    # tiny model with 64-token cap → at least a few hundred ms of audio
    assert len(audio) > 0.2 * engine.sr


@pytest.mark.parametrize("window", [16, 4])
def test_overlap_window_conserves_samples(env, engine, engine_cfg, monkeypatch, window):
    """CHATTERBOX_OVERLAP_WINDOW_TOKENS bounds the full-overlap re-synthesis
    window. T3 tokens are unaffected, so the emitted sample COUNT must be
    identical to the unbounded run (the window changes context, not length).
    window=4 < audio_tokens_per_slice=8 regresses the drop>emitted bug (the
    naive acc−W drop cut into NEW tokens and lost audio)."""
    base = asyncio.run(_collect_stream(engine, request_id="win-req"))

    monkeypatch.setenv("CHATTERBOX_OVERLAP_WINDOW_TOKENS", str(window))
    engine2 = _make_engine(engine_cfg)
    try:
        assert engine2.overlap_window == window
        windowed = asyncio.run(_collect_stream(engine2, request_id="win-req"))
    finally:
        engine2.shutdown()
    assert len(windowed) == len(base)
    assert windowed[:4] == b"RIFF"


def test_stream_zero_overlap_strategy(env, engine):
    data = asyncio.run(
        _collect_stream(engine, chunk_overlap_strategy="zero", output_format="raw_pcm")
    )
    assert len(data) > 0


def test_stream_empty_text(env, engine):
    data = asyncio.run(_collect_stream(engine, text="   "))
    assert data == b""


def test_stream_with_cloned_voice(env, engine):
    # author a reference wav and register it as a voice
    sr = 24000
    t = np.arange(sr) / sr
    ref = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    voice_path = engine.voice_manager.voices_dir / "tester.wav"
    write_wav(str(voice_path), ref, sr)

    data = asyncio.run(_collect_stream(engine, voice_id="tester.wav"))
    assert data[:4] == b"RIFF" and len(data) > 44
    assert "tester.wav" in engine.voice_cache

    engine.clear_voice_cache("tester.wav")
    assert "tester.wav" not in engine.voice_cache


def test_stream_missing_voice_raises(env, engine):
    async def run():
        with pytest.raises(FileNotFoundError):
            await _collect_stream(engine, voice_id="ghost.wav")

    asyncio.run(run())


def test_stream_cancellation(env, engine):
    async def run():
        token = CancellationToken()
        received = []
        gen = engine.stream(
            text="One sentence. " * 10,
            output_format="raw_pcm",
            voice_id=None,
            cfg_guidance_weight=0.0,
            synthesis_temperature=0.8,
            text_processing_chunk_size=30,
            audio_tokens_per_slice=8,
            remove_trailing_milliseconds=0,
            remove_leading_milliseconds=0,
            chunk_overlap_strategy="full",
            crossfade_duration_milliseconds=10,
            request_id="cancel-req",
            cancellation_token=token,
        )
        async for chunk in gen:
            received.append(chunk)
            token.cancel()  # cancel after the first chunk
        return received

    received = asyncio.run(run())
    assert len(received) >= 1
