"""HTTP API tests: full endpoint surface against a tiny-model engine."""
import asyncio
import os

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from chatterbox_tpu.audio.pcm import write_wav
from chatterbox_tpu.config import reset_config_cache

KEY = "test-key-123"


@pytest.fixture()
def server_env(tmp_path, monkeypatch):
    monkeypatch.setenv("API_KEY", KEY)
    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "voices"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "models"))
    reset_config_cache()
    yield tmp_path
    reset_config_cache()


def test_api_surface(server_env, tmp_path):
    from chatterbox_tpu.runtime import EngineConfig, TTSEngine
    from chatterbox_tpu.serve.app import create_app

    async def run():
        engine = TTSEngine(EngineConfig.tiny())
        app = create_app(engine, warm_voices=False)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            h = {"X-API-Key": KEY}

            # health: no auth required
            r = await client.get("/health")
            assert r.status == 200
            assert (await r.json())["status"] == "ok"

            # auth enforcement
            r = await client.get("/voices")
            assert r.status == 401
            r = await client.get("/voices", headers={"X-API-Key": "wrong"})
            assert r.status == 401
            # query-param auth also accepted
            r = await client.get(f"/voices?api_key={KEY}")
            assert r.status == 200

            # voices CRUD
            r = await client.get("/voices", headers=h)
            assert await r.json() == []
            sr = 24000
            wav_path = tmp_path / "probe.wav"
            t = np.arange(sr // 2) / sr
            write_wav(str(wav_path), (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
            with open(wav_path, "rb") as fh:
                r = await client.post(
                    "/voices", data={"file": fh}, headers=h
                )
            assert r.status == 201, await r.text()
            assert (await r.json())["voice_id"] == "probe.wav"
            with open(wav_path, "rb") as fh:
                r = await client.post("/voices", data={"file": fh}, headers=h)
            assert r.status == 409

            r = await client.get("/voices", headers=h)
            assert await r.json() == ["probe.wav"]

            # tts: validation
            r = await client.get("/tts/generate", headers=h)
            assert r.status == 400  # missing text
            r = await client.get("/tts/generate?text=hi&format=ogg", headers=h)
            assert r.status == 400  # bad format
            r = await client.get("/tts/generate?text=hi&voice_id=ghost.wav", headers=h)
            assert r.status == 404  # unknown voice
            r = await client.get("/tts/generate?text=hi")
            assert r.status == 401  # no auth

            # tts: streaming wav (GET) with explicit params
            r = await client.get(
                "/tts/generate?text=Hello+world&format=wav&audio_tokens_per_slice=8",
                headers=h,
            )
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("audio/wav")
            assert "X-Request-ID" in r.headers
            body = await r.read()
            assert body[:4] == b"RIFF" and len(body) > 44

            # tts: POST JSON with cloned voice
            r = await client.post(
                "/tts/generate",
                json={
                    "text": "Voice clone test.",
                    "voice_id": "probe.wav",
                    "format": "raw_pcm",
                    "audio_tokens_per_slice": 8,
                },
                headers=h,
            )
            assert r.status == 200
            body = await r.read()
            assert len(body) > 0

            # system-status
            r = await client.get("/system-status", headers=h)
            assert r.status == 200
            status = await r.json()
            assert "cpu" in status and "tpus" in status
            assert status["engine"]["state"] == "ready"

            # delete voice; preloaded/missing → 404
            r = await client.delete("/voices/probe.wav", headers=h)
            assert r.status == 200
            r = await client.delete("/voices/probe.wav", headers=h)
            assert r.status == 404

            # root serves the console (or a plain placeholder)
            r = await client.get("/")
            assert r.status == 200
        finally:
            await client.close()

    asyncio.run(run())
