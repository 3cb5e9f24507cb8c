"""Default-voice loading: conds.pt → engine Conditionals.

The reference facade bakes a default voice into the snapshot as ``conds.pt``
and uses it for every request without a voice_id
(/root/reference/src/tts_streaming.py:254-258, 399-406). These tests build a
synthetic conds.pt with torch (available in the test image only — the loader
itself is torch-free) and assert the engine's default conditionals come from
the file, with the zero-waveform fallback only when it is absent.
"""
import asyncio

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from chatterbox_tpu.config import reset_config_cache
from chatterbox_tpu.runtime import EngineConfig, TTSEngine
from chatterbox_tpu.runtime.loader import load_default_conds
from chatterbox_tpu.runtime.torch_pickle import load_torch_archive


def test_torch_pickle_roundtrip(tmp_path):
    payload = {
        "f32": torch.arange(12, dtype=torch.float32).reshape(3, 4),
        "i64": torch.tensor([[1, 2, 3]], dtype=torch.int64),
        "bf16": torch.linspace(-2, 2, 8, dtype=torch.bfloat16),
        "nested": {"x": torch.ones(2, 2), "s": "hello", "n": None, "f": 1.5},
        "scalar": torch.tensor(0.5),
    }
    p = tmp_path / "x.pt"
    torch.save(payload, p)
    out = load_torch_archive(p)
    np.testing.assert_allclose(out["f32"], payload["f32"].numpy())
    np.testing.assert_array_equal(out["i64"], payload["i64"].numpy())
    np.testing.assert_allclose(out["bf16"], payload["bf16"].float().numpy())
    np.testing.assert_allclose(out["nested"]["x"], 1.0)
    assert out["nested"]["s"] == "hello"
    assert out["nested"]["n"] is None
    assert out["nested"]["f"] == 1.5
    assert float(out["scalar"]) == 0.5


def test_torch_pickle_rejects_arbitrary_globals(tmp_path):
    p = tmp_path / "bad.pt"
    # complex() round-trips through a builtins global — outside the allowlist
    torch.save({"obj": complex(1, 2)}, p)
    with pytest.raises(Exception):
        load_torch_archive(p)


def _write_conds(path, n_prompt=5, n_feat=10, n_mels=80, emo=0.42, spk_dim=192, ve_dim=32):
    rng = np.random.default_rng(7)
    t3 = {
        "speaker_emb": torch.tensor(rng.standard_normal((1, ve_dim)), dtype=torch.float32),
        "cond_prompt_speech_tokens": torch.tensor(
            rng.integers(0, 50, (1, n_prompt)), dtype=torch.int64
        ),
        "cond_prompt_speech_emb": None,
        "emotion_adv": emo * torch.ones(1, 1, 1),
    }
    gen = {
        "prompt_token": torch.tensor(rng.integers(0, 50, (1, n_prompt)), dtype=torch.int64),
        "prompt_token_len": torch.tensor([n_prompt], dtype=torch.int64),
        "prompt_feat": torch.tensor(
            rng.standard_normal((1, n_feat, n_mels)), dtype=torch.float32
        ),
        "prompt_feat_len": None,
        "embedding": torch.tensor(rng.standard_normal((1, spk_dim)), dtype=torch.float32),
    }
    torch.save({"t3": t3, "gen": gen}, path)
    return t3, gen


def test_load_default_conds_fields(tmp_path):
    p = tmp_path / "conds.pt"
    t3, gen = _write_conds(p)
    raw = load_default_conds(p)
    np.testing.assert_allclose(raw["speaker_emb"], t3["speaker_emb"].numpy())
    np.testing.assert_array_equal(
        raw["prompt_speech_tokens"], t3["cond_prompt_speech_tokens"].numpy()
    )
    assert raw["emotion_adv"] == pytest.approx(0.42)
    assert raw["prompt_token_len"] == 5
    assert raw["prompt_feat_len"] == 10  # None in the file → frame count
    np.testing.assert_allclose(raw["prompt_feat"], gen["prompt_feat"].numpy())
    assert load_default_conds(tmp_path / "absent.pt") is None


@pytest.fixture()
def env(tmp_path, monkeypatch):
    (tmp_path / "models").mkdir()
    monkeypatch.setenv("VOICES_DIR", str(tmp_path / "voices"))
    monkeypatch.setenv("PRELOADED_VOICES_DIR", str(tmp_path / "preloaded"))
    monkeypatch.setenv("MODEL_PATH", str(tmp_path / "models"))
    reset_config_cache()
    yield tmp_path
    reset_config_cache()


def test_engine_default_voice_from_conds_pt(env):
    cfg = EngineConfig.tiny_ref()
    # size the synthetic voice to the tiny ref config
    rc = cfg.s3gen_ref
    _, gen = _write_conds(
        env / "models" / "conds.pt",
        n_prompt=rc.max_prompt_tokens - 2,
        n_feat=rc.max_prompt_mel - 4,
        n_mels=rc.n_mels,
        spk_dim=rc.spk_dim,
        ve_dim=cfg.t3.speaker_embed_dim,
    )
    engine = TTSEngine(cfg)
    asyncio.run(engine.ainit())
    conds = engine.voice_cache["default"]
    # the gen ref dict must carry the stored embedding / tokens, not the
    # zero-waveform fallback's computed ones
    np.testing.assert_allclose(
        np.asarray(conds.gen_ref["spk_emb"], np.float32),
        gen["embedding"].numpy(),
        rtol=1e-2,
    )
    n = rc.max_prompt_tokens - 2
    np.testing.assert_array_equal(
        np.asarray(conds.gen_ref["prompt_tokens"])[0, :n],
        gen["prompt_token"].numpy()[0],
    )
    # alignment rule: mel frames == up_stride × tokens
    up = rc.flow.up_stride
    n_mel = int(conds.gen_ref["prompt_mel_len"][0])
    n_tok = int(conds.gen_ref["prompt_len"][0])
    assert n_mel == n_tok * up
    assert conds.t3_cond_lanes.shape[0] == 2
    engine.shutdown()


def test_engine_default_voice_fallback_without_conds_pt(env):
    cfg = EngineConfig.tiny_ref()
    engine = TTSEngine(cfg)
    asyncio.run(engine.ainit())
    conds = engine.voice_cache["default"]
    # fallback conditionals exist and have the embed_ref contract shapes
    assert conds.gen_ref["prompt_mel"].shape[1] == cfg.s3gen_ref.max_prompt_mel
    engine.shutdown()


def test_engine_corrupt_conds_pt_falls_back(env):
    (env / "models" / "conds.pt").write_bytes(b"not a zip archive")
    cfg = EngineConfig.tiny_ref()
    engine = TTSEngine(cfg)
    asyncio.run(engine.ainit())
    assert "default" in engine.voice_cache  # fell back, did not crash
    engine.shutdown()
