"""T3/VoiceEncoder checkpoint-conversion tests (VERDICT r1 item 3).

Synthesises safetensors-style tensor dicts with the reference HF key schema
(llama ``tfmr.layers.{i}.self_attn.q_proj.weight`` …, VE
``lstm.weight_ih_l{i}`` …) and asserts the converters consume every tensor
with the right transposes — a silent key or layout drift fails here. The VE
LSTM math is additionally validated numerically against torch.nn.LSTM.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.t3 import T3Config, init_t3_params
from chatterbox_tpu.models.voice_encoder import (
    VoiceEncoderConfig,
    init_voice_encoder_params,
)
from chatterbox_tpu.runtime.loader import convert_t3, convert_voice_encoder

T3C = T3Config.tiny()
VEC = VoiceEncoderConfig.tiny()


def _synth_t3_raw(params) -> dict:
    """Build the HF-style tensor dict by reversing the documented mapping —
    shapes derived from the pytree so the test stays in sync with configs."""
    rng = np.random.default_rng(0)
    rnd = lambda shape: rng.standard_normal(shape).astype(np.float32) * 0.05
    raw = {}
    lay = params["backbone"]["layers"]
    L = lay["wq"].shape[0]
    per_layer = {
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("w_gate", True),
        "mlp.up_proj.weight": ("w_up", True),
        "mlp.down_proj.weight": ("w_down", True),
        "input_layernorm.weight": ("attn_norm", False),
        "post_attention_layernorm.weight": ("mlp_norm", False),
    }
    for i in range(L):
        for suffix, (pkey, transpose) in per_layer.items():
            shape = lay[pkey].shape[1:]
            if transpose:
                shape = shape[::-1]
            raw[f"tfmr.layers.{i}.{suffix}"] = rnd(shape)
    flat = {
        "text_emb.weight": params["text_emb"].shape,
        "speech_emb.weight": params["speech_emb"].shape,
        "text_head.weight": params["text_head"]["w"].shape[::-1],
        "text_head.bias": params["text_head"]["b"].shape,
        "speech_head.weight": params["speech_head"]["w"].shape[::-1],
        "speech_head.bias": params["speech_head"]["b"].shape,
        "text_pos_emb.emb.weight": params["text_pos"].shape,
        "speech_pos_emb.emb.weight": params["speech_pos"].shape,
        "tfmr.norm.weight": params["backbone"]["final_norm"].shape,
        "cond_enc.spkr_enc.weight": params["cond"]["spkr"]["w"].shape[::-1],
        "cond_enc.spkr_enc.bias": params["cond"]["spkr"]["b"].shape,
        "cond_enc.emotion_adv_fc.weight": params["cond"]["emotion"]["w"].shape[::-1],
        "cond_enc.emotion_adv_fc.bias": params["cond"]["emotion"]["b"].shape,
    }
    for key, shape in flat.items():
        raw[key] = rnd(shape)
    if "perceiver" in params["cond"]:
        # public Chatterbox Perceiver state-dict: [1, N, D] query bank + one
        # shared attention block (LayerNorm + 4 biased linears)
        N, D = params["cond"]["perceiver"]["query"].shape
        raw["cond_enc.perceiver.pre_attention_query"] = rnd((1, N, D))
        raw["cond_enc.perceiver.attn.norm.weight"] = 1.0 + rnd((D,))
        raw["cond_enc.perceiver.attn.norm.bias"] = rnd((D,))
        for lin in ("to_q", "to_k", "to_v", "proj_out"):
            raw[f"cond_enc.perceiver.attn.{lin}.weight"] = rnd((D, D))
            raw[f"cond_enc.perceiver.attn.{lin}.bias"] = rnd((D,))
    return raw


def test_convert_t3_consumes_every_tensor_with_right_transposes():
    params = init_t3_params(jax.random.PRNGKey(0), T3C)
    raw = _synth_t3_raw(params)
    used: set = set()
    params = convert_t3(raw, params, jnp.float32, used=used)
    unconsumed = sorted(set(raw) - used)
    assert unconsumed == [], unconsumed

    # transpose checks at representative leaves
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["layers"]["wq"][0]),
        raw["tfmr.layers.0.self_attn.q_proj.weight"].T, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["speech_head"]["w"]), raw["speech_head.weight"].T, atol=1e-6
    )
    np.testing.assert_allclose(  # norms load untransposed
        np.asarray(params["backbone"]["layers"]["attn_norm"][1]),
        raw["tfmr.layers.1.input_layernorm.weight"], atol=1e-6,
    )
    np.testing.assert_allclose(  # embeddings load untransposed
        np.asarray(params["text_emb"]), raw["text_emb.weight"], atol=1e-6
    )


def test_perceiver_conversion_matches_torch():
    """Numeric validation of the perceiver mapping: a torch forward of the
    public Chatterbox Perceiver structure (query bank + ONE shared residual
    attention block applied cross then self — LayerNorm on both inputs,
    biased q/k/v/out linears, softmax(QKᵀ/√Dh)V) must equal our
    ``perceiver_resample`` on the converted weights. Catches transpose or
    norm-placement drift that the consume-all test cannot see."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = T3C
    D, heads = cfg.hidden_size, cfg.perceiver_heads
    params = init_t3_params(jax.random.PRNGKey(0), cfg)
    raw = _synth_t3_raw(params)
    params = convert_t3(raw, params, jnp.float32)

    tw = {k: torch.tensor(raw[f"cond_enc.perceiver.attn.{k}"])
          for k in ("norm.weight", "norm.bias", "to_q.weight", "to_q.bias",
                    "to_k.weight", "to_k.bias", "to_v.weight", "to_v.bias",
                    "proj_out.weight", "proj_out.bias")}

    def block(x1, x2):
        x1n = F.layer_norm(x1, (D,), tw["norm.weight"], tw["norm.bias"])
        x2n = F.layer_norm(x2, (D,), tw["norm.weight"], tw["norm.bias"])
        q = F.linear(x1n, tw["to_q.weight"], tw["to_q.bias"])
        k = F.linear(x2n, tw["to_k.weight"], tw["to_k.bias"])
        v = F.linear(x2n, tw["to_v.weight"], tw["to_v.bias"])
        B, Sq, _ = q.shape
        split = lambda t: t.view(B, t.shape[1], heads, D // heads).transpose(1, 2)
        h = F.scaled_dot_product_attention(split(q), split(k), split(v))
        h = h.transpose(1, 2).reshape(B, Sq, D)
        return x1 + F.linear(h, tw["proj_out.weight"], tw["proj_out.bias"])

    B, P = 2, cfg.speech_cond_prompt_len
    rng = np.random.default_rng(7)
    prompt = rng.standard_normal((B, P, D)).astype(np.float32)
    with torch.no_grad():
        tq = torch.tensor(
            np.tile(raw["cond_enc.perceiver.pre_attention_query"], (B, 1, 1))
        )
        pre = block(tq, torch.tensor(prompt))
        ref_out = block(pre, pre).numpy()

    from chatterbox_tpu.models.t3.model import perceiver_resample

    ours = np.asarray(
        perceiver_resample(params["cond"]["perceiver"], cfg, jnp.asarray(prompt))
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-3)


def test_perceiver_valid_mask_identity_for_full_prompt():
    """kv-masking is our addition for short clips; with a full-length prompt
    it must be the exact identity (checkpoint-parity path)."""
    from chatterbox_tpu.models.t3.model import perceiver_resample

    cfg = T3C
    params = init_t3_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(9)
    prompt = jnp.asarray(
        rng.standard_normal((1, cfg.speech_cond_prompt_len, cfg.hidden_size))
        .astype(np.float32)
    )
    full = jnp.ones((1, cfg.speech_cond_prompt_len), bool)
    a = perceiver_resample(params["cond"]["perceiver"], cfg, prompt)
    b = perceiver_resample(params["cond"]["perceiver"], cfg, prompt, full)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_convert_t3_changes_forward():
    from chatterbox_tpu.models.t3.model import cond_embeddings, t3_forward_train

    def forward(params):
        B, T, S = 1, 6, 8
        cond = cond_embeddings(
            params, T3C,
            jnp.ones((B, T3C.speaker_embed_dim)) * 0.1,
            jnp.zeros((B, T3C.speech_cond_prompt_len), jnp.int32),
            jnp.full((B,), 0.5),
        )
        return np.asarray(
            t3_forward_train(params, T3C, cond, jnp.ones((B, T), jnp.int32),
                             jnp.ones((B, S), jnp.int32))
        )

    p_rand = init_t3_params(jax.random.PRNGKey(1), T3C)
    base = forward(p_rand)
    raw = _synth_t3_raw(p_rand)
    p_conv = convert_t3(raw, init_t3_params(jax.random.PRNGKey(1), T3C), jnp.float32)
    assert not np.allclose(base, forward(p_conv))


def test_convert_t3_detects_shape_drift(caplog):
    """A transposed (wrong-layout) tensor must be reported, not silently
    loaded."""
    params = init_t3_params(jax.random.PRNGKey(0), T3C)
    raw = _synth_t3_raw(params)
    bad = raw["cond_enc.spkr_enc.weight"]
    assert bad.shape[0] != bad.shape[1]  # tiny config keeps these distinct
    raw["cond_enc.spkr_enc.weight"] = bad.T  # simulate layout drift
    before = np.asarray(params["cond"]["spkr"]["w"]).copy()
    params = convert_t3(raw, params, jnp.float32)
    # the drifted tensor was NOT assigned
    np.testing.assert_allclose(np.asarray(params["cond"]["spkr"]["w"]), before)


def _synth_ve_raw(params) -> dict:
    rng = np.random.default_rng(3)
    rnd = lambda shape: rng.standard_normal(shape).astype(np.float32) * 0.2
    raw = {}
    for i, layer in enumerate(params["lstm"]):
        raw[f"lstm.weight_ih_l{i}"] = rnd(layer["wx"].shape[::-1])
        raw[f"lstm.weight_hh_l{i}"] = rnd(layer["wh"].shape[::-1])
        raw[f"lstm.bias_ih_l{i}"] = rnd(layer["b"].shape)
        raw[f"lstm.bias_hh_l{i}"] = rnd(layer["b"].shape)
    raw["proj.weight"] = rnd(params["proj"]["w"].shape[::-1])
    raw["proj.bias"] = rnd(params["proj"]["b"].shape)
    return raw


def test_convert_voice_encoder_consumes_every_tensor():
    params = init_voice_encoder_params(jax.random.PRNGKey(0), VEC)
    raw = _synth_ve_raw(params)
    used: set = set()
    params = convert_voice_encoder(raw, params, jnp.float32, used=used)
    assert sorted(set(raw) - used) == []
    np.testing.assert_allclose(
        np.asarray(params["lstm"][0]["wx"]), raw["lstm.weight_ih_l0"].T, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["lstm"][0]["b"]),
        raw["lstm.bias_ih_l0"] + raw["lstm.bias_hh_l0"], atol=1e-6,
    )


def test_converted_lstm_matches_torch_numerically():
    """The whole point of the VE mapping: converted weights must make our
    lax.scan LSTM produce torch.nn.LSTM's outputs (gate order i,f,g,o;
    bias_ih+bias_hh summed)."""
    torch = pytest.importorskip("torch")
    from chatterbox_tpu.models.voice_encoder.model import _lstm_layer

    params = init_voice_encoder_params(jax.random.PRNGKey(0), VEC)
    raw = _synth_ve_raw(params)
    params = convert_voice_encoder(raw, params, jnp.float32)

    lstm = torch.nn.LSTM(VEC.n_mels, VEC.hidden, num_layers=1, batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(raw["lstm.weight_ih_l0"]))
        lstm.weight_hh_l0.copy_(torch.from_numpy(raw["lstm.weight_hh_l0"]))
        lstm.bias_ih_l0.copy_(torch.from_numpy(raw["lstm.bias_ih_l0"]))
        lstm.bias_hh_l0.copy_(torch.from_numpy(raw["lstm.bias_hh_l0"]))

    x = np.random.default_rng(5).standard_normal((2, 12, VEC.n_mels)).astype(np.float32)
    ours = np.asarray(_lstm_layer(params["lstm"][0], jnp.asarray(x), VEC.hidden))
    theirs, _ = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-5)
