"""S3TokenizerV2: whisper-style encoder + FSQ quantizer (25 Hz, 3^8 codes).

Checkpoint-compatible with the ``tokenizer.*`` subtree of the reference's
``s3gen.safetensors`` (the serving stack tokenizes the voice prompt with it:
/root/reference/src/tts_streaming.py:369-372, consts S3_SR=16000 and the
``tokens < 6561`` validity mask at :667-668).

Architecture (publicly known speech_tokenizer_v2_25hz):
whisper 128-mel (100 Hz) → conv1 (k3, s2, gelu) → conv2 (k3, s2, gelu) →
+sinusoidal positional table (a checkpoint buffer) → pre-norm transformer
(q/v biased, k unbiased — whisper convention) → FSQ: Linear(D→8), tanh,
scale 0.999…, round → digit ∈ {0,1,2} per dim → code = Σ digit·3^d.

All paths are masked so right-padded batches tokenize the valid prefix
identically to unpadded inputs (tests/test_s3gen_ref.py::test_tokenizer_*).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.initializers import buffer_init, dense_init, rng_stream
from ...ops.nn import NEG_INF, layer_norm, linear
from .config import S3TokRefConfig
from .features import whisper_log_mel

# tanh outputs are scaled by (1 - 1e-3) before rounding so the ±1 boundaries
# cannot tie (the reference FSQ codebook uses the same guard constant)
_FSQ_TANH_SCALE = 1.0 - 1e-3


def _sinusoid_table(n_ctx: int, d: int) -> np.ndarray:
    """Whisper's sinusoidal positional embedding (stored in the checkpoint)."""
    log_timescale = np.log(10000.0) / (d // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(d // 2))
    t = np.arange(n_ctx)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_s3tok_ref_params(key: jax.Array, cfg: S3TokRefConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)
    D = cfg.n_state

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    blocks = []
    for _ in range(cfg.n_layer):
        blocks.append({
            "attn": {
                "q": {"w": mk(D, D), "b": mk(D)},
                "k": {"w": mk(D, D)},
                "v": {"w": mk(D, D), "b": mk(D)},
                "out": {"w": mk(D, D), "b": mk(D)},
            },
            "attn_ln": {"w": mk(D), "b": mk(D)},
            "mlp1": {"w": mk(D, 4 * D), "b": mk(4 * D)},
            "mlp2": {"w": mk(4 * D, D), "b": mk(D)},
            "mlp_ln": {"w": mk(D), "b": mk(D)},
        })
    pos = buffer_init(_sinusoid_table(cfg.n_audio_ctx, D), dtype)
    return {
        "conv1": {"w": mk(3, cfg.n_mels, D), "b": mk(D)},
        "conv2": {"w": mk(3, D, D), "b": mk(D)},
        "pos": pos,  # checkpoint buffer (sinusoidal); converted 1:1
        "blocks": blocks,
        "fsq": {"w": mk(D, cfg.fsq_dim), "b": mk(cfg.fsq_dim)},
    }


def _attention(p: Dict, cfg: S3TokRefConfig, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    B, T, D = x.shape
    H = cfg.n_head
    q = linear(x, p["q"]["w"], p["q"]["b"]).reshape(B, T, H, D // H)
    k = linear(x, p["k"]["w"]).reshape(B, T, H, D // H)
    v = linear(x, p["v"]["w"], p["v"]["b"]).reshape(B, T, H, D // H)
    scale = (D // H) ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
    return linear(out.reshape(B, T, D).astype(x.dtype), p["out"]["w"], p["out"]["b"])


def s3tok_ref_tokenize(
    params: Dict,
    cfg: S3TokRefConfig,
    wav16: jnp.ndarray,   # [B, L] 16 kHz, right-padded
    lens: jnp.ndarray,    # [B] valid sample counts
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (tokens [B, L//640] int32, valid token counts [B])."""
    mel, n_mel = whisper_log_mel(wav16, lens)            # [B, Tm, 128] @100 Hz
    mel = mel.astype(params["conv1"]["w"].dtype)
    x = jax.nn.gelu(
        conv1d(mel, params["conv1"]["w"], params["conv1"]["b"], stride=2, padding="SAME_TORCH")
    )
    x = jax.nn.gelu(
        conv1d(x, params["conv2"]["w"], params["conv2"]["b"], stride=2, padding="SAME_TORCH")
    )
    # clip to the positional table's capacity: audio beyond the tokenizer
    # context can't be represented (full-size table covers the 10 s prompt
    # budget; tiny test configs may see longer warm-up audio)
    cap = params["pos"].shape[0]
    if x.shape[1] > cap:
        x = x[:, :cap]
    T = x.shape[1]
    n_tok = jnp.minimum(n_mel // 4, cap)
    valid = jnp.arange(T)[None, :] < n_tok[:, None]
    x = jnp.where(valid[:, :, None], x, 0.0)
    x = x + params["pos"][:T][None].astype(x.dtype)
    for blk in params["blocks"]:
        h = layer_norm(x, blk["attn_ln"]["w"], blk["attn_ln"]["b"])
        x = x + _attention(blk["attn"], cfg, h, valid)
        h = layer_norm(x, blk["mlp_ln"]["w"], blk["mlp_ln"]["b"])
        x = x + linear(jax.nn.gelu(linear(h, blk["mlp1"]["w"], blk["mlp1"]["b"])),
                       blk["mlp2"]["w"], blk["mlp2"]["b"])
    # FSQ encode (round in float32: bf16 tanh near ±0.5 could flip digits)
    z = linear(x, params["fsq"]["w"], params["fsq"]["b"]).astype(jnp.float32)
    digits = jnp.round(jnp.tanh(z) * _FSQ_TANH_SCALE) + 1.0   # {0,1,2}
    powers = jnp.asarray(
        [cfg.fsq_levels ** d for d in range(cfg.fsq_dim)], jnp.float32
    )
    codes = jnp.sum(digits * powers, axis=-1).astype(jnp.int32)
    codes = jnp.where(valid, codes, 0)
    return codes, n_tok.astype(jnp.int32)
