"""HiFT-style neural vocoder: mel (50 Hz) → 24 kHz waveform.

Architecture (NSF source-filter + upsampling convs + ISTFT head), following
the reference's vocoder family (SURVEY.md §2b): an F0 predictor drives a
harmonic-plus-noise source; the generator upsamples mel through
transposed-conv stages (8·5·3), injecting source features at each rate, and
finishes with an ISTFT head (n_fft 16, hop 4) so 50 Hz frames → 480 samples.

Streaming continuity: ``source`` (the excitation signal) is the state that
must line up across chunk re-synthesis — the reference threads it between
calls as ``cache_source`` (/root/reference/src/tts_streaming.py:604,681-699).
Here the source is a deterministic function of (f0, noise key), and callers
additionally pass the cached prefix which overwrites the regenerated one, so
a re-synthesized prefix is sample-exact and chunk seams are click-free.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.conv import conv1d, conv_transpose1d
from ...ops.spectral import istft
from .config import S3GenConfig


def _dense(rng, shape, dtype, scale=None):
    from ...ops.initializers import dense_init

    return dense_init(rng, shape, dtype, scale)


def init_vocoder_params(key: jax.Array, cfg: S3GenConfig, dtype=jnp.float32) -> Dict:
    C = cfg.voc_channels
    M = cfg.n_mels
    from ...ops.initializers import rng_stream
    ks = rng_stream(key)
    dense = lambda shape, scale=None: _dense(next(ks), shape, dtype, scale)

    # F0 predictor: small conv stack on mel
    f0p = {
        "c1": {"w": dense((5, M, 256)), "b": jnp.zeros((256,), dtype)},
        "c2": {"w": dense((5, 256, 256)), "b": jnp.zeros((256,), dtype)},
        "c3": {"w": dense((5, 256, 1)), "b": jnp.zeros((1,), dtype)},
    }
    # NSF source: harmonic mixer
    source = {
        "harm_mix": {"w": dense((1, cfg.num_harmonics + 1, 1)), "b": jnp.zeros((1,), dtype)},
    }

    stages = []
    ch = C
    total_rate = 1
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        ch_out = C // (2 ** (i + 1))
        total_rate *= r
        stage = {
            "up": {"w": dense((k, ch, ch_out)), "b": jnp.zeros((ch_out,), dtype)},
            # source injection at this stage's frame rate
            "src": {"w": dense((7, 1, ch_out)), "b": jnp.zeros((ch_out,), dtype)},
            "res": [],
        }
        for rk in cfg.resblock_kernels:
            block = []
            for d in cfg.resblock_dilations:
                block.append(
                    {
                        "c1": {"w": dense((rk, ch_out, ch_out)), "b": jnp.zeros((ch_out,), dtype)},
                        "c2": {"w": dense((rk, ch_out, ch_out)), "b": jnp.zeros((ch_out,), dtype)},
                    }
                )
            stage["res"].append(block)
        stages.append(stage)
        ch = ch_out

    return {
        "f0p": f0p,
        "source": source,
        "pre": {"w": dense((7, M, C)), "b": jnp.zeros((C,), dtype)},
        "stages": stages,
        # small init: the ISTFT head exponentiates magnitudes, so start quiet
        "post": {"w": dense((7, ch, cfg.istft_n_fft + 2), 1e-2), "b": jnp.zeros((cfg.istft_n_fft + 2,), dtype)},
    }


def predict_f0(params: Dict, mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, M] → f0 [B, T] in Hz (non-negative)."""
    h = jax.nn.relu(conv1d(mel, params["f0p"]["c1"]["w"], params["f0p"]["c1"]["b"]))
    h = jax.nn.relu(conv1d(h, params["f0p"]["c2"]["w"], params["f0p"]["c2"]["b"]))
    f0 = jax.nn.softplus(conv1d(h, params["f0p"]["c3"]["w"], params["f0p"]["c3"]["b"]))
    return f0[..., 0] * 100.0  # softplus units → Hz scale


def make_source(
    params: Dict,
    cfg: S3GenConfig,
    f0: jnp.ndarray,     # [B, T] frame-rate F0
    key: jax.Array,
) -> jnp.ndarray:
    """Harmonic-plus-noise excitation at sample rate → [B, T*hop]."""
    B, T = f0.shape
    sr = cfg.sample_rate
    f0_up = jnp.repeat(f0, cfg.hop, axis=1)  # [B, L]
    phase = 2.0 * math.pi * jnp.cumsum(f0_up / sr, axis=1)
    k = jnp.arange(1, cfg.num_harmonics + 1, dtype=jnp.float32)
    harmonics = jnp.sin(phase[:, :, None] * k[None, None, :])  # [B, L, H]
    voiced = (f0_up > 10.0)[:, :, None]
    noise = jax.random.normal(key, f0_up.shape + (1,), jnp.float32)
    # voiced: harmonics + small noise; unvoiced: noise only
    exc = jnp.concatenate(
        [jnp.where(voiced, 0.1 * harmonics, 0.0), jnp.where(voiced, 0.003, 0.1) * noise],
        axis=-1,
    )
    src = jnp.tanh(conv1d(exc, params["source"]["harm_mix"]["w"], params["source"]["harm_mix"]["b"]))
    return src[..., 0]  # [B, L]


def _resblock(x, block, kernel, dilations):
    for unit, d in zip(block, dilations):
        h = jax.nn.leaky_relu(x, 0.1)
        h = conv1d(h, unit["c1"]["w"], unit["c1"]["b"], dilation=d)
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv1d(h, unit["c2"]["w"], unit["c2"]["b"])
        x = x + h
    return x


def vocode(
    params: Dict,
    cfg: S3GenConfig,
    mel: jnp.ndarray,       # [B, T, M]
    source: jnp.ndarray,    # [B, T*hop] excitation (possibly cache-prefixed)
) -> jnp.ndarray:
    """→ waveform [B, T*hop]."""
    B, T, _ = mel.shape
    x = conv1d(mel, params["pre"]["w"], params["pre"]["b"])
    src = source[:, :, None]  # [B, L, 1]

    rate = 1
    for stage, r in zip(params["stages"], cfg.upsample_rates):
        x = jax.nn.leaky_relu(x, 0.1)
        x = conv_transpose1d(x, stage["up"]["w"], stage["up"]["b"], stride=r)
        rate *= r
        # pool the sample-rate source down to this stage's frame rate
        stride = cfg.hop // rate
        s = conv1d(src, stage["src"]["w"], stage["src"]["b"], stride=stride)
        x = x + s[:, : x.shape[1]]
        acc = None
        for block, rk in zip(stage["res"], cfg.resblock_kernels):
            y = _resblock(x, block, rk, cfg.resblock_dilations)
            acc = y if acc is None else acc + y
        x = acc / len(stage["res"])

    x = jax.nn.leaky_relu(x, 0.1)
    spec_params = conv1d(x, params["post"]["w"], params["post"]["b"])
    n_bins = cfg.istft_n_fft // 2 + 1
    log_mag = jnp.clip(spec_params[..., :n_bins], -10.0, 3.0)
    phase = spec_params[..., n_bins : 2 * n_bins]
    spec = jnp.exp(log_mag) * jnp.exp(1j * phase.astype(jnp.float32))
    win = jnp.asarray(np.hanning(cfg.istft_n_fft).astype(np.float32))
    wav = istft(spec, cfg.istft_n_fft, cfg.istft_hop, win, center=False)
    L = T * cfg.hop
    wav = wav[:, :L]
    return jnp.clip(wav, -1.0, 1.0)
