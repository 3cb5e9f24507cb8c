"""HiFT vocoder (checkpoint-compatible): mel → NSF source-filter → ISTFT.

Mirrors the ``mel2wav.*`` subtree of the reference's ``s3gen.safetensors``
(publicly known CosyVoice-family HiFTGenerator): ConvRNN f0 predictor →
harmonic-plus-noise NSF source (SineGen with frame-rate phase integration) →
upsampling stack (weight-normed transposed convs, Snake resblocks) with the
source injected per stage through STFT-domain down-convs → 16/4 ISTFT head
(exp-magnitude, sin-phase).

The excitation ``source`` is returned and accepted as the streaming
continuity cache (the reference ``cache_source`` contract,
/root/reference/src/tts_streaming.py:604, 648-699): overriding the prefix
with the cached excitation makes chunk re-synthesis sample-exact there.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d, conv_transpose1d
from ...ops.initializers import buffer_init, dense_init, rng_stream
from ...ops.nn import linear
from ...ops.spectral import istft, stft
from .config import HiFTConfig


def _upsample_total(cfg: HiFTConfig) -> int:
    r = 1
    for u in cfg.upsample_rates:
        r *= u
    return r * cfg.istft_hop


def _source_down_rates(cfg: HiFTConfig) -> List[int]:
    rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    return list(np.cumprod(rates)[::-1])


def init_hift_params(key: jax.Array, cfg: HiFTConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)
    nfft2 = cfg.istft_n_fft + 2

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    def mk_resblock(c: int, k: int, dils) -> Dict:
        return {
            "convs1": [{"w": mk(k, c, c), "b": mk(c)} for _ in dils],
            "convs2": [{"w": mk(k, c, c), "b": mk(c)} for _ in dils],
            "alpha1": [mk(c) for _ in dils],
            "alpha2": [mk(c) for _ in dils],
        }

    base = cfg.base_channels
    ups, sdowns, sres, res = [], [], [], []
    cum = _source_down_rates(cfg)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = base // (2 ** i), base // (2 ** (i + 1))
        ups.append({"w": mk(k, cin, cout), "b": mk(cout)})
        du = cum[i]
        sdowns.append({"w": mk(1 if du == 1 else du * 2, nfft2, cout), "b": mk(cout)})
        sres.append(mk_resblock(cout, cfg.source_resblock_kernel_sizes[i],
                                cfg.source_resblock_dilation_sizes[i]))
        for k2, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            res.append(mk_resblock(cout, k2, dils))
    f0_convs = []
    cin = cfg.in_channels
    for _ in range(5):
        f0_convs.append({"w": mk(3, cin, cfg.f0_cond_channels), "b": mk(cfg.f0_cond_channels)})
        cin = cfg.f0_cond_channels
    win = np.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(cfg.istft_n_fft) / cfg.istft_n_fft),
                     np.float32)
    window = buffer_init(win, dtype)
    return {
        "conv_pre": {"w": mk(7, cfg.in_channels, base), "b": mk(base)},
        "ups": ups,
        "source_downs": sdowns,
        "source_resblocks": sres,
        "resblocks": res,
        "conv_post": {"w": mk(7, base // (2 ** len(cfg.upsample_rates)), nfft2), "b": mk(nfft2)},
        "f0": {"convs": f0_convs, "cls": {"w": mk(cfg.f0_cond_channels, 1), "b": mk(1)}},
        "m_source": {"w": mk(cfg.nb_harmonics + 1, 1), "b": mk(1)},
        "stft_window": window,  # checkpoint buffer
    }


def hift_receptive_margin(cfg: HiFTConfig) -> int:
    """Conservative ONE-SIDED receptive field of the mel→wav stack, in output
    samples. Every op in ``hift_decode`` is local (convs, transposed convs,
    STFT/ISTFT windows), so a waveform sample further than this margin from a
    window edge is exactly the full-length computation's sample — the basis
    for tail-windowed vocoding (full-overlap re-synthesis otherwise pays the
    vocoder over the quadratically growing accumulated length while only a
    constant-size tail is emitted). Bound, not tight: contributions are
    summed even across parallel branches."""
    total_up = _upsample_total(cfg)
    hop = cfg.istft_hop

    def rb_span(k: int, dils) -> int:
        # sequential dilated conv pairs: one-sided span in steps
        return sum(((k - 1) // 2) * d + (k - 1) // 2 for d in dils)

    rf = 3 * total_up  # conv_pre k7 @ mel rate
    cum = _source_down_rates(cfg)
    rate_in = total_up
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        rate_out = rate_in // u
        rf += (-(-k // u) + 1) * rate_in                       # transposed conv
        rf += max(
            (rb_span(kk, dd) for kk, dd in zip(
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)),
            default=0,
        ) * rate_out                                            # main resblocks
        du = cum[i]
        rf += cfg.istft_n_fft                                   # source STFT
        rf += (2 * du if du > 1 else 1) * hop                   # source down conv
        rf += rb_span(cfg.source_resblock_kernel_sizes[i],
                      cfg.source_resblock_dilation_sizes[i]) * rate_out
        rate_in = rate_out
    rf += rate_in                    # final-stage reflection pad
    rf += 3 * hop                    # conv_post k7 @ ISTFT frame rate
    rf += cfg.istft_n_fft            # ISTFT window
    return rf


def _snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    a = alpha.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return (x32 + jnp.sin(a * x32) ** 2 / (a + 1e-9)).astype(x.dtype)


def _resblock(p: Dict, x: jnp.ndarray, dils) -> jnp.ndarray:
    for j, d in enumerate(dils):
        xt = _snake(x, p["alpha1"][j])
        xt = conv1d(xt, p["convs1"][j]["w"], p["convs1"][j]["b"], dilation=d, padding="SAME_TORCH")
        xt = _snake(xt, p["alpha2"][j])
        xt = conv1d(xt, p["convs2"][j]["w"], p["convs2"][j]["b"], padding="SAME_TORCH")
        x = x + xt
    return x


def predict_f0(params: Dict, cfg: HiFTConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """ConvRNNF0Predictor: [B, F, 80] mel → [B, F] f0 (Hz, ≥0)."""
    h = mel
    for c in params["f0"]["convs"]:
        h = jax.nn.elu(conv1d(h, c["w"], c["b"], padding="SAME_TORCH"))
    f0 = linear(h, params["f0"]["cls"]["w"], params["f0"]["cls"]["b"])[..., 0]
    return jnp.abs(f0.astype(jnp.float32))


def _interp_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over axis 1."""
    B, T, C = x.shape
    pos = (np.arange(out_len) + 0.5) * (T / out_len) - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, T - 1)
    hi = np.clip(lo + 1, 0, T - 1)
    frac = np.clip(pos - np.floor(pos), 0.0, 1.0).astype(np.float32)
    frac = np.where(pos < 0, 0.0, frac)  # edge clamp
    return x[:, lo] * (1.0 - frac)[None, :, None] + x[:, hi] * frac[None, :, None]


def make_source(params: Dict, cfg: HiFTConfig, f0: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """NSF harmonic-plus-noise source. f0: [B, F] (frame rate) → [B, F·up].

    SineGen semantics: nearest-upsample f0 to the sample rate, build
    harmonics k·f0, integrate phase at the FRAME rate (linear down/up
    interpolation around the cumsum — anti-alias trick of the reference),
    random initial phase per harmonic (fundamental fixed), voiced/unvoiced
    gating, additive noise, then tanh(linear) merge across harmonics."""
    up = _upsample_total(cfg)
    B, F = f0.shape
    L = F * up
    H = cfg.nb_harmonics + 1
    f0_up = jnp.repeat(f0, up, axis=1)                                # [B, L]
    fn = f0_up[:, :, None] * jnp.arange(1, H + 1, dtype=jnp.float32)  # [B, L, H]
    rad = (fn / cfg.sample_rate) % 1.0
    k_ini, k_noise = jax.random.split(key)
    rand_ini = jax.random.uniform(k_ini, (B, H))
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    rad_frame = _interp_linear(rad, F)                                # 1/up downsample
    phase = jnp.cumsum(rad_frame, axis=1) * 2.0 * np.pi
    phase = _interp_linear(phase * up, L)
    sines = jnp.sin(phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, :, None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k_noise, sines.shape)
    sine_waves = sines * cfg.nsf_alpha * uv + noise
    har = jnp.tanh(linear(sine_waves, params["m_source"]["w"], params["m_source"]["b"]))
    return har[..., 0]  # [B, L]


def hift_decode(params: Dict, cfg: HiFTConfig, mel: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """[B, F, 80] mel + [B, F·up] excitation → [B, F·up] waveform."""
    n_fft, hop = cfg.istft_n_fft, cfg.istft_hop
    win = params["stft_window"].astype(jnp.float32)
    s_spec = stft(source.astype(jnp.float32), n_fft, hop, win)        # [B, Ns, 9]
    s_stft = jnp.concatenate([jnp.real(s_spec), jnp.imag(s_spec)], axis=-1)  # [B, Ns, 18]
    s_stft = s_stft.astype(mel.dtype)

    x = conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"], padding="SAME_TORCH")
    cum = _source_down_rates(cfg)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = conv_transpose1d(x, params["ups"][i]["w"], params["ups"][i]["b"], stride=u)
        if i == len(cfg.upsample_rates) - 1:
            # reflection pad (1, 0): aligns the final stage with the source
            # STFT frame count (the ISTFT head emits (N-1)·hop samples)
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        du = cum[i]
        sd = params["source_downs"][i]
        if du == 1:
            si = conv1d(s_stft, sd["w"], sd["b"])
        else:
            pad = du // 2
            si = conv1d(jnp.pad(s_stft, ((0, 0), (pad, pad), (0, 0))), sd["w"], sd["b"],
                        stride=du, padding="VALID")
        si = _resblock(params["source_resblocks"][i], si,
                       cfg.source_resblock_dilation_sizes[i])
        x = x + si
        acc = None
        for j in range(nk):
            r = _resblock(params["resblocks"][i * nk + j], x, cfg.resblock_dilation_sizes[j])
            acc = r if acc is None else acc + r
        x = acc / nk
    x = jax.nn.leaky_relu(x, 0.01)
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"], padding="SAME_TORCH")
    x = x.astype(jnp.float32)
    mag = jnp.exp(jnp.minimum(x[..., : n_fft // 2 + 1], np.log(1e2)))
    phase = jnp.sin(x[..., n_fft // 2 + 1:])
    spec = mag * jnp.exp(1j * phase)
    wav = istft(spec, n_fft, hop, win, length=source.shape[1])
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)
