"""CAMPPlus x-vector speaker encoder (checkpoint-compatible).

The reference's ``embed_ref`` computes the flow decoder's speaker embedding
with a CAMPPlus encoder over kaldi fbanks (``speaker_encoder.*`` subtree of
``s3gen.safetensors``; consumed via /root/reference/src/tts_streaming.py:365).

Publicly known architecture (3D-Speaker lineage):
FCM conv2d head (freq ÷8, stride on the frequency axis only) → TDNN
(k5, stride 2) → 3 CAM-dense TDNN blocks (dense growth, context-attention
gates) with transit halvings → masked stats pooling (mean‖std) → dense →
192-d embedding.

Every stage is masked on the valid-frame axis so right-padded batches match
unpadded computation (tests/test_s3gen_ref.py::test_campplus_shape_and_mask).
BatchNorms run in inference mode (running stats), so they are position-exact
under padding by construction.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.initializers import dense_init, rng_stream
from .config import CampPlusConfig

_SEG_LEN = 100  # CAM context segment pooling length (reference constant)


def _mk_bn(mk, c: int, affine: bool = True) -> Dict:
    p = {"mean": mk(c), "var": mk(c)}
    if affine:
        p["w"] = mk(c)
        p["b"] = mk(c)
    return p


def init_campplus_params(key: jax.Array, cfg: CampPlusConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    m = cfg.m_channels
    head = {
        "conv1": {"w": mk(3, 3, 1, m)},  # HWIO
        "bn1": _mk_bn(mk, m),
        "conv2": {"w": mk(3, 3, m, m)},
        "bn2": _mk_bn(mk, m),
    }
    for lname in ("layer1", "layer2"):
        blocks = []
        for bi in range(2):
            blk = {
                "conv1": {"w": mk(3, 3, m, m)},
                "bn1": _mk_bn(mk, m),
                "conv2": {"w": mk(3, 3, m, m)},
                "bn2": _mk_bn(mk, m),
            }
            if bi == 0:  # stride-2 block: projection shortcut
                blk["shortcut"] = {"conv": {"w": mk(1, 1, m, m)}, "bn": _mk_bn(mk, m)}
            blocks.append(blk)
        head[lname] = blocks

    ch = m * (cfg.feat_dim // 8)
    xv: Dict = {
        "tdnn": {"conv": {"w": mk(5, ch, cfg.init_channels)}, "bn": _mk_bn(mk, cfg.init_channels)}
    }
    ch = cfg.init_channels
    bn_ch = cfg.bn_size * cfg.growth_rate
    for b_i, (nl, k) in enumerate(zip(cfg.num_layers, cfg.kernel_sizes)):
        layers = []
        cin = ch
        for _ in range(nl):
            layers.append({
                "bn1": _mk_bn(mk, cin),
                "linear1": {"w": mk(1, cin, bn_ch)},
                "bn2": _mk_bn(mk, bn_ch),
                "cam_local": {"w": mk(k, bn_ch, cfg.growth_rate)},
                "cam_lin1": {"w": mk(1, bn_ch, bn_ch // 2), "b": mk(bn_ch // 2)},
                "cam_lin2": {"w": mk(1, bn_ch // 2, cfg.growth_rate), "b": mk(cfg.growth_rate)},
            })
            cin += cfg.growth_rate
        ch = cin
        xv[f"block{b_i + 1}"] = layers
        xv[f"transit{b_i + 1}"] = {"bn": _mk_bn(mk, ch), "conv": {"w": mk(1, ch, ch // 2)}}
        ch //= 2
    xv["out_bn"] = _mk_bn(mk, ch)
    xv["dense"] = {
        "conv": {"w": mk(1, ch * 2, cfg.embedding_size)},
        "bn": _mk_bn(mk, cfg.embedding_size, affine=False),
    }
    return {"head": head, "xvector": xv}


def _bn(x: jnp.ndarray, p: Dict, eps: float = 1e-5) -> jnp.ndarray:
    """Inference batch-norm over the channel (last) axis of [B, T, C].

    ``abs(var)`` is a no-op for real checkpoints (variances are positive) but
    keeps randomly-initialised test models finite."""
    inv = jax.lax.rsqrt(jnp.abs(p["var"].astype(jnp.float32)) + eps)
    y = (x.astype(jnp.float32) - p["mean"]) * inv
    if "w" in p:
        y = y * p["w"] + p["b"]
    return y.astype(x.dtype)


def _bn2d(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    """x: [B, F, T, C] — batchnorm over C."""
    return _bn(x.reshape(-1, 1, x.shape[-1]), p).reshape(x.shape)


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, stride_f: int = 1) -> jnp.ndarray:
    """x: [B, F, T, Cin], w: [kF, kT, Cin, Cout]; torch-symmetric padding,
    stride on the frequency axis only (CAMPPlus convention)."""
    kf, kt = w.shape[0], w.shape[1]
    pf, pt = (kf - 1) // 2, (kt - 1) // 2
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    x = jnp.pad(x, ((0, 0), (pf, pf), (pt, pt), (0, 0)))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride_f, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fcm_head(p: Dict, x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T, F] fbank → [B, T, m*(F//8)] via the 2-D conv head.

    Invalid time columns are re-zeroed before every conv so the valid region
    sees exactly the zero padding an unpadded run would (bn adds a bias to
    padded positions otherwise, and k=3 time convs would smear it in)."""

    def z(h):
        return jnp.where(valid[:, None, :, None], h, 0.0)

    h = x.transpose(0, 2, 1)[..., None]  # [B, F, T, 1]
    h = jax.nn.relu(_bn2d(_conv2d(z(h), p["conv1"]["w"]), p["bn1"]))
    for lname in ("layer1", "layer2"):
        for bi, blk in enumerate(p[lname]):
            stride = 2 if bi == 0 else 1
            h = z(h)
            out = jax.nn.relu(_bn2d(_conv2d(h, blk["conv1"]["w"], stride), blk["bn1"]))
            out = _bn2d(_conv2d(z(out), blk["conv2"]["w"]), blk["bn2"])
            if "shortcut" in blk:
                sc = _bn2d(_conv2d(h, blk["shortcut"]["conv"]["w"], stride), blk["shortcut"]["bn"])
            else:
                sc = h
            h = jax.nn.relu(out + sc)
    h = jax.nn.relu(_bn2d(_conv2d(z(h), p["conv2"]["w"], 2), p["bn2"]))
    B, F8, T, C = h.shape
    # torch reshape of (B, C, F8, T) → (B, C*F8, T); channel-major ordering
    return h.transpose(0, 3, 1, 2).reshape(B, C * F8, T).transpose(0, 2, 1)


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid time steps. x: [B, T, C], valid: [B, T] → [B, 1, C]."""
    denom = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None, None]
    return jnp.sum(jnp.where(valid[:, :, None], x, 0.0), axis=1, keepdims=True) / denom


def _seg_pool(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Masked segment average pooling (seg_len=100, ceil) broadcast back to T."""
    B, T, C = x.shape
    n_seg = -(-T // _SEG_LEN)
    pad = n_seg * _SEG_LEN - T
    xs = jnp.pad(jnp.where(valid[:, :, None], x, 0.0), ((0, 0), (0, pad), (0, 0)))
    vs = jnp.pad(valid.astype(x.dtype), ((0, 0), (0, pad)))
    seg_sum = xs.reshape(B, n_seg, _SEG_LEN, C).sum(axis=2)
    seg_cnt = jnp.maximum(vs.reshape(B, n_seg, _SEG_LEN).sum(axis=2), 1.0)
    seg = seg_sum / seg_cnt[:, :, None]
    return jnp.repeat(seg, _SEG_LEN, axis=1)[:, :T]


def _cam_layer(p: Dict, x: jnp.ndarray, valid: jnp.ndarray, k: int, dilation: int) -> jnp.ndarray:
    y = conv1d(x, p["cam_local"]["w"], dilation=dilation, padding="SAME_TORCH")
    context = _masked_mean(x, valid) + _seg_pool(x, valid)
    context = jax.nn.relu(conv1d(context, p["cam_lin1"]["w"], p["cam_lin1"]["b"]))
    gate = jax.nn.sigmoid(conv1d(context, p["cam_lin2"]["w"], p["cam_lin2"]["b"]))
    return y * gate


def campplus_embed(
    params: Dict,
    cfg: CampPlusConfig,
    fbank: jnp.ndarray,               # [B, T, feat_dim] CMN'd kaldi fbank
    valid: Optional[jnp.ndarray],     # [B, T] bool, or None for all-valid
) -> jnp.ndarray:
    """→ [B, embedding_size] speaker embedding."""
    B, T, _ = fbank.shape
    if valid is None:
        valid = jnp.ones((B, T), bool)
    fbank = jnp.where(valid[:, :, None], fbank, 0.0)
    h = _fcm_head(params["head"], fbank, valid)  # [B, T, ch]

    xv = params["xvector"]
    # TDNN k5 stride2 (torch padding=2): out_t = floor((T+4-5)/2)+1
    h = jnp.where(valid[:, :, None], h, 0.0)
    h = conv1d(h, xv["tdnn"]["conv"]["w"], stride=2, padding="SAME_TORCH")
    h = jax.nn.relu(_bn(h, xv["tdnn"]["bn"]))
    valid = valid[:, ::2][:, : h.shape[1]]

    for b_i, (nl, k, dil) in enumerate(zip(cfg.num_layers, cfg.kernel_sizes, cfg.dilations)):
        for layer in xv[f"block{b_i + 1}"]:
            z = jax.nn.relu(_bn(h, layer["bn1"]))
            z = jnp.where(valid[:, :, None], z, 0.0)
            z = conv1d(z, layer["linear1"]["w"])
            z = jax.nn.relu(_bn(z, layer["bn2"]))
            z = jnp.where(valid[:, :, None], z, 0.0)
            z = _cam_layer(layer, z, valid, k, dil)
            h = jnp.concatenate([h, z], axis=-1)  # dense connectivity
        t = xv[f"transit{b_i + 1}"]
        h = jax.nn.relu(_bn(h, t["bn"]))
        h = jnp.where(valid[:, :, None], h, 0.0)
        h = conv1d(h, t["conv"]["w"])

    h = jax.nn.relu(_bn(h, xv["out_bn"]))
    # stats pooling: mean ‖ unbiased std over valid frames
    n = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None].astype(h.dtype)
    mean = _masked_mean(h, valid)[:, 0]
    sq = _masked_mean((h - mean[:, None]) ** 2, valid)[:, 0]
    var = sq * n / jnp.maximum(n - 1.0, 1.0)
    stats = jnp.concatenate([mean, jnp.sqrt(jnp.maximum(var, 1e-7))], axis=-1)
    d = xv["dense"]
    emb = conv1d(stats[:, None], d["conv"]["w"])
    emb = _bn(emb, d["bn"])
    return emb[:, 0]
