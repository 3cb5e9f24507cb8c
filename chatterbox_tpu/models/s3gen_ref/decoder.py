"""CFM estimator: causal-UNet ConditionalDecoder (matcha layout) + Euler/CFG.

Checkpoint-compatible with ``flow.decoder.estimator.*`` of the reference's
``s3gen.safetensors`` (publicly known matcha-TTS decoder layout used by the
CosyVoice2 family): sinusoidal time embedding (scale 1000) → MLP; one
down level [resnet → transformer×n → conv k3], N mid levels, one up level
with the skip concat; final block + 1×1 projection.

The solver is the cosine-warped Euler CFM with classifier-free guidance
(rate 0.7): the uncond lane zeroes mu/spk/cond, both lanes batched into ONE
estimator call per step so the scan stays a single XLA graph.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.conv import conv1d
from ...ops.initializers import dense_init, rng_stream
from ...ops.nn import NEG_INF, layer_norm, linear
from ...ops.pallas_mha import flash_mha
from .config import FlowRefConfig

# test hook: force the flash path in interpret mode on CPU
_FLASH_INTERPRET = False


def _flash_active() -> bool:
    """Use the flash MHA kernel for the estimator's transformer blocks (TPU
    backend; CHATTERBOX_FLASH=0 opts out). The XLA path materializes
    [B, H, T, T] f32 scores in HBM — ~1 GB of traffic per estimator eval at
    production shapes across the 16 blocks; flash keeps them in VMEM."""
    import os

    if _FLASH_INTERPRET:
        return True
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("CHATTERBOX_FLASH", "1") == "1"
    )

# fixed noise-buffer length (frames) for chunk-stable CFM initial noise; the
# reference uses a 15000-frame buffer (50 Hz × 300 s) — far above any chunk
_NOISE_FRAMES = 2048


def _group_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, groups: int = 8,
                eps: float = 1e-5, valid: jnp.ndarray | None = None,
                extra: Dict | None = None, cap: bool = False):
    """torch GroupNorm over [B, T, C] (normalizes per group over (T, C/g)).

    ``valid`` ([B, T] bool) restricts the statistics to valid frames so a
    padded batch reproduces the reference's unpadded computation exactly.

    Prompt-cache support (CFM prompt prefill — see cfm_prompt_prefill):
    ``cap`` additionally returns this region's sufficient statistics
    ``{"s1": Σx [B,G], "s2": Σx² [B,G], "n": frame count [B]}``; ``extra``
    merges cached statistics from a frozen prompt region into this call's
    own, so the generated region normalizes with (frozen-prompt ∪ own)
    statistics. The sufficient-statistics form E[x²]−E[x]² is mathematically
    identical to the two-pass form below (fp rounding aside)."""
    B, T, C = x.shape
    g = x.astype(jnp.float32).reshape(B, T, groups, C // groups)
    if cap or extra is not None:
        vm = valid[:, :, None, None].astype(jnp.float32)
        s1 = jnp.sum(g * vm, axis=(1, 3))                    # [B, G]
        s2 = jnp.sum(jnp.square(g) * vm, axis=(1, 3))
        n = jnp.sum(valid.astype(jnp.float32), axis=1)       # [B]
        # capture OWN-region statistics only (pre-merge): streaming
        # accumulates them into a running total, so a merged capture would
        # double-count the frozen context (caught by
        # test_padding_lane_state_passthrough)
        own = {"s1": s1, "s2": s2, "n": n}
        if extra is not None:
            s1 = s1 + extra["s1"]
            s2 = s2 + extra["s2"]
            n = n + extra["n"]
        denom = jnp.maximum(n[:, None] * (C // groups), 1.0)
        mean = s1 / denom
        var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
        gn = (g - mean[:, None, :, None]) * jax.lax.rsqrt(var[:, None, :, None] + eps)
        out = gn.reshape(B, T, C).astype(x.dtype) * w + b
        if cap:
            return out, own
        return out
    if valid is None:
        mean = jnp.mean(g, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(g - mean), axis=(1, 3), keepdims=True)
    else:
        vm = valid[:, :, None, None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(vm, axis=1, keepdims=True), 1.0) * (C // groups)
        mean = jnp.sum(g * vm, axis=(1, 3), keepdims=True) / denom
        var = jnp.sum(jnp.square(g - mean) * vm, axis=(1, 3), keepdims=True) / denom
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, T, C).astype(x.dtype) * w + b


def _conv_h(x: jnp.ndarray, p: Dict, pc: jnp.ndarray | None = None,
            cap: bool = False, pos: jnp.ndarray | None = None):
    """SAME_TORCH conv1d with optional frozen left context at the
    prompt/generated boundary.

    ``pc`` ([B, (K−1)//2, C]): cached prompt-boundary frames prepended as the
    left context (replacing SAME_TORCH's zero left pad) so the generated
    region's first frames convolve over the real prompt tail. ``cap``
    additionally returns this region's own boundary frames for caching.
    The right edge keeps the zero pad in both modes (the prompt's right-edge
    frame is computed without sight of generated frames — part of the
    one-way prompt-cache deviation documented in cfm_prompt_prefill).

    ``pos`` ([B] int32, streaming right-packed blocks — cfm_generate_
    streaming): index of each row's FIRST valid frame; the halo is injected
    immediately left of it (the rows before it are masked padding) instead
    of at the block start. pos == 0 reproduces the prepend layout."""
    w, b = p["w"], p["b"]
    hw = (w.shape[0] - 1) // 2
    if pc is not None and hw and pos is not None:
        assert hw == 1, "pos-injected halo supports k=3 convs only"
        B, T, C = x.shape
        z = jnp.zeros((B, hw, C), x.dtype)
        ext = jnp.concatenate([z, x, z], axis=1)          # [B, T+2, C]
        jj = jnp.arange(T + 2 * hw)[None, :, None]
        # ext row `pos` is original row pos-1: the pad row (or the prepended
        # zero when pos==0) immediately left of the first valid frame
        ext = jnp.where(jj == pos[:, None, None], pc.astype(x.dtype), ext)
        out = conv1d(ext, w, b, padding="VALID")
    elif pc is not None and hw:
        B, _, C = x.shape
        ext = jnp.concatenate(
            [pc.astype(x.dtype), x, jnp.zeros((B, hw, C), x.dtype)], axis=1
        )
        out = conv1d(ext, w, b, padding="VALID")
    else:
        out = conv1d(x, w, b, padding="SAME_TORCH")
    if cap:
        # store in the weights' dtype: activations ride an f32 chain, but the
        # frozen context is read every slice — bf16 halves the per-voice
        # cache (~1.1 GB full-size) and its per-step HBM traffic
        return out, x[:, x.shape[1] - hw:].astype(w.dtype)
    return out


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x.astype(jnp.float32))).astype(x.dtype)


def init_estimator_params(key: jax.Array, cfg: FlowRefConfig, dtype=jnp.float32) -> Dict:
    rngs = rng_stream(key)
    ch = cfg.dec_channels[0]
    tdim = ch * 4
    inner = cfg.dec_num_heads * cfg.dec_attention_head_dim

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    def mk_resnet(cin: int):
        return {
            "mlp": {"w": mk(tdim, ch), "b": mk(ch)},
            "block1": {"conv": {"w": mk(3, cin, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
            "block2": {"conv": {"w": mk(3, ch, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
            "res": {"w": mk(1, cin, ch), "b": mk(ch)},
        }

    def mk_tf():
        return {
            "norm1": {"w": mk(ch), "b": mk(ch)},
            "to_q": {"w": mk(ch, inner)},
            "to_k": {"w": mk(ch, inner)},
            "to_v": {"w": mk(ch, inner)},
            "to_out": {"w": mk(inner, ch), "b": mk(ch)},
            "norm3": {"w": mk(ch), "b": mk(ch)},
            "ff1": {"w": mk(ch, 4 * ch), "b": mk(4 * ch)},
            "ff2": {"w": mk(4 * ch, ch), "b": mk(ch)},
        }

    def mk_level(cin: int):
        return {
            "resnet": mk_resnet(cin),
            "tf": [mk_tf() for _ in range(cfg.dec_n_blocks)],
            "conv": {"w": mk(3, ch, ch), "b": mk(ch)},
        }

    return {
        "time_mlp": {
            "lin1": {"w": mk(cfg.dec_time_dim, tdim), "b": mk(tdim)},
            "lin2": {"w": mk(tdim, tdim), "b": mk(tdim)},
        },
        "down": mk_level(cfg.dec_in_channels),
        "mid": [
            {"resnet": mk_resnet(ch), "tf": [mk_tf() for _ in range(cfg.dec_n_blocks)]}
            for _ in range(cfg.dec_num_mid_blocks)
        ],
        "up": mk_level(2 * ch),
        "final": {"conv": {"w": mk(3, ch, ch), "b": mk(ch)}, "gn": {"w": mk(ch), "b": mk(ch)}},
        "proj": {"w": mk(1, ch, cfg.output_size), "b": mk(cfg.output_size)},
    }


def _time_embedding(p: Dict, cfg: FlowRefConfig, t: jnp.ndarray) -> jnp.ndarray:
    """t: [B] in [0,1] → [B, 4*ch] (sinusoid scale 1000, matcha convention)."""
    half = cfg.dec_time_dim // 2
    freq = jnp.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = 1000.0 * t.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    h = jax.nn.silu(linear(emb, p["lin1"]["w"], p["lin1"]["b"]))
    return linear(h, p["lin2"]["w"], p["lin2"]["b"])


def _gn_extra(a: Dict | None, b: Dict | None) -> Dict | None:
    """Merge two frozen-context GroupNorm sufficient-statistic dicts (prompt
    cache + request streaming stats); the statistics are additive."""
    if a is None:
        return b
    if b is None:
        return a
    return {"s1": a["s1"] + b["s1"], "s2": a["s2"] + b["s2"], "n": a["n"] + b["n"]}


def _resnet(p: Dict, x: jnp.ndarray, mask: jnp.ndarray, valid: jnp.ndarray,
            temb: jnp.ndarray, pc: Dict | None = None, cap: bool = False,
            rc: Dict | None = None, pos: jnp.ndarray | None = None):
    """``rc`` (request streaming context, same node layout as ``pc``): its
    conv halos REPLACE the prompt's (the frames immediately left of this
    slice are the previous slice's tail, not the prompt boundary) and its
    GroupNorm statistics ADD to the prompt's. ``pos`` ([B]) places the halo
    for right-packed streaming blocks (see _conv_h)."""
    halo = rc if rc is not None else pc
    xm = x * mask
    h = _conv_h(xm, p["block1"]["conv"], halo["h1"] if halo else None, cap,
                pos=pos)
    if cap:
        h, r_h1 = h
    h = _group_norm(h, p["block1"]["gn"]["w"], p["block1"]["gn"]["b"], valid=valid,
                    extra=_gn_extra(pc["g1"] if pc else None,
                                    rc["g1"] if rc else None), cap=cap)
    if cap:
        h, r_g1 = h
    h = _mish(h)
    h = h + linear(_mish(temb), p["mlp"]["w"], p["mlp"]["b"])[:, None]
    h = _conv_h(h * mask, p["block2"]["conv"], halo["h2"] if halo else None, cap,
                pos=pos)
    if cap:
        h, r_h2 = h
    h = _group_norm(h, p["block2"]["gn"]["w"], p["block2"]["gn"]["b"], valid=valid,
                    extra=_gn_extra(pc["g2"] if pc else None,
                                    rc["g2"] if rc else None), cap=cap)
    if cap:
        h, r_g2 = h
    h = _mish(h)
    out = h + conv1d(xm, p["res"]["w"], p["res"]["b"])
    if cap:
        return out, {"h1": r_h1, "g1": r_g1, "h2": r_h2, "g2": r_g2}
    return out


def _tf_block(p: Dict, cfg: FlowRefConfig, x: jnp.ndarray, valid: jnp.ndarray,
              pc: Dict | None = None, pvalid: jnp.ndarray | None = None,
              cap: bool = False, ring: Dict | None = None):
    """DiT-style block (no positional encoding — position flows in through
    the surrounding convs, so cross-attending generated queries to cached
    prompt K/V needs no positional bookkeeping).

    ``pc`` ({"k","v"}: [B, P, H, dh] frozen prompt keys/values, masked by
    ``pvalid`` [B, P]) prepends the prompt context to this call's own keys;
    ``ring`` ({"k","v": [B, W, H, dh], "mask": [B, W]}) additionally prepends
    a request's frozen generated-context ring (streaming full-overlap — see
    cfm_generate_streaming; no positional encoding means a ring whose entries
    moved positions attends identically). ``cap`` additionally returns this
    region's K/V for caching."""
    B, T, C = x.shape
    H, dh = cfg.dec_num_heads, cfg.dec_attention_head_dim
    h = layer_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    q = linear(h, p["to_q"]["w"]).reshape(B, T, H, dh)
    k = linear(h, p["to_k"]["w"]).reshape(B, T, H, dh)
    v = linear(h, p["to_v"]["w"]).reshape(B, T, H, dh)
    if pc is not None or ring is not None:
        ks, vs, masks = [], [], []
        if pc is not None:
            ks.append(pc["k"].astype(k.dtype))
            vs.append(pc["v"].astype(v.dtype))
            masks.append(pvalid)
        if ring is not None:
            ks.append(ring["k"].astype(k.dtype))
            vs.append(ring["v"].astype(v.dtype))
            masks.append(ring["mask"])
        k_all = jnp.concatenate(ks + [k], axis=1)
        v_all = jnp.concatenate(vs + [v], axis=1)
        kv_valid = jnp.concatenate(masks + [valid], axis=1)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k_all,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        scores = jnp.where(kv_valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v_all,
                         preferred_element_type=jnp.float32)
    elif _flash_active():
        o = flash_mha(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), valid,
            scale=float(1.0 / np.sqrt(dh)), interpret=_FLASH_INTERPRET,
        )
        out = o.transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum("bihd,bjhd->bhij", q, k, preferred_element_type=jnp.float32) / np.sqrt(dh)
        scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v, preferred_element_type=jnp.float32)
    x = x + linear(out.reshape(B, T, H * dh).astype(x.dtype), p["to_out"]["w"], p["to_out"]["b"])
    h = layer_norm(x, p["norm3"]["w"], p["norm3"]["b"])
    h = linear(jax.nn.gelu(linear(h, p["ff1"]["w"], p["ff1"]["b"])), p["ff2"]["w"], p["ff2"]["b"])
    out = x + h
    if cap:
        # frozen-context K/V stored in the weights' dtype (see _conv_h note)
        wdt = p["to_k"]["w"].dtype
        return out, {"k": k.astype(wdt), "v": v.astype(wdt)}
    return out


def estimator_forward(
    params: Dict,
    cfg: FlowRefConfig,
    x: jnp.ndarray,       # [B, T, M] current sample
    mu: jnp.ndarray,      # [B, T, M] encoder output
    spk: jnp.ndarray,     # [B, M'] projected speaker embedding (80-d)
    cond: jnp.ndarray,    # [B, T, M] prompt-mel conditioning track
    t: jnp.ndarray,       # [B] flow time
    valid: jnp.ndarray,   # [B, T] bool
    pc: Dict | None = None,
    cap: bool = False,
    rc: Dict | None = None,
    cap_mode: str | None = None,
):
    """One vector-field evaluation → [B, T, M].

    ``pc`` ({"pv": [B, P] prompt key mask, "est": one step's captured prompt
    tree}): the generated region attends/convolves/normalizes against the
    frozen prompt context instead of carrying the prompt frames in ``x``.

    ``rc`` ({"est": one step's request tree — conv halos, GN stats and
    per-tf-block K/V rings {"k","v": [B, W, H, dh]}, "rmask": [B, W] ring
    valid mask}): a streaming request's OWN frozen generated-frame context
    (cfm_generate_streaming). Its halos replace the prompt's, its GN stats
    add to the prompt's, and its rings sit between the prompt K/V and this
    call's own keys.

    ``cap``/``cap_mode`` return ``(out, captured_tree)``: cap=True (mode
    "full") captures everything (cfm_prompt_prefill); mode "light" captures
    only conv halos + GN stats (cheap per-Euler-step request capture); mode
    "kv" captures only the transformer K/V (the one-off clean-context
    capture at the end of a streaming slice)."""
    B, T, _ = x.shape
    mode = "full" if cap else cap_mode
    cap_cv = mode in ("full", "light")   # conv halos + GN statistics
    cap_kv = mode in ("full", "kv")      # transformer K/V
    cap_any = cap_cv or cap_kv
    mask = valid[:, :, None].astype(x.dtype)
    temb = _time_embedding(params["time_mlp"], cfg, t)
    spk_track = jnp.broadcast_to(spk[:, None, :], (B, T, spk.shape[-1]))
    h = jnp.concatenate([x, mu, spk_track.astype(x.dtype), cond], axis=-1)

    pest = pc["est"] if pc is not None else None
    pvalid = pc["pv"] if pc is not None else None
    rest = rc["est"] if rc is not None else None
    rmask = rc["rmask"] if rc is not None else None
    rpos = rc.get("pos") if rc is not None else None

    def level(h, p_level, n_level, r_level, with_conv: bool, skip_in=None):
        """One UNet level: resnet → tf blocks → (optional k3 conv)."""
        rn_in = h if skip_in is None else jnp.concatenate([h, skip_in], axis=-1)
        r = _resnet(p_level["resnet"], rn_in, mask, valid, temb,
                    pc=n_level["resnet"] if n_level else None, cap=cap_cv,
                    rc=r_level["resnet"] if r_level else None,
                    pos=rpos if r_level is not None else None)
        h, r_rn = r if cap_cv else (r, None)
        tf_recs = []
        for i, tf in enumerate(p_level["tf"]):
            ring = None
            if r_level is not None:
                ring = dict(r_level["tf"][i])
                ring["mask"] = rmask
            r = _tf_block(tf, cfg, h * mask, valid,
                          pc=n_level["tf"][i] if n_level else None,
                          pvalid=pvalid, cap=cap_kv, ring=ring)
            h, r_tf = r if cap_kv else (r, None)
            tf_recs.append(r_tf)
        rec = {"resnet": r_rn, "tf": tf_recs} if cap_any else None
        if with_conv:
            pre_conv = h
            halo = (r_level["conv"] if r_level is not None
                    else (n_level["conv"] if n_level else None))
            r = _conv_h(h * mask, p_level["conv"], halo, cap_cv,
                        pos=rpos if r_level is not None else None)
            h, r_c = r if cap_cv else (r, None)
            if cap_any:
                rec["conv"] = r_c
            return h, rec, pre_conv
        return h, rec, h

    d_out, rec_down, skip = level(h, params["down"],
                                  pest["down"] if pest else None,
                                  rest["down"] if rest else None, True)
    h = d_out
    mid_recs = []
    for j, m in enumerate(params["mid"]):
        h, rec_m, _ = level(h, m, pest["mid"][j] if pest else None,
                            rest["mid"][j] if rest else None, False)
        mid_recs.append(rec_m)
    h, rec_up, _ = level(h, params["up"], pest["up"] if pest else None,
                         rest["up"] if rest else None, True, skip_in=skip)

    f = params["final"]
    nf = pest["final"] if pest else None
    rf = rest["final"] if rest else None
    halo = rf["conv"] if rf is not None else (nf["conv"] if nf else None)
    r = _conv_h(h * mask, f["conv"], halo, cap_cv,
                pos=rpos if rf is not None else None)
    h, r_fc = r if cap_cv else (r, None)
    r = _group_norm(h, f["gn"]["w"], f["gn"]["b"], valid=valid,
                    extra=_gn_extra(nf["gn"] if nf else None,
                                    rf["gn"] if rf is not None else None),
                    cap=cap_cv)
    h, r_fg = r if cap_cv else (r, None)
    h = _mish(h)
    out = conv1d(h * mask, params["proj"]["w"], params["proj"]["b"]) * mask
    if cap_any:
        return out, {"down": rec_down, "mid": mid_recs, "up": rec_up,
                     "final": {"conv": r_fc, "gn": r_fg}}
    return out


def cfm_generate(
    params: Dict,
    cfg: FlowRefConfig,
    key: jax.Array,
    mu: jnp.ndarray,      # [B, T, M]
    spk: jnp.ndarray,     # [B, 80]
    cond: jnp.ndarray,    # [B, T, M]
    valid: jnp.ndarray,   # [B, T]
) -> jnp.ndarray:
    """Cosine-warped Euler CFM sampling with CFG (inference_cfg_rate).

    The initial noise is sliced from a fixed-length buffer keyed per request,
    mirroring the reference's fixed ``rand_noise`` buffer: the noise at frame
    t is the same whatever the chunk length, so "full"-overlap re-synthesis
    of accumulated tokens reproduces earlier frames (seam stability)."""
    B, T, M = mu.shape
    if T <= _NOISE_FRAMES:
        x = jax.random.normal(key, (B, _NOISE_FRAMES, M), jnp.float32)[:, :T]
    else:
        x = jax.random.normal(key, (B, T, M), jnp.float32)
    steps = np.arange(cfg.n_timesteps + 1, dtype=np.float64) / cfg.n_timesteps
    t_span = (1.0 - np.cos(steps * 0.5 * np.pi)).astype(np.float32)
    w = cfg.inference_cfg_rate

    # CFG lanes batched together: [cond | uncond]
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    valid2 = jnp.concatenate([valid, valid], axis=0)

    def step(x, t_dt):
        t_i, dt = t_dt
        t = jnp.full((2 * B,), t_i)
        x2 = jnp.concatenate([x, x], axis=0).astype(mu.dtype)
        v = estimator_forward(params, cfg, x2, mu2, spk2, cond2, t, valid2)
        v = v.astype(jnp.float32)
        vc, vu = v[:B], v[B:]
        v = (1.0 + w) * vc - w * vu
        return x + dt * v, None

    xs = (jnp.asarray(t_span[:-1]), jnp.asarray(t_span[1:] - t_span[:-1]))
    x, _ = jax.lax.scan(step, x, xs)
    return x.astype(mu.dtype)


def _t_span(cfg: FlowRefConfig) -> np.ndarray:
    steps = np.arange(cfg.n_timesteps + 1, dtype=np.float64) / cfg.n_timesteps
    return (1.0 - np.cos(steps * 0.5 * np.pi)).astype(np.float32)


def cfm_prompt_prefill(
    params: Dict,
    cfg: FlowRefConfig,
    key: jax.Array,       # FIXED key (voice-stable, not per-request)
    mu_p: jnp.ndarray,    # [B, P, M] encoder output for the prompt region
    spk: jnp.ndarray,     # [B, 80]
    cond_p: jnp.ndarray,  # [B, P, M] packed prompt-mel conditioning
    valid_p: jnp.ndarray, # [B, P]
) -> Dict:
    """Solve the CFM over the voice-prompt region ONCE, capturing the frozen
    prompt context every Euler step → a per-voice cache for
    cfm_generate_cached.

    The reference re-processes the ~500-frame voice-prompt window through
    the estimator for every streamed slice (its s3gen.inference always sees
    [prompt | accumulated tokens] — /root/reference/src/tts_streaming.py:
    655-659, 681-688); at 10 Euler steps × 2 CFG lanes that lane-independent
    work is the measured single-chip serving ceiling (BENCH_NOTES r3). This
    prefill runs that work once per voice and caches, per Euler step:

    * per transformer block: the prompt K/V (the DiT blocks carry no
      positional encoding, so cross-attention needs no index bookkeeping);
    * per k3 conv: the prompt's boundary frame (left context for the
      generated region's first frame);
    * per GroupNorm: the prompt region's sufficient statistics.

    DELIBERATE DEVIATION (quality-measured by scripts/quality_study.py,
    ``CHATTERBOX_CFM_PROMPT_CACHE``): prompt frames no longer see generated
    frames — attention becomes one-way (the causal structure every streaming
    CFM variant adopts), the prompt's right conv edge sees zeros, and the
    prompt's GroupNorm contributions are frozen at prefill values. With an
    empty prompt the cached path is EXACT (tests/test_cfm_prompt_cache.py).

    Returns {"est": per-step capture tree (leaves [S, 2B, ...]),
    "pv": [2B, P] prompt key mask}. Both CFG lanes are captured — the uncond
    lane (zeroed mu/spk/cond) shares the x trajectory, as in cfm_generate."""
    B, P, M = mu_p.shape
    if P <= _NOISE_FRAMES:
        x = jax.random.normal(key, (B, _NOISE_FRAMES, M), jnp.float32)[:, :P]
    else:
        x = jax.random.normal(key, (B, P, M), jnp.float32)
    t_span = _t_span(cfg)
    w = cfg.inference_cfg_rate

    mu2 = jnp.concatenate([mu_p, jnp.zeros_like(mu_p)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.concatenate([cond_p, jnp.zeros_like(cond_p)], axis=0)
    valid2 = jnp.concatenate([valid_p, valid_p], axis=0)

    def step(x, t_dt):
        t_i, dt = t_dt
        t = jnp.full((2 * B,), t_i)
        x2 = jnp.concatenate([x, x], axis=0).astype(mu_p.dtype)
        v, rec = estimator_forward(params, cfg, x2, mu2, spk2, cond2, t, valid2,
                                   cap=True)
        v = v.astype(jnp.float32)
        vc, vu = v[:B], v[B:]
        v = (1.0 + w) * vc - w * vu
        return x + dt * v, rec

    xs = (jnp.asarray(t_span[:-1]), jnp.asarray(t_span[1:] - t_span[:-1]))
    _, recs = jax.lax.scan(step, x, xs)
    return {"est": recs, "pv": valid2}


def cfm_generate_cached(
    params: Dict,
    cfg: FlowRefConfig,
    key: jax.Array,       # request/chunk noise key (generated region only)
    mu_g: jnp.ndarray,    # [B, Tg, M] encoder output, GENERATED frames only
    spk: jnp.ndarray,     # [B, 80]
    valid_g: jnp.ndarray, # [B, Tg]
    cache: Dict,          # from cfm_prompt_prefill
) -> jnp.ndarray:
    """Euler CFM over the generated frames only, conditioned on the frozen
    prompt cache. The generated region's initial noise is sliced from the
    SAME buffer positions ([P, P+Tg)) the uncached path uses, so cached and
    uncached solves share noise exactly and the output difference is the
    one-way-prompt deviation alone. The cache's step axis S is either
    n_timesteps (per-step context) or 1 ("static": one context reused every
    step — 10× smaller, a further measured deviation)."""
    B, Tg, M = mu_g.shape
    P = cache["pv"].shape[-1]
    if P + Tg <= _NOISE_FRAMES:
        x = jax.random.normal(key, (B, _NOISE_FRAMES, M), jnp.float32)[:, P:P + Tg]
    else:
        x = jax.random.normal(key, (B, P + Tg, M), jnp.float32)[:, P:]
    t_span = _t_span(cfg)
    w = cfg.inference_cfg_rate

    mu2 = jnp.concatenate([mu_g, jnp.zeros_like(mu_g)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.zeros((2 * B, Tg, M), mu_g.dtype)
    valid2 = jnp.concatenate([valid_g, valid_g], axis=0)
    pv = cache["pv"]
    est_tree = cache["est"]
    if pv.shape[0] != 2 * B:
        # per-voice caches are captured at batch 1 ([cond, uncond] lanes);
        # lane-repeat broadcasts them to this call's batch: [c,u] → [c×B, u×B]
        assert pv.shape[0] == 2, "prompt cache lane layout must be [cond, uncond]"
        pv = jnp.repeat(pv, B, axis=0)
        est_tree = jax.tree.map(lambda a: jnp.repeat(a, B, axis=1), est_tree)

    S = jax.tree.leaves(est_tree)[0].shape[0]
    per_step = S == cfg.n_timesteps
    static_est = None if per_step else jax.tree.map(lambda a: a[0], est_tree)

    def step(x, scan_in):
        if per_step:
            t_i, dt, est = scan_in
        else:
            t_i, dt = scan_in
            est = static_est
        t = jnp.full((2 * B,), t_i)
        x2 = jnp.concatenate([x, x], axis=0).astype(mu_g.dtype)
        v = estimator_forward(params, cfg, x2, mu2, spk2, cond2, t, valid2,
                              pc={"pv": pv, "est": est})
        v = v.astype(jnp.float32)
        vc, vu = v[:B], v[B:]
        v = (1.0 + w) * vc - w * vu
        return x + dt * v, None

    ts = jnp.asarray(t_span[:-1])
    dts = jnp.asarray(t_span[1:] - t_span[:-1])
    xs = (ts, dts, est_tree) if per_step else (ts, dts)
    x, _ = jax.lax.scan(step, x, xs)
    return x.astype(mu_g.dtype)


# --------------------------------------------------------------------------
# Streaming full-overlap: per-REQUEST frozen generated-frame context
# --------------------------------------------------------------------------
# The reference's "full" overlap strategy re-synthesizes the ACCUMULATED
# token stream every slice (/root/reference/src/tts_streaming.py:655-659) —
# with the per-voice prompt cache in place, that re-solve of already-emitted
# frames is the remaining per-slice cost that grows with utterance length
# (BENCH_NOTES Run G). The streaming state below freezes each slice's frames
# as context for the next, so slice k solves ONLY its new frames against
# [voice prompt | previous generated frames] — a causal chunked CFM:
#
# * per transformer block: a K/V RING of the last ≤W generated frames,
#   captured from ONE estimator eval at t=1 with x = the slice's SOLVED mel
#   ("clean context": more informative than any intermediate-step x, and one
#   extra eval ≈ 1/n_timesteps overhead). The DiT blocks carry no positional
#   encoding, so ring eviction (old frames changing position) is exact.
# * per k3 conv: the previous slice's boundary frames, PER Euler step (the
#   left-context x differs per step) — replaces the prompt-boundary halo
#   after the first slice.
# * per GroupNorm: running sufficient statistics of ALL previous generated
#   frames, per Euler step, ADDED to the frozen prompt statistics.
#
# DELIBERATE DEVIATION (same one-way family as cfm_prompt_prefill, extended
# to slice boundaries; quality-measured by scripts/quality_study.py): frames
# no longer see later frames, and their frozen K/V come from the final-step
# clean-context eval rather than the joint per-step trajectory.


def _walk_hg(est: Dict, f_halo, f_gn) -> Dict:
    """Map over an est-shaped tree's conv-halo and GroupNorm-stat nodes,
    dropping the transformer K/V entries (→ None)."""
    def resnet(r):
        return {"h1": f_halo(r["h1"]), "g1": f_gn(r["g1"]),
                "h2": f_halo(r["h2"]), "g2": f_gn(r["g2"])}

    def level(n, with_conv):
        out = {"resnet": resnet(n["resnet"]), "tf": [None] * len(n["tf"])}
        if with_conv:
            out["conv"] = f_halo(n["conv"])
        return out

    return {
        "down": level(est["down"], True),
        "mid": [level(m, False) for m in est["mid"]],
        "up": level(est["up"], True),
        "final": {"conv": f_halo(est["final"]["conv"]),
                  "gn": f_gn(est["final"]["gn"])},
    }


def _walk_ring(est: Dict, f_tf) -> Dict:
    """Map over an est-shaped tree's transformer nodes only (others → None)."""
    def level(n, with_conv):
        out = {"resnet": None, "tf": [f_tf(kv) for kv in n["tf"]]}
        if with_conv:
            out["conv"] = None
        return out

    return {
        "down": level(est["down"], True),
        "mid": [level(m, False) for m in est["mid"]],
        "up": level(est["up"], True),
        "final": {"conv": None, "gn": None},
    }


def _merge_ctx(hg: Dict, ring: Dict) -> Dict:
    """hg (halos+stats, one step's slice) ∪ ring (K/V) → one rc est tree."""
    def level(h, r, with_conv):
        out = {"resnet": h["resnet"], "tf": r["tf"]}
        if with_conv:
            out["conv"] = h["conv"]
        return out

    return {
        "down": level(hg["down"], ring["down"], True),
        "mid": [level(h, r, False) for h, r in zip(hg["mid"], ring["mid"])],
        "up": level(hg["up"], ring["up"], True),
        "final": hg["final"],
    }


def _add_gn(old: Dict, new: Dict, keep: jnp.ndarray) -> Dict:
    """hg-tree update after a slice: halos ← the slice's captures (per-lane:
    ``keep`` [B2] lanes that produced no frames retain their old halo);
    GroupNorm stats ← running totals (old + the slice's own — a frame-less
    lane's capture is all-zero, so no select is needed there)."""
    km = keep[None, :, None, None]  # halo leaves are [S, B2, 1, C]

    def halo(o, n):
        return jnp.where(km, n, o)

    def resnet(o, n):
        return {"h1": halo(o["h1"], n["h1"]), "g1": _gn_extra(o["g1"], n["g1"]),
                "h2": halo(o["h2"], n["h2"]), "g2": _gn_extra(o["g2"], n["g2"])}

    def level(o, n, with_conv):
        out = {"resnet": resnet(o["resnet"], n["resnet"]),
               "tf": [None] * len(o["tf"])}
        if with_conv:
            out["conv"] = halo(o["conv"], n["conv"])
        return out

    return {
        "down": level(old["down"], new["down"], True),
        "mid": [level(o, n, False) for o, n in zip(old["mid"], new["mid"])],
        "up": level(old["up"], new["up"], True),
        "final": {"conv": halo(old["final"]["conv"], new["final"]["conv"]),
                  "gn": _gn_extra(old["final"]["gn"], new["final"]["gn"])},
    }


def init_stream_state(cfg: FlowRefConfig, vcache: Dict, window: int,
                      batch: int = 1) -> Dict:
    """Fresh per-request streaming context for cfm_generate_streaming.

    Halos start as the VOICE prompt cache's (slice 1's left context is the
    prompt boundary, exactly as in cfm_generate_cached); GroupNorm running
    stats start at zero (the prompt's stay separately in the voice cache);
    the K/V ring starts empty. ``vcache`` leaves may be captured at batch 1
    ([cond, uncond] lanes) — they are lane-repeated to ``batch``.
    ``klen``/``frames`` are per-REQUEST counters ([batch]); the CFG lanes
    of one request always advance in lockstep."""
    est = vcache["est"]
    B2 = 2 * batch
    if jax.tree.leaves(est)[0].shape[1] != B2:
        est = jax.tree.map(lambda a: jnp.repeat(a, batch, axis=1), est)
    H, dh = cfg.dec_num_heads, cfg.dec_attention_head_dim
    wdt = jax.tree.leaves(est)[0].dtype

    def zero_gn(g):
        return {"s1": jnp.zeros_like(g["s1"]), "s2": jnp.zeros_like(g["s2"]),
                "n": jnp.zeros_like(g["n"])}

    return {
        "hg": _walk_hg(est, lambda h: h, zero_gn),
        "ring": _walk_ring(
            est, lambda kv: {
                "k": jnp.zeros((B2, window, H, dh), wdt),
                "v": jnp.zeros((B2, window, H, dh), wdt),
            }),
        "klen": jnp.zeros((batch,), jnp.int32),
        "frames": jnp.zeros((batch,), jnp.int32),
    }


def _ring_append(ring: Dict, caps: Dict, klen: jnp.ndarray, tg: jnp.ndarray,
                 window: int, Tg: int):
    """Append a slice's captured K/V (right-packed: each lane's valid
    entries are its LAST ``tg`` of ``Tg``) after the ring's ``klen`` valid
    frames, evicting the oldest frames when the window would overflow.
    ``klen``/``tg`` are per-LANE ([B2]). Position is semantic-free (no
    positional encoding), only the valid mask matters. Pure gathers — no
    scatters — so XLA keeps it a few fused HBM passes."""
    shift = jnp.maximum(0, klen + tg - window)               # [B2]
    base = klen - shift                                      # [B2]
    wpos = jnp.arange(window)[None, :]                       # [1, W]
    roll_idx = (wpos + shift[:, None]) % window              # [B2, W]
    src = jnp.clip(wpos - base[:, None] + (Tg - tg[:, None]), 0, Tg - 1)
    is_new = (wpos >= base[:, None]) & (wpos < (base + tg)[:, None])
    m = is_new[:, :, None, None]

    def one(r, c):
        def g(a, idx):
            return jnp.take_along_axis(a, idx[:, :, None, None], axis=1)

        return {
            "k": jnp.where(m, g(c["k"], src), g(r["k"], roll_idx)),
            "v": jnp.where(m, g(c["v"], src), g(r["v"], roll_idx)),
        }

    def level(r, c, with_conv):
        out = {"resnet": None, "tf": [one(a, b) for a, b in zip(r["tf"], c["tf"])]}
        if with_conv:
            out["conv"] = None
        return out

    new = {
        "down": level(ring["down"], caps["down"], True),
        "mid": [level(r, c, False) for r, c in zip(ring["mid"], caps["mid"])],
        "up": level(ring["up"], caps["up"], True),
        "final": {"conv": None, "gn": None},
    }
    return new, base + tg


def cfm_generate_streaming(
    params: Dict,
    cfg: FlowRefConfig,
    key: jax.Array,       # request/chunk noise key (same buffer as cached path)
    mu_g: jnp.ndarray,    # [B, Tg, M] encoder output, NEW frames RIGHT-packed
    spk: jnp.ndarray,     # [B, 80]
    tg: jnp.ndarray,      # [B] valid new frames (each row's last tg are valid)
    vcache: Dict,         # per-voice cache from cfm_prompt_prefill (per-step)
    rstate: Dict,         # from init_stream_state / a previous slice
) -> tuple[jnp.ndarray, Dict]:
    """Solve ONLY this slice's new frames against [frozen voice prompt |
    frozen previous generated frames], then capture this slice's context →
    (mel block [B, Tg, M] right-packed, next rstate).

    Each row's new frames' initial noise comes from buffer positions
    [P + frames, P + frames + tg) — the SAME positions the uncached and
    prompt-cached paths use for those frames, so a chunk's FIRST slice is
    the prompt-cached solve exactly (tests/test_cfm_streaming.py). Rows
    with tg == 0 (padding lanes of a batched slice) pass their state
    through unchanged."""
    B, Tg, M = mu_g.shape
    pv = vcache["pv"]
    est_tree = vcache["est"]
    P = pv.shape[-1]
    if pv.shape[0] != 2 * B:
        assert pv.shape[0] == 2, "voice cache lane layout must be [cond, uncond]"
        pv = jnp.repeat(pv, B, axis=0)
        est_tree = jax.tree.map(lambda a: jnp.repeat(a, B, axis=1), est_tree)

    # right-packed per-row valid mask + noise gathered per row from the
    # row's absolute frame positions
    j = jnp.arange(Tg)[None, :]
    valid_g = j >= (Tg - tg[:, None])                        # [B, Tg]
    noise = jax.random.normal(key, (B, _NOISE_FRAMES, M), jnp.float32)
    abs_pos = P + rstate["frames"][:, None] + (j - (Tg - tg[:, None]))
    idx = jnp.clip(abs_pos, 0, _NOISE_FRAMES - 1).astype(jnp.int32)
    x = jnp.take_along_axis(noise, idx[:, :, None], axis=1)  # [B, Tg, M]

    t_span = _t_span(cfg)
    w = cfg.inference_cfg_rate
    S = cfg.n_timesteps

    mu2 = jnp.concatenate([mu_g, jnp.zeros_like(mu_g)], axis=0)
    spk2 = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
    cond2 = jnp.zeros((2 * B, Tg, M), mu_g.dtype)
    valid2 = jnp.concatenate([valid_g, valid_g], axis=0)
    tg2 = jnp.concatenate([tg, tg], axis=0)                  # [2B] per-lane
    pos2 = (Tg - tg2).astype(jnp.int32)                      # first valid row
    W = jax.tree.leaves(rstate["ring"])[0].shape[1]
    klen2 = jnp.concatenate([rstate["klen"], rstate["klen"]], axis=0)
    rmask = jnp.arange(W)[None, :] < klen2[:, None]          # [2B, W]
    ring = rstate["ring"]

    def step(x, scan_in):
        t_i, dt, est, hg_s = scan_in
        t = jnp.full((2 * B,), t_i)
        x2 = jnp.concatenate([x, x], axis=0).astype(mu_g.dtype)
        v, caps = estimator_forward(
            params, cfg, x2, mu2, spk2, cond2, t, valid2,
            pc={"pv": pv, "est": est},
            rc={"est": _merge_ctx(hg_s, ring), "rmask": rmask, "pos": pos2},
            cap_mode="light",
        )
        v = v.astype(jnp.float32)
        vc, vu = v[:B], v[B:]
        v = (1.0 + w) * vc - w * vu
        return x + dt * v, caps

    ts = jnp.asarray(t_span[:-1])
    dts = jnp.asarray(t_span[1:] - t_span[:-1])
    x, hg_caps = jax.lax.scan(step, x, (ts, dts, est_tree, rstate["hg"]))
    mel = x.astype(mu_g.dtype)

    # clean-context capture: one eval at t=1 with x = the SOLVED mel — the
    # next slices attend to keys computed from (near-)clean context
    last_est = jax.tree.map(lambda a: a[S - 1], est_tree)
    last_hg = jax.tree.map(lambda a: a[S - 1], rstate["hg"])
    mel2 = jnp.concatenate([mel, mel], axis=0)
    _, kv_caps = estimator_forward(
        params, cfg, mel2, mu2, spk2, cond2, jnp.full((2 * B,), 1.0), valid2,
        pc={"pv": pv, "est": last_est},
        rc={"est": _merge_ctx(last_hg, ring), "rmask": rmask, "pos": pos2},
        cap_mode="kv",
    )

    new_ring, new_klen2 = _ring_append(ring, kv_caps, klen2, tg2, W, Tg)
    new_state = {
        "hg": _add_gn(rstate["hg"], hg_caps, tg2 > 0),
        "ring": new_ring,
        "klen": new_klen2[:B],
        "frames": rstate["frames"] + tg,
    }
    return mel, new_state
