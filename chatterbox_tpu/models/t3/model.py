"""T3: llama-style autoregressive text→speech-token decoder, TPU-native.

Design notes (vs the reference's torch implementation, SURVEY.md §2b):

* The backbone is a stack-scanned llama decoder: per-layer weights are stored
  stacked along a leading layer axis and iterated with ``lax.scan`` so XLA
  compiles ONE layer body instead of 30 — fast compiles, identical runtime.
* Decode uses a static-shape KV cache [L, B, S_max, H, Dh]. A decode *slice*
  of N steps runs as one jitted ``lax.scan`` with on-device sampling
  (temperature / top-p / repetition penalty / CFG) so the host sees one
  dispatch per ~N tokens instead of one per token — the property that makes
  sub-300 ms time-to-first-audio possible on TPU (per-step host round trips
  are the #1 TTFA killer, SURVEY.md §7 hard part (a)).
* Classifier-free guidance always runs 2 lanes per request (cond / uncond);
  logits combine as ``cond + w·(cond − uncond)`` with per-request weight w.
  w=0 degenerates exactly to the cond lane, so one compiled graph serves all
  guidance settings (the reference instead changes batch shape per request,
  /root/reference/src/tts_streaming.py:475-476).
* Rows are LEFT-padded inside a static text bucket: [pad | cond | text],
  keeping valid tokens contiguous so rotary positions need no per-row gaps.

Sequence layout per row:  [pad | cond(C) | text(≤T) ]  → prefill cache
then speech tokens (BOS first) are decoded one-by-one into the cache.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.nn import (
    NEG_INF,
    apply_rope,
    causal_attention,
    layer_norm,
    linear,
    rms_norm,
    rope_frequencies,
    swiglu,
)
from ...ops.sampling import (  # noqa: F401 (re-exported ops)
    apply_repetition_penalty,
    sample_token,
    top_p_filter,
)
from .config import T3Config

Params = Dict


# ------------------------------------------------------------------ init
def init_t3_params(key: jax.Array, cfg: T3Config, dtype=jnp.float32) -> Params:
    from ...ops.initializers import dense_init, rng_stream

    D, L = cfg.hidden_size, cfg.num_layers
    Hq, Hk, Dh, F = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.intermediate_size
    ks = rng_stream(key)

    def dense(shape, scale=None):
        return dense_init(next(ks), shape, dtype, scale)

    params: Params = {
        "text_emb": dense((cfg.text_vocab_size, D), 0.02),
        "speech_emb": dense((cfg.speech_vocab_size, D), 0.02),
        "text_pos": dense((cfg.max_text_tokens + 2, D), 0.02),
        "speech_pos": dense((cfg.max_speech_tokens + 2, D), 0.02),
        "speech_head": {"w": dense((D, cfg.speech_vocab_size)), "b": jnp.zeros((cfg.speech_vocab_size,), dtype)},
        "text_head": {"w": dense((D, cfg.text_vocab_size)), "b": jnp.zeros((cfg.text_vocab_size,), dtype)},
        "cond": {
            "spkr": {"w": dense((cfg.speaker_embed_dim, D)), "b": jnp.zeros((D,), dtype)},
            "emotion": {"w": dense((1, D)), "b": jnp.zeros((D,), dtype)},
        },
        "backbone": {
            "layers": {
                "attn_norm": jnp.ones((L, D), dtype),
                "mlp_norm": jnp.ones((L, D), dtype),
                "wq": dense((L, D, Hq * Dh)),
                "wk": dense((L, D, Hk * Dh)),
                "wv": dense((L, D, Hk * Dh)),
                "wo": dense((L, Hq * Dh, D)),
                "w_gate": dense((L, D, F)),
                "w_up": dense((L, D, F)),
                "w_down": dense((L, F, D)),
            },
            "final_norm": jnp.ones((D,), dtype),
        },
    }
    if cfg.use_perceiver_resampler:
        # Checkpoint-compatible with the public Chatterbox ``Perceiver``
        # (resemble-ai/chatterbox t3/modules/perceiver.py; the reference
        # consumes it via its fork — /root/reference/requirements.txt:9):
        # a learned query bank (checkpoint key
        # ``cond_enc.perceiver.pre_attention_query`` [1, N, D]) and ONE
        # shared attention block (``cond_enc.perceiver.attn.*``: LayerNorm +
        # to_q/to_k/to_v/proj_out linears with bias) applied twice — cross
        # (query→prompt) then self (output→output). Mirroring that exact
        # parameter structure is what lets ``t3_cfg.safetensors`` load
        # (VERDICT r3 missing-1).
        N = cfg.perceiver_latents
        params["cond"]["perceiver"] = {
            "query": dense((N, D), math.sqrt(3.0 / N)),
            "attn": {
                "norm_w": jnp.ones((D,), dtype),
                "norm_b": jnp.zeros((D,), dtype),
                "wq": {"w": dense((D, D)), "b": jnp.zeros((D,), dtype)},
                "wk": {"w": dense((D, D)), "b": jnp.zeros((D,), dtype)},
                "wv": {"w": dense((D, D)), "b": jnp.zeros((D,), dtype)},
                "wo": {"w": dense((D, D)), "b": jnp.zeros((D,), dtype)},
            },
        }
    return params


# ---------------------------------------------------------------- conditioning
def _perceiver_attn_block(
    p: Params, heads: int, x_q, x_kv, kv_valid: Optional[jnp.ndarray] = None
):
    """The Chatterbox perceiver's residual attention block (public
    resemble-ai/chatterbox ``AttentionBlock2``): ONE shared LayerNorm applied
    to both the query-side and key-side inputs, q/k/v/out linears with bias,
    softmax(QKᵀ/√Dh)V, residual from the un-normed query input.
    kv_valid: [B, Sk] bool — masks padded key positions (our addition for
    short reference clips; with a full-length prompt it is the identity, so
    checkpoint-parity outputs are unchanged)."""
    B, Sq, D = x_q.shape
    Dh = D // heads
    xqn = layer_norm(x_q, p["norm_w"], p["norm_b"])
    xkn = layer_norm(x_kv, p["norm_w"], p["norm_b"])
    q = linear(xqn, p["wq"]["w"], p["wq"]["b"]).reshape(B, Sq, heads, Dh)
    k = linear(xkn, p["wk"]["w"], p["wk"]["b"]).reshape(B, -1, heads, Dh)
    v = linear(xkn, p["wv"]["w"], p["wv"]["b"]).reshape(B, -1, heads, Dh)
    if kv_valid is None:
        mask = jnp.ones((B, 1, Sq, k.shape[1]), dtype=bool)
    else:
        mask = jnp.broadcast_to(kv_valid[:, None, None, :], (B, 1, Sq, k.shape[1]))
    o = causal_attention(q, k, v, mask=mask)
    return x_q + linear(o.reshape(B, Sq, D), p["wo"]["w"], p["wo"]["b"])


def perceiver_resample(
    p: Params,
    cfg: T3Config,
    prompt_emb: jnp.ndarray,
    prompt_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compress [B, P, D] prompt embeddings to [B, N, D] latents.

    Structure matches the public Chatterbox ``Perceiver`` exactly (the module
    the reference conditions T3 with — /root/reference/src/
    tts_streaming.py:369-381 via requirements.txt:9): a learned query bank
    and a SINGLE attention block applied twice with shared weights — first
    cross (queries attend to the prompt), then self (output attends to
    itself). prompt_valid: [B, P] bool — padded prompt positions are not
    attended (our addition; identity for full-length prompts)."""
    B = prompt_emb.shape[0]
    q = jnp.broadcast_to(p["query"][None], (B,) + p["query"].shape).astype(prompt_emb.dtype)
    pre = _perceiver_attn_block(
        p["attn"], cfg.perceiver_heads, q, prompt_emb, kv_valid=prompt_valid
    )
    return _perceiver_attn_block(p["attn"], cfg.perceiver_heads, pre, pre)


def cond_embeddings(
    params: Params,
    cfg: T3Config,
    speaker_emb: jnp.ndarray,     # [B, speaker_embed_dim]
    prompt_tokens: jnp.ndarray,   # [B, speech_cond_prompt_len] int32
    emotion_adv: jnp.ndarray,     # [B] exaggeration scalar
    prompt_len: Optional[jnp.ndarray] = None,  # [B] valid prompt token counts
) -> jnp.ndarray:
    """Build the conditioning prefix [B, C, D]:
    [speaker] + prompt speech tokens (perceiver-resampled) + [emotion].
    Padded prompt positions (short reference clips) are masked out of the
    resampler / zeroed so they cannot contaminate the voice conditioning."""
    c = params["cond"]
    spk = linear(speaker_emb, c["spkr"]["w"], c["spkr"]["b"])[:, None, :]
    prompt = params["speech_emb"][prompt_tokens]
    P = prompt_tokens.shape[1]
    valid = None
    if prompt_len is not None:
        valid = jnp.arange(P)[None, :] < prompt_len[:, None]
    if cfg.use_perceiver_resampler:
        prompt = perceiver_resample(c["perceiver"], cfg, prompt, valid)
    elif valid is not None:
        prompt = jnp.where(valid[:, :, None], prompt, 0.0)
    emo = linear(emotion_adv[:, None], c["emotion"]["w"], c["emotion"]["b"])[:, None, :]
    return jnp.concatenate([spk, prompt, emo], axis=1)


# ---------------------------------------------------------------- backbone
def _split_heads(x, heads, Dh):
    B, S, _ = x.shape
    return x.reshape(B, S, heads, Dh)


def _maybe_repeat_kv(k, cfg: T3Config):
    if cfg.num_kv_heads == cfg.num_heads:
        return k
    return jnp.repeat(k, cfg.num_heads // cfg.num_kv_heads, axis=2)


def _backbone_prefill(
    params: Params,
    cfg: T3Config,
    h: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    collect_kv: bool = True,
    remat: bool = False,
):
    """Run all layers over a full [B, S, D] sequence.

    valid: [B, S] bool, False on pad rows. Returns (hidden, k_all, v_all) with
    k_all/v_all stacked [L, B, S, Hk, Dh].

    collect_kv=False skips stacking the per-layer K/V (training doesn't decode
    from this pass; the stack is [L,B,S,Hk,Dh] ×2 — ~2 GB at B=8/S=1024/bf16).
    remat=True wraps each layer in jax.checkpoint so the backward pass
    rematerializes activations instead of keeping all L layers' intermediates
    live — the standard TPU HBM/FLOPs trade for training scans (forward-only
    jit is unaffected). prevent_cse=False is the documented-safe setting under
    lax.scan and avoids the CSE-blocking slowdown.
    """
    B, S, D = h.shape
    Dh = cfg.head_dim
    cos, sin = rope_frequencies(Dh, cfg.max_seq_len, cfg.rope_theta)
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    causal = jnp.tril(jnp.ones((S, S), dtype=bool))
    mask = causal[None, None] & valid[:, None, None, :]  # [B,1,S,S]

    def layer(h, lp):
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q = apply_rope(_split_heads(linear(x, lp["wq"]), cfg.num_heads, Dh), cos, sin, positions)
        k = apply_rope(_split_heads(linear(x, lp["wk"]), cfg.num_kv_heads, Dh), cos, sin, positions)
        v = _split_heads(linear(x, lp["wv"]), cfg.num_kv_heads, Dh)
        o = causal_attention(q, _maybe_repeat_kv(k, cfg), _maybe_repeat_kv(v, cfg), mask)
        h = h + linear(o.reshape(B, S, -1), lp["wo"])
        x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + swiglu(x, lp["w_gate"], lp["w_up"], lp["w_down"])
        return h, ((k, v) if collect_kv else None)

    if remat:
        layer = jax.checkpoint(layer, prevent_cse=False)
    h, kv = jax.lax.scan(layer, h, params["backbone"]["layers"])
    h = rms_norm(h, params["backbone"]["final_norm"], cfg.rms_eps)
    if collect_kv:
        return h, kv[0], kv[1]
    return h, None, None


def _backbone_decode_step(
    params: Params,
    cfg: T3Config,
    h: jnp.ndarray,          # [B, 1, D]
    k_cache: jnp.ndarray,    # [L, B, S, Hk, Dh] (int8 when quantized)
    v_cache: jnp.ndarray,
    start: jnp.ndarray,      # [B] first valid cache index (left-pad offset)
    pos: jnp.ndarray,        # [B] current write position
    k_scale: Optional[jnp.ndarray] = None,  # [L, B, S, Hk] int8-cache scales
    v_scale: Optional[jnp.ndarray] = None,
    s_view: Optional[int] = None,
):
    """One decode step for all layers. Returns (hidden, k_new, v_new) where
    k_new/v_new are [L, B, 1, Hk, Dh] to be written into the cache at pos.

    ``s_view`` limits attention to the first s_view cache entries. The slice
    happens PER LAYER inside the scan body: slicing the whole stacked cache up
    front materializes an [L, B, s_view, H, Dh] temporary (gigabytes at
    batch 32) and OOMs HBM; the per-layer slice is a ~100 MB transient.
    """
    B = h.shape[0]
    Dh = cfg.head_dim
    quantized = k_scale is not None
    paired = cfg.kv_cache_layout == "paired"
    # cache seq axis: [L,B,S,Hk,Dh] seq-major / [L,B,Hp,S,2*Dh] paired (both
    # dtypes; paired-int8 adds [L,B,Hp,2,S] scale planes). Guard the layout
    # claim against the actual storage (ADVICE r2: a config/storage mismatch
    # must fail loudly, not silently misread the cache depth).
    if paired:
        assert k_cache.shape[4] == 2 * Dh, (
            "paired cache/config mismatch", k_cache.shape, Dh)
    S_alloc = k_cache.shape[3] if paired else k_cache.shape[2]
    S = s_view if s_view is not None else S_alloc
    cos, sin = rope_frequencies(Dh, cfg.max_seq_len, cfg.rope_theta)
    positions = pos[:, None]  # [B, 1]
    idx = jnp.arange(S)[None, None, None, :]
    cache_valid = (idx >= start[:, None, None, None]) & (idx < pos[:, None, None, None])
    scale = 1.0 / math.sqrt(Dh)

    def layer(h, xs):
        kc_s = vc_s = None
        if quantized:
            lp, kc, vc, kc_s, vc_s = xs
            if s_view is not None and not paired:
                kc = jax.lax.slice_in_dim(kc, 0, s_view, axis=1)
                vc = jax.lax.slice_in_dim(vc, 0, s_view, axis=1)
                kc_s = jax.lax.slice_in_dim(kc_s, 0, s_view, axis=1)
                vc_s = jax.lax.slice_in_dim(vc_s, 0, s_view, axis=1)
        else:
            lp, kc, vc = xs
            if s_view is not None and not paired:
                # XLA path: the slice materializes a copy each step — only
                # acceptable off-TPU; the paired-kernel path bounds the read
                # via its grid instead (no copy).
                kc = jax.lax.slice_in_dim(kc, 0, s_view, axis=1)
                vc = jax.lax.slice_in_dim(vc, 0, s_view, axis=1)
        x = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q = apply_rope(_split_heads(linear(x, lp["wq"]), cfg.num_heads, Dh), cos, sin, positions)
        k = apply_rope(_split_heads(linear(x, lp["wk"]), cfg.num_kv_heads, Dh), cos, sin, positions)
        v = _split_heads(linear(x, lp["wv"]), cfg.num_kv_heads, Dh)
        G = cfg.num_heads // cfg.num_kv_heads
        if paired:
            from ...ops.pallas_attention_v3 import paired_decode_attention

            o = paired_decode_attention(
                q[:, 0], kc, vc, k[:, 0], v[:, 0], start, pos,
                k_scale=kc_s, v_scale=vc_s,   # None unless int8 cache
                s_view=s_view,
                interpret=jax.default_backend() != "tpu",
            )[:, None]  # [B, 1, H, Dh]
        else:
            # grouped attention WITHOUT materializing a repeated cache (the
            # repeat would multiply cache traffic by G and erase GQA's win):
            # fold query heads into [B, Hk, G, Dh] against the shared KV head.
            qg = q[:, 0].reshape(B, cfg.num_kv_heads, G, Dh)
            # int8 cache: per-token scales factor OUT of the dots —
            #   q·(k_int8·s) == (q·k_int8)·s  — so the int8 tensors feed the
            # einsum directly (the int8→bf16 convert fuses into the matmul
            # read) and the scale lands on the tiny score/prob tensors. The
            # r1 implementation dequantized the whole cache per step, which
            # materialized a bf16 copy and made int8 SLOWER than bf16.
            kc_in = kc if not quantized else kc.astype(h.dtype)
            s_cache = jnp.einsum(
                "bhgd,bkhd->bhgk", qg, kc_in, preferred_element_type=jnp.float32
            ) * scale  # [B, Hk, G, S]
            if quantized:
                s_cache = s_cache * kc_s.transpose(0, 2, 1)[:, :, None, :]
            s_cache = jnp.where(cache_valid, s_cache, NEG_INF)
            s_self = jnp.einsum(
                "bhgd,bhd->bhg", qg, k[:, 0], preferred_element_type=jnp.float32
            )[..., None] * scale  # [B, Hk, G, 1]
            probs = jax.nn.softmax(jnp.concatenate([s_cache, s_self], axis=-1), axis=-1)
            pc = probs[..., :S]
            if quantized:
                pc = pc * vc_s.transpose(0, 2, 1)[:, :, None, :]
                vc_in = vc.astype(h.dtype)
            else:
                vc_in = vc
            o = (
                jnp.einsum(
                    "bhgk,bkhd->bhgd", pc.astype(h.dtype), vc_in,
                    preferred_element_type=jnp.float32,
                )
                + probs[..., S:].astype(jnp.float32) * v[:, 0][:, :, None, :].astype(jnp.float32)
            ).astype(h.dtype)  # [B, Hk, G, Dh]
            o = o.reshape(B, 1, cfg.num_heads, Dh)
        h = h + linear(o.reshape(B, 1, -1), lp["wo"])
        x = rms_norm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + swiglu(x, lp["w_gate"], lp["w_up"], lp["w_down"])
        return h, (k, v)

    xs = (
        (params["backbone"]["layers"], k_cache, v_cache, k_scale, v_scale)
        if quantized
        else (params["backbone"]["layers"], k_cache, v_cache)
    )
    h, (k_new, v_new) = jax.lax.scan(layer, h, xs)
    h = rms_norm(h, params["backbone"]["final_norm"], cfg.rms_eps)
    return h, k_new, v_new


def _write_cache(cache_arr: jnp.ndarray, new: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Write new [L, B, 1, ...] into cache [L, B, S, ...] at per-row pos [B]."""

    def per_row(c, n, p):  # c: [L, S, ...], n: [L, 1, ...]
        idx = (0, p) + (0,) * (c.ndim - 2)
        return jax.lax.dynamic_update_slice(c, n, idx)

    return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(cache_arr, new, pos)


def _write_cache_paired(cache_arr: jnp.ndarray, new: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Write new [L, B, Hp, 1, 128] into cache [L, B, Hp, S, 128] at pos [B]."""

    def per_row(c, n, p):  # c: [L, Hp, S, 128], n: [L, Hp, 1, 128]
        return jax.lax.dynamic_update_slice(c, n, (0, 0, p, 0))

    return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(cache_arr, new, pos)


def _write_scales_paired(scale_arr: jnp.ndarray, new: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Write new [L, B, Hp, 2, 1] into scales [L, B, Hp, 2, S] at pos [B]."""

    def per_row(c, n, p):  # c: [L, Hp, 2, S], n: [L, Hp, 2, 1]
        return jax.lax.dynamic_update_slice(c, n, (0, 0, 0, p))

    return jax.vmap(per_row, in_axes=(1, 1, 0), out_axes=1)(scale_arr, new, pos)


# ------------------------------------------------------------- KV quantization
def _quantize_kv(x: jnp.ndarray):
    """Symmetric per-token-per-head int8: x [..., Dh] → (int8, scale [...])."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


# ---------------------------------------------------------------- prefill
def _left_pack_prefix(
    params: Params,
    cfg: T3Config,
    cond: jnp.ndarray,         # [B, C, D]
    text_tokens: jnp.ndarray,  # [B, T_pad] int32, right-padded
    text_len: jnp.ndarray,     # [B] valid lengths
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build the left-padded prefix [pad(T_pad-t_len) | cond | text].

    Returns (h [B, P, D], valid [B, P] bool, pad [B]). Implemented as a
    per-row gather from the right-packed layout so shapes stay static.
    Shared by prefill (serving) and the teacher-forced train pass so both see
    identical text→speech relative RoPE positions.
    """
    T_pad = text_tokens.shape[1]
    P = cond.shape[1] + T_pad

    text_emb = params["text_emb"][text_tokens]
    if cfg.learned_pos_emb:
        text_emb = text_emb + params["text_pos"][jnp.arange(T_pad)][None]
    packed = jnp.concatenate([cond, text_emb], axis=1)  # [B, P, D]

    pad = (T_pad - text_len).astype(jnp.int32)  # [B]
    j = jnp.arange(P)[None, :]                  # output index
    src = j - pad[:, None]                      # content index; <0 → pad region
    src = jnp.clip(src, 0, P - 1)
    h = jnp.take_along_axis(packed, src[:, :, None], axis=1)
    valid = jnp.arange(P)[None, :] >= pad[:, None]
    h = jnp.where(valid[:, :, None], h, 0.0)
    return h, valid, pad


def t3_prefill_raw(
    params: Params,
    cfg: T3Config,
    cond: jnp.ndarray,         # [B, C, D] conditioning prefix (per lane)
    text_tokens: jnp.ndarray,  # [B, T_pad] int32, right-padded
    text_len: jnp.ndarray,     # [B] valid lengths
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the prefix through the backbone → (k_all, v_all, pad).

    The row is left-padded: [pad(T_pad-t_len) | cond | text].
    k_all/v_all: [L, B, P, Hk, Dh]; pad: [B] left-pad widths (= cache start).
    """
    h, valid, pad = _left_pack_prefix(params, cfg, cond, text_tokens, text_len)
    # pin to the parameter dtype: float32 conditioning inputs (speaker embs
    # etc.) otherwise promote the whole prefix — and the resulting K/V would
    # mismatch a bfloat16 cache
    h = h.astype(params["text_emb"].dtype)

    _, k_all, v_all = _backbone_prefill(params, cfg, h, valid)
    return k_all, v_all, pad


def t3_prefill(
    params: Params,
    cfg: T3Config,
    cond: jnp.ndarray,
    text_tokens: jnp.ndarray,
    text_len: jnp.ndarray,
) -> Dict:
    """Prefill and return a per-request KV cache grown to the decode budget."""
    B = cond.shape[0]
    P = cond.shape[1] + text_tokens.shape[1]
    k_all, v_all, pad = t3_prefill_raw(params, cfg, cond, text_tokens, text_len)
    S_max = P + 1 + cfg.max_speech_tokens
    padw = ((0, 0), (0, 0), (0, S_max - P), (0, 0), (0, 0))
    cache = {"start": pad, "pos": jnp.full((B,), P, jnp.int32)}
    paired = cfg.kv_cache_layout == "paired"
    if cfg.kv_cache_dtype == "int8" and paired:
        from ...ops.pallas_attention_v3 import pack_cache_paired, pack_scales_paired

        kq, ks = _quantize_kv(k_all)
        vq, vs = _quantize_kv(v_all)
        padw_p = ((0, 0), (0, 0), (0, 0), (0, S_max - P), (0, 0))
        padw_sp = ((0, 0), (0, 0), (0, 0), (0, 0), (0, S_max - P))
        cache.update(
            k=jnp.pad(pack_cache_paired(kq), padw_p),
            v=jnp.pad(pack_cache_paired(vq), padw_p),
            k_scale=jnp.pad(pack_scales_paired(ks), padw_sp),
            v_scale=jnp.pad(pack_scales_paired(vs), padw_sp),
        )
    elif cfg.kv_cache_dtype == "int8":
        kq, ks = _quantize_kv(k_all)
        vq, vs = _quantize_kv(v_all)
        padw_s = padw[:-1]
        cache.update(
            k=jnp.pad(kq, padw), v=jnp.pad(vq, padw),
            k_scale=jnp.pad(ks, padw_s), v_scale=jnp.pad(vs, padw_s),
        )
    elif paired:
        from ...ops.pallas_attention_v3 import pack_cache_paired

        padw_p = ((0, 0), (0, 0), (0, 0), (0, S_max - P), (0, 0))
        cache.update(
            k=jnp.pad(pack_cache_paired(k_all), padw_p),
            v=jnp.pad(pack_cache_paired(v_all), padw_p),
        )
    else:
        cache.update(k=jnp.pad(k_all, padw), v=jnp.pad(v_all, padw))
    return cache


# ---------------------------------------------------------------- decode
def make_decode_state(
    rng: jax.Array,
    cfg: T3Config,
    num_requests: int,
    temperature,
    top_p,
    cfg_weight,
    rep_penalty,
) -> Dict:
    R = num_requests
    as_vec = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (R,))
    # Per-slot RNG keys: sampling for one request must not depend on what the
    # other batch slots are doing (or on global scheduler history).
    slot_keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(R))
    return {
        "last_token": jnp.full((R,), cfg.start_speech_token, jnp.int32),
        "step": jnp.zeros((R,), jnp.int32),
        "done": jnp.zeros((R,), bool),
        "token_counts": jnp.zeros((R, cfg.speech_vocab_size), jnp.int32),
        "slot_keys": slot_keys,
        "temperature": as_vec(temperature),
        "top_p": as_vec(top_p),
        "cfg_weight": as_vec(cfg_weight),
        "rep_penalty": as_vec(rep_penalty),
    }


def _invalid_token_mask(cfg: T3Config) -> jnp.ndarray:
    """Logit mask forbidding non-code, non-stop ids (BOS, unused specials)."""
    ids = jnp.arange(cfg.speech_vocab_size)
    allowed = (ids < cfg.num_speech_codes) | (ids == cfg.stop_speech_token)
    return jnp.where(allowed, 0.0, NEG_INF)


@partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "s_view"),
    donate_argnames=("cache", "state"),
)
def t3_decode_slice(
    params: Params,
    cfg: T3Config,
    cache: Dict,
    state: Dict,
    n_steps: int,
    s_view: Optional[int] = None,
) -> Tuple[jnp.ndarray, Dict, Dict]:
    """Generate `n_steps` speech tokens in one on-device scan.

    Returns (tokens [R, n_steps] int32, cache, state). Requests that hit EOS
    keep emitting stop_speech_token; the host trims them. Lanes are laid out
    [r0-cond, r0-uncond, r1-cond, ...] (2 lanes per request for CFG).

    ``s_view`` (static) limits attention to the first s_view cache entries —
    decode is cache-bandwidth-bound, so reading only the filled prefix
    instead of the whole static budget is a large win early in a request.
    The caller must guarantee max(pos) + n_steps <= s_view.
    """
    R = state["last_token"].shape[0]
    token_mask = _invalid_token_mask(cfg)

    # derive from the cache itself so a mismatched cfg cannot write int8
    # into a float cache (or vice versa)
    quantized = "k_scale" in cache

    def step(carry, _):
        cache, state = carry
        # A finished (or empty batching) slot must not advance its cache
        # position or speech step — it idles in place, re-emitting EOS.
        active_lanes = jnp.repeat(~state["done"], 2)
        tok_lanes = jnp.repeat(state["last_token"], 2)         # [B]
        step_lanes = jnp.clip(jnp.repeat(state["step"], 2), 0, cfg.max_speech_tokens + 1)
        h = params["speech_emb"][tok_lanes][:, None, :]
        if cfg.learned_pos_emb:
            h = h + params["speech_pos"][step_lanes][:, None, :]
        hidden, k_new, v_new = _backbone_decode_step(
            params, cfg, h, cache["k"], cache["v"],
            cache["start"], cache["pos"],
            cache.get("k_scale"), cache.get("v_scale"),
            s_view,
        )
        new_cache = {
            "start": cache["start"],
            "pos": cache["pos"] + active_lanes.astype(jnp.int32),
        }
        if quantized and cfg.kv_cache_layout == "paired":
            L_, B_ = k_new.shape[0], k_new.shape[1]
            Hp = cfg.num_kv_heads // 2
            pair_shape = (L_, B_, Hp, 1, 2 * cfg.head_dim)
            kq, ks = _quantize_kv(k_new)   # kq [L,B,1,Hk,Dh], ks [L,B,1,Hk]
            vq, vs = _quantize_kv(v_new)
            to_pair_s = lambda s: jnp.moveaxis(s.reshape(L_, B_, 1, Hp, 2), 2, 4)
            new_cache["k"] = _write_cache_paired(cache["k"], kq.reshape(pair_shape), cache["pos"])
            new_cache["v"] = _write_cache_paired(cache["v"], vq.reshape(pair_shape), cache["pos"])
            new_cache["k_scale"] = _write_scales_paired(cache["k_scale"], to_pair_s(ks), cache["pos"])
            new_cache["v_scale"] = _write_scales_paired(cache["v_scale"], to_pair_s(vs), cache["pos"])
        elif quantized:
            kq, ks = _quantize_kv(k_new)
            vq, vs = _quantize_kv(v_new)
            new_cache["k"] = _write_cache(cache["k"], kq, cache["pos"])
            new_cache["v"] = _write_cache(cache["v"], vq, cache["pos"])
            new_cache["k_scale"] = _write_cache(cache["k_scale"], ks, cache["pos"])
            new_cache["v_scale"] = _write_cache(cache["v_scale"], vs, cache["pos"])
        elif cfg.kv_cache_layout == "paired":
            L_, B_ = k_new.shape[0], k_new.shape[1]
            pair_shape = (L_, B_, cfg.num_kv_heads // 2, 1, 2 * cfg.head_dim)
            new_cache["k"] = _write_cache_paired(cache["k"], k_new.reshape(pair_shape), cache["pos"])
            new_cache["v"] = _write_cache_paired(cache["v"], v_new.reshape(pair_shape), cache["pos"])
        else:
            new_cache["k"] = _write_cache(cache["k"], k_new, cache["pos"])
            new_cache["v"] = _write_cache(cache["v"], v_new, cache["pos"])
        cache = new_cache
        logits = linear(
            hidden[:, 0], params["speech_head"]["w"], params["speech_head"]["b"]
        ).astype(jnp.float32)
        pair = logits.reshape(R, 2, -1)
        w = state["cfg_weight"][:, None]
        guided = pair[:, 0] + w * (pair[:, 0] - pair[:, 1])
        guided = guided + token_mask[None]
        # per-request repetition penalty (vectorized over R)
        seen = state["token_counts"] > 0
        rp = state["rep_penalty"][:, None]
        guided = jnp.where(
            seen, jnp.where(guided > 0, guided / rp, guided * rp), guided
        )
        sub_keys = jax.vmap(jax.random.fold_in)(state["slot_keys"], state["step"])
        filtered = guided / jnp.maximum(state["temperature"][:, None], 1e-4)
        # top-p per request (top_p is a traced vector → per-row nucleus
        # filter, sort-free bisection — ops/sampling.top_p_filter)
        filtered = top_p_filter(filtered, state["top_p"])
        sampled = jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(sub_keys, filtered)
        greedy = jnp.argmax(guided, axis=-1)
        token = jnp.where(state["temperature"] <= 0.0, greedy, sampled).astype(jnp.int32)
        token = jnp.where(state["done"], cfg.stop_speech_token, token)
        done = state["done"] | (token == cfg.stop_speech_token)
        active = ~state["done"]
        counts = state["token_counts"].at[jnp.arange(R), token].add(
            active.astype(jnp.int32)
        )
        state = {
            **state,
            "last_token": token,
            "step": state["step"] + active.astype(jnp.int32),
            "done": done,
            "token_counts": counts,
        }
        return (cache, state), token

    (cache, state), tokens = jax.lax.scan(step, (cache, state), None, length=n_steps)
    return tokens.T, cache, state  # [R, n_steps]


# ---------------------------------------------------------------- training
def t3_forward_train(
    params: Params,
    cfg: T3Config,
    cond: jnp.ndarray,           # [B, C, D]
    text_tokens: jnp.ndarray,    # [B, T]
    speech_tokens: jnp.ndarray,  # [B, S] target speech tokens (BOS-shifted inputs)
    text_len: Optional[jnp.ndarray] = None,  # [B] valid text lengths
    remat: bool = True,
) -> jnp.ndarray:
    """Teacher-forced forward pass → speech logits [B, S, V_speech].

    Input sequence: [cond | text | BOS, speech[:-1]]; logits are read at the
    speech positions. ``text_len`` masks padded text positions out of the
    attention so training matches the serving-side masking. Used by the
    training step and multi-chip shard checks.

    remat=True (default) checkpoints each scanned layer so the backward pass
    rematerializes instead of storing every layer's activations; K/V stacking
    is skipped entirely (never consumed when training).
    """
    B, T = text_tokens.shape
    S = speech_tokens.shape[1]
    C = cond.shape[1]
    bos = jnp.full((B, 1), cfg.start_speech_token, jnp.int32)
    speech_in = jnp.concatenate([bos, speech_tokens[:, :-1]], axis=1)
    speech_emb = params["speech_emb"][speech_in]
    if cfg.learned_pos_emb:
        speech_emb = speech_emb + params["speech_pos"][jnp.arange(S)][None]
    # Left-pack [pad | cond | text] exactly as serving prefill does, so the
    # RoPE distance from the last text token to speech BOS is identical in
    # training and inference (right-padded text would leave a per-row
    # position gap of T - text_len before speech BOS).
    if text_len is None:
        text_len = jnp.full((B,), T, jnp.int32)
    prefix, prefix_valid, _ = _left_pack_prefix(params, cfg, cond, text_tokens, text_len)
    h = jnp.concatenate([prefix, speech_emb.astype(prefix.dtype)], axis=1)
    valid = jnp.concatenate([prefix_valid, jnp.ones((B, S), dtype=bool)], axis=1)
    hidden, _, _ = _backbone_prefill(params, cfg, h, valid, collect_kv=False, remat=remat)
    speech_hidden = hidden[:, cond.shape[1] + T :]
    return linear(
        speech_hidden, params["speech_head"]["w"], params["speech_head"]["b"]
    ).astype(jnp.float32)
