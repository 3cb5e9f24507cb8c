"""S3Gen (reference architecture) facade: init, embed_ref, chunk inference.

Checkpoint-compatible counterpart of ``models/s3gen`` (the TPU-first DiT
redesign) exposing the same pure-function surface the engine consumes
(SURVEY.md §2b; /root/reference/src/tts_streaming.py:365-366, 583-590,
681-688):

* ``s3gen_ref_embed_ref(wav24, wav16) → ref dict`` — prompt tokens (via the
  checkpoint tokenizer), prompt mel (HiFiGAN extractor), CAMPPlus x-vector;
  fixed-size RIGHT-padded windows (reference alignment rule: mel frames are
  clipped to exactly 2× the prompt token count).
* ``s3gen_ref_inference(tokens, ref, cache_source) → (wav, new_cache)`` —
  one XLA graph per chunk: left-packed [pad|prompt|generated] track through
  the upsample-conformer encoder, CFM Euler solve with CFG, HiFT vocoder
  with the excitation-prefix continuity contract.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.nn import linear
from .campplus import campplus_embed, init_campplus_params
from .config import S3GenRefConfig
from .decoder import (
    cfm_generate,
    cfm_generate_cached,
    cfm_generate_streaming,
    cfm_prompt_prefill,
    init_estimator_params,
    init_stream_state,
)
from .features import hifigan_log_mel, kaldi_fbank, reflect_tail
from .hift import hift_decode, init_hift_params, make_source, predict_f0
from .tokenizer import init_s3tok_ref_params, s3tok_ref_tokenize
from .upsample_encoder import init_upsample_encoder_params, upsample_encode

MEL_HOP_24K = 480  # HiFiGAN mel hop at 24 kHz (50 fps)


def init_s3gen_ref_params(key: jax.Array, cfg: S3GenRefConfig, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    from ...ops.initializers import dense_init, rng_stream

    rngs = rng_stream(k3)

    def mk(*shape):
        return dense_init(next(rngs), shape, dtype)

    fl = cfg.flow
    return {
        "tokenizer": init_s3tok_ref_params(k1, cfg.tokenizer, dtype),
        "speaker": init_campplus_params(k2, cfg.speaker, dtype),
        "flow": {
            "input_emb": mk(fl.vocab_size, fl.input_size),
            "spk_affine": {"w": mk(fl.spk_embed_dim, fl.output_size), "b": mk(fl.output_size)},
            "encoder_proj": {"w": mk(fl.input_size, fl.output_size), "b": mk(fl.output_size)},
            "encoder": init_upsample_encoder_params(k4, fl, dtype),
            "estimator": init_estimator_params(k5, fl, dtype),
        },
        "mel2wav": init_hift_params(k6, cfg.hift, dtype),
    }


def s3gen_ref_embed_ref(
    params: Dict,
    cfg: S3GenRefConfig,
    wav24: jnp.ndarray,      # [B, L24] 24 kHz reference audio (≤10 s budget)
    wav24_len: jnp.ndarray,  # [B]
    wav16: jnp.ndarray,      # [B, L16] the same audio at 16 kHz
    wav16_len: jnp.ndarray,  # [B]
) -> Dict:
    """Voice conditioning dict (cached per voice_id by the engine)."""
    # Reflect the valid tail into the zero-padded static buffer: for prompts
    # shorter than the 10 s budget the last mel frame's window extends up to
    # (n_fft - hop)/2 = 720 samples past wav24_len, and the reference
    # extractor sees REFLECTED audio there (its input is the true-length
    # waveform, reflect-padded), not zeros (ADVICE r2).
    mel = hifigan_log_mel(reflect_tail(wav24, wav24_len))   # [B, F, 80]
    Pm, P = cfg.max_prompt_mel, cfg.max_prompt_tokens
    if mel.shape[1] < Pm:
        mel = jnp.pad(mel, ((0, 0), (0, Pm - mel.shape[1]), (0, 0)))
    mel = mel[:, :Pm]
    mel_len = jnp.minimum(wav24_len // MEL_HOP_24K, Pm)

    tokens, tok_len = s3tok_ref_tokenize(params["tokenizer"], cfg.tokenizer, wav16, wav16_len)
    if tokens.shape[1] < P:
        tokens = jnp.pad(tokens, ((0, 0), (0, P - tokens.shape[1])))
    tokens = tokens[:, :P]
    # reference alignment rule: prompt mel frames == 2 × prompt tokens
    tok_len = jnp.minimum(jnp.minimum(tok_len, mel_len // cfg.flow.up_stride), P)
    mel_len = tok_len * cfg.flow.up_stride

    fb, fb_len = kaldi_fbank(wav16, wav16_len)
    fb_valid = jnp.arange(fb.shape[1])[None, :] < fb_len[:, None]
    spk = campplus_embed(params["speaker"], cfg.speaker, fb, fb_valid)

    mel_valid = jnp.arange(Pm)[None, :] < mel_len[:, None]
    return {
        "spk_emb": spk,                                             # [B, 192]
        "prompt_tokens": tokens.astype(jnp.int32),                  # [B, P]
        "prompt_len": tok_len.astype(jnp.int32),                    # [B]
        "prompt_mel": jnp.where(mel_valid[:, :, None], mel, 0.0),   # [B, Pm, 80]
        "prompt_mel_len": mel_len.astype(jnp.int32),                # [B]
    }


def _left_pack(
    buf: jnp.ndarray, valid_len: jnp.ndarray, fill: float | int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Right-align the valid prefix of a right-padded buffer: [v|pad] → [pad|v].

    buf: [B, P] or [B, P, C]; returns (packed buffer, [B, P] valid mask)."""
    B, P = buf.shape[:2]
    off = (P - valid_len)[:, None]
    j = jnp.arange(P)[None, :]
    src = jnp.clip(j - off, 0, P - 1)
    idx = src if buf.ndim == 2 else src[:, :, None]
    packed = jnp.take_along_axis(buf, jnp.broadcast_to(idx, buf.shape if buf.ndim == 2 else (B, P, buf.shape[2])), axis=1)
    mask = j >= off
    if buf.ndim == 3:
        packed = jnp.where(mask[:, :, None], packed, fill)
    else:
        packed = jnp.where(mask, packed, fill)
    return packed, mask


def _spk_track(params: Dict, ref: Dict) -> jnp.ndarray:
    """Normalized speaker embedding → 80-d estimator conditioning track."""
    spk_n = ref["spk_emb"] * jax.lax.rsqrt(
        jnp.sum(jnp.square(ref["spk_emb"].astype(jnp.float32)), -1, keepdims=True) + 1e-12
    ).astype(ref["spk_emb"].dtype)
    return linear(spk_n, params["flow"]["spk_affine"]["w"], params["flow"]["spk_affine"]["b"])


def _packed_prompt_mel(cfg: S3GenRefConfig, ref: Dict, dtype) -> jnp.ndarray:
    """Prompt-mel conditioning, left-packed (right-aligned against the
    generated frames)."""
    Pm = cfg.max_prompt_tokens * cfg.flow.up_stride
    pm = ref["prompt_mel"][:, :Pm]
    pm_len = jnp.minimum(ref["prompt_mel_len"], Pm)
    packed_mel, _ = _left_pack(pm.astype(dtype), pm_len)
    return packed_mel


def _encode_mu(
    params: Dict,
    cfg: S3GenRefConfig,
    tokens: jnp.ndarray,     # [B, T] generated speech tokens, right-padded
    token_len: jnp.ndarray,  # [B]
    ref: Dict,               # from s3gen_ref_embed_ref
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Upsample-conformer encoder over the [pad | prompt | generated] token
    track → (mu [B, (P+T)·fpt, 80], valid_f [B, (P+T)·fpt], spk [B, 80])."""
    B, T = tokens.shape
    fl = cfg.flow
    P = cfg.max_prompt_tokens

    packed_prompt, prompt_mask = _left_pack(
        ref["prompt_tokens"], jnp.minimum(ref["prompt_len"], P)
    )
    full = jnp.concatenate([packed_prompt, tokens], axis=1)          # [B, P+T]
    gen_valid = jnp.arange(T)[None, :] < token_len[:, None]
    valid = jnp.concatenate([prompt_mask, gen_valid], axis=1)

    emb_table = params["flow"]["input_emb"]
    emb = emb_table[jnp.clip(full, 0, fl.vocab_size - 1)]
    emb = jnp.where(valid[:, :, None], emb, 0.0)
    h, valid_f = upsample_encode(params["flow"]["encoder"], fl, emb, valid)
    mu = linear(h, params["flow"]["encoder_proj"]["w"], params["flow"]["encoder_proj"]["b"])
    return mu, valid_f, _spk_track(params, ref)


def _source_with_cache(
    params: Dict,
    cfg: S3GenRefConfig,
    mel_gen: jnp.ndarray,       # [B, T·fpt, 80] f32, invalid frames zeroed
    source_cache: jnp.ndarray,  # [B, T·spt] excitation prefix
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,
) -> jnp.ndarray:
    """HiFT excitation with continuity (reference cache_source contract)."""
    f0 = predict_f0(params["mel2wav"], cfg.hift, mel_gen)            # [B, T·fpt]
    source = make_source(params["mel2wav"], cfg.hift, f0, jax.random.fold_in(key, 1))
    L = source.shape[1]
    idx = jnp.arange(L)[None, :]
    return jnp.where(
        idx < cache_len[:, None], source_cache[:, :L].astype(source.dtype), source
    )


def _mel_and_source(
    params: Dict,
    cfg: S3GenRefConfig,
    tokens: jnp.ndarray,        # [B, T] generated speech tokens, right-padded
    token_len: jnp.ndarray,     # [B]
    ref: Dict,                  # from s3gen_ref_embed_ref
    source_cache: jnp.ndarray,  # [B, T*samples_per_token] excitation prefix
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,             # request-stable key (determinism = seam continuity)
    cfm_cache: Dict | None = None,  # from s3gen_ref_prompt_prefill
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared front of chunk inference: encoder → CFM mel → NSF excitation
    with the cache-override contract. → (mel_gen [B, T·fpt, 80],
    source [B, T·spt]).

    With ``cfm_cache`` the estimator solves only the generated frames
    against the frozen per-voice prompt context (see cfm_prompt_prefill);
    the encoder still sees [prompt | generated] bidirectionally (it is ~1%
    of the estimator's FLOPs), so ``mu`` is unchanged."""
    B, T = tokens.shape
    fl = cfg.flow
    P = cfg.max_prompt_tokens
    fpt = fl.up_stride
    Pm = P * fpt

    mu, valid_f, spk = _encode_mu(params, cfg, tokens, token_len, ref)

    gen_frame_valid = valid_f[:, Pm:]
    if cfm_cache is not None:
        mel_gen = cfm_generate_cached(
            params["flow"]["estimator"], fl, key, mu[:, Pm:], spk,
            gen_frame_valid, cfm_cache,
        )
    else:
        packed_mel = _packed_prompt_mel(cfg, ref, mu.dtype)
        cond = jnp.concatenate(
            [packed_mel, jnp.zeros((B, T * fpt, packed_mel.shape[2]), mu.dtype)], axis=1
        )
        mel_full = cfm_generate(params["flow"]["estimator"], fl, key, mu, spk, cond, valid_f)
        mel_gen = mel_full[:, Pm:]                                   # [B, T·fpt, 80]
    mel_gen = jnp.where(gen_frame_valid[:, :, None], mel_gen, 0.0)
    # Pin the mel→wav stack to f32 regardless of the flow's activation dtype
    # (no-op when the flow computed in f32): with CHATTERBOX_FLOW_BF16 the
    # bf16 deviation is scoped to the encoder/CFM — the NSF source phase
    # accumulation and ISTFT phase math stay full-precision.
    mel_gen = mel_gen.astype(jnp.float32)
    source = _source_with_cache(params, cfg, mel_gen, source_cache, cache_len, key)
    return mel_gen, source


def s3gen_ref_inference(
    params: Dict,
    cfg: S3GenRefConfig,
    tokens: jnp.ndarray,        # [B, T] generated speech tokens, right-padded
    token_len: jnp.ndarray,     # [B]
    ref: Dict,                  # from s3gen_ref_embed_ref
    source_cache: jnp.ndarray,  # [B, T*samples_per_token] excitation prefix
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,             # request-stable key (determinism = seam continuity)
    cfm_cache: Dict | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming chunk → (wav [B, T·spt], new_source_cache [B, T·spt])."""
    mel_gen, source = _mel_and_source(
        params, cfg, tokens, token_len, ref, source_cache, cache_len, key,
        cfm_cache=cfm_cache,
    )
    wav = hift_decode(params["mel2wav"], cfg.hift, mel_gen, source)
    return wav, source


def s3gen_ref_prompt_prefill(
    params: Dict,
    cfg: S3GenRefConfig,
    ref: Dict,       # from s3gen_ref_embed_ref (leaves [B, ...])
    key: jax.Array,  # FIXED key: the prompt noise is voice-stable, mirroring
                     # the reference's one fixed rand_noise buffer per model
) -> Dict:
    """Per-voice CFM prompt cache: run the prompt-only encoder + the
    capturing CFM solve once (see cfm_prompt_prefill for the contract and
    the documented one-way deviation). Cached per voice_id alongside the
    conditioning dict; every subsequent slice of every request for this
    voice skips the ~500-frame prompt re-encode that is the measured
    single-chip serving ceiling (BENCH_NOTES r3)."""
    fl = cfg.flow
    P = cfg.max_prompt_tokens
    packed_prompt, prompt_mask = _left_pack(
        ref["prompt_tokens"], jnp.minimum(ref["prompt_len"], P)
    )
    emb = params["flow"]["input_emb"][jnp.clip(packed_prompt, 0, fl.vocab_size - 1)]
    emb = jnp.where(prompt_mask[:, :, None], emb, 0.0)
    h, valid_f = upsample_encode(params["flow"]["encoder"], fl, emb, prompt_mask)
    mu_p = linear(h, params["flow"]["encoder_proj"]["w"], params["flow"]["encoder_proj"]["b"])
    spk = _spk_track(params, ref)
    cond_p = _packed_prompt_mel(cfg, ref, mu_p.dtype)
    return cfm_prompt_prefill(
        params["flow"]["estimator"], fl, key, mu_p, spk, cond_p, valid_f
    )


def s3gen_ref_inference_tail(
    params: Dict,
    cfg: S3GenRefConfig,
    tokens: jnp.ndarray,        # [B, T] generated speech tokens, right-padded
    token_len: jnp.ndarray,     # [B]
    ref: Dict,                  # from s3gen_ref_embed_ref
    source_cache: jnp.ndarray,  # [B, T*samples_per_token] excitation prefix
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,
    start: jnp.ndarray,         # [B] first wanted output sample (0 ≤ · ≤ T·spt − tail_len)
    tail_len: int,              # static: samples returned per row
    cfm_cache: Dict | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunk inference that VOCODES only a window around the emitted tail →
    (wav_tail [B, tail_len] == full wav[:, start:start+tail_len] exactly,
    new_source_cache [B, T·spt]).

    The reference re-synthesizes the full accumulated token stream every
    slice in "full"-overlap mode but emits only the new tail
    (/root/reference/src/tts_streaming.py:655-659, 681-688). Encoder/CFM are
    bidirectional (prefix recompute is semantic), but the mel→wav stack is
    LOCAL — convs + STFT windows — so vocoding a [start − margin,
    start + tail + margin] window reproduces the emitted samples exactly
    (margin = hift_receptive_margin) while the vocoder cost stays constant
    per slice instead of growing with the accumulated length."""
    mel_gen, source = _mel_and_source(
        params, cfg, tokens, token_len, ref, source_cache, cache_len, key,
        cfm_cache=cfm_cache,
    )
    wav_tail = _vocode_tail_window(params, cfg, mel_gen, source, start, tail_len)
    return wav_tail, source


def _vocode_tail_window(
    params: Dict,
    cfg: S3GenRefConfig,
    mel_gen: jnp.ndarray,  # [B, T·fpt, 80]
    source: jnp.ndarray,   # [B, T·spt]
    start: jnp.ndarray,    # [B] first wanted output sample
    tail_len: int,         # static
) -> jnp.ndarray:
    """Vocode a receptive-field window → wav[:, start:start+tail_len] EXACTLY
    (see s3gen_ref_inference_tail for the locality argument)."""
    from .hift import hift_receptive_margin

    fpt = cfg.flow.up_stride
    spt = cfg.samples_per_token
    T = source.shape[1] // spt
    # window extents in whole tokens (spt-aligned keeps mel/source in step)
    margin_tok = -(-hift_receptive_margin(cfg.hift) // spt) + 1
    tail_tok = -(-tail_len // spt)
    win_tok = min(T, tail_tok + 2 * margin_tok)
    w0_tok = jnp.clip(start // spt - margin_tok, 0, T - win_tok)     # [B]

    def one(mel_b, src_b, w0_t, start_b):
        mel_w = jax.lax.dynamic_slice(
            mel_b, (w0_t * fpt, 0), (win_tok * fpt, mel_b.shape[1])
        )
        src_w = jax.lax.dynamic_slice(src_b, (w0_t * spt,), (win_tok * spt,))
        wav_w = hift_decode(
            params["mel2wav"], cfg.hift, mel_w[None], src_w[None]
        )[0]
        return jax.lax.dynamic_slice(wav_w, (start_b - w0_t * spt,), (tail_len,))

    return jax.vmap(one)(mel_gen, source, w0_tok, start)


def init_s3gen_stream_state(
    cfg: S3GenRefConfig,
    cfm_cache: Dict,   # per-voice cache from s3gen_ref_prompt_prefill
    window: int,       # K/V ring capacity in mel frames
    cap_tokens: int,   # largest accumulated token count a chunk can reach
) -> Dict:
    """Fresh per-request (per-chunk) streaming state for
    s3gen_ref_inference_streaming: the CFM stream context (K/V ring, conv
    halos, GN running stats — see decoder.init_stream_state) plus the frozen
    accumulated-mel buffer the vocoder/excitation read from. All leaves are
    immutable JAX arrays, so one state is shared as the fresh template by
    every request of a voice."""
    return {
        "cfm": init_stream_state(cfg.flow, cfm_cache, window, batch=1),
        "mel": jnp.zeros((1, cap_tokens * cfg.flow.up_stride, cfg.flow.output_size),
                         jnp.float32),
    }


def s3gen_ref_inference_streaming(
    params: Dict,
    cfg: S3GenRefConfig,
    tokens: jnp.ndarray,        # [B, T] ACCUMULATED chunk tokens, right-padded
    token_len: jnp.ndarray,     # [B] total valid tokens (old + new)
    new_len: jnp.ndarray,       # [B] NEW tokens this slice (suffix of the valid region)
    ref: Dict,                  # from s3gen_ref_embed_ref
    source_cache: jnp.ndarray,  # [B, T·spt] excitation prefix
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,             # chunk-stable key (same every slice)
    start: jnp.ndarray,         # [B] first wanted output sample
    tail_len: int,              # static: samples returned per row
    rstate: Dict,               # from init_s3gen_stream_state / previous slice
    new_block_tokens: int,      # static upper bound on new_len
    cfm_cache: Dict | None = None,  # REQUIRED (per-voice prompt context)
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
    """Streaming full-overlap chunk slice → (wav_tail [B, tail_len],
    new_source_cache [B, T·spt], new_rstate).

    The reference's "full" overlap strategy re-synthesizes the ACCUMULATED
    token stream every slice (/root/reference/src/tts_streaming.py:655-659).
    This path solves ONLY the slice's new frames against [frozen voice
    prompt | frozen previous generated frames] (cfm_generate_streaming) and
    reads earlier frames' mel from the per-request buffer, so per-slice CFM
    cost is constant in utterance length. The encoder still re-encodes the
    accumulated track bidirectionally (~1% of estimator FLOPs — exact mu),
    and f0/source/vocoder keep today's contracts: the chunk-stable key makes
    the excitation bit-reproducible across slices, the source prefix is
    cache-overridden, and the vocoder windows the emitted tail (EXACT given
    the frozen mel). A chunk's FIRST slice equals s3gen_ref_inference_tail
    up to fp32 summation order (fresh state degenerates to the prompt cache;
    the right-packed small block reorders GroupNorm/attention reductions —
    tests/test_s3gen_streaming.py); later slices are the documented one-way
    deviation, quality-measured by scripts/quality_study.py."""
    assert cfm_cache is not None, "streaming inference requires the CFM prompt cache"
    B, T = tokens.shape
    fl = cfg.flow
    fpt = fl.up_stride
    Pm = cfg.max_prompt_tokens * fpt
    TgF = new_block_tokens * fpt

    mu, valid_f, spk = _encode_mu(params, cfg, tokens, token_len, ref)

    # gather the NEW frames' mu, right-packed into the static block
    frames_total = token_len * fpt                                   # [B]
    new_frames = new_len * fpt                                       # [B]
    old_frames = frames_total - new_frames                           # [B]
    j = jnp.arange(TgF)[None, :]                                     # [1, TgF]
    src_frame = Pm + old_frames[:, None] + (j - (TgF - new_frames[:, None]))
    idx = jnp.clip(src_frame, 0, mu.shape[1] - 1)
    mu_new = jnp.take_along_axis(mu, idx[:, :, None], axis=1)        # [B, TgF, M]

    mel_new, new_cfm = cfm_generate_streaming(
        params["flow"]["estimator"], fl, key, mu_new, spk,
        new_frames.astype(jnp.int32), cfm_cache, rstate["cfm"],
    )

    # write the new frames into the frozen-mel buffer (pure gather + select:
    # only rows [old, total) change; the template's zeros beyond stay zeros)
    buf = rstate["mel"]                                              # [B, Fc, M]
    jj = jnp.arange(buf.shape[1])[None, :]
    is_new = (jj >= old_frames[:, None]) & (jj < frames_total[:, None])
    bsrc = jnp.clip(jj - old_frames[:, None] + (TgF - new_frames[:, None]),
                    0, TgF - 1)
    gathered = jnp.take_along_axis(mel_new.astype(buf.dtype), bsrc[:, :, None], axis=1)
    buf = jnp.where(is_new[:, :, None], gathered, buf)

    mel_gen = buf[:, : T * fpt]                                      # [B, T·fpt, M]
    source = _source_with_cache(params, cfg, mel_gen, source_cache, cache_len, key)
    wav_tail = _vocode_tail_window(params, cfg, mel_gen, source, start, tail_len)
    return wav_tail, source, {"cfm": new_cfm, "mel": buf}
