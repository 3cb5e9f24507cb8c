"""S3Gen facade: parameter init, reference-voice embedding, chunk inference.

Mirrors the surface the serving stack consumes from the reference package
(SURVEY.md §2b): ``embed_ref(ref_wav, sr) -> ref_dict`` and
``inference(speech_tokens, ref_dict, cache_source) -> (wav, new_cache)``
(/root/reference/src/tts_streaming.py:365-366, 583-590, 681-688) — recast as
pure functions over parameter pytrees with static shapes:

* prompt tokens/mel live in fixed-size, LEFT-padded windows so the packed
  [prompt | generated] track has no interior gaps;
* one call = one XLA graph: encoder → CFM Euler scan → vocoder;
* the vocoder excitation (``source``) is returned and accepted as the
  streaming continuity cache, same contract as the reference's
  ``cache_source``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.spectral import log_mel_spectrogram
from .config import S3GenConfig
from .encoder import encode_tokens, init_encoder_params
from .flow import cfm_generate, init_flow_params
from .vocoder import init_vocoder_params, make_source, predict_f0, vocode
from .xvector import init_xvector_params, xvector_embed

PAD_TOKEN_OFFSET = 0  # pad id == cfg.vocab_size


def init_s3gen_params(key: jax.Array, cfg: S3GenConfig, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "encoder": init_encoder_params(k1, cfg, dtype),
        "flow": init_flow_params(k2, cfg, dtype),
        "vocoder": init_vocoder_params(k3, cfg, dtype),
        "xvector": init_xvector_params(k4, cfg, dtype=dtype),
    }


def s3gen_embed_ref(
    params: Dict,
    cfg: S3GenConfig,
    ref_wav_24k: jnp.ndarray,    # [B, L24] (≤ 10 s, host-trimmed)
    fbank_16k: jnp.ndarray,      # [B, Tf, 80] fbank of the 16 kHz reference
    prompt_tokens: jnp.ndarray,  # [B, P] from the speech tokenizer (≤ 6 s)
    prompt_len: jnp.ndarray,     # [B]
    fbank_len: jnp.ndarray | None = None,  # [B] valid fbank frames
) -> Dict:
    """Build the conditioning dict for a voice (cached per voice_id)."""
    mel = log_mel_spectrogram(ref_wav_24k, cfg.sample_rate, cfg.n_fft, cfg.hop, cfg.n_mels)
    mel = mel[:, : cfg.max_prompt_mel]
    pm_len = jnp.minimum(prompt_len * cfg.frames_per_token, mel.shape[1])
    fb_valid = None
    if fbank_len is not None:
        fb_valid = jnp.arange(fbank_16k.shape[1])[None, :] < fbank_len[:, None]
    spk = xvector_embed(params["xvector"], fbank_16k, fb_valid)
    P = cfg.max_prompt_tokens
    prompt_tokens = prompt_tokens[:, :P]
    if prompt_tokens.shape[1] < P:
        prompt_tokens = jnp.pad(
            prompt_tokens, ((0, 0), (0, P - prompt_tokens.shape[1])), constant_values=cfg.vocab_size
        )
    return {
        "spk_emb": spk,
        "prompt_tokens": prompt_tokens.astype(jnp.int32),
        "prompt_len": jnp.minimum(prompt_len, P).astype(jnp.int32),
        "prompt_mel": mel,
        "prompt_mel_len": pm_len.astype(jnp.int32),
    }


def _left_pack_prompt(
    cfg: S3GenConfig,
    prompt_tokens: jnp.ndarray,  # [B, P] right-padded
    prompt_len: jnp.ndarray,     # [B]
    tokens: jnp.ndarray,         # [B, T] right-padded generated tokens
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build [pad | prompt | generated] with the prompt right-aligned against
    the generated tokens, so the valid region is contiguous."""
    B, P = prompt_tokens.shape
    T = tokens.shape[1]
    off = (P - prompt_len)[:, None]                       # [B,1] left-pad width
    j = jnp.arange(P)[None, :]
    src = jnp.clip(j - off, 0, P - 1)
    packed_prompt = jnp.take_along_axis(prompt_tokens, src, axis=1)
    packed_prompt = jnp.where(j >= off, packed_prompt, cfg.vocab_size)
    full = jnp.concatenate([packed_prompt, tokens], axis=1)  # [B, P+T]
    valid_prompt = j >= off
    return full, valid_prompt


def s3gen_inference(
    params: Dict,
    cfg: S3GenConfig,
    tokens: jnp.ndarray,        # [B, T] generated speech tokens, right-padded with vocab_size
    token_len: jnp.ndarray,     # [B] valid token counts
    ref: Dict,                  # from s3gen_embed_ref
    source_cache: jnp.ndarray,  # [B, T*samples_per_token] excitation prefix (zeros beyond cache_len)
    cache_len: jnp.ndarray,     # [B] valid samples in source_cache
    key: jax.Array,             # request-stable PRNG key (noise determinism = seam continuity)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One streaming chunk → (wav [B, T*samples_per_token], new_source_cache).

    The valid output is the first token_len*samples_per_token samples of wav;
    the caller slices (and, under the "full" overlap strategy, drops the
    prefix it already emitted — sample-exact thanks to the source cache).
    """
    B, T = tokens.shape
    P = cfg.max_prompt_tokens
    fpt = cfg.frames_per_token
    spt = cfg.samples_per_token

    full_tokens, valid_prompt = _left_pack_prompt(
        cfg, ref["prompt_tokens"], ref["prompt_len"], tokens
    )
    gen_valid = jnp.arange(T)[None, :] < token_len[:, None]
    valid_tokens = jnp.concatenate([valid_prompt, gen_valid], axis=1)

    mu = encode_tokens(params["encoder"], cfg, full_tokens, valid_tokens)  # [B, 2(P+T), M]
    F_total = (P + T) * fpt
    frame_valid = jnp.repeat(valid_tokens, fpt, axis=1)

    # prompt-mel conditioning track, right-aligned against the generated frames
    Pm = P * fpt
    cond = jnp.zeros((B, F_total, cfg.n_mels), mu.dtype)
    pm = ref["prompt_mel"]
    pm_len = jnp.minimum(ref["prompt_mel_len"], Pm)
    if pm.shape[1] < Pm:
        pm = jnp.pad(pm, ((0, 0), (0, Pm - pm.shape[1]), (0, 0)))
    else:
        pm = pm[:, :Pm]
    offf = (Pm - pm_len)[:, None]
    jf = jnp.arange(Pm)[None, :]
    srcf = jnp.clip(jf - offf, 0, Pm - 1)
    packed_mel = jnp.take_along_axis(pm, srcf[:, :, None], axis=1)
    prompt_frame_flag = (jf >= offf)[:, :, None]
    packed_mel = jnp.where(prompt_frame_flag, packed_mel, 0.0)
    cond = cond.at[:, :Pm].set(packed_mel.astype(cond.dtype))
    flag = jnp.concatenate(
        [prompt_frame_flag.astype(mu.dtype), jnp.zeros((B, T * fpt, 1), mu.dtype)], axis=1
    )

    mel_full = cfm_generate(
        params["flow"], cfg, key, mu, cond, flag, ref["spk_emb"], frame_valid
    )
    mel_gen = mel_full[:, Pm:]  # [B, T*fpt, M]
    # zero invalid frames so vocoder convs see silence, not pad garbage
    gen_frame_valid = frame_valid[:, Pm:]
    mel_gen = jnp.where(gen_frame_valid[:, :, None], mel_gen, 0.0)

    # Vocoder with excitation continuity
    f0 = predict_f0(params["vocoder"], mel_gen)                     # [B, T*fpt]
    src_key = jax.random.fold_in(key, 1)
    source = make_source(params["vocoder"], cfg, f0, src_key)       # [B, T*spt... (fpt*hop)]
    L = T * spt
    idx = jnp.arange(L)[None, :]
    use_cache = idx < cache_len[:, None]
    source = jnp.where(use_cache, source_cache[:, :L], source)
    wav = vocode(params["vocoder"], cfg, mel_gen, source)
    return wav, source
