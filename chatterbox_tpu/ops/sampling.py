"""On-device token sampling: temperature, top-p, repetition penalty.

The reference's T3 samples on the host GPU inside the torch generator
(chatterbox pkg, consumed at /root/reference/src/tts_streaming.py:483-491).
On TPU, sampling must stay on device inside the jitted decode loop — a
host round-trip per token would destroy time-to-first-audio. These are pure
jnp functions used inside `lax.scan` decode bodies.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .nn import NEG_INF


def apply_repetition_penalty(
    logits: jnp.ndarray, token_counts: jnp.ndarray, penalty: float
) -> jnp.ndarray:
    """CTRL-style repetition penalty: divide positive logits (multiply
    negative) for every token already generated. token_counts: [B, V] > 0
    marks seen tokens."""
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def top_p_filter(logits: jnp.ndarray, top_p) -> jnp.ndarray:
    """Mask logits outside the nucleus (cumulative prob <= top_p) WITHOUT a
    full-vocab sort.

    The sort-based filter — keep the minimal descending-probability prefix
    whose mass reaches top_p, plus all ties of the crossing logit (reference
    semantics: the HF top_p warper consumed by inference_stream,
    /root/reference/src/tts_streaming.py:483-491) — is equivalent to
    thresholding at t* = max{t : mass{q_i >= t} >= top_p}: the crossing
    value IS that maximal threshold. t* is found by bisection on the
    unnormalized softmax masses: 30 fused compare+reduce passes over
    [..., V] instead of XLA's O(log^2 V) sorting-network passes (the sort
    dominated the decode step's sampling tail at V=8194 — BENCH_NOTES r4).
    Exact up to the bisection width (~max_prob * 2^-30): a token flips
    membership only if its probability sits within ~1e-9 of the nucleus
    boundary. At least one token (the argmax and its ties) always survives.

    ``top_p`` may be a Python float or an array broadcastable to
    ``logits.shape[:-1]`` (per-row nucleus mass).
    """
    p = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), logits.shape[:-1])
    e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    e_max = jnp.max(e, axis=-1)  # == 1.0 wherever any logit is finite
    target = p * jnp.sum(e, axis=-1)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(e >= mid[..., None], e, 0.0), axis=-1)
        ge = mass >= target  # mid still keeps enough mass -> raise lo
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, _ = jax.lax.fori_loop(
        0, 30, body, (jnp.zeros_like(target), e_max * 1.000001 + 1e-30)
    )
    # always keep the argmax (and its ties): degrades gracefully to greedy
    # as top_p -> 0 instead of producing an all -inf row
    keep = (e >= lo[..., None]) | (e >= e_max[..., None])
    return jnp.where(keep, logits, NEG_INF)


def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float | jnp.ndarray = 1.0,
    top_p: float | jnp.ndarray = 1.0,
) -> jnp.ndarray:
    """Sample token ids [B] from logits [B, V]. temperature<=0 means argmax.

    temperature/top_p may be traced scalars — control flow is jnp.where, not
    Python `if`, so one compiled graph serves all settings.
    """
    temperature = jnp.asarray(temperature, jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)
    safe_t = jnp.maximum(temperature, 1e-4)
    scaled = logits.astype(jnp.float32) / safe_t
    filtered = top_p_filter(scaled, jnp.minimum(jnp.asarray(top_p, jnp.float32), 1.0))
    sampled = jax.random.categorical(key, filtered, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled)
