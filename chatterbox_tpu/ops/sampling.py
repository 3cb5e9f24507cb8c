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


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Mask logits outside the nucleus (cumulative prob <= top_p).

    Fully vectorized: sort descending, keep tokens whose *preceding*
    cumulative mass is < top_p (so at least one token always survives).
    """
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(sorted_probs, axis=-1)
    cum_before = cum - sorted_probs
    keep_sorted = cum_before < top_p
    # Threshold logit: smallest kept logit per row.
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits >= thresh, logits, NEG_INF)


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
