"""Host-side parameter initialization.

Initializing with per-tensor `jax.random.normal` calls issues one device op
per tensor; on a tunneled TPU runtime that is hundreds of round-trips and
made engine startup hang for minutes. Instead: derive a numpy Generator from
the JAX key (ONE device transfer) and build all init tensors on the host;
they move to HBM in a single `jax.device_put` of the finished pytree.
"""
from __future__ import annotations

import math
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp


def host_rng(key: jax.Array) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key)
    return np.random.default_rng(int(np.uint64(data.ravel()[-1])))


def rng_stream(key: jax.Array, n: int = 1024) -> Iterator[np.random.Generator]:
    """Independent child generators (mirrors iterating jax.random.split)."""
    base = host_rng(key)
    seeds = base.integers(0, 2**63, size=n, dtype=np.int64)
    for s in seeds:
        yield np.random.default_rng(int(s))


_SHAPE_ONLY = False


class shape_only_init:
    """Context manager: init functions return ShapeDtypeStructs instead of
    materializing tensors — used to build structural templates (e.g. for
    checkpoint loading) without RNG work or device allocation."""

    def __enter__(self):
        global _SHAPE_ONLY
        self._prev = _SHAPE_ONLY
        _SHAPE_ONLY = True

    def __exit__(self, *exc):
        global _SHAPE_ONLY
        _SHAPE_ONLY = self._prev


def buffer_init(value: np.ndarray, dtype) -> jnp.ndarray:
    """Deterministic (non-random) parameter buffer — e.g. a window function or
    sinusoid table that the checkpoint stores. Shape-only aware like
    dense_init so structural templates stay allocation-free."""
    if _SHAPE_ONLY:
        return jax.ShapeDtypeStruct(tuple(value.shape), jnp.dtype(dtype))
    return jnp.asarray(value, dtype=dtype)


def dense_init(rng: np.random.Generator, shape, dtype, scale: Optional[float] = None) -> jnp.ndarray:
    if _SHAPE_ONLY:
        return jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype))
    fan_in = shape[-2] if len(shape) >= 2 else shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(fan_in)
    arr = (rng.standard_normal(shape, dtype=np.float32) * scale)
    return jnp.asarray(arr, dtype=dtype)
