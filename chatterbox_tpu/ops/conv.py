"""1-D convolution helpers (NTC layout) for the audio models."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def conv1d(
    x: jnp.ndarray,            # [B, T, Cin]
    w: jnp.ndarray,            # [K, Cin, Cout]
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "SAME",     # "SAME" | "VALID" | "CAUSAL" | "SAME_TORCH"
    groups: int = 1,
) -> jnp.ndarray:
    K = w.shape[0]
    if x.dtype != w.dtype:  # weights define the compute precision (bf16 policy)
        x = x.astype(w.dtype)
    if padding == "CAUSAL":
        pad_amt = (K - 1) * dilation
        x = jnp.pad(x, ((0, 0), (pad_amt, 0), (0, 0)))
        pad = "VALID"
    elif padding == "SAME_TORCH":
        # torch Conv1d(padding=(K-1)//2 * dilation): symmetric explicit pad.
        # Differs from XLA "SAME" when stride > 1 (XLA right-biases the pad),
        # so strided convs converted from torch checkpoints must use this.
        p = (K - 1) // 2 * dilation
        x = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
        pad = "VALID"
    else:
        pad = padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jnp.ndarray,            # [B, T, Cin]
    w: jnp.ndarray,            # [K, Cin, Cout]
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
) -> jnp.ndarray:
    """Transposed conv with output length T*stride (HiFiGAN-style upsampling:
    kernel K, stride s, pad (K-s)//2 — requires (K-s) even).

    Matches torch ``conv_transpose1d`` exactly for a kernel in [K, Cin, Cout]
    layout (torch's [Cin, Cout, K] moved-axis): lax.conv_transpose correlates
    where torch's transposed conv convolves, so the kernel is flipped along
    the spatial axis here."""
    K = w.shape[0]
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    pad_total = K - stride
    pad_lo = pad_total // 2
    pad_hi = pad_total - pad_lo
    y = jax.lax.conv_transpose(
        x,
        w[::-1],
        strides=(stride,),
        padding=((K - 1 - pad_lo, K - 1 - pad_hi),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=False,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b
    return y
