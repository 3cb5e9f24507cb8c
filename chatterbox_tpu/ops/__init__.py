from .nn import (
    rms_norm,
    layer_norm,
    rope_frequencies,
    apply_rope,
    causal_attention,
    swiglu,
    linear,
)
from .sampling import sample_token, top_p_filter

__all__ = [
    "rms_norm",
    "layer_norm",
    "rope_frequencies",
    "apply_rope",
    "causal_attention",
    "swiglu",
    "linear",
    "sample_token",
    "top_p_filter",
]
