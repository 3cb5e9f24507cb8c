from .config import T3Config
from .model import (
    init_t3_params,
    cond_embeddings,
    t3_prefill,
    t3_decode_slice,
    make_decode_state,
)

__all__ = [
    "T3Config",
    "init_t3_params",
    "cond_embeddings",
    "t3_prefill",
    "t3_decode_slice",
    "make_decode_state",
]
