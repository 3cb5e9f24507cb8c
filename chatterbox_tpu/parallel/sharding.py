"""Sharding rules: parameter partition specs for the models.

Megatron-style tensor parallelism for the T3 llama backbone: attention
q/k/v and the MLP in-projections shard their OUTPUT feature dim on ``tp``
(column parallel); the attention out-projection and MLP down-projection shard
their INPUT dim (row parallel) so XLA inserts one psum per block on ICI.
Embeddings/heads shard the vocab dim; norms replicate. Batch rides ``dp``.
"""
from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES


def t3_param_specs() -> Dict:
    """PartitionSpec pytree matching init_t3_params' structure (perceiver
    subtree is added dynamically when present)."""
    tp = AXES.tp
    layers = {
        "attn_norm": P(),
        "mlp_norm": P(),
        "wq": P(None, None, tp),
        "wk": P(None, None, tp),
        "wv": P(None, None, tp),
        "wo": P(None, tp, None),
        "w_gate": P(None, None, tp),
        "w_up": P(None, None, tp),
        "w_down": P(None, tp, None),
    }
    return {
        # embeddings/heads replicated: the speech vocab (8194) is not
        # tp-divisible, and these are <2% of parameter bytes — the backbone
        # carries the tensor parallelism.
        "text_emb": P(),
        "speech_emb": P(),
        "text_pos": P(),
        "speech_pos": P(),
        "speech_head": {"w": P(), "b": P()},
        "text_head": {"w": P(), "b": P()},
        "cond": {
            "spkr": {"w": P(), "b": P()},
            "emotion": {"w": P(), "b": P()},
            "perceiver": None,  # filled from params structure (replicated)
        },
        "backbone": {"layers": layers, "final_norm": P()},
    }


def _match_tree(params: Dict, specs) -> Dict:
    """Fill in replicated specs for any subtree the rule table leaves None /
    missing, following the params structure."""
    if specs is None:
        return jax.tree.map(lambda _: P(), params)
    if isinstance(params, dict):
        return {
            k: _match_tree(v, specs.get(k) if isinstance(specs, dict) else None)
            for k, v in params.items()
        }
    return specs


def t3_param_sharding(params: Dict, mesh: Mesh) -> Dict:
    specs = _match_tree(params, t3_param_specs())
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXES.dp))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place a T3 params pytree onto the mesh per the TP rules."""
    return jax.device_put(params, t3_param_sharding(params, mesh))
