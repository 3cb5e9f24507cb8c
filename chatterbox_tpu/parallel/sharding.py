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
    if isinstance(params, (list, tuple)):
        out = [
            _match_tree(
                v,
                specs[i] if isinstance(specs, (list, tuple)) and i < len(specs) else None,
            )
            for i, v in enumerate(params)
        ]
        return type(params)(out) if isinstance(params, tuple) else out
    return specs


def t3_param_sharding(params: Dict, mesh: Mesh) -> Dict:
    specs = _match_tree(params, t3_param_specs())
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def s3gen_ref_param_specs(cfg) -> Dict:
    """TP rules for the checkpoint-compatible S3Gen (the serving-heavy half):

    * flow conformer blocks: attention q/k/v/pos column-parallel on heads,
      out row-parallel; feed-forward w1 column / w2 row (one psum per block);
      pos_bias u/v shard the head dim.
    * CFM estimator transformer blocks: to_q/k/v column, to_out row; GEGLU-
      free ff1 column / ff2 row. Resnet convs: block1 column (Cout), block2
      row (Cin); group-norm groups stay shard-local for tp ≤ 8 (256/8 ch per
      group). time-MLP projections follow block1's column sharding.
    * tokenizer / CAMPPlus / HiFT / embeddings replicate (embed_ref runs per
      voice, HiFT is 7% of flow FLOPs — not worth the collectives).
    """
    tp = AXES.tp

    def conformer():
        return {
            "attn": {
                "q": {"w": P(None, tp), "b": P(tp)},
                "k": {"w": P(None, tp), "b": P(tp)},
                "v": {"w": P(None, tp), "b": P(tp)},
                "out": {"w": P(tp, None), "b": P()},
                "pos": {"w": P(None, tp)},
                "bias_u": P(tp, None),
                "bias_v": P(tp, None),
            },
            "norm_mha": None,
            "ff": {"w1": {"w": P(None, tp), "b": P(tp)}, "w2": {"w": P(tp, None), "b": P()}},
            "norm_ff": None,
        }

    def tf_block():
        return {
            "norm1": None,
            "to_q": {"w": P(None, tp)},
            "to_k": {"w": P(None, tp)},
            "to_v": {"w": P(None, tp)},
            "to_out": {"w": P(tp, None), "b": P()},
            "norm3": None,
            "ff1": {"w": P(None, tp), "b": P(tp)},
            "ff2": {"w": P(tp, None), "b": P()},
        }

    def resnet():
        return {
            "mlp": {"w": P(None, tp), "b": P(tp)},
            "block1": {"conv": {"w": P(None, None, tp), "b": P(tp)}, "gn": None},
            "block2": {"conv": {"w": P(None, tp, None), "b": P()}, "gn": None},
            "res": {"w": P(None, None, None), "b": P()},
        }

    fl = cfg.flow
    return {
        "tokenizer": None,
        "speaker": None,
        "mel2wav": None,
        "flow": {
            "input_emb": P(),
            "spk_affine": None,
            "encoder_proj": None,
            "encoder": {
                "embed": None,
                "lookahead": None,
                "up_conv": None,
                "up_embed": None,
                "after_norm": None,
                "blocks": [conformer() for _ in range(fl.num_blocks)],
                "up_blocks": [conformer() for _ in range(fl.num_up_blocks)],
            },
            "estimator": {
                "time_mlp": None,
                "down": {"resnet": resnet(), "tf": [tf_block() for _ in range(fl.dec_n_blocks)], "conv": None},
                "mid": [
                    {"resnet": resnet(), "tf": [tf_block() for _ in range(fl.dec_n_blocks)]}
                    for _ in range(fl.dec_num_mid_blocks)
                ],
                "up": {"resnet": resnet(), "tf": [tf_block() for _ in range(fl.dec_n_blocks)], "conv": None},
                "final": None,
                "proj": None,
            },
        },
    }


def _spec_is_shardable(spec: P, shape, mesh: Mesh) -> bool:
    """A spec applies only if every named axis divides its dimension."""
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            continue
        for name in (names if isinstance(names, tuple) else (names,)):
            size = mesh.shape[name]
            if dim % size:
                return False
    return True


def s3gen_ref_param_sharding(params: Dict, cfg, mesh: Mesh) -> Dict:
    specs = _match_tree(params, s3gen_ref_param_specs(cfg))
    # tiny test configs may not divide by tp — fall back to replication per leaf
    fixed = jax.tree.map(
        lambda leaf, s: s if _spec_is_shardable(s, leaf.shape, mesh) else P(),
        params, specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), fixed,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXES.dp))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """Place a T3 params pytree onto the mesh per the TP rules."""
    return jax.device_put(params, t3_param_sharding(params, mesh))


def shard_s3gen_ref_params(params: Dict, cfg, mesh: Mesh) -> Dict:
    """Place an s3gen_ref params pytree onto the mesh per the TP rules."""
    return jax.device_put(params, s3gen_ref_param_sharding(params, cfg, mesh))
