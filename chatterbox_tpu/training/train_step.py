"""T3 training step (teacher-forced speech-token cross entropy).

The reference is an inference-only stack, but the rebuilt framework ships a
training path so the model can be fine-tuned / distilled on TPU pods: the
step jits end-to-end over a (dp, tp) mesh — parameters tensor-sharded per
parallel/sharding.py, batch data-sharded — and XLA inserts the psum/all-gather
collectives over ICI.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.t3.config import T3Config
from ..models.t3.model import cond_embeddings, t3_forward_train


def t3_loss(
    params: Dict,
    cfg: T3Config,
    batch: Dict,
) -> jnp.ndarray:
    """Masked CE over speech tokens. batch: speaker_emb [B,S], prompt_tokens
    [B,P], emotion [B], text [B,T], speech [B,S], speech_mask [B,S]."""
    cond = cond_embeddings(
        params, cfg, batch["speaker_emb"], batch["prompt_tokens"], batch["emotion"]
    )
    logits = t3_forward_train(
        params, cfg, cond, batch["text_tokens"], batch["speech_tokens"],
        text_len=batch.get("text_len"),
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, batch["speech_tokens"][..., None], axis=-1)[..., 0]
    mask = batch["speech_mask"].astype(jnp.float32)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(cfg: T3Config, optimizer: optax.GradientTransformation):
    """Returns (init_state, train_step). train_step is jit-compatible and
    mesh-agnostic: placement of params/batch drives the parallelism."""

    def init_state(params: Dict):
        return {"params": params, "opt_state": optimizer.init(params), "step": jnp.zeros((), jnp.int32)}

    def train_step(state: Dict, batch: Dict) -> Tuple[Dict, Dict]:
        loss, grads = jax.value_and_grad(t3_loss)(state["params"], cfg, batch)
        updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        gnorm = optax.global_norm(grads)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return init_state, train_step
