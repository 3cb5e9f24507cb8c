"""Mesh/sharding/training tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from chatterbox_tpu.models.t3 import T3Config, init_t3_params
from chatterbox_tpu.models.t3.model import cond_embeddings, t3_forward_train
from chatterbox_tpu.parallel import make_mesh, shard_params
from chatterbox_tpu.parallel.mesh import AXES
from chatterbox_tpu.training import make_train_step, t3_loss

CFG = T3Config.tiny().with_(
    hidden_size=128, num_heads=8, num_kv_heads=8, head_dim=16,
    intermediate_size=256, max_text_tokens=16, max_speech_tokens=32,
)


def _batch(B=4, T=8, S=16):
    return {
        "speaker_emb": jnp.zeros((B, CFG.speaker_embed_dim), jnp.float32),
        "prompt_tokens": jnp.zeros((B, CFG.speech_cond_prompt_len), jnp.int32),
        "emotion": jnp.full((B,), 0.5, jnp.float32),
        "text_tokens": jnp.zeros((B, T), jnp.int32),
        "speech_tokens": jnp.ones((B, S), jnp.int32),
        "speech_mask": jnp.ones((B, S), jnp.float32),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = make_mesh()  # default: all tp
    assert mesh.shape == {"dp": 1, "tp": 8}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=3)


def test_sharded_forward_matches_single_device():
    """TP-sharded forward must produce the same logits as unsharded."""
    params = init_t3_params(jax.random.PRNGKey(0), CFG)
    batch = _batch(B=2)

    def forward(p, b):
        cond = cond_embeddings(p, CFG, b["speaker_emb"], b["prompt_tokens"], b["emotion"])
        return t3_forward_train(p, CFG, cond, b["text_tokens"], b["speech_tokens"])

    ref = np.asarray(jax.jit(forward)(params, batch))

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh)
    b_shard = {k: jax.device_put(v, NamedSharding(mesh, P(AXES.dp))) for k, v in batch.items()}
    with mesh:
        out = np.asarray(jax.jit(forward)(sharded, b_shard))
    np.testing.assert_allclose(ref, out, atol=2e-4, rtol=1e-3)


def test_train_step_decreases_loss():
    params = init_t3_params(jax.random.PRNGKey(0), CFG)
    init_state, train_step = make_train_step(CFG, optax.adam(1e-3))
    state = init_state(params)
    batch = _batch()
    step = jax.jit(train_step)
    first = None
    for _ in range(5):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_sharded_train_step_runs():
    mesh = make_mesh(dp=2, tp=4)
    params = shard_params(init_t3_params(jax.random.PRNGKey(0), CFG), mesh)
    init_state, train_step = make_train_step(CFG, optax.adamw(1e-4))
    state = init_state(params)
    batch = {k: jax.device_put(v, NamedSharding(mesh, P(AXES.dp))) for k, v in _batch().items()}
    with mesh:
        state, metrics = jax.jit(train_step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state["step"]) == 1


def test_remat_forward_and_grads_match():
    """jax.checkpoint over the scanned layers is a pure memory/FLOPs trade:
    logits AND parameter gradients must be bit-compatible with the
    non-remat pass (same graph, recomputed activations)."""
    params = init_t3_params(jax.random.PRNGKey(1), CFG)
    batch = _batch(B=2)

    def loss(p, remat):
        cond = cond_embeddings(p, CFG, batch["speaker_emb"], batch["prompt_tokens"], batch["emotion"])
        logits = t3_forward_train(
            p, CFG, cond, batch["text_tokens"], batch["speech_tokens"], remat=remat
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, batch["speech_tokens"][..., None], axis=-1)[..., 0]
        return -(ll * batch["speech_mask"]).mean()

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(p, False)))(params)
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(p, True)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0, flat1 = jax.tree.leaves(g0), jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
