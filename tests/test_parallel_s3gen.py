"""Tensor-parallel serving of the checkpoint-compatible S3Gen.

The TP rules (parallel/sharding.py::s3gen_ref_param_specs) column/row-shard
the flow conformer and CFM-estimator projections; this runs the full
s3gen_ref inference on an emulated tp mesh and requires the sharded result
to match the single-device one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chatterbox_tpu.models.s3gen_ref import (
    S3GenRefConfig,
    init_s3gen_ref_params,
    s3gen_ref_inference,
)
from chatterbox_tpu.parallel import make_mesh
from chatterbox_tpu.parallel.sharding import shard_s3gen_ref_params

CFG = S3GenRefConfig.tiny()


def _ref_dict():
    rng = np.random.default_rng(3)
    P, Pm = CFG.max_prompt_tokens, CFG.max_prompt_mel
    return {
        "spk_emb": jnp.asarray(rng.standard_normal((1, CFG.spk_dim)), jnp.float32),
        "prompt_tokens": jnp.asarray(rng.integers(0, 100, (1, P)), jnp.int32),
        "prompt_len": jnp.array([P], jnp.int32),
        "prompt_mel": jnp.asarray(rng.standard_normal((1, Pm, 80)) * 0.1, jnp.float32),
        "prompt_mel_len": jnp.array([Pm], jnp.int32),
    }


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_sharded_inference_matches_single_device(tp):
    if len(jax.devices()) < tp:
        pytest.skip("needs virtual devices")
    params = init_s3gen_ref_params(jax.random.PRNGKey(0), CFG)
    ref = _ref_dict()
    T = 4
    spt = CFG.samples_per_token
    args = (
        jnp.asarray(np.arange(T)[None], jnp.int32), jnp.array([T], jnp.int32),
        ref, jnp.zeros((1, T * spt)), jnp.array([0], jnp.int32),
        jax.random.PRNGKey(5),
    )
    want, want_src = s3gen_ref_inference(params, CFG, *args)

    mesh = make_mesh(dp=1, tp=tp, devices=jax.devices()[:tp])
    sharded = shard_s3gen_ref_params(params, CFG, mesh)
    got, got_src = jax.jit(
        lambda p, *a: s3gen_ref_inference(p, CFG, *a)
    )(sharded, *args)
    # excitation path is tanh-bounded → tight; the random-init vocoder's exp
    # head amplifies f32 reassociation across sharded matmuls → loose + corr
    # (same convention as test_s3gen_scheduler)
    np.testing.assert_allclose(np.asarray(got_src), np.asarray(want_src), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2)
    corr = np.corrcoef(np.asarray(got)[0], np.asarray(want)[0])[0, 1]
    assert corr > 0.999, corr


def test_tp_specs_actually_shard_at_full_size():
    """At the full config every conformer/estimator projection must actually
    shard (no silent fall-back to replication)."""
    from chatterbox_tpu.parallel.sharding import (
        _match_tree,
        _spec_is_shardable,
        s3gen_ref_param_specs,
    )
    from jax.sharding import PartitionSpec as P

    cfg = S3GenRefConfig()
    from chatterbox_tpu.ops.initializers import shape_only_init

    with shape_only_init():
        params = init_s3gen_ref_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    specs = _match_tree(params, s3gen_ref_param_specs(cfg))
    bad = []

    def walk(p, s, path):
        if isinstance(p, dict):
            for k in p:
                walk(p[k], s[k], path + (k,))
        elif isinstance(p, (list, tuple)):
            for i in range(len(p)):
                walk(p[i], s[i], path + (i,))
        else:
            if s != P() and not _spec_is_shardable(s, p.shape, mesh):
                bad.append((path, p.shape, s))

    walk(params, specs, ())
    assert not bad, bad[:5]
    flow_specs = specs["flow"]["encoder"]["blocks"][0]["attn"]["q"]["w"]
    assert flow_specs != P()
