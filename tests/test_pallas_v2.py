"""Head-major (v2) pallas decode attention vs the jnp reference (interpret)."""
import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.ops.pallas_attention_v2 import pallas_decode_attention_hmajor

NEG_INF = -1e9


def _reference(q, kc, vc, kn, vn, start, pos):
    B, H, S, Dh = kc.shape
    scale = 1.0 / np.sqrt(Dh)
    s = jnp.einsum("bhd,bhsd->bhs", q, kc) * scale
    idx = jnp.arange(S)[None, None, :]
    valid = (idx >= start[:, None, None]) & (idx < pos[:, None, None])
    s = jnp.where(valid, s, NEG_INF)
    ss = jnp.einsum("bhd,bhd->bh", q, kn)[..., None] * scale
    p = jax.nn.softmax(jnp.concatenate([s, ss], -1), -1)
    return jnp.einsum("bhs,bhsd->bhd", p[..., :S], vc) + p[..., S:] * vn


def test_v2_matches_reference_interpret():
    B, H, Dh, S = 2, 4, 64, 512
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, H, Dh), jnp.float32)
    kc = jax.random.normal(ks[1], (B, H, S, Dh), jnp.float32)
    vc = jax.random.normal(ks[2], (B, H, S, Dh), jnp.float32)
    kn = jax.random.normal(ks[3], (B, H, Dh), jnp.float32)
    vn = jax.random.normal(ks[4], (B, H, Dh), jnp.float32)
    start = jnp.array([0, 3], jnp.int32)
    pos = jnp.array([200, 400], jnp.int32)
    ref = np.asarray(_reference(q, kc, vc, kn, vn, start, pos))
    for block_s, view in ((128, None), (512, None), (128, 256)):
        got = np.asarray(
            pallas_decode_attention_hmajor(
                q, kc, vc, kn, vn, start, pos, block_s=block_s,
                interpret=True, s_view=view,
            )
        )
        if view is not None and int(pos.max()) > view:
            continue  # caller contract: pos <= view
        np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
