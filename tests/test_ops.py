"""Sampling / numerics op tests."""
import jax
import jax.numpy as jnp
import numpy as np

from chatterbox_tpu.ops.sampling import apply_repetition_penalty, sample_token, top_p_filter


def test_top_p_keeps_at_least_one():
    logits = jnp.array([[10.0, 0.0, -5.0]])
    out = top_p_filter(logits, 0.01)
    # Highest-prob token always survives
    assert np.isfinite(np.asarray(out)[0, 0])
    assert np.asarray(out)[0, 1] < -1e8


def test_top_p_one_keeps_all():
    logits = jnp.array([[1.0, 0.5, 0.1, -2.0]])
    out = top_p_filter(logits, 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(logits))


def test_sample_greedy_at_zero_temperature():
    logits = jnp.array([[0.1, 3.0, 0.2], [5.0, 0.0, 0.0]])
    tok = sample_token(jax.random.PRNGKey(0), logits, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(tok), [1, 0])


def test_sample_distribution_roughly_matches():
    logits = jnp.log(jnp.array([[0.7, 0.2, 0.1]]))
    keys = jax.random.split(jax.random.PRNGKey(0), 500)
    toks = np.asarray(
        jax.vmap(lambda k: sample_token(k, logits, temperature=1.0))(keys)
    ).ravel()
    freq = np.bincount(toks, minlength=3) / len(toks)
    assert abs(freq[0] - 0.7) < 0.08


def test_repetition_penalty_direction():
    logits = jnp.array([[2.0, -2.0, 1.0]])
    counts = jnp.array([[1, 1, 0]])
    out = np.asarray(apply_repetition_penalty(logits, counts, 2.0))
    assert out[0, 0] == 1.0      # positive logit divided
    assert out[0, 1] == -4.0     # negative logit multiplied
    assert out[0, 2] == 1.0      # unseen untouched
