"""MCD / LSD parity-metric harness tests (synthetic signals)."""
import numpy as np

from chatterbox_tpu.audio.quality import log_spectral_distance, mel_cepstral_distortion
from chatterbox_tpu.utils import safe_delete_buffers


def _tone(freq, sr=24000, secs=1.0, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mcd_zero_for_identical():
    x = _tone(220)
    assert mel_cepstral_distortion(x, x, 24000) < 1e-6


def test_mcd_orders_similarity():
    x = _tone(220)
    near = _tone(233)   # ~1 semitone away
    far = _tone(1200)
    d_near = mel_cepstral_distortion(x, near, 24000)
    d_far = mel_cepstral_distortion(x, far, 24000)
    assert 0 < d_near < d_far


def test_lsd_monotone_with_noise():
    rng = np.random.default_rng(0)
    x = _tone(300)
    a = x + 0.01 * rng.standard_normal(len(x)).astype(np.float32)
    b = x + 0.2 * rng.standard_normal(len(x)).astype(np.float32)
    assert log_spectral_distance(x, a, 24000) < log_spectral_distance(x, b, 24000)


def test_mcd_handles_length_mismatch():
    x = _tone(220, secs=1.0)
    y = _tone(220, secs=0.8)
    assert np.isfinite(mel_cepstral_distortion(x, y, 24000))


def test_safe_delete_buffers():
    import jax.numpy as jnp

    tree = {"a": jnp.ones((4,)), "b": [jnp.zeros((2, 2))]}
    safe_delete_buffers(tree)
    safe_delete_buffers(tree)  # idempotent
