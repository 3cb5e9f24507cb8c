"""Native audiokit tests: build, correctness vs the Python reference paths."""
import numpy as np
import pytest

from chatterbox_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_pcm16_matches_numpy(rng):
    x = rng.uniform(-1.5, 1.5, 4096).astype(np.float32)
    got = np.frombuffer(native.float_to_pcm16(x), dtype="<i2")
    ref = (np.clip(x, -1, 1) * 32767.0)
    # native uses round-to-nearest; numpy astype truncates — allow off-by-one
    assert np.abs(got - ref).max() <= 1.0


def test_crossfade_mix_matches_curves():
    from chatterbox_tpu.audio.crossfade import equal_power_curves

    n = 720
    a = np.full(n, 0.5, np.float32)
    b = np.full(n, -0.25, np.float32)
    got = native.crossfade_mix(a, b)
    fo, fi = equal_power_curves(n)
    np.testing.assert_allclose(got, a * fo + b * fi, atol=1e-5)


def test_resample_tone():
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample_poly(x, 2, 3)  # 24k -> 16k
    assert abs(len(y) - sr_out) <= 2
    spec = np.abs(np.fft.rfft(y[200:-200]))
    peak_hz = np.argmax(spec) * sr_out / len(y[200:-200])
    assert abs(peak_hz - 440) < 5
    # amplitude preserved within a few percent
    assert abs(np.abs(y[200:-200]).max() - 1.0) < 0.05


def test_resample_matches_scipy_closely():
    from scipy.signal import resample_poly as scipy_resample

    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000).astype(np.float32)
    # band-limit the test signal so both filters see in-band content
    from scipy.signal import butter, filtfilt

    b, a = butter(8, 0.3)
    x = filtfilt(b, a, x).astype(np.float32)
    ours = native.resample_poly(x, 2, 3)
    theirs = scipy_resample(x.astype(np.float64), 2, 3)
    n = min(len(ours), len(theirs))
    err = np.abs(ours[100 : n - 100] - theirs[100 : n - 100]).max()
    assert err < 5e-3, err


def test_upsample_path():
    x = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    y = native.resample_poly(x, 3, 2)  # 16k -> 24k
    assert abs(len(y) - 24000) <= 2
