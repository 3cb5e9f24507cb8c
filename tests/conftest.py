"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (mirrors the driver's
dryrun_multichip environment). Must run before any jax import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("CHATTERBOX_PRECOMPILE", "0")  # keep test loops quiet
os.environ.setdefault("CHATTERBOX_COMPILE_CACHE", "0")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS, so force the CPU backend
# explicitly (tests emulate an 8-device mesh on CPU).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_voice_dirs(tmp_path, monkeypatch):
    voices = tmp_path / "voices"
    preloaded = tmp_path / "preloaded-voices"
    voices.mkdir()
    preloaded.mkdir()
    return str(voices), str(preloaded)
