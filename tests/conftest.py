"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so every sharded code path is
exercised without TPU hardware — the single-host multi-device simulation the
survey prescribes (SURVEY.md §4.4). Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This image's sitecustomize force-registers the axon TPU plugin and pins
# jax_platforms="axon,cpu"; an explicit config update (not just the env var)
# is required to keep tests off the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_tone(rate=44_100, seconds=1.0, freq=440.0, channels=1, amplitude=0.5):
    """Synthesize a sine test clip as float32 [channels, n]."""
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64) / rate
    base = amplitude * np.sin(2 * np.pi * freq * t)
    if channels == 2:
        data = np.stack([base, amplitude * np.sin(2 * np.pi * freq * 1.5 * t)])
    else:
        data = base[None, :]
    return data.astype(np.float32)


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `reference` in dB."""
    reference = np.asarray(reference, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    noise = reference - test
    denom = np.sum(noise**2)
    if denom == 0:
        return float("inf")
    return float(10.0 * np.log10(np.sum(reference**2) / denom))
