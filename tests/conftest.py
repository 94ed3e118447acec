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


# --- fast tier (VERDICT r3 #6) ---------------------------------------------
# Core-correctness modules that together run in ~3 min on this 1-CPU host
# (measured 2026-08-20: 253 tests, 165 s). The heavy excluded modules are
# the sharded/TP/PV/Pallas exactness suites and soak-style e2e runs.
# Run with:  python -m pytest tests/ -m fast -q
# Full suite (~35 min) stays the round-end gate.
FAST_MODULES = {
    "test_graph", "test_serde", "test_mix", "test_chunkflow", "test_e2e",
    "test_editnodes", "test_session", "test_notifications",
    "test_server_page", "test_example_projects", "test_resample",
    "test_streaming", "test_stream_executor", "test_server",
    "test_wav_export", "test_examples", "test_bimix_alignment",
    "test_crossfade", "test_generator", "test_batch", "test_cancellation",
    "test_decode_fuzz", "test_editor_flows", "test_cli_platform",
}


def pytest_collection_modifyitems(config, items):
    import pathlib

    for item in items:
        if pathlib.Path(str(item.fspath)).stem in FAST_MODULES:
            item.add_marker(pytest.mark.fast)
