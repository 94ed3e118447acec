"""The Pallas identity-lock kernel (ops/pallas_lock.py) vs the XLA
Hillis-Steele path (pv._lock_to_peaks), interpreter mode on CPU.

The last-valid combine only SELECTS seed values, so every scan order is
bitwise-identical; in interpret mode the rotation transcendentals are
XLA's too, so the whole kernel must match the JITTED XLA path EXACTLY
(the production lock always runs inside jit; the eager reference differs
from its own jitted self by FMA contraction in the final rotation —
measured 6e-8, so the jitted form is the comparison target). The TPU
bench A/Bs the compiled kernel on hardware (tempo_stage_ab metric)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.ops import pv
from nodey_tpu.ops.pallas_lock import lock_to_peaks_pallas

_lock_jit = jax.jit(pv._lock_to_peaks)


def _planes(C, K, B, seed=0, silent_rows=()):
    """Random phasor planes shaped like _pv_impl's lock inputs."""
    rng = np.random.default_rng(seed)
    phi = rng.uniform(-np.pi, np.pi, (C, K, B)).astype(np.float32)
    ph_in = rng.uniform(-np.pi, np.pi, (C, K, B)).astype(np.float32)
    # Smooth-ish magnitudes so peaks are sparse like real spectra.
    mag = np.abs(
        np.cumsum(rng.standard_normal((C, K, B)), axis=-1)
    ).astype(np.float32)
    for r in silent_rows:
        mag[:, r, :] = 0.0  # constant row: no strict local maxima at all
    return (
        jnp.asarray(np.cos(phi)),
        jnp.asarray(np.sin(phi)),
        jnp.asarray(ph_in),
        jnp.asarray(mag),
    )


@pytest.mark.parametrize(
    "C,K,B",
    [
        (2, 37, 1025),   # 44.1/48 kHz bin count; rows not a tile multiple
        (1, 64, 257),    # 8 kHz bin count
        (2, 5, 129),     # tiny
    ],
)
def test_lock_kernel_bitwise_vs_xla(C, K, B):
    cos_phi, sin_phi, ph_in, mag = _planes(C, K, B)
    ref = _lock_jit(cos_phi, sin_phi, ph_in, mag)
    got = lock_to_peaks_pallas(cos_phi, sin_phi, ph_in, mag,
                               interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_lock_kernel_silent_frames():
    """Constant (silent) rows still produce a bin-0 "peak" under the
    -1.0 edge-fill semantics (0 > -1 at the left edge), so every bin of
    the row locks to bin 0 — identically in both formulations. What
    matters is that the degenerate geometry takes the same selects."""
    cos_phi, sin_phi, ph_in, mag = _planes(
        2, 16, 1025, seed=3, silent_rows=(0, 7, 15)
    )
    ref = _lock_jit(cos_phi, sin_phi, ph_in, mag)
    got = lock_to_peaks_pallas(cos_phi, sin_phi, ph_in, mag,
                               interpret=True)
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    # Silent rows: bin 0 is the adopted peak, so bin 0 keeps its phasor.
    oc = np.asarray(got[0])
    np.testing.assert_array_equal(
        oc[:, 0, 0], np.asarray(cos_phi)[:, 0, 0]
    )


def test_dispatcher_routes_by_env(monkeypatch):
    """lock_phases honors NODEY_PV_LOCK_FORCE and matches both ways on
    CPU (interpret kernel == XLA path bitwise)."""
    cos_phi, sin_phi, ph_in, mag = _planes(1, 8, 257, seed=5)
    # Distinct jit wrappers: the env var is read at trace time, and the
    # production call sites are always jitted (eager XLA differs from its
    # own jitted self by FMA contraction).
    monkeypatch.setenv("NODEY_PV_LOCK_FORCE", "xla")
    a = jax.jit(lambda *t: pv.lock_phases(*t))(cos_phi, sin_phi, ph_in, mag)
    monkeypatch.setenv("NODEY_PV_LOCK_FORCE", "pallas")
    b = jax.jit(lambda *t: pv.lock_phases(*t))(cos_phi, sin_phi, ph_in, mag)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vmap_composes(monkeypatch):
    """The kernel batches under vmap (the dp run_batch path vmaps whole
    PV programs on TPU, where the pallas route is the default; CPU suite
    runs it in interpret mode — the batching rule is the same jax-level
    transform either way) and stays bitwise-equal to the XLA lock."""
    rng = np.random.default_rng(11)
    xb = jnp.asarray(
        (0.3 * rng.standard_normal((3, 2, 12_000))).astype(np.float32)
    )

    def stretch(c):
        return pv.pv_stretch_at_rate(c, jnp.int32(c.shape[1]), 1.25, 48_000)

    monkeypatch.setenv("NODEY_PV_LOCK_FORCE", "pallas")
    out_p, n_p = jax.vmap(stretch)(xb)
    monkeypatch.setenv("NODEY_PV_LOCK_FORCE", "xla")
    out_x, n_x = jax.vmap(stretch)(xb)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), rtol=0, atol=3e-7
    )
