"""ops/scans.py — the shared constant-coefficient scan engine.

Contract: the ``doubling`` and ``blocked`` forms compute the SAME
inclusive scan (AR(1), complex-modal rotation, max-plus) up to f32
re-association, each agreeing with a sequential float64/complex128
mirror; the auto dispatcher switches forms by length without changing
results beyond that bound; the blocked form's GEMMs pin HIGHEST
precision (the backend's silent bf16 default would quietly void every
floor here — ROUND4.md section 10).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodey_tpu.ops import scans

from conftest import snr_db


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.5 * rng.standard_normal((channels, n))).astype(np.float32)


def ar1_ref(x, pole):
    x = x.astype(np.float64)
    out = np.zeros_like(x)
    t = np.zeros(x.shape[0])
    for i in range(x.shape[1]):
        t = pole * t + x[:, i]
        out[:, i] = t
    return out


def rot_ref(xr, xi, pole):
    z = xr.astype(np.float64) + 1j * xi.astype(np.float64)
    out = np.zeros_like(z)
    t = np.zeros(z.shape[0], dtype=np.complex128)
    for i in range(z.shape[1]):
        t = complex(pole) * t + z[:, i]
        out[:, i] = t
    return out


def maxplus_ref(a, c):
    a = a.astype(np.float64)
    out = np.zeros_like(a)
    for ch in range(a.shape[0]):
        e = -np.inf
        for i in range(a.shape[1]):
            e = max(a[ch, i], e - c)
            out[ch, i] = e
    return out


# Lengths straddling the block structure: short (doubling), non-multiple
# of the 256 block width, and multi-block.
LENGTHS = [300, 1000, 4096, 5000]
POLES = [0.5, -0.3, 0.999]


@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("pole", POLES)
def test_ar1_forms_agree(monkeypatch, n, pole):
    x = noise(n)
    ref = ar1_ref(x, pole)
    outs = {}
    for form in ("doubling", "blocked"):
        monkeypatch.setenv("NODEY_SCAN_FORM", form)
        outs[form] = np.asarray(scans.ar1_scan(jnp.asarray(x), pole))
        assert snr_db(ref.astype(np.float32), outs[form]) > 110.0
    if n >= 2 * scans._W:
        # Both forms actually ran distinct programs; bound their gap.
        assert snr_db(outs["doubling"], outs["blocked"]) > 110.0


@pytest.mark.parametrize("n", [1000, 5000])
def test_rot_forms_agree(monkeypatch, n):
    pole = complex(0.9995 * np.cos(0.01), 0.9995 * np.sin(0.01))
    x = noise(n, seed=3)
    g = 0.37 - 0.21j
    xr = np.float32(g.real) * x
    xi = np.float32(g.imag) * x
    ref = rot_ref(xr, xi, pole)
    for form in ("doubling", "blocked"):
        monkeypatch.setenv("NODEY_SCAN_FORM", form)
        mr, mi = scans.rot_scan(jnp.asarray(xr), jnp.asarray(xi), pole)
        assert snr_db(ref.real.astype(np.float32), np.asarray(mr)) > 100.0
        assert snr_db(ref.imag.astype(np.float32), np.asarray(mi)) > 100.0


@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("c", [1e-4, 1e-2])
def test_maxplus_forms_agree(monkeypatch, n, c):
    rng = np.random.default_rng(7)
    # Log-domain-shaped input: mostly decaying with occasional spikes.
    a = (rng.standard_normal((2, n)) * 2.0 - 8.0).astype(np.float32)
    ref = maxplus_ref(a, c)
    for form in ("doubling", "blocked"):
        monkeypatch.setenv("NODEY_SCAN_FORM", form)
        out = np.asarray(scans.maxplus_scan(jnp.asarray(a), c))
        np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_blocked_gemm_pins_highest_precision(monkeypatch):
    """The scan GEMMs must never ride the backend's silent bf16 matmul
    default (ROUND4.md section 10)."""
    monkeypatch.setenv("NODEY_SCAN_FORM", "blocked")
    x = jnp.zeros((2, 4096), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v: scans.ar1_scan(v, 0.9))(x)
    dots = [e for e in jaxpr.eqns for _ in [0]
            if e.primitive.name == "dot_general"]
    assert dots, "blocked form should lower to dot_general"
    for e in dots:
        prec = e.params.get("precision")
        assert prec is not None and "HIGHEST" in str(prec), prec


def test_auto_dispatch_thresholds(monkeypatch):
    monkeypatch.delenv("NODEY_SCAN_FORM", raising=False)
    assert scans._form(512) == "doubling"
    assert scans._form(scans._BLOCK_THRESHOLD) == "blocked"
    # Forced blocked still refuses lengths too short to block.
    monkeypatch.setenv("NODEY_SCAN_FORM", "blocked")
    assert scans._form(100) == "doubling"
