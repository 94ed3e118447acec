"""Device-built PV DFT bases (VERDICT r4 #5): the offline phase-vocoder
program must not bake O(10-100 MB) basis/projection literals into its
executable (a 128 MB cache entry re-shipped through the relay per fresh
process — ROUND6.md §16). On TPU the bases are built in-program from
int32 iota + trig (+ one K-independent GEMM fold); these tests pin, on
CPU:

1. component parity of every device builder vs its float64 host twin;
2. end-to-end quality parity: the device-basis render sits at the SAME
   distance from the float64 reference mirror as the host-basis render
   (the PV tail amplifies ANY uncorrelated 1e-7-level plane perturbation
   to ~35-40 dB waveform SNR — measured, inherent to phase
   re-integration — so waveform SNR between the two f32 formulations is
   the wrong metric; distance-to-truth is the invariant);
3. the compiled executable carries NO large f32 constants under
   NODEY_PV_BASIS=device (the structural guarantee this whole feature
   exists for).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nodey_tpu.ops import pv

from conftest import snr_db

RATE = 48_000


def _signal(seconds=2.0, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * RATE)
    t = np.arange(n) / RATE
    x = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + 0.15 * np.sin(2 * np.pi * 1867.0 * t + 0.3)
        + noise * rng.standard_normal(n)
    ).astype(np.float32)
    return np.stack([x, np.roll(x, 7)]).astype(np.float32)


def test_basis_backend_dispatch(monkeypatch):
    monkeypatch.delenv("NODEY_PV_BASIS", raising=False)
    assert pv._basis_backend() == "host"  # CPU test backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert pv._basis_backend() == "device"
    monkeypatch.setenv("NODEY_PV_BASIS", "host")
    assert pv._basis_backend() == "host"
    monkeypatch.setenv("NODEY_PV_BASIS", "device")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert pv._basis_backend() == "device"


def test_dft_trig_dev_matches_host():
    """Exact-int32 range reduction: device trig tables match the float64
    host tables to f32 rounding even at the matrix corner, where naive
    f32 cos(r*c*w) loses ~4 digits of phase."""
    for rows, cols, mod in ((2176, 1089, 2176), (1025, 2048, 2048)):
        cos_d, sin_d = jax.jit(
            lambda r=rows, c=cols, m=mod: pv._dft_trig_dev(r, c, m)
        )()
        k = np.arange(rows, dtype=np.float64)[:, None] * np.arange(cols)[
            None, :
        ]
        ang = 2.0 * np.pi * k / mod
        assert snr_db(np.cos(ang), np.asarray(cos_d)) > 120.0
        assert snr_db(np.sin(ang), np.asarray(sin_d)) > 120.0


def test_device_component_parity():
    n_fft = 2048
    bins = n_fft // 2 + 1
    # Window.
    wd = np.asarray(jax.jit(lambda: pv._pv_window_dev(n_fft))())
    assert snr_db(pv._pv_window(n_fft), wd) > 120.0
    # Shift-theorem matrices (incl. the in-program GEMM folds).
    host = pv._shift_matrices(n_fft)
    dev = jax.jit(lambda: pv._shift_matrices_dev(n_fft))()
    for name, h, d in zip(
        ("cosL", "sinL", "Mrr", "Mir", "Mrs", "Mis"), host, dev
    ):
        assert snr_db(h, np.asarray(d)) > 115.0, name
    # Inverse bases as _pv_synth builds them.
    cos_i, sin_i = jax.jit(lambda: pv._dft_trig_dev(bins, n_fft, n_fft))()
    cval = np.full((bins, 1), 2.0 / n_fft, np.float32)
    cval[0, 0] = cval[-1, 0] = 1.0 / n_fft
    ih, jh = pv._idft_matrices(n_fft)
    assert snr_db(ih, np.asarray(cos_i) * cval) > 120.0
    assert snr_db(jh, -np.asarray(sin_i) * cval) > 120.0


def test_ola_denominator_edges_match_full():
    """The piecewise denominator (head ramp / exact 1.5 interior / tail
    ramp) equals the full per-K host constant for any K >= 8."""
    for n_fft in (1024, 2048):
        hop = n_fft // 4
        head, tail = pv._ola_denominator_edges(n_fft)
        for K in (8, 23, 100):
            full = pv._ola_denominator(K, n_fft)
            np.testing.assert_array_equal(full[: 3 * hop], head)
            np.testing.assert_array_equal(full[-3 * hop:], tail)
            np.testing.assert_allclose(
                full[3 * hop: -3 * hop], 1.5, rtol=0, atol=1e-6
            )


@pytest.mark.parametrize("fwd", ["shift", "gather"])
def test_device_basis_quality_parity(fwd, monkeypatch):
    """Equal distance to the float64 reference: the device-basis f32
    render must be as close to the f64 mirror as the host-basis f32
    render (within 1.5 dB), with identical output length."""
    monkeypatch.setenv("NODEY_PV_FWD_FORCE", fwd)
    data = _signal()
    N = data.shape[1]
    dj = jnp.asarray(data)
    ref = pv.pv_stretch_reference(data, 0.8, RATE)
    monkeypatch.setenv("NODEY_PV_BASIS", "host")
    a, la = pv.pv_stretch_at_rate(dj, N, 0.8, RATE)
    monkeypatch.setenv("NODEY_PV_BASIS", "device")
    b, lb = pv.pv_stretch_at_rate(dj, N, 0.8, RATE)
    assert int(la) == int(lb)
    n = min(ref.shape[1], a.shape[1])
    snr_host = snr_db(ref[:, :n], np.asarray(a)[:, :n])
    snr_dev = snr_db(ref[:, :n], np.asarray(b)[:, :n])
    assert snr_dev > snr_host - 1.5, (snr_host, snr_dev)
    assert snr_dev > 35.0


def test_device_basis_executable_has_no_large_constants(monkeypatch):
    """The structural criterion: under NODEY_PV_BASIS=device the offline
    PV program's optimized HLO contains no f32 constant above 200 KB
    (host-basis literals for this shape total ~56 MB)."""
    monkeypatch.setenv("NODEY_PV_BASIS", "device")
    monkeypatch.setenv("NODEY_PV_FWD_FORCE", "shift")
    data = jnp.zeros((2, 2 * RATE), jnp.float32)
    fn = jax.jit(
        lambda d: pv.pv_stretch_at_rate(d, 2 * RATE, 0.8, RATE)
    )
    txt = fn.lower(data).compile().as_text()
    offenders = []
    for line in txt.splitlines():
        if "constant(" not in line or "= f32[" not in line:
            continue
        shape = line.split("f32[", 1)[1].split("]", 1)[0]
        dims = [int(d) for d in shape.split(",") if d.strip().isdigit()]
        n = int(np.prod(dims)) if dims else 1
        if n * 4 > 200_000:
            offenders.append(shape)
    assert offenders == [], offenders


def test_streaming_step_unaffected_by_basis_backend(monkeypatch):
    """The chunked streaming step keeps its own (small, fixed-shape)
    host-literal math — the offline/streamed formulation split is
    documented in PARITY.md; here we pin that flipping NODEY_PV_BASIS
    does not change the streamed output at all."""
    from nodey_tpu.ops import chunkops  # noqa: F401  (import side effects)

    data = _signal(seconds=1.0)
    C, N = data.shape
    plan = pv.pv_stream_plan(1.26, 48_000, push_cap=4096)
    outs = []
    for basis in ("host", "device"):
        monkeypatch.setenv("NODEY_PV_BASIS", basis)
        state = pv.pv_stream_init(plan, C)
        step = jax.jit(
            lambda s, d, n, done, _p=plan: pv.pv_stream_step(
                _p, s, d, n, done
            )
        )
        pos, pieces, done = 0, [], False
        while not done:
            block = np.zeros((C, 4096), np.float32)
            n = min(4096, N - pos)
            if n > 0:
                block[:, :n] = data[:, pos: pos + n]
            pos += max(n, 0)
            state, out, out_n, out_done = step(
                state, jnp.asarray(block), jnp.int32(max(n, 0)),
                jnp.bool_(pos >= N),
            )
            if int(out_n):
                pieces.append(np.asarray(out)[:, : int(out_n)])
            done = bool(out_done)
        outs.append(np.concatenate(pieces, axis=1))
    np.testing.assert_array_equal(outs[0], outs[1])
