"""The fused phase-path kernel (ops/pallas_phase.py) vs pv's XLA
formulation, interpreter mode on CPU.

The kernel's peak/lock DECISIONS are bitwise the XLA path's (identical
magnitude compares, shared ``_lock_tile`` body), but the phasor prefix
composes its complex products in a different association order than
``lax.associative_scan``'s odd-even recursion, so outputs agree to f32
round-off rather than bitwise: tests pin >=100 dB SNR on the planes and
>=95 dB on full PV stretches (reassociation noise random-walks with K,
~106 dB measured at K=150).  The TPU bench A/Bs the compiled kernel
on hardware (pv_phase_fused speedup metric)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from conftest import snr_db
from nodey_tpu.ops import pv
from nodey_tpu.ops.pallas_phase import phase_path_pallas


def _planes_from_audio(seconds, tempo, rate, seed=0):
    """Real forward-DFT planes + geometry for structured audio."""
    rng = np.random.default_rng(seed)
    N = int(seconds * rate)
    t = np.arange(N) / rate
    x = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.3 * np.sin(2 * np.pi * 1234.5 * t + 0.7)
        + 0.05 * rng.standard_normal(N)
    ).astype(np.float32)
    data = np.stack([x, np.roll(x, 17)])
    n_fft, hop, pos, dpos, pad_to = pv._pv_geometry(N, tempo, rate)
    w = pv._pv_window(n_fft)
    from nodey_tpu.ops.stft import _dft_matrices

    cos_m, sin_m = _dft_matrices(n_fft)
    xp = np.pad(data, ((0, 0), (0, max(0, pad_to - N))))
    frames = np.stack(
        [xp[:, p : p + n_fft] for p in pos], axis=1
    ) * w[None, None, :]
    re = frames @ cos_m
    im = frames @ sin_m
    return (
        jnp.asarray(re.astype(np.float32)),
        jnp.asarray(im.astype(np.float32)),
        n_fft,
        hop,
        dpos,
    )


def _xla_planes(re, im, dpos, hop, n_fft, lock):
    """pv._pv_impl's XLA mid-section, extracted verbatim, jitted."""

    def f(re, im):
        bins = n_fft // 2 + 1
        mag = jnp.sqrt(re * re + im * im)
        ph = jnp.arctan2(im, re)
        b_i = jnp.arange(bins, dtype=jnp.int32)
        dpos_i = jnp.asarray(dpos[1:].astype(np.int32))
        omega_dpos = (
            (b_i[None, :] * dpos_i[:, None]) % n_fft
        ).astype(jnp.float32) * np.float32(pv._TWO_PI / n_fft)
        ph_d = ph[:, 1:] - ph[:, :-1]
        dphi = ph_d - omega_dpos[None]
        wrapped = dphi - pv._TWO_PI * jnp.round(dphi / pv._TWO_PI)
        hop_over_dpos = jnp.asarray(
            (float(hop) / dpos[1:, None]).astype(np.float32)
        )
        omega_hop = np.mod(
            np.arange(bins) * hop, n_fft
        ).astype(np.float64) * (pv._TWO_PI / n_fft)
        adv = (
            jnp.asarray(omega_hop.astype(np.float32))[None, None, :]
            + wrapped * hop_over_dpos[None]
        )
        ca, sa = jnp.cos(adv), jnp.sin(adv)

        def _cmul(a, b):
            return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

        c0, s0 = jnp.cos(ph[:, :1]), jnp.sin(ph[:, :1])
        pc, ps = lax.associative_scan(_cmul, (ca, sa), axis=1)
        cos_phi = jnp.concatenate([c0, c0 * pc - s0 * ps], axis=1)
        sin_phi = jnp.concatenate([s0, c0 * ps + s0 * pc], axis=1)
        if lock:
            cos_phi, sin_phi = pv._lock_to_peaks(cos_phi, sin_phi, ph, mag)
        return mag * cos_phi, mag * sin_phi

    return jax.jit(f)(re, im)


@pytest.mark.parametrize("lock", [True, False])
@pytest.mark.parametrize(
    "seconds,tempo,rate",
    [
        (1.5, 1.25, 48_000),   # K not a multiple of TILE_K
        (0.7, 0.8, 22_050),    # slow-down, odd bins (513 -> lane pad)
        (2.1, 2.0, 48_000),    # large ratio
    ],
)
def test_phase_kernel_vs_xla_planes(seconds, tempo, rate, lock):
    re, im, n_fft, hop, dpos = _planes_from_audio(seconds, tempo, rate)
    ref = _xla_planes(re, im, dpos, hop, n_fft, lock)
    got = phase_path_pallas(re, im, dpos, hop, n_fft, lock=lock,
                            interpret=True)
    for g, r in zip(got, ref):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape
        assert snr_db(r.ravel()[None], g.ravel()[None]) > 100.0


def test_phase_kernel_mono_tiny():
    re, im, n_fft, hop, dpos = _planes_from_audio(0.3, 1.1, 22_050)
    re, im = re[:1], im[:1]
    ref = _xla_planes(re, im, dpos, hop, n_fft, True)
    got = phase_path_pallas(re, im, dpos, hop, n_fft, interpret=True)
    for g, r in zip(got, ref):
        assert snr_db(np.asarray(r).ravel()[None],
                      np.asarray(g).ravel()[None]) > 100.0


def test_full_stretch_fused_vs_xla(monkeypatch):
    """End-to-end pv_stretch_at_rate through _pv_impl's dispatch."""
    rate = 48_000
    N = int(1.2 * rate)
    rng = np.random.default_rng(3)
    t = np.arange(N) / rate
    x = (0.6 * np.sin(2 * np.pi * 523.25 * t)
         + 0.1 * rng.standard_normal(N)).astype(np.float32)
    data = jnp.asarray(np.stack([x, -x]))

    monkeypatch.setenv("NODEY_PV_PHASE_FORCE", "xla")
    ref, ref_len = pv.pv_stretch_at_rate(data, N, 1.25, rate)
    monkeypatch.setenv("NODEY_PV_PHASE_FORCE", "interpret")
    got, got_len = pv.pv_stretch_at_rate(data, N, 1.25, rate)
    assert got_len == ref_len
    ref, got = np.asarray(ref)[:, :ref_len], np.asarray(got)[:, :ref_len]
    assert snr_db(ref, got) > 95.0


def test_option_paths_fall_back(monkeypatch):
    """transient/formant options must keep working when the fused
    backend is forced: _pv_impl falls back to the XLA formulation."""
    rate = 22_050
    N = int(0.5 * rate)
    x = np.sin(2 * np.pi * 330.0 * np.arange(N) / rate).astype(np.float32)
    data = jnp.asarray(x[None])
    monkeypatch.setenv("NODEY_PV_PHASE_FORCE", "interpret")
    out = pv._pv_impl(data, 1.25, rate, transient=True)
    assert np.isfinite(np.asarray(out)).all()
    out = pv._pv_impl(data, 1.25, rate, formant_ratio=1.3)
    assert np.isfinite(np.asarray(out)).all()


def test_shift_theorem_fwd_vs_gather(monkeypatch):
    """The aligned-gather + shift-theorem analysis DFT must match the
    direct per-frame gather formulation to f32 GEMM roundoff, end to
    end through _pv_impl (phase path pinned to XLA so only the forward
    side differs)."""
    rate = 48_000
    N = int(1.3 * rate)
    rng = np.random.default_rng(11)
    t = np.arange(N) / rate
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)
         + 0.1 * rng.standard_normal(N)).astype(np.float32)
    data = jnp.asarray(np.stack([x, -0.7 * x]))

    monkeypatch.setenv("NODEY_PV_PHASE_FORCE", "xla")
    monkeypatch.setenv("NODEY_PV_FWD_FORCE", "gather")
    ref, ref_len = pv.pv_stretch_at_rate(data, N, 1.26, rate)
    monkeypatch.setenv("NODEY_PV_FWD_FORCE", "shift")
    got, got_len = pv.pv_stretch_at_rate(data, N, 1.26, rate)
    assert got_len == ref_len
    ref = np.asarray(ref)[:, :ref_len]
    got = np.asarray(got)[:, :ref_len]
    assert snr_db(ref, got) > 85.0


def test_shift_theorem_planes_vs_gather():
    """Plane-level parity of _fwd_dft_shift vs the direct formulation
    across rates (odd bin counts exercise the lane padding)."""
    for rate, seconds in ((48_000, 0.9), (22_050, 0.6)):
        N = int(seconds * rate)
        rng = np.random.default_rng(rate)
        data = rng.standard_normal((2, N)).astype(np.float32)
        n_fft, hop, pos, dpos, pad_to = pv._pv_geometry(N, 1.26, rate)
        w = pv._pv_window(n_fft)
        from nodey_tpu.ops.stft import _dft_matrices

        cos_m, sin_m = _dft_matrices(n_fft)
        xp = np.pad(data, ((0, 0), (0, max(0, pad_to - N))))
        frames = np.stack(
            [xp[:, p : p + n_fft] for p in pos], axis=1
        ) * w[None, None, :]
        ref_re = frames @ cos_m
        ref_im = frames @ sin_m
        got_re, got_im = pv._fwd_dft_shift(jnp.asarray(data), pos, n_fft)
        assert snr_db(ref_re, np.asarray(got_re)) > 85.0
        assert snr_db(ref_im, np.asarray(got_im)) > 85.0


def test_inkernel_atan2_accuracy():
    """The hand-rolled kernel atan2 (Mosaic has no atan2 primitive) must
    track np.arctan2 to a few f32 ulps over the full circle, including
    the axes and the (0, 0) convention."""
    from nodey_tpu.ops.pallas_phase import _atan2

    rng = np.random.default_rng(5)
    y = rng.standard_normal(20_000).astype(np.float32) * np.float32(
        10.0
    ) ** rng.integers(-20, 20, 20_000).astype(np.float32)
    x = rng.standard_normal(20_000).astype(np.float32) * np.float32(
        10.0
    ) ** rng.integers(-20, 20, 20_000).astype(np.float32)
    # axes + origin + denormal-ish magnitudes
    specials_y = np.array([0, 0, 1, -1, 0, 1e-30, -1e-30], np.float32)
    specials_x = np.array([0, 1, 0, 0, -1, 1e-30, 1e-30], np.float32)
    y = np.concatenate([y, specials_y])
    x = np.concatenate([x, specials_x])
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    err = np.abs(got.astype(np.float64) - ref)
    # pi-wrap: both +pi and -pi are valid at the branch cut
    err = np.minimum(err, np.abs(err - 2 * np.pi))
    assert float(err.max()) < 4e-7, float(err.max())
    assert got[len(got) - 7] == 0.0  # atan2(0, 0) == 0 (XLA convention)
