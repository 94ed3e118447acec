"""Pallas TPU kernel fusing the phase vocoder's entire phase path.

``pv._pv_impl``'s mid-section between the two DFT GEMM pairs —
magnitude/phase extraction, per-bin instantaneous-frequency wrap, the
K-axis phasor prefix accumulation, identity phase locking, and the
mag*phasor synthesis products — is elementwise/scan work over
[C, K, bins] planes.  As XLA ops it streams every intermediate through
HBM: ~6 materialized planes plus an O(log K) associative scan plus the
lock hand-off (~18 MB per plane per channel at 30 s stereo / 48 kHz),
measured as the bulk of the PV stage's non-GEMM cost on v5e.

This kernel reads the forward-DFT planes (re, im) ONCE per tile, runs
the whole chain in VMEM, and writes only the two synthesis planes
(mag*cos_phi, mag*sin_phi) consumed by the inverse GEMMs:

- grid = (channel, K/T frame tiles); TPU grid steps run sequentially,
  so the cross-tile phase continuation rides three [1, Bp] VMEM scratch
  rows (carry phasor cos/sin + previous frame's analysis phase),
  reset at each channel's first tile;
- within a tile the prefix is a Hillis-Steele doubling over the frame
  (sublane) axis in PHASOR form — identical O(eps)-per-combine error
  independent of accumulated magnitude, same reasoning as the XLA
  ``associative_scan`` formulation (pv.py:460-487);
- the frame-0 absolute phase seed is folded in by defining
  adv[0] := ph[0], so the prefix directly yields synthesis phase with
  no separate concatenate;
- locking reuses the exact ``pallas_lock._lock_tile`` body (bitwise
  the same peak decisions as the XLA path; rotations to transcendental
  ulps).

Numerics vs the XLA path: peak/lock DECISIONS are bitwise identical
(pure compares on identically-computed magnitudes); the phasor prefix
composes multiplications in a different association order, so outputs
agree to f32 round-off (tests pin >=110 dB SNR against pv's XLA
formulation in interpret mode, plus TPU-vs-XLA parity in the on-chip
suite).  Unsupported options (transient resets, formant warp) fall
back to the XLA path in ``pv._pv_impl``.

Reference behavior anchor: the tempo/pitch stage this accelerates is
the second algorithm family shipped on top of the reference's WSOLA
(SoundTouch) tempo path (/root/reference/src/processor/
audio-velocity.cpp:265-443); the phase-locked vocoder itself follows
Laroche & Dolson (1999) as in ops/pv.py.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodey_tpu.ops.pallas_lock import _lock_tile

_TWO_PI = np.float32(2.0 * math.pi)

# Frames per grid step.  64 keeps worst-case VMEM residency (4 blocks
# double-buffered + ~10 live lock temporaries + ~8 phase temporaries at
# [64, Bp] f32, Bp <= 2176 for 96 kHz) under ~10 MB of the 16 MB/core
# budget.
TILE_K = 64


_PI = np.float32(math.pi)
_PI_2 = np.float32(math.pi / 2)
_PI_4 = np.float32(math.pi / 4)


def _atan2(y, x):
    """f32 atan2 from compare/select + a Cephes-style minimax odd
    polynomial (Mosaic has no atan2 primitive; TC lowering raises
    NotImplementedError).  Range-reduced to t in [0, 0.4142] via the
    octant fold t -> (t-1)/(t+1), ~1-2 ulp over the full circle;
    atan2(0, 0) == 0 to match XLA's convention."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.where(hi > 0.0, hi, 1.0)
    mid = t > 0.41421356
    u = jnp.where(mid, (t - 1.0) / (t + 1.0), t)
    z = u * u
    p = (
        (
            (np.float32(8.05374449538e-2) * z
             - np.float32(1.38776856032e-1)) * z
            + np.float32(1.99777106478e-1)
        ) * z
        - np.float32(3.33329491539e-1)
    ) * z * u + u
    r = jnp.where(mid, _PI_4 + p, p)
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _phase_kernel(B: int, Bp: int, T: int, hop: int, n_fft: int,
                  lock: bool,
                  re_ref, im_ref, dpos_ref,
                  ry_ref, iy_ref,
                  cc_ref, sc_ref, php_ref):
    kt = pl.program_id(1)

    @pl.when(kt == 0)
    def _reset():
        cc_ref[...] = jnp.ones((1, Bp), jnp.float32)
        sc_ref[...] = jnp.zeros((1, Bp), jnp.float32)
        php_ref[...] = jnp.zeros((1, Bp), jnp.float32)

    re = re_ref[0]                                   # [T, Bp]
    im = im_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, Bp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (T, Bp), 0)

    mag = jnp.sqrt(re * re + im * im)
    ph = _atan2(im, re)

    # ph_prev[r] = ph[r-1]; row 0 continues from the previous tile's
    # last analysis phase (scratch), zeros at the very first tile where
    # the value is unused (adv[0] is overridden to the absolute seed).
    ph_up = pltpu.roll(ph, shift=1, axis=0)
    ph_prev = jnp.where(row == 0, php_ref[0][None, :], ph_up)

    dpos = dpos_ref[...][:, :1]                      # [T, 1] int32
    scale = np.float32(2.0 * math.pi / n_fft)
    omega_dpos = ((lane * dpos) % n_fft).astype(jnp.float32) * scale
    dphi = ph - ph_prev - omega_dpos
    wrapped = dphi - _TWO_PI * jnp.round(dphi / _TWO_PI)
    hod = np.float32(hop) / dpos.astype(jnp.float32)
    omega_hop = ((lane * hop) % n_fft).astype(jnp.float32) * scale
    adv = omega_hop + wrapped * hod
    # Fold the absolute frame-0 phase seed into the prefix itself.
    adv = jnp.where((row == 0) & (kt == 0), ph, adv)

    ca, sa = jnp.cos(adv), jnp.sin(adv)
    s = 1
    while s < T:
        cs = pltpu.roll(ca, shift=s, axis=0)
        ss = pltpu.roll(sa, shift=s, axis=0)
        m = row >= s
        cs = jnp.where(m, cs, 1.0)
        ss = jnp.where(m, ss, 0.0)
        ca, sa = ca * cs - sa * ss, ca * ss + sa * cs
        s *= 2

    cc = cc_ref[0][None, :]
    sc = sc_ref[0][None, :]
    cos_phi = ca * cc - sa * sc
    sin_phi = ca * sc + sa * cc

    cc_ref[0, :] = cos_phi[T - 1, :]
    sc_ref[0, :] = sin_phi[T - 1, :]
    php_ref[0, :] = ph[T - 1, :]

    if lock:
        mag_l = jnp.where(lane < B, mag, -1.0)
        cos_phi, sin_phi = _lock_tile(mag_l, cos_phi, sin_phi, ph, Bp)

    ry_ref[0] = mag * cos_phi
    iy_ref[0] = mag * sin_phi


@functools.lru_cache(maxsize=16)
def _dpos_lanes(dpos_key, Kp: int):
    d = np.asarray(dpos_key, dtype=np.int32)
    d = np.pad(d, (0, Kp - len(d)), constant_values=1)
    return np.repeat(d[:, None], 128, axis=1)


def phase_path_pallas(re, im, dpos, hop: int, n_fft: int,
                      lock: bool = True, interpret: bool = False):
    """[C, K, B] forward-DFT planes -> (mag*cos_phi, mag*sin_phi).

    ``dpos`` is the static integer analysis-hop array from
    ``pv._pv_geometry`` (dpos[0] is ignored — frame 0 is the absolute
    seed).  Returns the synthesis planes ready for the inverse GEMMs.
    """
    C, K, B = re.shape
    T = TILE_K
    Bp = -(-B // 128) * 128
    Kp = -(-K // T) * T

    def prep(a):
        return jnp.pad(a, ((0, 0), (0, Kp - K), (0, Bp - B)))

    dpos_b = jnp.asarray(_dpos_lanes(tuple(int(x) for x in dpos), Kp))

    spec = pl.BlockSpec((1, T, Bp), lambda c, kt: (c, kt, 0),
                        memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((T, 128), lambda c, kt: (kt, 0),
                         memory_space=pltpu.VMEM)
    ry, iy = pl.pallas_call(
        functools.partial(_phase_kernel, B, Bp, T, hop, n_fft, lock),
        grid=(C, Kp // T),
        in_specs=[spec, spec, dspec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((C, Kp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((C, Kp, Bp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, Bp), jnp.float32),
            pltpu.VMEM((1, Bp), jnp.float32),
            pltpu.VMEM((1, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(prep(re), prep(im), dpos_b)
    return ry[:, :K, :B], iy[:, :K, :B]
