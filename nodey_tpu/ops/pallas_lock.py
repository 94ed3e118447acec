"""Pallas TPU kernel for the phase-vocoder identity-lock scan.

Same math as ``pv._lock_to_peaks`` (simplified Laroche–Dolson identity
locking: peak detection, nearest-dominant-peak assignment via forward +
reverse "last valid" doubling scans, rigid re-phasing of non-peak bins)
but executed entirely in VMEM: the XLA formulation streams ~11 doubling
steps x 2 directions x 4 carried arrays through HBM (~3 GB of traffic at
[2, 2252, 1025] — measured ~10 ms on v5e, the dominant cost of the
locked PV pipeline, ROUND4.md §11), while this kernel reads each tile
once, runs every doubling step on-chip with ``pltpu.roll`` shifts +
selects, and writes the two locked phasor planes back — ~110 MB total.

Because the last-valid combine only ever SELECTS seed values, the scan
is bitwise-identical to the XLA Hillis–Steele path (and to
``lax.associative_scan``) in any order; tests/test_pallas_lock.py pins
kernel(interpret) == pv._lock_to_peaks exactly on CPU. On the chip the
final re-phasing rotation (cos/sin of the phase offsets) may differ from
XLA by transcendental ulps — inside the PV algorithm's own f32 floor.

Reference behavior: phase locking per Laroche & Dolson (1999), the
standard identity-locking refinement of the phase vocoder the reference's
SoundTouch dependency does NOT implement (its tempo stage is WSOLA —
/root/reference/src/processor/audio-velocity.cpp:369-427); this kernel
accelerates the second algorithm family the rebuild ships on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows of (channel, frame) pairs processed per grid step. 64 keeps the
# worst-case VMEM residency (4 in + 2 out blocks double-buffered + ~10
# live doubling temporaries at [64, Bp] f32, Bp <= 2176 for 96 kHz)
# comfortably under the ~16 MB/core budget.
TILE_ROWS = 64


def _lock_tile(mag, cos_phi, sin_phi, ph_in, Bp: int):
    """Identity-lock one [T, Bp] tile entirely in registers/VMEM.

    Lane index == bin index (the bin axis is never tiled); pad lanes
    must carry mag == -1.0 so they are never peaks and their seeds stay
    invalid through both scans.  Shared by the standalone lock kernel
    below and the fused phase-path kernel (ops/pallas_phase.py).
    """
    T = mag.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, Bp), 1)

    def shift_f(x, s, fill):
        # result[i] = x[i - s], first s lanes = fill
        r = pltpu.roll(x, shift=s, axis=1)
        return jnp.where(lane < s, fill, r)

    def shift_b(x, s, fill):
        # result[i] = x[i + s], last s lanes = fill (pltpu.roll requires
        # a non-negative shift: left-by-s == right-by-(Bp - s))
        r = pltpu.roll(x, shift=Bp - s, axis=1)
        return jnp.where(lane >= Bp - s, fill, r)

    neg1 = jnp.float32(-1.0)
    is_peak = (
        (mag > shift_f(mag, 1, neg1))
        & (mag >= shift_b(mag, 1, neg1))
        & (mag > shift_f(mag, 2, neg1))
        & (mag >= shift_b(mag, 2, neg1))
    )

    inval = jnp.int32(-1)
    seed = (
        jnp.where(is_peak, lane, inval),
        jnp.where(is_peak, cos_phi, 0.0),
        jnp.where(is_peak, sin_phi, 0.0),
        jnp.where(is_peak, ph_in, 0.0),
    )

    def scan(arrs, shift):
        arrs = list(arrs)
        s = 1
        while s < Bp:
            valid = arrs[0] >= 0
            arrs = [
                jnp.where(valid, a, shift(a, s, inval if i == 0 else 0.0))
                for i, a in enumerate(arrs)
            ]
            s *= 2
        return arrs

    prev = scan(seed, shift_f)   # last peak at or before each bin
    nxt = scan(seed, shift_b)    # first peak at or after each bin

    prev_i, nxt_i = prev[0], nxt[0]
    use_prev = (prev_i >= 0) & (
        (nxt_i < 0) | (lane - prev_i <= nxt_i - lane)
    )
    has_peak = (prev_i >= 0) | (nxt_i >= 0)
    cp = jnp.where(use_prev, prev[1], nxt[1])
    sp = jnp.where(use_prev, prev[2], nxt[2])
    pph = jnp.where(use_prev, prev[3], nxt[3])
    cp = jnp.where(has_peak, cp, cos_phi)
    sp = jnp.where(has_peak, sp, sin_phi)
    pph = jnp.where(has_peak, pph, ph_in)

    d = ph_in - pph
    cd, sd = jnp.cos(d), jnp.sin(d)
    return (
        jnp.where(is_peak, cos_phi, cp * cd - sp * sd),
        jnp.where(is_peak, sin_phi, cp * sd + sp * cd),
    )


def _lock_kernel(Bp: int, mag_ref, cp_ref, sp_ref, ph_ref,
                 oc_ref, os_ref):
    """One [TILE_ROWS, Bp] tile: full lock scan in VMEM."""
    oc, os_ = _lock_tile(mag_ref[...], cp_ref[...], sp_ref[...],
                         ph_ref[...], Bp)
    oc_ref[...] = oc
    os_ref[...] = os_


def lock_to_peaks_pallas(cos_phi, sin_phi, ph_in, mag,
                         interpret: bool = False):
    """Identity phase locking on [C, K, B] phasor planes; same contract
    as ``pv._lock_to_peaks`` (bitwise-equal scan decisions; rotation to
    transcendental ulps on hardware, bitwise in interpret mode)."""
    C, K, B = mag.shape
    Bp = -(-B // 128) * 128
    R = C * K
    Rp = -(-R // TILE_ROWS) * TILE_ROWS

    def prep(a, fill):
        a = a.reshape(R, B)
        return jnp.pad(a, ((0, Rp - R), (0, Bp - B)),
                       constant_values=fill)

    args = (
        prep(mag, -1.0),       # pad bins/rows can never be peaks
        prep(cos_phi, 0.0),
        prep(sin_phi, 0.0),
        prep(ph_in, 0.0),
    )
    spec = pl.BlockSpec((TILE_ROWS, Bp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lock_kernel, Bp),
        grid=(Rp // TILE_ROWS,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((Rp, Bp), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    oc, os_ = (a[:R, :B].reshape(C, K, B) for a in out)
    return oc, os_
