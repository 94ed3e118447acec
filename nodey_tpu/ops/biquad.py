"""Biquad IIR filtering — the "inherently serial" second-order section
as log-depth first-order associative scans (target-spec extension; the
reference ships no filtering/EQ nodes).

A biquad y[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2] - a1 y[n-1] - a2 y[n-2]
is a second-order linear recurrence; its state evaluates with
associative scans the same way the compressor's one-pole does
(ops/dynamics.one_pole_log_scan). The NAIVE formulation — the 2x2
companion-matrix affine scan — is numerically poor for near-unit-circle
poles (measured 37 dB vs the float64 mirror on a 60 Hz Q=10 bell: the
cumulative A^k products reach magnitude ~1/(1-r) with catastrophic
cancellation). The shipped formulation factors by pole structure and
never materializes a growing matrix product:

* **complex pole pair** (a1^2 < 4 a2, every Q > 0.5 design): modal
  decomposition. The state recurrence s[n] = A s[n-1] + u x[n]
  diagonalizes to ONE complex first-order scan
  m[n] = p m[n-1] + g x[n] (the other mode is its conjugate), and the
  output reads the exclusive state: y[n] = b0 x[n] + 2 Re(m[n-1]).
  All intermediates are bounded by the signal scale (|p| < 1), so the
  f32 scan holds >=110 dB against the float64 mirror even at Q = 10
  (vs 37 dB for the matrix form). The device program carries the scan
  as SPLIT re/im f32 pairs — complex dtypes are UNIMPLEMENTED on this
  TPU backend (measured: any c64 program raises at the first
  device_get) — with the complex algebra done on host in complex128
  and applied as real rotation-scales.

* **real poles** (a1^2 >= 4 a2, Q <= 0.5 designs): partial fractions
  degenerate as the poles coalesce (the modal gains carry a 1/(p1-p2)
  factor), so instead the section runs as FIR(3) + two cascaded real
  AR(1) scans — w = b*x convolution (exact), t[n] = p1 t[n-1] + w[n],
  y[n] = p2 y[n-1] + t[n] — which is well-conditioned even for exactly
  repeated poles.

Both branches stream with tiny per-section carries (one (re, im) f32
pair per channel, or the FIR tail + two real scalars) and shard the sample
axis exactly: per-shard local scans plus log2(sp)-step ``ppermute``
doublings whose per-step weights p^(d*chunk) are STATIC (host-computed
in complex128) — the streaming carry evaluated spatially, the same move
as the limiter/compressor prefixes (ops/dynamics.py) and the PV phasor
chain (parallel/pv_sharded.py). An IIR's impulse response is infinite,
so overlap-discard (the LTI sp fast path in parallel/sharded.py) can
never be exact for these nodes — the state prefix is.

Coefficient design follows the RBJ Audio EQ Cookbook (float64 on host,
cast once to float32; branch selection uses the f32-rounded values the
device actually runs). The float64 sequential mirror (cascade_reference)
runs the SAME f32-rounded coefficients, isolating scan re-association
from coefficient rounding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream


@dataclasses.dataclass(frozen=True)
class BiquadCoef:
    """Normalized (a0 = 1) biquad coefficients, float64 by design."""

    b0: float
    b1: float
    b2: float
    a1: float
    a2: float

    def f32(self) -> "BiquadCoef":
        """The coefficients the device program actually uses."""
        return BiquadCoef(*(float(np.float32(v)) for v in (
            self.b0, self.b1, self.b2, self.a1, self.a2
        )))


# -- RBJ cookbook designs (float64, host) ------------------------------------


def _wq(freq: float, rate: int, q: float) -> Tuple[float, float, float]:
    f0 = min(max(float(freq), 1.0), 0.49 * rate)
    w0 = 2.0 * math.pi * f0 / rate
    alpha = math.sin(w0) / (2.0 * max(float(q), 1e-3))
    return w0, math.cos(w0), alpha


def _norm(b0, b1, b2, a0, a1, a2) -> BiquadCoef:
    return BiquadCoef(b0 / a0, b1 / a0, b2 / a0, a1 / a0, a2 / a0)


def peaking(freq: float, gain_db: float, q: float, rate: int) -> BiquadCoef:
    A = 10.0 ** (gain_db / 40.0)
    _w0, cosw, alpha = _wq(freq, rate, q)
    return _norm(
        1 + alpha * A, -2 * cosw, 1 - alpha * A,
        1 + alpha / A, -2 * cosw, 1 - alpha / A,
    )


def low_shelf(freq: float, gain_db: float, rate: int) -> BiquadCoef:
    A = 10.0 ** (gain_db / 40.0)
    w0, cosw, _ = _wq(freq, rate, 1.0)
    # RBJ shelf slope S = 1: alpha = sin(w0)/2 * sqrt((A+1/A)(1/S-1)+2).
    alpha = math.sin(w0) / 2.0 * math.sqrt(2.0)
    sq = 2.0 * math.sqrt(A) * alpha
    return _norm(
        A * ((A + 1) - (A - 1) * cosw + sq),
        2 * A * ((A - 1) - (A + 1) * cosw),
        A * ((A + 1) - (A - 1) * cosw - sq),
        (A + 1) + (A - 1) * cosw + sq,
        -2 * ((A - 1) + (A + 1) * cosw),
        (A + 1) + (A - 1) * cosw - sq,
    )


def high_shelf(freq: float, gain_db: float, rate: int) -> BiquadCoef:
    A = 10.0 ** (gain_db / 40.0)
    w0, cosw, _ = _wq(freq, rate, 1.0)
    alpha = math.sin(w0) / 2.0 * math.sqrt(2.0)  # S = 1
    sq = 2.0 * math.sqrt(A) * alpha
    return _norm(
        A * ((A + 1) + (A - 1) * cosw + sq),
        -2 * A * ((A - 1) + (A + 1) * cosw),
        A * ((A + 1) + (A - 1) * cosw - sq),
        (A + 1) - (A - 1) * cosw + sq,
        2 * ((A - 1) - (A + 1) * cosw),
        (A + 1) - (A - 1) * cosw - sq,
    )


def lowpass(freq: float, q: float, rate: int) -> BiquadCoef:
    _w0, cosw, alpha = _wq(freq, rate, q)
    return _norm(
        (1 - cosw) / 2, 1 - cosw, (1 - cosw) / 2,
        1 + alpha, -2 * cosw, 1 - alpha,
    )


def highpass(freq: float, q: float, rate: int) -> BiquadCoef:
    _w0, cosw, alpha = _wq(freq, rate, q)
    return _norm(
        (1 + cosw) / 2, -(1 + cosw), (1 + cosw) / 2,
        1 + alpha, -2 * cosw, 1 - alpha,
    )


def bandpass(freq: float, q: float, rate: int) -> BiquadCoef:
    """Constant 0 dB peak gain bandpass."""
    _w0, cosw, alpha = _wq(freq, rate, q)
    return _norm(alpha, 0.0, -alpha, 1 + alpha, -2 * cosw, 1 - alpha)


def notch(freq: float, q: float, rate: int) -> BiquadCoef:
    _w0, cosw, alpha = _wq(freq, rate, q)
    return _norm(1.0, -2 * cosw, 1.0, 1 + alpha, -2 * cosw, 1 - alpha)


# -- section analysis (host) --------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Section:
    """One biquad prepared for execution: f32-rounded coefficients plus
    the pole structure that picks the scan formulation."""

    coef: BiquadCoef          # f32-rounded
    conj: bool                # complex conjugate pole pair?
    # conj: mode pole p and modal input gain g (complex128 host values).
    p: complex
    g: complex
    # real: the two real poles (p, p2), FIR taps are coef.b*.
    p2: complex


def prepare(coef: BiquadCoef) -> Section:
    c = coef.f32()
    disc = c.a1 * c.a1 - 4.0 * c.a2
    if disc < 0.0:
        sq = complex(0.0, math.sqrt(-disc))
        p1 = (-c.a1 + sq) / 2.0
        p2 = (-c.a1 - sq) / 2.0
        # s[n] = A s[n-1] + u x[n] with A = [[-a1, 1], [-a2, 0]],
        # u = (b1 - a1 b0, b2 - a2 b0); eigenvectors (1, p + a1), so
        # V = [[1, 1], [-p2, -p1]], det = p2 - p1, and the mode-1 input
        # gain is g = (-p1 u1 - u2) / (p2 - p1). y = b0 x + 2 Re(m1').
        u1 = c.b1 - c.a1 * c.b0
        u2 = c.b2 - c.a2 * c.b0
        g = (-p1 * u1 - u2) / (p2 - p1)
        return Section(coef=c, conj=True, p=p1, g=g, p2=p2)
    sq = math.sqrt(disc)
    p1 = (-c.a1 + sq) / 2.0
    p2 = (-c.a1 - sq) / 2.0
    return Section(coef=c, conj=False, p=complex(p1), g=0j,
                   p2=complex(p2))


def prepare_all(coeffs: List[BiquadCoef]) -> List[Section]:
    return [prepare(c) for c in coeffs]


# -- first-order scans ---------------------------------------------------------


# The scan engines live in ops/scans.py (shared with ops/dynamics.py):
# Hillis-Steele doubling with host-exact step weights for short arrays,
# blocked MXU pole-power GEMMs (~3 HBM passes instead of log2(N) rounds)
# for long ones. The docstring formulations above describe the math;
# scans.py owns the device shapes.
from nodey_tpu.ops.scans import (  # noqa: E402
    ar1_scan as _ar1_scan,
    pole_powers as _pole_powers,
    rot_scan as _rot_scan,
)


def _fir3(x, b0: float, b1: float, b2: float, h=None):
    """w[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2]; ``h`` = the two samples
    before x[..., 0] as [..., 2] (zeros if None)."""
    if h is None:
        h = jnp.zeros(x.shape[:-1] + (2,), x.dtype)
    ext = jnp.concatenate([h, x], axis=-1)
    return (
        np.float32(b0) * ext[..., 2:]
        + np.float32(b1) * ext[..., 1:-1]
        + np.float32(b2) * ext[..., :-2]
    )


# -- apply (offline) ------------------------------------------------------------


def _sec_init_state(sec: Section, channels: int):
    if sec.conj:
        # Modal carry as (re, im) — no complex dtypes on this backend.
        return jnp.zeros((channels, 2), dtype=jnp.float32)
    return (
        jnp.zeros((channels, 2), dtype=jnp.float32),  # FIR history
        jnp.zeros((channels,), dtype=jnp.float32),    # t carry
        jnp.zeros((channels,), dtype=jnp.float32),    # y carry
    )


def _sec_apply(x, sec: Section, state):
    """Filter [C, N] through one section from ``state`` (None = silence
    history; the init-carry scans are skipped entirely); returns
    (y, new_state)."""
    c = sec.coef
    if sec.conj:
        mr, mi = _rot_scan(
            np.float32(sec.g.real) * x, np.float32(sec.g.imag) * x,
            sec.p,
        )
        if state is None:
            mp_r = jnp.zeros((x.shape[0],), dtype=jnp.float32)
        else:
            mp_r, mp_i = state[:, 0], state[:, 1]             # [C] f32
            pw_r, pw_i = _pole_powers(sec.p, x.shape[-1])
            mr = mr + pw_r * mp_r[:, None] - pw_i * mp_i[:, None]
            mi = mi + pw_i * mp_r[:, None] + pw_r * mp_i[:, None]
        m_excl_r = jnp.concatenate(
            [mp_r[:, None], mr[:, :-1]], axis=-1
        )
        y = np.float32(c.b0) * x + 2.0 * m_excl_r
        return y, jnp.stack([mr[:, -1], mi[:, -1]], axis=-1)
    h, t_prev, y_prev = state if state is not None else (None,) * 3
    p1 = np.float32(sec.p.real)
    p2 = np.float32(sec.p2.real)
    w = _fir3(x, c.b0, c.b1, c.b2, h)
    t = _ar1_scan(w, p1)
    if t_prev is not None:
        pow1 = _pole_powers(sec.p, x.shape[-1])[0]
        t = t + pow1 * t_prev[:, None]
    y = _ar1_scan(t, p2)
    if y_prev is not None:
        pow2 = _pole_powers(sec.p2, x.shape[-1])[0]
        y = y + pow2 * y_prev[:, None]
    new_h = (jnp.concatenate([h, x], axis=-1) if h is not None
             else x)[..., -2:]
    return y, (new_h, t[:, -1], y[:, -1])


def cascade_apply(x, sections: List[Section], states=None):
    """Apply a section cascade; returns (y, [new_state per section])."""
    new_states = []
    for i, sec in enumerate(sections):
        st = None if states is None else states[i]
        x, s = _sec_apply(x, sec, st)
        new_states.append(s)
    return x, new_states


def cascade_stream(stream: Stream, sections: List[Section]) -> Stream:
    """Offline cascade over a whole Stream. The filter tail past the
    valid length rings into the padding, so the output is re-masked —
    the Stream invariant (zeros at index >= length) is load-bearing:
    the sharded psum length algebra and amix's drained-input silence
    both depend on it."""
    if not sections:
        return stream
    out, _ = cascade_apply(stream.data, sections)
    idx = jnp.arange(out.shape[-1], dtype=jnp.int32)
    out = jnp.where(idx[None, :] < stream.length, out, 0.0)
    return stream.with_data(out, fmt=FMT_FLT)


# -- streaming -----------------------------------------------------------------


def cascade_stream_init(channels: int, sections: List[Section]):
    return tuple(_sec_init_state(s, channels) for s in sections)


def cascade_stream_step(sections: List[Section], state, data, n):
    """One chunk [C, W] with ``n`` valid samples. Invalid tail samples
    do not advance any carry (each gathers at sample n-1), so streamed
    output equals the offline render up to scan re-association."""
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    last = jnp.clip(n - 1, 0, data.shape[1] - 1)
    new_states = []
    for i, sec in enumerate(sections):
        if sec.conj:
            mp = state[i]                                     # [C, 2]
            mp_r, mp_i = mp[:, 0], mp[:, 1]
            c = sec.coef
            mr, mi = _rot_scan(
                np.float32(sec.g.real) * x,
                np.float32(sec.g.imag) * x, sec.p,
            )
            pw_r, pw_i = _pole_powers(sec.p, x.shape[-1])
            mr = mr + pw_r * mp_r[:, None] - pw_i * mp_i[:, None]
            mi = mi + pw_i * mp_r[:, None] + pw_r * mp_i[:, None]
            m_excl_r = jnp.concatenate(
                [mp_r[:, None], mr[:, :-1]], axis=-1
            )
            x = np.float32(c.b0) * x + 2.0 * m_excl_r
            m_last = jnp.stack([mr[:, last], mi[:, last]], axis=-1)
            new_states.append(jnp.where(n > 0, m_last, mp))
        else:
            h, t_prev, y_prev = state[i]
            c = sec.coef
            p1 = np.float32(sec.p.real)
            p2 = np.float32(sec.p2.real)
            w = _fir3(x, c.b0, c.b1, c.b2, h)
            pow1 = _pole_powers(sec.p, x.shape[-1])[0]
            t = _ar1_scan(w, p1) + pow1 * t_prev[:, None]
            pow2 = _pole_powers(sec.p2, x.shape[-1])[0]
            y = _ar1_scan(t, p2) + pow2 * y_prev[:, None]
            ext = jnp.concatenate([h, x], axis=-1)
            # FIR history at the valid boundary: samples n-1, n-2.
            new_h = jnp.stack(
                [
                    jnp.take_along_axis(
                        ext, (last + 1)[None, None].repeat(
                            ext.shape[0], 0
                        ), axis=-1
                    )[..., 0],
                    jnp.take_along_axis(
                        ext, (last + 2)[None, None].repeat(
                            ext.shape[0], 0
                        ), axis=-1
                    )[..., 0],
                ],
                axis=-1,
            )
            new_states.append((
                jnp.where(n > 0, new_h, h),
                jnp.where(n > 0, t[:, last], t_prev),
                jnp.where(n > 0, y[:, last], y_prev),
            ))
            x = y
    # Re-mask the invalid tail (the filter rings past sample n-1; chunk
    # padding must stay zero for downstream consumers).
    x = jnp.where((idx < n)[None, :], x, 0.0)
    return tuple(new_states), x


# -- sharding ------------------------------------------------------------------


def _cross_shard_ar1(v_end, pole_chunk_pows, axis_name: str, sp: int,
                     zero):
    """Exclusive cross-shard prefix of an AR(1) carry: shard i receives
    the state at the END of shard i-1 (``zero`` on shard 0 — the global
    init is silence). ``pole_chunk_pows[k]`` must equal p^(2^k * chunk)
    (host-precomputed; static). Only the [C]-vector state rides ICI."""
    from jax import lax as _lax

    idx = _lax.axis_index(axis_name)
    v = v_end
    d = 1
    k = 0
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        r = _lax.ppermute(v, axis_name, perm)
        nv = r * pole_chunk_pows[k] + v
        v = jnp.where(idx >= d, nv, v)
        d *= 2
        k += 1
    if sp > 1:
        prev = _lax.ppermute(
            v, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        return jnp.where(idx == 0, zero, prev)
    return jnp.full_like(v, zero)


def _chunk_pows(p: complex, chunk: int, sp: int):
    """[p^(chunk), p^(2*chunk), p^(4*chunk), ...] in complex128 on host
    (static doubling weights)."""
    out = []
    d = 1
    while d < sp:
        out.append(np.complex128(complex(p)) ** (d * chunk))
        d *= 2
    return out or [np.complex128(0)]


def _cross_shard_ar1_rot(v, pole_chunk_pows, axis_name: str, sp: int):
    """``_cross_shard_ar1`` for the modal (complex) carry, held as
    [C, 2] (re, im) f32 — the host complex128 doubling weights apply as
    real rotation-scales (no complex dtypes on this backend)."""
    from jax import lax as _lax

    idx = _lax.axis_index(axis_name)
    d = 1
    k = 0
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        r = _lax.ppermute(v, axis_name, perm)
        w = pole_chunk_pows[k]
        wr = np.float32(w.real)
        wi = np.float32(w.imag)
        rot = jnp.stack(
            [
                r[:, 0] * wr - r[:, 1] * wi,
                r[:, 0] * wi + r[:, 1] * wr,
            ],
            axis=-1,
        )
        v = jnp.where(idx >= d, rot + v, v)
        d *= 2
        k += 1
    if sp > 1:
        prev = _lax.ppermute(
            v, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        return jnp.where(idx == 0, 0.0, prev)
    return jnp.zeros_like(v)


def cascade_sharded_local(x, sections: List[Section], axis_name: str,
                          sp: int):
    """Per-shard cascade body (under ``shard_map`` over ``axis_name``).

    Per section: the FIR history arrives as a 2-sample halo from the
    left neighbor (real branch only), then each first-order scan runs
    locally and its carry crosses shards via ``_cross_shard_ar1`` — the
    modal branch moves one (re, im) f32 pair per channel, the real
    branch two real scalars in two dependent rounds (t feeds y)."""
    from nodey_tpu.parallel.ops import halo_exchange_nd

    chunk = x.shape[-1]
    for sec in sections:
        c = sec.coef
        if sec.conj:
            mr_l, mi_l = _rot_scan(
                np.float32(sec.g.real) * x,
                np.float32(sec.g.imag) * x, sec.p,
            )
            mp = _cross_shard_ar1_rot(
                jnp.stack([mr_l[:, -1], mi_l[:, -1]], axis=-1),
                _chunk_pows(sec.p, chunk, sp), axis_name, sp,
            )
            mp_r, mp_i = mp[:, 0], mp[:, 1]
            pw_r, pw_i = _pole_powers(sec.p, chunk)
            mr = mr_l + pw_r * mp_r[:, None] - pw_i * mp_i[:, None]
            m_excl_r = jnp.concatenate(
                [mp_r[:, None], mr[:, :-1]], axis=-1
            )
            x = np.float32(c.b0) * x + 2.0 * m_excl_r
        else:
            p1 = np.float32(sec.p.real)
            p2 = np.float32(sec.p2.real)
            ext = halo_exchange_nd(x, 2, 0, axis_name)
            w = _fir3(x, c.b0, c.b1, c.b2, h=ext[..., :2])
            t_local = _ar1_scan(w, p1)
            t_prev = _cross_shard_ar1(
                t_local[:, -1],
                [np.float32(pw.real)
                 for pw in _chunk_pows(sec.p, chunk, sp)],
                axis_name, sp, np.float32(0),
            )
            pow1 = _pole_powers(sec.p, chunk)[0]
            t = t_local + pow1 * t_prev[:, None]
            y_local = _ar1_scan(t, p2)
            y_prev = _cross_shard_ar1(
                y_local[:, -1],
                [np.float32(pw.real)
                 for pw in _chunk_pows(sec.p2, chunk, sp)],
                axis_name, sp, np.float32(0),
            )
            pow2 = _pole_powers(sec.p2, chunk)[0]
            x = y_local + pow2 * y_prev[:, None]
    return x


# -- float64 sequential mirror ---------------------------------------------------


def cascade_reference(data: np.ndarray, sections: List[Any]) -> np.ndarray:
    """Sequential float64 TDF-II mirror running the SAME f32-rounded
    coefficients the device program uses (the yardstick isolates scan
    re-association from coefficient rounding). Accepts Sections or raw
    BiquadCoefs."""
    x = data.astype(np.float64)
    for sec in sections:
        coef = sec.coef if isinstance(sec, Section) else sec
        c = coef.f32()
        y = np.zeros_like(x)
        for ch in range(x.shape[0]):
            s1 = 0.0
            s2 = 0.0
            for i in range(x.shape[1]):
                xn = x[ch, i]
                yn = c.b0 * xn + s1
                s1 = c.b1 * xn - c.a1 * yn + s2
                s2 = c.b2 * xn - c.a2 * yn
                y[ch, i] = yn
        x = y
    return x.astype(np.float32)
