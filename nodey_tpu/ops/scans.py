"""Constant-coefficient first-order scans — shared device formulations.

Every "inherently serial" recurrence in this framework (the biquad IIR
modes in ops/biquad.py, the compressor's one-pole attack smoother and
the limiter/compressor release envelope in ops/dynamics.py) is a
first-order recurrence with CONSTANT coefficients, so every scan weight
is host-computable in float64/complex128 instead of device-chained f32
products. This module owns the two device formulations each primitive
supports:

* ``doubling`` — Hillis-Steele with host-exact step weights: log2(N)
  rounds, each a full pass over the array (O(N log N) HBM traffic).
  Right for short arrays, where the blocked form's fixed costs dominate.

* ``blocked`` — reshape [..., N] -> [..., B, W]: the in-block inclusive
  scan is a dense [.., W] x [W, W] upper-triangular pole-power GEMM on
  the MXU (precision HIGHEST — bitwise-f32 dots on this backend,
  ROUND4.md section 10), block carries cross in a tiny doubling over the
  [.., B] block ends, and the exclusive carry injects in one epilogue
  pass with host pole-power vectors — ~3 HBM passes total. The max-plus
  primitive has no MXU semiring, so its "blocked" form is two-level
  doubling: log2(W) full-traffic rounds + the [.., B] carry doubling +
  one injection pass (~halves traffic vs global doubling).

On-chip motivation: the master-bus chain (three biquad sections + two
compressor detector stages + one limiter envelope over a 30-s stereo
clip) measured 8.5 ms pipeline with global doubling — almost entirely
HBM-bound scan rounds, ~21 per scan at N = 1.44 M.

``NODEY_SCAN_FORM`` forces ``doubling`` or ``blocked`` (default
``auto``: blocked from ``_BLOCK_THRESHOLD`` samples up). All forms are
mathematically the same inclusive scan; they differ only in f32
re-association, bounded by the tests in tests/test_scans.py.

One primitive here has NON-constant coefficients: ``tv_ar1_scan`` (the
phaser's swept allpass recurrence, ops/phaser.py). Its pole varies per
sample, so no weight is host-computable; it runs as one associative
pair scan over affine maps instead.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp
from jax import lax

_W = 256                  # block width: [.., W] x [W, W] GEMM tiles
_BLOCK_THRESHOLD = 2048   # auto: doubling below, blocked at/above
_NEG = np.float32(-3.0e38)  # effective max identity (floored log domain)


def _form(n: int) -> str:
    f = os.environ.get("NODEY_SCAN_FORM", "auto")
    if f == "doubling":
        return "doubling"
    if n < 2 * _W:        # blocked needs enough blocks to pay for itself
        return "doubling"
    if f == "blocked":
        return "blocked"
    return "blocked" if n >= _BLOCK_THRESHOLD else "doubling"


# -- host-side pole powers ------------------------------------------------------


def pole_powers(p: complex, n: int):
    """[p^1, ..., p^n] in host complex128 (exact-ish decay curves),
    split into (re, im) f32 arrays."""
    with np.errstate(under="ignore"):
        vals = np.power(np.complex128(complex(p)),
                        np.arange(1, n + 1, dtype=np.float64))
    return vals.real.astype(np.float32), vals.imag.astype(np.float32)


def _pow_table(p: complex, w: int) -> np.ndarray:
    """Upper-triangular [W, W] complex128 table U[j, i] = p^(i-j) for
    i >= j, 0 below — the in-block scan as a dense matrix."""
    e = np.arange(w)[None, :] - np.arange(w)[:, None]
    with np.errstate(under="ignore"):
        vals = np.power(np.complex128(complex(p)), np.maximum(e, 0))
    return np.where(e >= 0, vals, 0.0)


def _blocks(x, w: int):
    """Pad the last axis to a multiple of ``w`` and reshape to
    [..., B, w]; returns (blocks, B, original n)."""
    n = x.shape[-1]
    b = -(-n // w)
    padn = b * w - n
    if padn:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, padn)])
    return x.reshape(x.shape[:-1] + (b, w)), b, n


# -- AR(1): t[n] = p t[n-1] + x[n], zero init -----------------------------------


def _ar1_doubling(x, pole):
    n = x.shape[-1]
    p = np.complex128(complex(pole))
    t = x
    d = 1
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    while d < n:
        w = np.float32((p ** d).real)
        pad[-1] = (d, 0)
        t = t + w * jnp.pad(t[..., :-d], pad)
        d *= 2
    return t


def _shift_scan_add(s, d, w_r):
    pad = [(0, 0)] * (s.ndim - 1) + [(d, 0)]
    return s + w_r * jnp.pad(s[..., :-d], pad)


def _ar1_blocked(x, pole):
    xb, b, n = _blocks(x, _W)
    u = _pow_table(pole, _W).real.astype(np.float32)
    t = jnp.einsum(
        "...bj,ji->...bi", xb, u,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # Exclusive block-carry prefix (tiny: [.., B]) with step weight p^W.
    p_w = np.complex128(complex(pole)) ** _W
    s = t[..., -1]
    d = 1
    while d < b:
        s = _shift_scan_add(s, d, np.float32((p_w ** d).real))
        d *= 2
    pad = [(0, 0)] * (s.ndim - 1) + [(1, 0)]
    excl = jnp.pad(s[..., :-1], pad)
    powv = pole_powers(pole, _W)[0]
    t = t + powv * excl[..., None]
    return t.reshape(t.shape[:-2] + (b * _W,))[..., :n]


def ar1_scan(x, pole):
    """Inclusive t[n] = pole * t[n-1] + x[n] with zero init along the
    last axis (real pole, f32 x)."""
    if _form(x.shape[-1]) == "blocked":
        return _ar1_blocked(x, pole)
    return _ar1_doubling(x, pole)


# -- complex AR(1) on split re/im pairs ------------------------------------------
# (complex dtypes are unimplemented on this TPU backend; the complex
# algebra runs on host and applies as real rotation-scales.)


def _rot_doubling(xr, xi, pole):
    n = xr.shape[-1]
    p = np.complex128(complex(pole))
    tr, ti = xr, xi
    d = 1
    pad = [(0, 0)] * (xr.ndim - 1) + [(d, 0)]
    while d < n:
        w = p ** d
        wr = np.float32(w.real)
        wi = np.float32(w.imag)
        pad[-1] = (d, 0)
        sr = jnp.pad(tr[..., :-d], pad)
        si = jnp.pad(ti[..., :-d], pad)
        tr, ti = tr + wr * sr - wi * si, ti + wi * sr + wr * si
        d *= 2
    return tr, ti


def _rot_blocked(xr, xi, pole):
    xrb, b, n = _blocks(xr, _W)
    xib, _, _ = _blocks(xi, _W)
    table = _pow_table(pole, _W)
    ur = table.real.astype(np.float32)
    ui = table.imag.astype(np.float32)

    def gemm(v, m):
        return jnp.einsum(
            "...bj,ji->...bi", v, m,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    tr = gemm(xrb, ur) - gemm(xib, ui)
    ti = gemm(xrb, ui) + gemm(xib, ur)
    # Exclusive block-carry prefix: rotation doubling over [.., B].
    p_w = np.complex128(complex(pole)) ** _W
    sr, si = tr[..., -1], ti[..., -1]
    d = 1
    while d < b:
        w = p_w ** d
        wr = np.float32(w.real)
        wi = np.float32(w.imag)
        pad = [(0, 0)] * (sr.ndim - 1) + [(d, 0)]
        hr = jnp.pad(sr[..., :-d], pad)
        hi = jnp.pad(si[..., :-d], pad)
        sr, si = sr + wr * hr - wi * hi, si + wi * hr + wr * hi
        d *= 2
    pad = [(0, 0)] * (sr.ndim - 1) + [(1, 0)]
    er = jnp.pad(sr[..., :-1], pad)
    ei = jnp.pad(si[..., :-1], pad)
    pw_r, pw_i = pole_powers(pole, _W)
    tr = tr + pw_r * er[..., None] - pw_i * ei[..., None]
    ti = ti + pw_i * er[..., None] + pw_r * ei[..., None]
    shape = tr.shape[:-2] + (b * _W,)
    return tr.reshape(shape)[..., :n], ti.reshape(shape)[..., :n]


def rot_scan(xr, xi, pole):
    """The complex modal scan m[n] = p m[n-1] + x[n] on split re/im f32
    arrays."""
    if _form(xr.shape[-1]) == "blocked":
        return _rot_blocked(xr, xi, pole)
    return _rot_doubling(xr, xi, pole)


# -- max-plus: env[n] = max(a[n], env[n-1] - c) ----------------------------------


def _maxplus_doubling(a, c):
    n = a.shape[-1]
    t = a
    d = 1
    pad = [(0, 0)] * (a.ndim - 1) + [(d, 0)]
    while d < n:
        pad[-1] = (d, 0)
        t = jnp.maximum(
            t,
            jnp.pad(t[..., :-d], pad, constant_values=_NEG)
            - np.float32(float(c) * d),
        )
        d *= 2
    return t


def _maxplus_blocked(a, c):
    ab, b, n = _blocks(a, _W)   # pad value 0.0 sliced off below; see note
    # NOTE: _blocks zero-pads, and 0.0 is not the max-plus identity — but
    # padding only occupies indices >= n, which are sliced off, and a
    # causal scan never reads rightward, so the pad can't contaminate
    # kept outputs.
    t = ab
    d = 1
    while d < _W:
        pad = [(0, 0)] * (t.ndim - 1) + [(d, 0)]
        t = jnp.maximum(
            t,
            jnp.pad(t[..., :-d], pad, constant_values=_NEG)
            - np.float32(float(c) * d),
        )
        d *= 2
    # Exclusive block-carry prefix over [.., B] (decrement c*W per block).
    s = t[..., -1]
    d = 1
    while d < b:
        pad = [(0, 0)] * (s.ndim - 1) + [(d, 0)]
        s = jnp.maximum(
            s,
            jnp.pad(s[..., :-d], pad, constant_values=_NEG)
            - np.float32(float(c) * _W * d),
        )
        d *= 2
    pad = [(0, 0)] * (s.ndim - 1) + [(1, 0)]
    excl = jnp.pad(s[..., :-1], pad, constant_values=_NEG)
    decay = (np.float32(float(c))
             * np.arange(1, _W + 1, dtype=np.float32))
    t = jnp.maximum(t, excl[..., None] - decay)
    return t.reshape(t.shape[:-2] + (b * _W,))[..., :n]


def maxplus_scan(a, c):
    """Prefix maximum under constant per-step decrement ``c``:
    env[n] = max_{k<=n} (a[k] - c*(n-k)) along the last axis."""
    if _form(a.shape[-1]) == "blocked":
        return _maxplus_blocked(a, c)
    return _maxplus_doubling(a, c)


def tv_ar1_scan(u, p):
    """y[n] = p[n] * y[n-1] + u[n] with y[-1] = 0 — a first-order linear
    recurrence with a TIME-VARYING pole, along the last axis.

    Unlike the constant-pole forms above, no scan weight is
    host-computable, so this runs as one ``lax.associative_scan`` over
    affine maps: the pair (P, V) represents y_out = P * y_in + V, and
    two segments compose as (Pa, Va) then (Pb, Vb) ->
    (Pa * Pb, Vb + Pb * Va).

    Returns ``(P_cum, y)`` where ``P_cum[n] = prod_{j<=n} p[j]`` — the
    weight a nonzero initial state enters with (``y_s[n] = y[n] +
    P_cum[n] * s``), which is how the streaming carry and the sharded
    cross-shard state prefix fold in (ops/phaser.py). ``p`` broadcasts
    against ``u`` (a [N] pole track shared by [C, N] channels).

    Conditioning: callers keep |p| < 1 (the phaser's pole is in (0, 1)),
    so every composed product decays and all intermediates stay bounded
    by the drive scale — same argument as the biquad modal scan
    (ops/biquad.py). Long-run P_cum underflows to 0.0 in f32; that is
    the correct limit (the initial state's true contribution is below
    f32 resolution there), never a NaN.
    """
    p_b = jnp.broadcast_to(p, u.shape)

    def combine(a, b):
        pa, va = a
        pb, vb = b
        return pa * pb, vb + pb * va

    return lax.associative_scan(combine, (p_b, u), axis=-1)
