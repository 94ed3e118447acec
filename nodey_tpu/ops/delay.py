"""Feedback delay (echo) — an exact K-echo geometric comb evaluated at
log depth (target-spec extension; the reference ships no delay effect —
this completes the send/master chain alongside the EQ, dynamics and
reverb nodes).

The classic feedback delay line

    w[t] = x[t - D] + fb * w[t - D]
         = sum_{k=1..inf} fb^(k-1) * x[t - k*D]

is an AR(1) recurrence at stride D. Rather than carrying an infinite
IIR tail (which would force the same exact-state-prefix machinery the
biquads need and make overlap-discard sharding impossible), the node's
DEFINED semantics truncate the echo train at the first repeat below
-60 dB: exactly

    K = ceil(60 / (-20*log10(fb)))   echoes   (K = 1 when fb == 0,
                                              capped at 66 = fb 0.9),

so the kernel is a FINITE sparse FIR comb with taps fb^(k-1) at lags
k*D, k = 1..K — finite receptive field K*D, which makes the node a
plain LTI citizen of the overlap-discard sp mesh path (BITWISE sharded
== offline, like the reverb) and gives the streamed path a bitwise
contract too (see below).

Device formulation — square-and-multiply doubling, not K shifted adds:
with T_m[t] = sum_{j=0..m-1} fb^j x[t - j*D], partial combs compose as

    T_{a+b}[t] = T_a[t] + fb^a * T_b[t - a*D]

so T_K builds from the binary decomposition of K in ~2*log2(K) <= 14
shifted multiply-adds (vs K <= 66 naive passes — the delay is pure HBM
traffic, so depth IS the cost), every weight fb^j a host-float64
constant cast once to f32. The composition tree per output sample is a
pure function of K — independent of position, array length, chunking or
shard boundaries — so any two renders agree wherever their input
context is complete, with the standing across-program caveat
(ops/resample.apply_filter_bank): exact within one program, last-ulp
across program shapes (the compiler is free to fuse a given
multiply-add into an FMA in one program and not another). Streamed and
sharded renders are different programs from the whole-clip one, so
tests/test_delay.py pins both at one-ulp-of-partial-sum tolerance
(atol 3e-7), the same bar the resampler carries.

Output length GROWS by exactly K*D (the echo tail), mirrored by the
streaming flush protocol (an input-history ring of K*D samples keeps
emitting pure tail after input EOF) — the same grown-output contract
the reverb pinned into the executor and the sharded psum length
algebra.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream

_MAX_ECHOES = 66          # fb clamp 0.9 -> 66 repeats reach -60 dB
_TRUNCATE_DB = 60.0


def delay_params(rate: int, delay_ms: float, feedback: float
                 ) -> Tuple[int, int]:
    """(D, K): the delay lag in samples (>= 1) and the exact echo count
    of the truncated comb."""
    d = max(1, int(round(float(delay_ms) * 1e-3 * rate)))
    fb = float(feedback)
    if fb <= 0.0:
        return d, 1
    k = int(math.ceil(_TRUNCATE_DB / (-20.0 * math.log10(fb))))
    return d, min(max(k, 1), _MAX_ECHOES)


def _shift(x, lag: int):
    """x[t - lag] along the last axis, zeros shifted in from the left."""
    if lag >= x.shape[-1]:
        return jnp.zeros_like(x)
    pad = [(0, 0)] * (x.ndim - 1) + [(lag, 0)]
    return jnp.pad(x[..., :-lag], pad)


def comb_apply(x, d: int, k: int, fb: float):
    """T_K[t] = sum_{j=0..K-1} fb^j x[t - j*D] by square-and-multiply
    over K's binary decomposition (fixed composition tree per sample —
    the bitwise chunk/shard invariance argument above)."""
    fb64 = np.float64(fb)
    part = x            # T_p with p = 1
    p = 1
    acc = None          # T_r
    r = 0
    rem = int(k)
    while rem:
        if rem & 1:
            if acc is None:
                acc, r = part, p
            else:
                acc = acc + np.float32(fb64 ** r) * _shift(part, r * d)
                r += p
        rem >>= 1
        if rem:
            part = part + np.float32(fb64 ** p) * _shift(part, p * d)
            p *= 2
    return acc


def delay_wet(x, d: int, k: int, fb: float):
    """w[t] = sum_{k=1..K} fb^(k-1) x[t - k*D] = T_K shifted by D."""
    return _shift(comb_apply(x, d, k, fb), d)


# -- offline ---------------------------------------------------------------------


def delay_stream(stream: Stream, delay_ms: float, feedback: float,
                 wet: float, dry: float) -> Stream:
    """Offline echo over a whole Stream. Output length grows by the
    K*D echo tail when wet > 0; padding past the grown length is exact
    zeros by construction (every comb term is zero there), re-masked
    anyway to pin the Stream invariant the sharded length algebra
    loads."""
    wet32 = np.float32(wet)
    dry32 = np.float32(dry)
    if float(wet) == 0.0:
        out = stream.data if float(dry) == 1.0 else dry32 * stream.data
        return stream.with_data(out, fmt=FMT_FLT)
    d, k = delay_params(stream.rate, delay_ms, feedback)
    tail = k * d
    idx = jnp.arange(stream.capacity, dtype=jnp.int32)
    x = jnp.where((idx < stream.length)[None, :], stream.data, 0.0)
    xpad = jnp.pad(x, ((0, 0), (0, tail)))
    y = dry32 * xpad + wet32 * delay_wet(xpad, d, k, float(feedback))
    out_len = stream.length + jnp.int32(tail)
    oidx = jnp.arange(stream.capacity + tail, dtype=jnp.int32)
    y = jnp.where((oidx < out_len)[None, :], y, 0.0)
    return Stream(
        data=y, length=out_len, rate=stream.rate,
        channels=stream.channels, fmt=FMT_FLT, t0_us=stream.t0_us,
    )


# -- streaming -------------------------------------------------------------------


def delay_stream_init(channels: int, d: int, k: int):
    """(input-history ring [C, K*D], tail remaining): the ring holds the
    last K*D consumed input samples — the node's whole receptive field —
    so each chunk's outputs see exactly the offline context."""
    ring = jnp.zeros((channels, k * d), dtype=jnp.float32)
    return (ring, jnp.int32(k * d))


def delay_stream_step(params, state, data, n, in_done):
    """One chunk [C, W] with ``n`` valid. Outputs the chunk's echoes from
    [ring ++ chunk] (bitwise-equal to the offline render — same values,
    same composition tree), advances the ring by the emitted count, and
    after input EOF keeps flushing pure tail until K*D extra samples
    have shipped."""
    d, k, fb, wet, dry = params
    ring, rem = state
    w = data.shape[1]
    hist = ring.shape[1]
    idx = jnp.arange(w, dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    ext = jnp.concatenate([ring, x], axis=1)          # [C, K*D + W]
    wet_full = delay_wet(ext, d, k, fb)
    out = np.float32(dry) * x + np.float32(wet) * wet_full[:, hist:]
    flushing = jnp.logical_and(in_done, n <= 0)
    out_n = jnp.where(flushing, jnp.minimum(jnp.int32(w), rem), n)
    rem = jnp.where(flushing, rem - out_n, rem)
    out = jnp.where((idx < out_n)[None, :], out, 0.0)
    # Advance the ring by the emitted count (== consumed input samples;
    # flush chunks shift in the zeros the tail algebra expects).
    ring = lax.dynamic_slice(ext, (jnp.int32(0), out_n), ring.shape)
    done = jnp.logical_and(in_done, rem <= 0)
    return (ring, rem), out, out_n, done


# -- reference -------------------------------------------------------------------


def delay_reference(data: np.ndarray, rate: int, delay_ms: float,
                    feedback: float, wet: float, dry: float) -> np.ndarray:
    """Sequential float64 mirror of the truncated-comb semantics (the
    yardstick the log-depth composition is tested against). Returns the
    grown [C, N + K*D] output."""
    d, k = delay_params(rate, delay_ms, feedback)
    if float(wet) == 0.0:
        return (np.float64(dry) * data.astype(np.float64)).astype(
            np.float32
        )
    x = data.astype(np.float64)
    n = x.shape[1]
    out = np.zeros((x.shape[0], n + k * d))
    out[:, :n] = float(dry) * x
    for j in range(1, k + 1):
        out[:, j * d:j * d + n] += (
            float(wet) * float(feedback) ** (j - 1) * x
        )
    return out.astype(np.float32)
