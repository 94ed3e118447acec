"""Stereo pan/balance, mid/side width and fade envelopes (target-spec
extensions; the reference ships none — with these the node set covers
placement and clip-boundary shaping alongside the dynamics/EQ/send
palette).

**Pan** (`audio_pan`) is memoryless and time-invariant — a per-channel
constant gain — so it rides every existing path for free: the LTI
overlap-discard sharder, the stateless streaming step, and the tv chain
compiler. Two laws, chosen by the input width:

* stereo in: BALANCE law ``gl = min(1, 1-p), gr = min(1, 1+p)`` —
  center (p = 0) is gains of exactly 1.0, a bitwise passthrough (the
  standing transparency contract).
* mono in: constant-power PLACEMENT into stereo,
  ``gl = cos((p+1)*pi/4), gr = sin((p+1)*pi/4)`` (equal acoustic power
  at every position; gains precomputed in float64 on host).

**Width** (`audio_width`) is the pan's mid/side sibling — a constant
2x2 channel matrix ``out = (m + w s, m - w s)`` scaling the side signal
— and rides the same three paths (LTI overlap-discard, stateless
streaming, tv chain). Width 1.0 and mono inputs are bitwise
passthroughs (special-cased: the re-associated matrix at w = 1 is not
bitwise L/R).

**Fade** (`audio_fade`) is TIME-VARIANT but analytic — the gain at
sample t is a pure function of the global sample index, the same class
as the tremolo LFO (ops/modfx.py), and the cross-chunk/cross-shard
state is just the integer position. Anchors are ABSOLUTE (fade-in from
sample 0; fade-out starting at ``out_start_s``) so the law is identical
in offline, chunk-streamed (no total-length lookahead needed — the
stream executor only learns the clip length at EOF) and sp-sharded
renders.

Exactness: positions are int32 (exact to 2^31 samples ≈ 12 h at 48 kHz);
ramp differences are formed in int32 and converted to f32 only where
they are < 2^24 (ramp lengths are clamped to 60 s, ≤ 11.5 M samples at
192 kHz), so the int->f32 conversion is exact and any two programs
compute bit-equal gains at equal global positions. Outside the ramps the
gain is the CONSTANT 1.0 (never ``n_ramp * (1/n_ramp)``, which rounds),
so pre-fade-out / post-fade-in regions are bitwise passthroughs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import FMT_FLT, Stream

# -- pan ---------------------------------------------------------------------


def pan_gains(pan: float, channels: int) -> Tuple[float, float]:
    """(gl, gr) for the given input width; float64 host math."""
    p = min(max(float(pan), -1.0), 1.0)
    if channels == 2:
        return min(1.0, 1.0 - p), min(1.0, 1.0 + p)
    theta = (p + 1.0) * math.pi / 4.0
    return math.cos(theta), math.sin(theta)


def pan_array(data, pan: float, xp=jnp):
    """[C, N] -> [2, N] panned stereo (C in {1, 2})."""
    gl, gr = pan_gains(pan, data.shape[0])
    g = xp.asarray([[gl], [gr]], dtype=xp.float32)
    if data.shape[0] == 1:
        data = xp.concatenate([data, data], axis=0)
    return data * g


def pan_stream(stream: Stream, pan: float) -> Stream:
    if stream.channels == 2 and float(pan) == 0.0:
        return stream                      # bitwise passthrough
    return stream.with_data(pan_array(stream.data, pan), fmt=FMT_FLT)


def pan_reference(data: np.ndarray, pan: float) -> np.ndarray:
    """Float64 mirror (same gains, f64 accumulate) for golden tests."""
    gl, gr = pan_gains(pan, data.shape[0])
    x = data.astype(np.float64)
    if x.shape[0] == 1:
        x = np.concatenate([x, x], axis=0)
    return (x * np.array([[gl], [gr]])).astype(np.float32)


# -- fade --------------------------------------------------------------------

_RAMP_MAX_MS = 60_000.0       # keeps ramp sample counts < 2^24 at 192 kHz


@dataclasses.dataclass(frozen=True)
class FadeSpec:
    """Host-resolved integer anchors (exact; see module docstring).

    ``anchor_end`` switches the fade-out from the absolute
    ``out_start`` anchor to "ends at the stream's traced length" —
    available offline/dp/sp where the length is known at trace time;
    the streaming planner rejects it (a causal stream cannot anchor at
    its own end)."""

    n_in: int                 # fade-in ramp length in samples (0 = none)
    out_start: int            # fade-out ramp start sample (0 = none)
    n_out: int                # fade-out ramp length in samples
    anchor_end: bool = False

    @property
    def out_end(self) -> int:
        return self.out_start + self.n_out

    @property
    def is_noop(self) -> bool:
        if self.anchor_end:
            return self.n_in == 0 and self.n_out == 0
        return self.n_in == 0 and self.out_start == 0


def fade_spec(rate: int, in_ms: float, out_start_s: float,
              out_ms: float, anchor_end: bool = False) -> FadeSpec:
    in_ms = min(max(float(in_ms), 0.0), _RAMP_MAX_MS)
    out_ms = min(max(float(out_ms), 0.0), _RAMP_MAX_MS)
    out_start_s = max(float(out_start_s), 0.0)
    n_in = int(round(in_ms * 1e-3 * rate))
    # int32 position arithmetic: keep out_end + any chunk width < 2^31.
    out_start = min(int(round(out_start_s * rate)), 1 << 30)
    n_out = int(round(out_ms * 1e-3 * rate))
    if anchor_end:
        return FadeSpec(n_in=n_in, out_start=0, n_out=n_out,
                        anchor_end=True)
    if out_start == 0:
        n_out = 0                     # out_start_s == 0 disables fade-out
    return FadeSpec(n_in=n_in, out_start=out_start, n_out=n_out)


def fade_gain(spec: FadeSpec, pos0, width: int, xp=jnp):
    """[width] f32 gain at global positions pos0 + i. Exactly 1.0
    outside the ramps; 0.0 after the fade-out completes."""
    p = pos0 + xp.arange(width, dtype=xp.int32)
    g = None
    if spec.n_in > 0:
        ramp = xp.minimum(p, xp.int32(spec.n_in)).astype(xp.float32) \
            * xp.float32(1.0 / spec.n_in)
        g = xp.where(p >= xp.int32(spec.n_in), xp.float32(1.0), ramp)
    if spec.out_start > 0:
        # diff in [0, n_out] inside the ramp — int32-exact, f32-exact.
        diff = xp.clip(xp.int32(spec.out_end) - p, xp.int32(0),
                       xp.int32(max(spec.n_out, 1)))
        if spec.n_out > 0:
            ramp = diff.astype(xp.float32) * xp.float32(1.0 / spec.n_out)
        else:
            ramp = xp.zeros(width, dtype=xp.float32)
        g_out = xp.where(p < xp.int32(spec.out_start), xp.float32(1.0),
                         xp.where(p >= xp.int32(spec.out_end),
                                  xp.float32(0.0), ramp))
        g = g_out if g is None else g * g_out
    if g is None:
        g = xp.ones(width, dtype=xp.float32)
    return g


def fade_gain_end(spec: FadeSpec, pos0, width: int, length, xp=jnp):
    """[width] f32 gain with the fade-out anchored to END at the traced
    stream ``length`` (spec.n_out is the ramp length; spec.out_start is
    ignored). Only available where the length is known at trace time —
    offline/dp/sp renders; a causal stream cannot anchor at its end."""
    p = pos0 + xp.arange(width, dtype=xp.int32)
    if spec.n_in > 0:
        ramp = xp.minimum(p, xp.int32(spec.n_in)).astype(xp.float32) \
            * xp.float32(1.0 / spec.n_in)
        g = xp.where(p >= xp.int32(spec.n_in), xp.float32(1.0), ramp)
    else:
        g = xp.ones(width, dtype=xp.float32)
    if spec.n_out > 0:
        length = length.astype(xp.int32) if hasattr(length, "astype") \
            else xp.int32(length)
        diff = xp.clip(length - p, xp.int32(0), xp.int32(spec.n_out))
        ramp = diff.astype(xp.float32) * xp.float32(1.0 / spec.n_out)
        g_out = xp.where(p < length - xp.int32(spec.n_out),
                         xp.float32(1.0),
                         xp.where(p >= length, xp.float32(0.0), ramp))
        g = g * g_out if spec.n_in > 0 else g_out
    return g


def fade_stream(stream: Stream, spec: FadeSpec) -> Stream:
    if spec.is_noop:
        return stream                      # bitwise passthrough
    if spec.anchor_end:
        g = fade_gain_end(spec, jnp.int32(0), stream.capacity,
                          stream.length)
    else:
        g = fade_gain(spec, jnp.int32(0), stream.capacity)
    return stream.with_data(stream.data * g[None, :], fmt=FMT_FLT)


def fade_reference(data: np.ndarray, rate: int, in_ms: float,
                   out_start_s: float, out_ms: float,
                   anchor_end: bool = False) -> np.ndarray:
    """Float64 mirror with the same integer anchors."""
    spec = fade_spec(rate, in_ms, out_start_s, out_ms, anchor_end)
    n = data.shape[1]
    p = np.arange(n, dtype=np.int64)
    g = np.ones(n, dtype=np.float64)
    if spec.n_in > 0:
        g *= np.minimum(p, spec.n_in) / spec.n_in
    if spec.anchor_end:
        if spec.n_out > 0:
            ramp = np.clip(n - p, 0, spec.n_out) / spec.n_out
            g *= np.where(p < n - spec.n_out, 1.0, ramp)
    elif spec.out_start > 0:
        if spec.n_out > 0:
            ramp = np.clip(spec.out_end - p, 0, spec.n_out) / spec.n_out
        else:
            ramp = np.zeros(n)
        g *= np.where(p < spec.out_start, 1.0,
                      np.where(p >= spec.out_end, 0.0, ramp))
    return (data.astype(np.float64) * g[None, :]).astype(np.float32)


# -- streaming ---------------------------------------------------------------


def fade_stream_init():
    """Carry: the global sample position of the next chunk (int32)."""
    return (jnp.int32(0),)


def fade_stream_step(spec: FadeSpec, state, data, n):
    (pos0,) = state
    g = fade_gain(spec, pos0, data.shape[1])
    return (pos0 + n,), data * g[None, :]


# -- sharded (sp chain) local steps --------------------------------------------


def pan_sharded_local(x, pan: float):
    """Memoryless: per-channel gains, zero communication."""
    return pan_array(x, pan)


# -- stereo width (mid/side) --------------------------------------------------


def width_array(data, width: float, xp=jnp):
    """[2, N] -> [2, N] mid/side width scaling: out = (m + w s, m - w s)
    with m = 0.5 (L + R), s = 0.5 (L - R). w = 0 collapses to mono
    (both channels the mid sum), w = 2 doubles the side energy. Linear,
    time-invariant, memoryless — the same LTI class as the pan law.
    Callers special-case w == 1.0 BEFORE this (m + s re-associates
    0.5 L + 0.5 R + 0.5 L - 0.5 R, which is not bitwise L)."""
    half = xp.float32(0.5) if xp is jnp else 0.5
    m = half * (data[0] + data[1])
    s = half * (data[0] - data[1])
    ws = xp.float32(width) * s if xp is jnp else float(width) * s
    return xp.stack([m + ws, m - ws])


def width_stream(stream: Stream, width: float) -> Stream:
    if float(width) == 1.0 or stream.channels != 2:
        return stream                      # bitwise passthrough
    return stream.with_data(
        width_array(stream.data, width), fmt=FMT_FLT
    )


def width_reference(data: np.ndarray, width: float) -> np.ndarray:
    """Float64 mirror (same mid/side formulation, f64 accumulate)."""
    x = data.astype(np.float64)
    m = 0.5 * (x[0] + x[1])
    s = 0.5 * (x[0] - x[1])
    ws = float(width) * s
    return np.stack([m + ws, m - ws]).astype(np.float32)


def fade_sharded_local(x, spec: FadeSpec, axis_name: str, length=None):
    """Gain from the shard's global offset — zero communication (the
    same move as ops/modfx.tremolo_sharded_local). ``length`` is the
    traced GLOBAL valid length, required for anchor_end specs."""
    from jax import lax

    pos0 = lax.axis_index(axis_name).astype(jnp.int32) \
        * jnp.int32(x.shape[-1])
    if spec.anchor_end:
        g = fade_gain_end(spec, pos0, x.shape[-1], length)
    else:
        g = fade_gain(spec, pos0, x.shape[-1])
    return x * g[None, :]
