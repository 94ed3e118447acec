"""Modulation effects — tremolo and chorus/flanger (target-spec
extensions; the reference ships no modulation effects — with these the
node set covers the full standard channel-strip/send palette).

Both are TIME-VARIANT (an LFO modulates gain or delay), which breaks
the overlap-discard LTI sharding story — but unlike WSOLA, the time
variance is ANALYTIC: the modulation at sample t is a pure function of
the global sample index. So every render path (offline, chunk-streamed,
sp-sharded) can evaluate the identical modulation value at the identical
global position, and the only cross-chunk/cross-shard state is WHERE IN
THE CLIP WE ARE — an integer.

**Exact LFO phase as modular-integer residues** (the same move as the
PV's 16.16 hop numerators, ops/pv.py): float phase accumulation drifts
(f32 can't even hold a sample index past 2^24), so the LFO rate is
quantized to NUM/DEN cycles/second with DEN <= 128 (1/128 Hz steps —
inaudible) and phase is tracked as an integer residue

    r(pos) = (pos * NUM) mod M,       M = DEN * sample_rate  (< 2^23)

advanced and decomposed entirely in int32 with host-precomputed
two-level tables (i*NUM mod M for i < 4096, and j*4096*NUM mod M), so
no intermediate ever overflows and any two programs compute bit-equal
residues at equal global positions. theta = 2*pi*r/M then feeds one f32
cos; M < 2^24 keeps the int->f32 conversion exact.

**Tremolo**: out[t] = x[t] * (1 - depth * (0.5 - 0.5*cos theta)) — at
depth 0 the gain is EXACTLY 1.0 (bitwise passthrough). Elementwise; no
receptive field.

**Chorus**: out = dry*x + wet * mean_v x[t - d_v(t)],
d_v(t) = base + depth * (0.5 - 0.5*cos(theta + v/V turns)), evaluated
as a gathered linear interpolation (two jnp.take per voice). A small
``base`` (1-10 ms) with one voice is the classic flanger sweep; larger
base (15-30 ms) with 2-3 detuned voices is chorus. FIR (no feedback),
so the receptive field is finite: ceil(base + depth) + 2 samples.
"""

from __future__ import annotations

import fractions
import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import FMT_FLT, Stream

_DEN_MAX = 128          # LFO rate quantum: 1/128 Hz
_LO_BITS = 12           # two-level phase table split (4096)
_LO = 1 << _LO_BITS


def lfo_quantize(rate_hz: float, sample_rate: int) -> Tuple[int, int]:
    """(NUM, M): quantized LFO rate as NUM/DEN cycles/s with DEN <= 128,
    returned as the per-sample residue increment NUM and the modulus
    M = DEN * sample_rate."""
    frac = fractions.Fraction(
        max(float(rate_hz), 1.0 / _DEN_MAX)
    ).limit_denominator(_DEN_MAX)
    num, den = frac.numerator, frac.denominator
    m = den * int(sample_rate)
    assert m < (1 << 24), (m, "LFO modulus must stay f32-exact")
    return num, m


def _phase_tables(num: int, m: int, width: int):
    """Host-exact int32 tables: lo[i] = (i*NUM) mod M for i < 4096 and
    hi[j] = (j*4096*NUM) mod M for j <= width//4096 (Python ints — no
    overflow anywhere)."""
    lo = np.array([(i * num) % m for i in range(_LO)], dtype=np.int32)
    n_hi = width // _LO + 1
    hi = np.array([(j * _LO * num) % m for j in range(n_hi)],
                  dtype=np.int32)
    return lo, hi


def lfo_turns(r0, width: int, num: int, m: int, offset_turns: float = 0.0):
    """f32 LFO phase in turns [width] at residue positions r0 + i*NUM
    (mod M), i in [0, width). ``r0`` may be traced (int32 < M). The
    int->f32 conversion is exact (M < 2^24); ``offset_turns`` adds a
    static per-voice offset."""
    lo, hi = _phase_tables(num, m, width)
    i = jnp.arange(width, dtype=jnp.int32)
    part = (jnp.asarray(hi)[i >> _LO_BITS]
            + jnp.asarray(lo)[i & (_LO - 1)])          # < 2*M
    r = (r0 + part) % jnp.int32(m)                     # < 3*M << 2^31
    turns = r.astype(jnp.float32) / np.float32(m)
    if offset_turns:
        turns = turns + np.float32(offset_turns)
    return turns


def advance_residue(r0, n, num: int, m: int, width: int):
    """(r0 + n*NUM) mod M for a traced valid count n <= width, via the
    same overflow-safe tables."""
    lo, hi = _phase_tables(num, m, width)
    part = jnp.asarray(hi)[n >> _LO_BITS] + jnp.asarray(lo)[n & (_LO - 1)]
    return (r0 + part) % jnp.int32(m)


# -- tremolo ---------------------------------------------------------------------


def tremolo_gain(r0, width: int, num: int, m: int, depth: float):
    """[width] f32 gain 1 - depth*(0.5 - 0.5*cos theta); exactly 1.0
    everywhere at depth == 0."""
    turns = lfo_turns(r0, width, num, m)
    s = np.float32(0.5) - np.float32(0.5) * jnp.cos(
        np.float32(2.0 * math.pi) * turns
    )
    return np.float32(1.0) - np.float32(depth) * s


def tremolo_stream(stream: Stream, rate_hz: float, depth: float) -> Stream:
    """Offline tremolo over a whole Stream (phase 0 at stream sample 0)."""
    num, m = lfo_quantize(rate_hz, stream.rate)
    g = tremolo_gain(jnp.int32(0), stream.capacity, num, m, depth)
    return stream.with_data(stream.data * g[None, :], fmt=FMT_FLT)


def tremolo_reference(data: np.ndarray, sample_rate: int, rate_hz: float,
                      depth: float) -> np.ndarray:
    """Float64 mirror with the same exact integer phase residues."""
    num, m = lfo_quantize(rate_hz, sample_rate)
    n = data.shape[1]
    r = (np.arange(n, dtype=np.int64) * num) % m
    s = 0.5 - 0.5 * np.cos(2.0 * math.pi * r / m)
    g = 1.0 - float(depth) * s
    return (data.astype(np.float64) * g[None, :]).astype(np.float32)


# -- chorus ----------------------------------------------------------------------


def chorus_spec(sample_rate: int, base_ms: float, depth_ms: float,
                voices: int) -> Tuple[float, float, int]:
    """(base, depth, hist) in samples: modulation bounds and the history
    length (receptive field) the streaming ring / sharded halo must
    cover."""
    base = max(float(base_ms), 0.0) * 1e-3 * sample_rate
    depth = max(float(depth_ms), 0.0) * 1e-3 * sample_rate
    hist = int(math.ceil(base + depth)) + 2
    return base, depth, hist


def chorus_wet(x_ext, r0, width: int, num: int, m: int, base: float,
               depth: float, voices: int):
    """Wet sum over voices from ``x_ext`` [C, hist + width] (hist
    samples of left context): for output i, gathers
    x_ext[hist + i - d_v(i)] with linear interpolation. Voice v's LFO
    is offset v/V turns. Returns [C, width]."""
    hist = x_ext.shape[1] - width
    i = jnp.arange(width, dtype=jnp.int32)
    acc = None
    for v in range(voices):
        turns = lfo_turns(r0, width, num, m, offset_turns=v / voices)
        s = np.float32(0.5) - np.float32(0.5) * jnp.cos(
            np.float32(2.0 * math.pi) * turns
        )
        d = np.float32(base) + np.float32(depth) * s       # [width]
        di = jnp.floor(d).astype(jnp.int32)
        frac = d - di.astype(jnp.float32)
        pos = hist + i - di                                # >= 1
        a = jnp.take(x_ext, pos, axis=1)
        b = jnp.take(x_ext, pos - 1, axis=1)
        wetv = (np.float32(1.0) - frac)[None, :] * a + frac[None, :] * b
        acc = wetv if acc is None else acc + wetv
    return acc * np.float32(1.0 / voices)


def chorus_stream(stream: Stream, rate_hz: float, base_ms: float,
                  depth_ms: float, voices: int, wet: float,
                  dry: float) -> Stream:
    """Offline chorus over a whole Stream (length-preserving; the wet
    path reads zeros before the clip start, like a real delay line that
    starts empty)."""
    num, m = lfo_quantize(rate_hz, stream.rate)
    base, depth, hist = chorus_spec(stream.rate, base_ms, depth_ms, voices)
    idx = jnp.arange(stream.capacity, dtype=jnp.int32)
    x = jnp.where((idx < stream.length)[None, :], stream.data, 0.0)
    x_ext = jnp.pad(x, ((0, 0), (hist, 0)))
    w = chorus_wet(x_ext, jnp.int32(0), stream.capacity, num, m, base,
                   depth, voices)
    y = np.float32(dry) * x + np.float32(wet) * w
    y = jnp.where((idx < stream.length)[None, :], y, 0.0)
    return stream.with_data(y, fmt=FMT_FLT)


def chorus_reference(data: np.ndarray, sample_rate: int, rate_hz: float,
                     base_ms: float, depth_ms: float, voices: int,
                     wet: float, dry: float) -> np.ndarray:
    """Float64 mirror with the same exact integer phase residues."""
    num, m = lfo_quantize(rate_hz, sample_rate)
    base, depth, hist = chorus_spec(sample_rate, base_ms, depth_ms, voices)
    c, n = data.shape
    x = np.concatenate(
        [np.zeros((c, hist)), data.astype(np.float64)], axis=1
    )
    out = float(dry) * data.astype(np.float64)
    i = np.arange(n, dtype=np.int64)
    for v in range(voices):
        r = (i * num) % m
        turns = r / m + v / voices
        s = 0.5 - 0.5 * np.cos(2.0 * math.pi * turns)
        d = base + depth * s
        di = np.floor(d).astype(np.int64)
        frac = d - di
        pos = hist + i - di
        a = x[:, pos]
        b = x[:, pos - 1]
        out += float(wet) / voices * ((1.0 - frac) * a + frac * b)
    return out.astype(np.float32)


# -- streaming -------------------------------------------------------------------


def tremolo_stream_init():
    """Carry: the LFO phase residue at the next sample (int32 < M)."""
    return (jnp.int32(0),)


def tremolo_stream_step(params, state, data, n):
    num, m, depth = params
    (r0,) = state
    w = data.shape[1]
    g = tremolo_gain(r0, w, num, m, depth)
    r1 = advance_residue(r0, n, num, m, w)
    return (r1,), data * g[None, :]


def chorus_stream_init(channels: int, hist: int):
    """Carry: (input-history ring [C, hist], phase residue int32)."""
    return (jnp.zeros((channels, hist), dtype=jnp.float32), jnp.int32(0))


def chorus_stream_step(params, state, data, n):
    """One chunk [C, W], n valid: wet from [ring ++ chunk] at the exact
    global phase residues; ring and residue advance by n. Length-
    preserving (out_n == n), so no flush protocol is needed."""
    num, m, base, depth, voices, wet, dry = params
    ring, r0 = state
    w = data.shape[1]
    idx = jnp.arange(w, dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    ext = jnp.concatenate([ring, x], axis=1)
    wetsum = chorus_wet(ext, r0, w, num, m, base, depth, voices)
    out = np.float32(dry) * x + np.float32(wet) * wetsum
    out = jnp.where((idx < n)[None, :], out, 0.0)
    from jax import lax

    ring = lax.dynamic_slice(ext, (jnp.int32(0), n), ring.shape)
    r1 = advance_residue(r0, n, num, m, w)
    return (ring, r1), out


# -- sharded (sp chain) local steps ------------------------------------------------


def shard_residue(num: int, m: int, chunk: int, axis_name: str):
    """This shard's starting phase residue: (axis_index * chunk * NUM)
    mod M, with the per-shard advance (chunk*NUM mod M) reduced on host
    so the device product axis_index * adv stays < sp * M << 2^31."""
    from jax import lax

    adv = (chunk * num) % m            # host Python int — exact
    i = lax.axis_index(axis_name)
    return (i.astype(jnp.int32) * jnp.int32(adv)) % jnp.int32(m)


def tremolo_sharded_local(x, rate_hz: float, depth: float,
                          sample_rate: int, axis_name: str):
    """Per-shard tremolo body: phase from the shard's global offset —
    no communication at all."""
    num, m = lfo_quantize(rate_hz, sample_rate)
    r0 = shard_residue(num, m, x.shape[-1], axis_name)
    g = tremolo_gain(r0, x.shape[-1], num, m, depth)
    return x * g[None, :]


def chorus_sharded_local(x, length, rate_hz: float, base_ms: float,
                         depth_ms: float, voices: int, wet: float,
                         dry: float, sample_rate: int, axis_name: str):
    """Per-shard chorus body: the left halo (receptive field ``hist``)
    arrives via ppermute halo exchange; phase from the shard's global
    offset. Output masked to the global valid length so the
    zero-padding invariant survives."""
    from jax import lax

    from nodey_tpu.parallel.ops import halo_exchange_nd

    num, m = lfo_quantize(rate_hz, sample_rate)
    base, depth, hist = chorus_spec(sample_rate, base_ms, depth_ms, voices)
    chunk = x.shape[-1]
    ext = halo_exchange_nd(x, left_halo=hist, right_halo=0,
                           axis_name=axis_name)
    r0 = shard_residue(num, m, chunk, axis_name)
    wetsum = chorus_wet(ext, r0, chunk, num, m, base, depth, voices)
    out = np.float32(dry) * x + np.float32(wet) * wetsum
    gidx = lax.axis_index(axis_name) * chunk + jnp.arange(
        chunk, dtype=jnp.int32
    )
    return jnp.where(gidx[None, :] < length, out, 0.0)
