"""Signal-generator kernels — test oscillators and noise, exact by
construction (target-spec extension; the reference has no source other
than file decode, src/processor/audio-io.cpp:27-426 — a node editor
without a test oscillator cannot exercise a chain without media).

Design rules, matching the framework's exactness brand:

* **Tonal waveforms run on exact integer phase residues** — the same
  two-level modular tables as the modulation LFOs (ops/modfx.py):
  the phase at absolute sample ``t`` is the integer ``(t*NUM) mod M``
  with ``M = DEN * sample_rate < 2^24`` (f32-exact), so the offline
  program, every streamed chunk, and the float64 mirror all evaluate
  the IDENTICAL residue at the identical sample. Frequency quantizes
  to NUM/DEN cycles/s with the largest DEN keeping M f32-exact
  (worst-case error < 1/DEN_MAX Hz — fractions of a millihertz at
  48 kHz; inaudible, and documented in the node description).
* **Square is exactly ±gain** (an integer compare picks the sign);
  saw/triangle have one f32 division as their only rounding; sine
  adds the f32 ``sin`` evaluation (mirror agreement is the f32
  roundoff floor, like the tremolo LFO).
* **Noise is a counter hash of the absolute sample index** (Murmur3
  finalizer on ``index ^ f(seed, channel)``): stateless, so chunked
  streaming reproduces the offline buffer bitwise with zero carried
  RNG state, and two channels decorrelate by hashing the channel in.

No band-limiting (polyBLEP/additive) is applied to square/saw/triangle:
these are TEST signals whose sample-exact shape is the contract, the
same trade the reference's gain node makes (bit semantics over
band-puristry). The description says so.
"""

from __future__ import annotations

import fractions
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from nodey_tpu.core.stream import FMT_FLT, Stream
from nodey_tpu.ops.modfx import _phase_tables, advance_residue

_M_MAX = 1 << 24  # f32-exact integer ceiling for the phase modulus

WAVEFORMS = ("sine", "square", "triangle", "saw", "noise")


def osc_quantize(freq_hz: float, sample_rate: int) -> Tuple[int, int]:
    """(NUM, M): quantized oscillator frequency as NUM/DEN cycles/s with
    the largest DEN keeping M = DEN*rate < 2^24; returned as the
    per-sample residue increment NUM and the modulus M."""
    den_max = (_M_MAX - 1) // int(sample_rate)
    f = min(max(float(freq_hz), 1.0 / den_max), sample_rate / 2.0)
    frac = fractions.Fraction(f).limit_denominator(den_max)
    num, den = frac.numerator, frac.denominator
    m = den * int(sample_rate)
    assert 0 < m < _M_MAX, (m, "oscillator modulus must stay f32-exact")
    return num % m, m


def osc_residues(r0, width: int, num: int, m: int):
    """int32 residues [width]: (r0 + i*NUM) mod M for i in [0, width).
    ``r0`` may be traced (int32 < M). Overflow-safe via the modfx
    two-level host tables (ops/modfx.py:66-75)."""
    lo, hi = _phase_tables(num, m, width)
    i = jnp.arange(width, dtype=jnp.int32)
    part = (jnp.asarray(hi)[i >> 12] + jnp.asarray(lo)[i & 4095])  # < 2*M
    return (r0 + part) % jnp.int32(m)


def tone_block(kind: str, r0, width: int, num: int, m: int,
               gain: float = 1.0):
    """f32 [width] waveform values in [-gain, gain] at residue positions
    r0 + i*NUM (mod M).

    The modulus division and the output gain fold into ONE trace-time f32
    constant, and every pre-multiply term stays in exact int32 — each
    waveform is integer arithmetic plus a single f32 multiply (sine adds
    the opaque ``sin``, which the gain cannot migrate into). With no
    division to reassociate and no multiply-add shape for fma contraction
    to vary on, different programs (offline whole-clip vs per-chunk
    streamed) produce bitwise-identical samples; the streamed==offline
    tests pin this."""
    r = osc_residues(r0, width, num, m)
    g = float(gain)
    if kind == "sine":
        # One multiply by the folded angular step, then sin, then gain —
        # sin is opaque to the simplifier, so the gain cannot migrate.
        phase = r.astype(jnp.float32) * np.float32(2.0 * math.pi / m)
        return jnp.sin(phase) * np.float32(g)
    if kind == "square":
        # Exact integer half-period test: +gain on [0, M/2), -gain after.
        return jnp.where(2 * r < m, np.float32(g), np.float32(-g))
    s = 2 * r - m  # int32 in (-M, M): f32-exact
    if kind == "saw":
        return s.astype(jnp.float32) * np.float32(g / m)
    if kind == "triangle":
        # -gain at phase 0, +gain at phase 1/2, back down:
        # g*(2|s|/M - 1) = (2|s| - M) * (g/M) with 2|s| - M an exact
        # int32 in [-M, M) — integer math plus ONE f32 multiply, so no
        # multiply-add shape exists for fma contraction to vary on.
        return (2 * jnp.abs(s) - m).astype(jnp.float32) * np.float32(g / m)
    raise ValueError(f"unknown waveform kind: {kind}")


# -- counter-hash noise ------------------------------------------------------------

_FMIX_C1 = np.uint32(0x85EBCA6B)
_FMIX_C2 = np.uint32(0xC2B2AE35)


def _fmix32(h):
    """Murmur3 finalizer: a full-avalanche uint32 -> uint32 bijection."""
    h = h ^ (h >> 16)
    h = h * _FMIX_C1
    h = h ^ (h >> 13)
    h = h * _FMIX_C2
    return h ^ (h >> 16)


def noise_block(seed: int, channel: int, pos0, width: int,
                gain: float = 1.0):
    """f32 [width] white noise in [-gain, gain): hash of the absolute
    sample index — identical values for identical indices in every
    execution plan (offline, streamed, mirror). ``pos0`` may be traced
    int32. Gain folds into the dequantization constants (see
    tone_block's rounding note)."""
    i = pos0 + jnp.arange(width, dtype=jnp.int32)
    key = np.uint32((seed * 0x9E3779B9 + channel * 0x7FEB352D) & 0xFFFFFFFF)
    h = _fmix32(i.astype(jnp.uint32) ^ key)
    # Top 23 bits, centered in INTEGER space: (h>>9) - 2^22 is an exact
    # int32 in [-2^22, 2^22) -> exact f32, then ONE multiply maps to
    # [-gain, gain) — no multiply-add shape for fma contraction to vary.
    g = float(gain)
    centered = (h >> np.uint32(9)).astype(jnp.int32) - jnp.int32(1 << 22)
    return centered.astype(jnp.float32) * np.float32(g * 2.0 ** -22)


# -- block synthesis ---------------------------------------------------------------


def generator_block(kind: str, num: int, m: int, gain: float, seed: int,
                    channels: int, pos0, r0, width: int):
    """f32 [channels, width] generator samples starting at absolute
    sample ``pos0`` (residue ``r0 = (pos0*NUM) mod M``). Tonal waveforms
    are identical across channels; noise decorrelates per channel."""
    if kind == "noise":
        rows = [noise_block(seed, c, pos0, width, gain)
                for c in range(channels)]
        return jnp.stack(rows)
    row = tone_block(kind, r0, width, num, m, gain)
    return jnp.broadcast_to(row[None, :], (channels, width))


def generator_stream(kind: str, freq_hz: float, gain: float, seed: int,
                     rate: int, channels: int, total: int,
                     capacity: int) -> Stream:
    """Offline synthesis: a whole Stream with ``total`` valid samples
    (zero past the end, the Stream padding contract)."""
    num, m = osc_quantize(freq_hz, rate)
    data = generator_block(kind, num, m, gain, seed, channels,
                           jnp.int32(0), jnp.int32(0), capacity)
    idx = jnp.arange(capacity, dtype=jnp.int32)[None, :]
    data = jnp.where(idx < total, data, np.float32(0.0))
    return Stream(data=data, length=jnp.int32(total), rate=rate,
                  channels=channels, fmt=FMT_FLT)


# -- chunk streaming: int32 position + phase-residue carries ------------------------


def generator_stream_init():
    return {"pos": jnp.int32(0), "r": jnp.int32(0)}


def generator_stream_step(kind: str, num: int, m: int, gain: float,
                          seed: int, channels: int, total: int,
                          state, width: int):
    """One streamed chunk at the carried absolute position. Values are
    bitwise the offline buffer's: both paths evaluate the same residue /
    index hash at the same absolute sample."""
    pos, r = state["pos"], state["r"]
    data = generator_block(kind, num, m, gain, seed, channels, pos, r, width)
    n = jnp.clip(jnp.int32(total) - pos, 0, width)
    idx = jnp.arange(width, dtype=jnp.int32)[None, :]
    data = jnp.where(idx < n, data, np.float32(0.0))
    done = (pos + width) >= total
    # Advance clamps at ``total`` so indefinite post-EOF flush steps
    # cannot overflow the int32 position.
    new_state = {
        "pos": jnp.minimum(pos + width, jnp.int32(total)),
        "r": jnp.where(
            done, r, advance_residue(r, jnp.int32(width), num, m, width)
        ),
    }
    return new_state, data, n, done


# -- float64 mirror ----------------------------------------------------------------


def generator_reference(kind: str, freq_hz: float, gain: float, seed: int,
                        rate: int, channels: int, total: int) -> np.ndarray:
    """Float64 mirror on the same integer residues / index hashes."""
    num, m = osc_quantize(freq_hz, rate)
    t = np.arange(total, dtype=np.int64)
    r = (t * num) % m
    if kind == "sine":
        row = np.sin(2.0 * math.pi * r / m)
    elif kind == "square":
        row = np.where(2 * r < m, 1.0, -1.0)
    elif kind == "saw":
        row = (2 * r - m) / m
    elif kind == "triangle":
        row = 2.0 * np.abs(2 * r - m) / m - 1.0
    elif kind == "noise":
        rows = []
        for c in range(channels):
            key = np.uint32(
                (seed * 0x9E3779B9 + c * 0x7FEB352D) & 0xFFFFFFFF
            )
            with np.errstate(over="ignore"):
                h = _fmix32_np(t.astype(np.uint32) ^ key)
            rows.append((h >> 9).astype(np.float64) * 2.0 ** -22 - 1.0)
        return (np.stack(rows) * float(gain)).astype(np.float64)
    else:
        raise ValueError(f"unknown waveform kind: {kind}")
    out = np.broadcast_to(row[None, :], (channels, total))
    return out * float(gain)


def _fmix32_np(h: np.ndarray) -> np.ndarray:
    h = h.astype(np.uint32)
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    return h ^ (h >> np.uint32(16))
