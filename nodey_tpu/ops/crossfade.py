"""Crossfade — two-input A->B blend over a timed window (target-spec
extension; the reference's closest analog is hand-automating two
amix weights, which cannot be sample-exact — src/processor/
audio-amix.cpp:296-307 weights are static per run).

The two inputs share one timeline (the same convention as every mixer
here: streams are placed by their pts/t0, zero-extended past their
length). Before the window the output is BITWISE input A; after it,
BITWISE input B — selection by ``jnp.where`` on the integer sample
index, never ``1.0 * A + 0.0 * B`` (which flips -0.0 signs). Inside
the window:

    u     = (i - n0) / n_dur                 i = global sample index
    linear:       gA = 1 - u,        gB = u
    equal_power:  gA = cos(pi u / 2), gB = sin(pi u / 2)
    out   = gA * A + gB * B

Exactness class: ANALYTIC time variance (the fade's family,
ops/fadepan.py) — the gain at sample i is a pure function of the int32
global index. ``i - n0`` is formed in int32 and converted to f32 only
where it is < n_dur <= 2^24 (window lengths clamp to 60 s), so any two
programs compute bit-equal gains at equal global positions. Streamed ==
offline BITWISE outside the window (pure index selection of input
data); inside it, the two-term blend ``gA*A + gB*B`` sits at the
across-program last-ulp bar — XLA's fma contraction is a per-program
choice (measured: 1-ulp diffs on ~6% of in-window samples between the
offline and streamed compilations; the same bar the chorus holds,
tests/test_modfx.py). The cross-chunk state is ONE int32 position (plus
the aligned-merge FIFOs every two-input node carries,
core/chunkflow.py).

Output length is max(len A, len B): content before the window can only
come from A, after it only from B, inside from both — so every nonzero
sample is covered, matching the mixers' drain-the-longest semantics
(reference: audio-amix.cpp:279-291).

Window anchors clamp to the same 2^30-sample ceiling as the fade
(processors/fade.py): a start past it raises a structured error rather
than silently relocating the splice.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.stream import FMT_FLT, Stream

_ANCHOR_MAX = 1 << 30          # same ceiling as ops/fadepan.fade_spec
_DUR_MAX_MS = 60_000.0         # keeps n_dur < 2^24 at 192 kHz

LAWS = ("equal_power", "linear")


def crossfade_spec(sample_rate: int, at_s: float,
                   dur_ms: float) -> Tuple[int, int]:
    """(n0, n_dur) in samples; structured error past the int32-exact
    anchor ceiling (~6.2 h at 48 kHz) instead of a silent relocation."""
    dur = min(max(float(dur_ms), 1.0), _DUR_MAX_MS)
    n_dur = max(int(round(dur * 1e-3 * sample_rate)), 1)
    n0 = int(round(max(float(at_s), 0.0) * sample_rate))
    if n0 + n_dur >= _ANCHOR_MAX:
        raise ProcessorRuntimeError(
            "Crossfade window exceeds the exact-anchor ceiling",
            "Crossfade windows must end within 2^30 samples of the "
            f"timeline start (about {_ANCHOR_MAX / sample_rate / 3600.0:.1f} "
            "hours at this sample rate) so gains stay int32-exact.",
            f"at_s={at_s} dur_ms={dur_ms} rate={sample_rate}",
        )
    return n0, n_dur


def crossfade_gains(pos0, width: int, n0: int, n_dur: int, law: str):
    """(gA, gB, before, after) at global positions pos0 + [0, width):
    f32 gain tracks for the window interior plus the bitwise-selection
    masks. ``pos0`` may be traced (int32)."""
    i = pos0 + jnp.arange(width, dtype=jnp.int32)
    before = i < jnp.int32(n0)
    after = i >= jnp.int32(n0 + n_dur)
    # In-window offsets are < n_dur <= 2^24: the int32 -> f32 convert is
    # exact. Clamp keeps the (masked-out) exterior finite.
    off = jnp.clip(i - jnp.int32(n0), 0, n_dur)
    u = off.astype(jnp.float32) * np.float32(1.0 / n_dur)
    if law == "linear":
        ga = np.float32(1.0) - u
        gb = u
    else:
        ga = jnp.cos(np.float32(0.5 * math.pi) * u)
        gb = jnp.sin(np.float32(0.5 * math.pi) * u)
    return ga, gb, before, after


def crossfade_blend(a, b, pos0, n0: int, n_dur: int, law: str):
    """Elementwise A->B blend of equal-shape [C, W] windows at global
    positions pos0 + [0, W): bitwise A before the window, bitwise B
    after it, gain blend inside."""
    ga, gb, before, after = crossfade_gains(
        pos0, a.shape[-1], n0, n_dur, law
    )
    mix = ga[None, :] * a + gb[None, :] * b
    return jnp.where(before[None, :], a,
                     jnp.where(after[None, :], b, mix))


def crossfade_streams(sa: Stream, sb: Stream, at_s: float, dur_ms: float,
                      law: str) -> Stream:
    """Offline crossfade of two whole Streams (equal rate and channel
    count, both at t0 0 — the processor validates)."""
    n0, n_dur = crossfade_spec(sa.rate, at_s, dur_ms)
    cap = max(sa.capacity, sb.capacity)

    def pad_to(s):
        idx = jnp.arange(s.capacity, dtype=jnp.int32)
        x = jnp.where((idx < s.length)[None, :], s.data, 0.0)
        if s.capacity < cap:
            x = jnp.pad(x, ((0, 0), (0, cap - s.capacity)))
        return x

    a, b = pad_to(sa), pad_to(sb)
    out = crossfade_blend(a, b, jnp.int32(0), n0, n_dur, law)
    length = jnp.maximum(sa.length, sb.length)
    idx = jnp.arange(cap, dtype=jnp.int32)
    out = jnp.where((idx < length)[None, :], out, 0.0)
    return Stream(data=out, length=length, rate=sa.rate,
                  channels=sa.channels, fmt=FMT_FLT)


def crossfade_reference(a: np.ndarray, b: np.ndarray, sample_rate: int,
                        at_s: float, dur_ms: float,
                        law: str) -> np.ndarray:
    """Float64 mirror over equal-length [C, N] arrays (pad first)."""
    n0, n_dur = crossfade_spec(sample_rate, at_s, dur_ms)
    n = a.shape[-1]
    i = np.arange(n, dtype=np.int64)
    u = np.clip((i - n0) / n_dur, 0.0, 1.0)
    if law == "linear":
        ga, gb = 1.0 - u, u
    else:
        ga = np.cos(0.5 * math.pi * u)
        gb = np.sin(0.5 * math.pi * u)
    xa = a.astype(np.float64)
    xb = b.astype(np.float64)
    mix = ga * xa + gb * xb
    out = np.where(i < n0, xa, np.where(i >= n0 + n_dur, xb, mix))
    return out.astype(np.float32)
