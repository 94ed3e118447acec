"""Phaser — K cascaded first-order allpass stages swept by an exact
integer-residue LFO (target-spec extension; the reference ships no
modulation effects — this completes the classic trio next to
tremolo/chorus, ops/modfx.py).

Like tremolo/chorus the modulation is ANALYTIC time variance: the
allpass coefficient at sample t is a pure function of the global sample
index (LFO phase as exact modular-integer residues, ops/modfx.py), so
offline, chunk-streamed and sp-sharded renders evaluate the identical
coefficient at the identical global position. Unlike them the effect is
RECURSIVE — each stage carries IIR state — so the cross-program state is
a per-stage scalar pair, not just a position.

Math (classic phaser, e.g. the unit analyzed in J. O. Smith's
"Physical Audio Signal Processing" phaser chapter):

    s[n]  = 0.5 - 0.5 cos(2 pi turns[n])        exact LFO residues
    f[n]  = f_min * (f_max / f_min)^s[n]        exponential sweep (Hz)
    t[n]  = tan(pi f[n] / rate)
    a[n]  = (t[n] - 1) / (t[n] + 1)             in (-1, 0)
    stage (x K):  y[n] = a[n] x[n] + x[n-1] - a[n] y[n-1]
    out   = dry * x + wet * y_K                 K/2 sweeping notches

Each stage is H(z) = (a + z^-1)/(1 + a z^-1) — unit magnitude at every
frequency, phase falling 0..-2pi; summed with the dry path, frequencies
where the cascade phase crosses odd multiples of pi cancel, giving the
moving notch comb. ``wet == 0`` (with dry 1) is a bitwise passthrough.

**Device formulation.** The stage recurrence is a first-order linear
recurrence with a TIME-VARYING pole p[n] = -a[n] in (0, 1) and drive
u[n] = a[n] x[n] + x[n-1]: it runs as ONE associative pair scan over
affine maps (ops/scans.tv_ar1_scan) — log-depth on device, every
intermediate bounded by the drive scale since |p| < 1. The scan's
cumulative pole products P_cum fold nonzero initial state in exactly
(y_s[n] = y[n] + P_cum[n] * s), which is how:

* **streaming** carries per-stage (x_prev, y_prev) scalars plus the LFO
  residue across chunks (bounded memory, any clip length), and
* **sp sharding** evaluates the same carry SPATIALLY: per-stage
  one-sample left halo for x[n-1], zero-init local scans, then a
  log2(sp)-step ``ppermute`` doubling of the per-shard affine summaries
  (P_shard, y_end) — the same move as the compressor's smoother prefix
  (ops/dynamics._sharded_s_log) but with DYNAMIC pole products, since a
  swept pole admits no host-precomputed step weights.

No feedback path: a feedback phaser re-enters stage 1 through all K
stages (one global recurrence of order K with time-varying
coefficients), which has no per-stage scan decomposition — the classic
feedforward unit is what ships.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream
from nodey_tpu.ops import modfx
from nodey_tpu.ops.scans import tv_ar1_scan


def phaser_spec(sample_rate: int, rate_hz: float, f_min: float,
                f_max: float) -> Tuple[int, int, float, float]:
    """(NUM, M, k0, k1): quantized LFO constants plus the log-sweep
    affine map ln f = k0 + s * k1, with the sweep band clamped inside
    the Nyquist interval for this rate (f in [20 Hz, 0.45 * rate], so
    t = tan(pi f / rate) stays in (0, tan(0.45 pi)) and a in (-1, 1))."""
    num, m = modfx.lfo_quantize(rate_hz, sample_rate)
    fmin = min(max(float(f_min), 20.0), 0.40 * sample_rate)
    fmax = min(max(float(f_max), fmin), 0.45 * sample_rate)
    k0 = math.log(fmin)
    k1 = math.log(fmax / fmin)
    return num, m, k0, k1


def phaser_coeffs(r0, width: int, num: int, m: int, k0: float, k1: float,
                  rate: int):
    """f32 allpass coefficient track a[i] (< 0) for global positions
    r0 + i, i in [0, width), from exact integer phase residues."""
    turns = modfx.lfo_turns(r0, width, num, m)
    s = np.float32(0.5) - np.float32(0.5) * jnp.cos(
        np.float32(2.0 * math.pi) * turns
    )
    f = jnp.exp(np.float32(k0) + s * np.float32(k1))
    t = jnp.tan(np.float32(math.pi / rate) * f)
    return (t - np.float32(1.0)) / (t + np.float32(1.0))


def _shift1(x, head):
    """x delayed one sample along the last axis; ``head`` [C, 1] fills
    position 0 (zeros offline, the carried x_prev when streaming)."""
    return jnp.concatenate([head, x[:, :-1]], axis=1)


def phaser_apply(x, a, stages: int, wet: float, dry: float,
                 x_prev=None, y_prev=None):
    """The K-stage cascade over one window ``x`` [C, W] with coefficient
    track ``a`` [W]. ``x_prev``/``y_prev`` [K, C] are the per-stage
    carries (zeros when None). Returns (out [C, W], new_x_prev, new_y_prev
    as stage-major stacks of the window's LAST column — gather the column
    you need before masking when the valid length is shorter)."""
    c = x.shape[0]
    p = -a
    xs_last, ys_last = [], []
    cur = x
    for k in range(stages):
        head = (jnp.zeros((c, 1), x.dtype) if x_prev is None
                else x_prev[k][:, None])
        xm1 = _shift1(cur, head)
        u = a[None, :] * cur + xm1
        if y_prev is not None:
            # Fold the carried state into the first drive sample: the
            # recurrence y[0] = p[0] y_prev + u[0] is exactly a scan
            # with u'[0] = u[0] + p[0] * y_prev.
            u = u.at[:, 0].add(p[0] * y_prev[k])
        xs_last.append(cur)
        _, y = tv_ar1_scan(u, p)
        cur = y
        ys_last.append(y)
    out = np.float32(dry) * x + np.float32(wet) * cur
    return out, xs_last, ys_last


def phaser_stream(stream: Stream, rate_hz: float, f_min: float,
                  f_max: float, stages: int, wet: float,
                  dry: float) -> Stream:
    """Offline phaser over a whole Stream (phase 0 and empty allpass
    state at stream sample 0; length-preserving)."""
    num, m, k0, k1 = phaser_spec(stream.rate, rate_hz, f_min, f_max)
    idx = jnp.arange(stream.capacity, dtype=jnp.int32)
    x = jnp.where((idx < stream.length)[None, :], stream.data, 0.0)
    a = phaser_coeffs(jnp.int32(0), stream.capacity, num, m, k0, k1,
                      stream.rate)
    out, _, _ = phaser_apply(x, a, stages, wet, dry)
    out = jnp.where((idx < stream.length)[None, :], out, 0.0)
    return stream.with_data(out, fmt=FMT_FLT)


def phaser_reference(data: np.ndarray, sample_rate: int, rate_hz: float,
                     f_min: float, f_max: float, stages: int, wet: float,
                     dry: float) -> np.ndarray:
    """Float64 sequential mirror with the same exact integer phase
    residues (coefficients and recurrence both in float64; the SNR gap
    to the device path is f32 transcendentals + scan re-association)."""
    num, m, k0, k1 = phaser_spec(sample_rate, rate_hz, f_min, f_max)
    c, n = data.shape
    i = np.arange(n, dtype=np.int64)
    r = (i * num) % m
    s = 0.5 - 0.5 * np.cos(2.0 * math.pi * r / m)
    f = np.exp(k0 + s * k1)
    t = np.tan(math.pi / sample_rate * f)
    a = (t - 1.0) / (t + 1.0)
    x = data.astype(np.float64)
    out = float(dry) * x.copy()
    cur = x
    for _ in range(stages):
        y = np.zeros_like(cur)
        xm1 = 0.0
        ym1 = np.zeros(c)
        for j in range(n):
            y[:, j] = a[j] * cur[:, j] + xm1 - a[j] * ym1
            xm1 = cur[:, j]
            ym1 = y[:, j]
        cur = y
    out += float(wet) * cur
    return out.astype(np.float32)


# -- streaming -------------------------------------------------------------------


def phaser_stream_init(channels: int, stages: int):
    """Carry: per-stage previous input/output columns [K, C] each, plus
    the LFO phase residue at the next sample. Two DISTINCT zero arrays:
    the streaming executor donates state buffers, and an aliased pair
    would be the same buffer donated twice."""
    return (
        jnp.zeros((stages, channels), dtype=jnp.float32),
        jnp.zeros((stages, channels), dtype=jnp.float32),
        jnp.int32(0),
    )


def phaser_stream_step(params, state, data, n):
    """One chunk [C, W], n valid. Length-preserving (out_n == n). The
    new per-stage carries gather at column n-1 (the last VALID sample);
    an all-padding chunk (n == 0) leaves the state untouched."""
    num, m, k0, k1, rate, stages, wet, dry = params
    x_prev, y_prev, r0 = state
    w = data.shape[1]
    idx = jnp.arange(w, dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    a = phaser_coeffs(r0, w, num, m, k0, k1, rate)
    out, xs_last, ys_last = phaser_apply(
        x, a, stages, wet, dry, x_prev=x_prev, y_prev=y_prev
    )
    out = jnp.where((idx < n)[None, :], out, 0.0)
    last = jnp.maximum(n - 1, 0)
    new_x = jnp.stack([cur[:, last] for cur in xs_last])
    new_y = jnp.stack([y[:, last] for y in ys_last])
    keep = (n > 0)
    new_x = jnp.where(keep, new_x, x_prev)
    new_y = jnp.where(keep, new_y, y_prev)
    r1 = modfx.advance_residue(r0, n, num, m, w)
    return (new_x, new_y, r1), out


# -- sharded (sp chain) local step --------------------------------------------------


def _affine_prefix_exclusive(p_end, v_end, axis_name: str, sp: int):
    """State entering each shard: the exclusive cross-shard prefix of
    per-shard affine summaries (P_i, V_i) -> y_in(i) for a recurrence
    with zero global initial state.

    Inclusive Hillis-Steele doubling over the mesh axis first (the
    received summary is the EARLIER operand of (Pa,Va) . (Pb,Vb) =
    (Pa Pb, Vb + Pb Va)); ppermute fills un-addressed shards with zeros,
    which is NOT the affine identity (P = 1), so every step gates on
    idx >= d — the same construction as ops/dynamics._sharded_s_log but
    with DYNAMIC products riding ICI alongside the values."""
    idx = lax.axis_index(axis_name)
    pv, vv = p_end, v_end
    d = 1
    while d < sp:
        perm = [(i, i + d) for i in range(sp - d)]
        pr = lax.ppermute(pv, axis_name, perm)
        vr = lax.ppermute(vv, axis_name, perm)
        np_, nv = pr * pv, vv + pv * vr
        pv = jnp.where(idx >= d, np_, pv)
        vv = jnp.where(idx >= d, nv, vv)
        d *= 2
    if sp > 1:
        prev = lax.ppermute(
            vv, axis_name, [(i, i + 1) for i in range(sp - 1)]
        )
        return jnp.where(idx == 0, jnp.zeros_like(vv), prev)
    return jnp.zeros_like(vv)


def phaser_sharded_local(x, length, rate_hz: float, f_min: float,
                         f_max: float, stages: int, wet: float,
                         dry: float, sample_rate: int, axis_name: str,
                         sp: int):
    """Per-shard phaser body: coefficient track from the shard's global
    offset, one-sample left halo per stage for x[n-1], zero-init local
    scans + the exclusive affine cross-shard prefix folding each stage's
    true entering state in via the local cumulative pole products."""
    from nodey_tpu.parallel.ops import halo_exchange_nd

    num, m, k0, k1 = phaser_spec(sample_rate, rate_hz, f_min, f_max)
    chunk = x.shape[-1]
    r0 = modfx.shard_residue(num, m, chunk, axis_name)
    a = phaser_coeffs(r0, chunk, num, m, k0, k1, sample_rate)
    p = -a
    gidx = lax.axis_index(axis_name) * chunk + jnp.arange(
        chunk, dtype=jnp.int32
    )
    x0 = x
    cur = x
    for _ in range(stages):
        ext = halo_exchange_nd(cur, left_halo=1, right_halo=0,
                               axis_name=axis_name)
        xm1 = ext[:, :chunk]
        u = a[None, :] * cur + xm1
        p_cum, y0 = tv_ar1_scan(u, p)
        s_in = _affine_prefix_exclusive(
            p_cum[:, -1], y0[:, -1], axis_name, sp
        )
        cur = y0 + p_cum * s_in[:, None]
    out = np.float32(dry) * x0 + np.float32(wet) * cur
    return jnp.where(gidx[None, :] < length, out, 0.0)
