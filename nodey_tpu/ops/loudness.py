"""Loudness measurement (ITU-R BS.1770-4) and normalization gain — the
two-pass whole-clip op behind ``audio_normalize`` (target-spec
extension; the reference has no level automation at all — its gain node
is a static slider, src/processor/audio-vol.cpp:75-100).

**Peak mode**: gain = 10^(target/20) / max|x| — one global reduction.

**LUFS mode** (integrated loudness, BS.1770-4):

1. K-weighting: two fixed biquads — a +4 dB high shelf (the acoustic
   head model) then a ~38 Hz high-pass (the RLB weighting). At 48 kHz
   the spec's exact coefficient table ships verbatim; other rates
   re-derive via the RBJ cookbook from the de-facto analog parameters
   (f_shelf = 1681.974451 Hz, G = 3.999843854 dB, Q = 0.707175237;
   f_hp = 38.135470876 Hz, Q = 0.500327037) — the standard re-design
   used by loudness meters for non-48k rates. Filtering runs on the
   same modal first-order scans as the EQ (ops/biquad.cascade_apply).
2. Mean-square per 400 ms block at 75 % overlap (100 ms hop), computed
   as hop-chunk partial sums then 4-chunk windows — no cumsum over the
   clip (a 14 M-sample f32 cumsum would lose the tail digits).
3. Gating: absolute at -70 LKFS, then relative at 10 LU below the
   absolute-gated mean — both as masked means over the block set
   (traced; no data-dependent shapes).
4. L_int = -0.691 + 10 log10(mean over gated blocks of the
   channel-weight sum). Channel weights are 1.0 for mono/stereo (the
   surround side weights never apply to this graph's 1-2 channels).

Whole-clip by construction (the gate needs every block before the gain
exists), so the node renders offline / batched-dp and refuses the
chunk-streaming path with ``UnstreamableGraphError`` — the same
documented fallback as the fade's ``anchor_end`` (processors/fade.py).

Verification anchors (tests/test_loudness.py): the BS.1770 calibration
property — a 0 dBFS 997 Hz sine in one channel reads −3.01 LKFS — plus
a float64 mirror and the gating behavior on loud-phrase/quiet-tail
material.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from nodey_tpu.ops import biquad as bq

# BS.1770-4 Table 1/2 coefficients, exact at 48 kHz.
_SHELF_48K = ([1.53512485958697, -2.69169618940638, 1.19839281085285],
              [-1.69065929318241, 0.73248077421585])
_HP_48K = ([1.0, -2.0, 1.0],
           [-1.99004745483398, 0.99007225036621])

# De-facto analog parameters behind the 48 kHz table (Mansbridge /
# pyloudnorm re-derivation) for other sample rates.
_SHELF_F, _SHELF_G, _SHELF_Q = 1681.9744509555319, 3.99984385397, \
    0.7071752369554193
_HP_F, _HP_Q = 38.13547087613982, 0.5003270373253953

ABS_GATE_LKFS = -70.0
REL_GATE_LU = 10.0
BLOCK_S = 0.400
HOP_S = 0.100
_OFFSET = -0.691
_SILENCE_FLOOR = -120.0        # returned when no block passes the gate


def _coef(b: List[float], a: List[float]) -> bq.BiquadCoef:
    return bq.BiquadCoef(b0=b[0], b1=b[1], b2=b[2], a1=a[0], a2=a[1])


def k_weight_coeffs(rate: int) -> List[bq.BiquadCoef]:
    """The two K-weighting biquads for ``rate`` (float64 host design)."""
    if rate == 48_000:
        return [_coef(*_SHELF_48K), _coef(*_HP_48K)]
    # RBJ high shelf at (f, G, Q).
    A = 10.0 ** (_SHELF_G / 40.0)
    w0 = 2.0 * math.pi * _SHELF_F / rate
    alpha = math.sin(w0) / (2.0 * _SHELF_Q)
    cw = math.cos(w0)
    sqA = math.sqrt(A)
    b0 = A * ((A + 1) + (A - 1) * cw + 2 * sqA * alpha)
    b1 = -2 * A * ((A - 1) + (A + 1) * cw)
    b2 = A * ((A + 1) + (A - 1) * cw - 2 * sqA * alpha)
    a0 = (A + 1) - (A - 1) * cw + 2 * sqA * alpha
    a1 = 2 * ((A - 1) - (A + 1) * cw)
    a2 = (A + 1) - (A - 1) * cw - 2 * sqA * alpha
    shelf = _coef([b0 / a0, b1 / a0, b2 / a0], [a1 / a0, a2 / a0])
    # RBJ high-pass at (f, Q).
    w0 = 2.0 * math.pi * _HP_F / rate
    alpha = math.sin(w0) / (2.0 * _HP_Q)
    cw = math.cos(w0)
    a0 = 1 + alpha
    hp = _coef(
        [(1 + cw) / 2 / a0, -(1 + cw) / a0, (1 + cw) / 2 / a0],
        [-2 * cw / a0, (1 - alpha) / a0],
    )
    return [shelf, hp]


def block_geometry(rate: int, capacity: int) -> Tuple[int, int, int]:
    """(hop, per_block, n_hops): 100 ms hop chunks; one gating block is
    ``per_block`` consecutive hops (4 at standard rates)."""
    hop = max(int(round(HOP_S * rate)), 1)
    per_block = max(int(round(BLOCK_S / HOP_S)), 1)
    n_hops = capacity // hop
    return hop, per_block, n_hops


def integrated_lufs(data, length, rate: int):
    """Traced integrated loudness (LKFS) of ``data`` [C, N] with valid
    prefix ``length``. Returns the f32 scalar; silent/short clips (no
    gated block) return ``_SILENCE_FLOOR``."""
    sections = bq.prepare_all(k_weight_coeffs(rate))
    cap = data.shape[-1]
    idx = jnp.arange(cap, dtype=jnp.int32)
    x = jnp.where((idx < length)[None, :], data, 0.0)
    z, _ = bq.cascade_apply(x, sections)

    hop, per_block, n_hops = block_geometry(rate, cap)
    if n_hops < per_block:
        return jnp.float32(_SILENCE_FLOOR)
    # Per-channel hop-chunk power sums, then 4-hop block means.
    zz = z[:, : n_hops * hop].astype(jnp.float32) ** 2
    hop_sums = zz.reshape(z.shape[0], n_hops, hop).sum(axis=-1)
    n_blocks = n_hops - per_block + 1
    w = jnp.stack([
        hop_sums[:, i: i + n_blocks] for i in range(per_block)
    ]).sum(axis=0)                              # [C, n_blocks]
    ms = w / jnp.float32(per_block * hop)
    power = ms.sum(axis=0)                      # channel weights 1.0
    # A block is measurable only if it lies inside the valid prefix.
    n_valid_hops = length // jnp.int32(hop)
    valid = (jnp.arange(n_blocks, dtype=jnp.int32)
             + jnp.int32(per_block)) <= n_valid_hops

    floor = jnp.float32(10.0 ** ((ABS_GATE_LKFS - _OFFSET) / 10.0))
    l_abs = valid & (power > floor)

    def gated_mean(mask):
        cnt = mask.sum()
        s = jnp.where(mask, power, 0.0).sum()
        return s / jnp.maximum(cnt, 1).astype(jnp.float32), cnt

    m_abs, c_abs = gated_mean(l_abs)
    # Relative gate: 10 LU below the absolute-gated mean loudness.
    rel_floor = m_abs * jnp.float32(10.0 ** (-REL_GATE_LU / 10.0))
    l_rel = l_abs & (power > rel_floor)
    m_rel, c_rel = gated_mean(l_rel)
    lufs = jnp.float32(_OFFSET) + jnp.float32(10.0 / math.log(10.0)) \
        * jnp.log(jnp.maximum(m_rel, 1e-30))
    return jnp.where((c_abs > 0) & (c_rel > 0), lufs,
                     jnp.float32(_SILENCE_FLOOR))


def normalize_gain_lufs(data, length, rate: int, target_db: float):
    """Linear gain bringing integrated loudness to ``target_db`` LUFS;
    1.0 for silence (nothing to scale to)."""
    measured = integrated_lufs(data, length, rate)
    gain = jnp.exp(
        jnp.float32(math.log(10.0) / 20.0)
        * (jnp.float32(target_db) - measured)
    )
    return jnp.where(measured <= jnp.float32(_SILENCE_FLOOR + 1.0),
                     jnp.float32(1.0), gain)


def normalize_gain_peak(data, length, target_db: float):
    """Linear gain bringing the sample peak to ``target_db`` dBFS; 1.0
    for silence."""
    cap = data.shape[-1]
    idx = jnp.arange(cap, dtype=jnp.int32)
    x = jnp.where((idx < length)[None, :], data, 0.0)
    peak = jnp.abs(x).max()
    target = jnp.float32(10.0 ** (float(target_db) / 20.0))
    return jnp.where(peak > 0.0, target / jnp.maximum(peak, 1e-30),
                     jnp.float32(1.0))


# -- float64 mirror ----------------------------------------------------------


def _sos_filter(x: np.ndarray, coeffs: List[bq.BiquadCoef]) -> np.ndarray:
    y = x.astype(np.float64)
    for c in coeffs:
        out = np.zeros_like(y)
        for ch in range(y.shape[0]):
            x1 = x2 = y1 = y2 = 0.0
            for i in range(y.shape[1]):
                v = y[ch, i]
                o = (c.b0 * v + c.b1 * x1 + c.b2 * x2
                     - c.a1 * y1 - c.a2 * y2)
                x2, x1 = x1, v
                y2, y1 = y1, o
                out[ch, i] = o
        y = out
    return y


def loudness_reference(data: np.ndarray, rate: int) -> float:
    """Float64 sequential BS.1770-4 integrated loudness."""
    z = _sos_filter(data.astype(np.float64), k_weight_coeffs(rate))
    hop, per_block, n_hops = block_geometry(rate, data.shape[-1])
    n_blocks = n_hops - per_block + 1
    if n_blocks <= 0:
        return _SILENCE_FLOOR
    powers = []
    for b in range(n_blocks):
        seg = z[:, b * hop: b * hop + per_block * hop]
        powers.append(float((seg ** 2).mean(axis=1).sum()))
    powers = np.array(powers)
    floor = 10.0 ** ((ABS_GATE_LKFS - _OFFSET) / 10.0)
    sel = powers > floor
    if not sel.any():
        return _SILENCE_FLOOR
    rel_floor = powers[sel].mean() * 10.0 ** (-REL_GATE_LU / 10.0)
    sel &= powers > rel_floor
    if not sel.any():
        return _SILENCE_FLOOR
    return _OFFSET + 10.0 * math.log10(powers[sel].mean())
