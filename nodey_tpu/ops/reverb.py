"""Convolution reverb — uniform-partition overlap-save FFT convolution
executed as real-DFT GEMMs on the MXU (target-spec extension; the
reference ships no reverb).

The impulse response is synthesized ON HOST in float64 (spectral-decay
synthesis: white-noise STFT frames shaped by a per-bin RT60 curve,
Hann-OLA'd — dense, smooth, frequency-dependent decay, deterministic by
seeded RNG), then the convolution runs on device:

* Partition the IR into K blocks of P samples, each zero-padded to
  F = 2P and transformed once on host (np.fft.rfft, float64 -> f32
  spectra). Complex dtypes are UNIMPLEMENTED on this TPU backend, so all
  device spectra are SPLIT (re, im) f32 pairs and the DFTs are explicit
  real-basis matmuls — the same move as the STFT node (ops/stft.py) and
  the PV DFT passes (ops/pv.py).
* Overlap-save framing: input blocks of P; each hop's segment is the
  previous block concatenated with the current one (F = 2P — no strided
  gathers), forward-transformed in ONE batched [C*T, F] x [F, 2*BINS]
  GEMM per re/im pair.
* Frequency-domain delay line: Y[t] = sum_k X[t-k] (*) H[k] — the
  classic uniform-partition FDL, evaluated as K shifted multiply-adds
  over the [C, T, BINS] spectra planes (K <= ~190 for the 8 s decay
  cap; XLA fuses the accumulation chain).
* Inverse real DFT as one [C*T, 2*BINS] x [2*BINS, F] GEMM (Yr and Yi
  concatenated against stacked icos/isin bases); the last P samples of
  each hop are the valid overlap-save outputs.

All GEMMs pin precision HIGHEST (the backend's silent bf16 default —
ROUND4.md section 10). The hop grid is anchored to the array start, so
any two renders whose sample grids align (offline whole-clip vs the sp
mesh's halo'd windows: chunk and halo are multiples of P and the halo
covers K*P samples) produce BITWISE-equal kept samples; the chunked
streaming path re-anchors per chunk (exact math, different grid), so
streamed vs offline agreement is re-association-level like every other
streaming stage.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream

PARTITION = 2048            # P: overlap-save hop / IR partition size
_F = 2 * PARTITION          # DFT size
_BINS = _F // 2 + 1


@functools.lru_cache(maxsize=4)
def _fwd_mats() -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT analysis bases [F, BINS]: (cos, -sin), float64-designed."""
    k = np.arange(_F, dtype=np.float64)[:, None] * np.arange(_BINS)[None, :]
    ang = 2.0 * np.pi * k / _F
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


@functools.lru_cache(maxsize=4)
def _inv_mat() -> np.ndarray:
    """Stacked inverse basis [2*BINS, F]: y = [Yr | Yi] @ inv, matching
    np.fft.irfft (half-spectrum weights 2 except DC/Nyquist, 1/F)."""
    n = np.arange(_F, dtype=np.float64)[None, :]
    b = np.arange(_BINS, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * b * n / _F
    w = np.full((_BINS, 1), 2.0)
    w[0] = w[-1] = 1.0
    icos = w * np.cos(ang) / _F
    isin = -w * np.sin(ang) / _F
    return np.concatenate([icos, isin], axis=0).astype(np.float32)


# -- host IR synthesis ----------------------------------------------------------


def design_ir(rate: int, channels: int, decay_s: float,
              pre_delay_ms: float, damping: float) -> np.ndarray:
    """[C, L] float32 impulse response, unit energy per channel.

    Spectral-decay synthesis (float64): per-bin RT60 shortens toward
    Nyquist with ``damping``; each STFT frame is white noise scaled by
    10^(-3 t / RT60(f)); Hann-OLA reconstruction (COLA at hop = n_fft/2).
    Deterministic: fixed seed, one RNG stream, so the same parameters
    always produce the same room (serde-stable)."""
    # Frame size scales with rate (~21 ms) so the per-frame decay grid
    # stays fine relative to even the shortest RT60 at any rate.
    n_fft = min(max(1 << int(round(math.log2(max(rate * 0.021, 64)))),
                    256), 2048)
    hop = n_fft // 2
    decay_s = float(decay_s)
    ln = max(int(round(decay_s * rate)), n_fft)
    frames = ln // hop + 2
    rng = np.random.default_rng(0xC0FFEE)
    bins = n_fft // 2 + 1
    freqs = np.arange(bins, dtype=np.float64) * rate / n_fft
    rt60 = decay_s * (1.0 - float(damping) * 0.85 * freqs / (rate / 2.0))
    rt60 = np.maximum(rt60, 0.05)
    t = np.arange(frames, dtype=np.float64)[:, None] * hop / rate
    env = 10.0 ** (-3.0 * t / rt60[None, :])
    win = np.hanning(n_fft + 1)[:n_fft]
    out = np.zeros((channels, frames * hop + n_fft), dtype=np.float64)
    for c in range(channels):
        xr = rng.standard_normal((frames, bins)) * env
        xi = rng.standard_normal((frames, bins)) * env
        xi[:, 0] = 0.0
        xi[:, -1] = 0.0
        seg = np.fft.irfft(xr + 1j * xi, n=n_fft, axis=-1) * win
        for f in range(frames):
            out[c, f * hop:f * hop + n_fft] += seg[f]
    ir = out[:, :ln]
    # Short attack fade-in (2 ms) so the onset is dense, not clicky.
    fade = min(int(0.002 * rate), ln)
    ir[:, :fade] *= np.linspace(0.0, 1.0, fade, endpoint=False)[None, :]
    ir /= np.sqrt(np.sum(ir * ir, axis=1, keepdims=True)) + 1e-30
    pre = int(round(float(pre_delay_ms) * 1e-3 * rate))
    if pre:
        ir = np.concatenate(
            [np.zeros((channels, pre)), ir], axis=1
        )
    return ir.astype(np.float32)


@functools.lru_cache(maxsize=8)
def ir_partitions(rate: int, channels: int, decay_s: float,
                  pre_delay_ms: float, damping: float):
    """Host-precomputed partition spectra: (Hr, Hi) [C, K, BINS] f32
    numpy constants (float64 rfft of P-sample partitions zero-padded to
    F), plus the raw IR length."""
    ir = design_ir(rate, channels, decay_s, pre_delay_ms, damping)
    ln = ir.shape[1]
    k = -(-ln // PARTITION)
    padded = np.zeros((channels, k, _F))
    flat = np.zeros((channels, k * PARTITION))
    flat[:, :ln] = ir
    padded[:, :, :PARTITION] = flat.reshape(channels, k, PARTITION)
    spec = np.fft.rfft(padded, axis=-1)
    return (spec.real.astype(np.float32), spec.imag.astype(np.float32), ln)


def ir_length(rate: int, decay_s: float, pre_delay_ms: float) -> int:
    """Static IR length in samples (the node's receptive field)."""
    ln = max(int(round(float(decay_s) * rate)), 1024)
    return ln + int(round(float(pre_delay_ms) * 1e-3 * rate))


# -- partitioned convolution (device) ---------------------------------------------


def _segments(x):
    """[C, T*P] -> overlap-save segments [C, T, F]: each hop is the
    previous P-block concatenated with the current one (zeros before the
    array start)."""
    c = x.shape[0]
    t = x.shape[-1] // PARTITION
    blocks = x.reshape(c, t, PARTITION)
    prev = jnp.pad(blocks[:, :-1], ((0, 0), (1, 0), (0, 0)))
    return jnp.concatenate([prev, blocks], axis=-1)


def partitioned_conv(x, hr: np.ndarray, hi: np.ndarray, out_len: int):
    """Linear convolution of ``x`` [C, N] with the partitioned IR
    spectra (host constants [C, K, BINS]); returns [C, out_len] where
    ``out_len`` <= N_padded + K*P (callers pass N + L - 1)."""
    c, n = x.shape
    k = hr.shape[1]
    t = -(-out_len // PARTITION)
    need = t * PARTITION
    if need > n:
        x = jnp.pad(x, ((0, 0), (0, need - n)))
    else:
        x = x[:, :need]
    seg = _segments(x)                                   # [C, T, F]
    cos_m, msin_m = _fwd_mats()
    xr = jnp.einsum(
        "ctf,fb->ctb", seg, cos_m,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    xi = jnp.einsum(
        "ctf,fb->ctb", seg, msin_m,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # Frequency-domain delay line: Y[t] = sum_k X[t-k] (*) H[k], as K
    # shifted multiply-adds (complex product in split-real form).
    yr = jnp.zeros_like(xr)
    yi = jnp.zeros_like(xi)
    for kk in range(k):
        if kk:
            sxr = jnp.pad(xr[:, :-kk], ((0, 0), (kk, 0), (0, 0)))
            sxi = jnp.pad(xi[:, :-kk], ((0, 0), (kk, 0), (0, 0)))
        else:
            sxr, sxi = xr, xi
        hrk = hr[:, kk][:, None, :]                      # [C, 1, BINS]
        hik = hi[:, kk][:, None, :]
        yr = yr + sxr * hrk - sxi * hik
        yi = yi + sxr * hik + sxi * hrk
    y = jnp.einsum(
        "ctb,bf->ctf", jnp.concatenate([yr, yi], axis=-1), _inv_mat(),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # Overlap-save: the last P samples of each hop are valid.
    out = y[..., PARTITION:].reshape(c, t * PARTITION)
    return out[:, :out_len]


# -- offline ---------------------------------------------------------------------


def reverb_stream(stream: Stream, decay_s: float, pre_delay_ms: float,
                  damping: float, wet: float, dry: float) -> Stream:
    """Offline reverb over a whole Stream. Output length grows by the IR
    tail (L - 1) when wet > 0; the capacity grows with it. Padding past
    the valid length is re-masked to exact zeros (the DFT path leaves
    ~-140 dB cancellation noise there; the Stream invariant is
    load-bearing for the sharded length algebra)."""
    wet32 = np.float32(wet)
    dry32 = np.float32(dry)
    if float(wet) == 0.0:
        out = stream.data if float(dry) == 1.0 else dry32 * stream.data
        return stream.with_data(out, fmt=FMT_FLT)
    hr, hi, _ln = ir_partitions(
        stream.rate, stream.channels, float(decay_s),
        float(pre_delay_ms), float(damping),
    )
    ln_total = ir_length(stream.rate, decay_s, pre_delay_ms)
    cap_out = stream.capacity + -(-(ln_total) // PARTITION) * PARTITION
    idx = jnp.arange(stream.capacity, dtype=jnp.int32)
    x = jnp.where((idx < stream.length)[None, :], stream.data, 0.0)
    wetpath = partitioned_conv(x, hr, hi, cap_out)
    drypath = jnp.pad(x, ((0, 0), (0, cap_out - stream.capacity)))
    y = dry32 * drypath + wet32 * wetpath
    out_len = stream.length + jnp.int32(ln_total - 1)
    oidx = jnp.arange(cap_out, dtype=jnp.int32)
    y = jnp.where((oidx < out_len)[None, :], y, 0.0)
    return Stream(
        data=y, length=out_len, rate=stream.rate,
        channels=stream.channels, fmt=FMT_FLT, t0_us=stream.t0_us,
    )


# -- streaming -------------------------------------------------------------------


def stream_ring_len(width: int, ir_len: int) -> int:
    """Static ring capacity for chunk width ``width``: one chunk's full
    convolution (width + IR, hop-padded)."""
    return -(-(width + ir_len) // PARTITION) * PARTITION


def reverb_stream_init(channels: int, width: int, ir_len: int, wet: float):
    ring = jnp.zeros((channels, stream_ring_len(width, ir_len)),
                     dtype=jnp.float32)
    rem = jnp.int32(ir_len - 1 if float(wet) > 0.0 else 0)
    return (ring, rem)


def reverb_stream_step(params, state, data, n, in_done):
    """One chunk [C, W] with ``n`` valid. The chunk's full convolution
    accumulates into an output ring anchored at the chunk start; the
    first ``n`` ring samples ship with the dry path, then the ring
    shifts by ``n``. After input EOF, flush steps drain the IR tail
    (``rem`` counts down); done = input done and tail drained."""
    hr, hi, ir_len, wet, dry = params
    ring, rem = state
    w = data.shape[1]
    idx = jnp.arange(w, dtype=jnp.int32)
    x = jnp.where((idx < n)[None, :], data, 0.0)
    conv = partitioned_conv(x, hr, hi, ring.shape[1])
    ring = ring + np.float32(wet) * conv
    flushing = jnp.logical_and(in_done, n <= 0)
    out_n = jnp.where(flushing, jnp.minimum(jnp.int32(w), rem), n)
    rem = jnp.where(flushing, rem - out_n, rem)
    out = np.float32(dry) * x + ring[:, :w]
    out = jnp.where((idx < out_n)[None, :], out, 0.0)
    # Shift the ring left by out_n (traced): slice from a zero-extended
    # copy at a dynamic start.
    ext = jnp.pad(ring, ((0, 0), (0, w)))
    ring = lax.dynamic_slice(
        ext, (jnp.int32(0), out_n), (ring.shape[0], ring.shape[1])
    )
    done = jnp.logical_and(in_done, rem <= 0)
    return (ring, rem), out, out_n, done
