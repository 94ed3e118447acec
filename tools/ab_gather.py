"""On-chip A/B: PV analysis-side formulations at config-4 shapes.

The profile (tools/profile_pv.py, healthy relay 2026-08-20) shows the
forward side — per-frame gather + window + 2 DFT GEMMs — at 3.2 ms of
the 6.7 ms PV stage, vs 0.86 ms for the equal-FLOPs inverse: the
irregular-position frame gather dominates.  Candidates:

A. current: vmapped lane-axis dynamic_slice per frame (baseline);
B. gather+window only (barrier, tiny output) — isolates gather cost;
C. aligned row-gather: pad positions down to 128-sample blocks, gather
   rows of the [N/128, 128] view (embedding-style), window/DFT NOT
   applied — isolates the aligned-gather cost;
D. shift-theorem pipeline: C's aligned gather (L = n_fft + 128 window),
   L-point real DFT GEMMs, per-frame static phase ramp (the residual
   r_k = pos_k mod 128 roll in frequency domain), then a fixed
   [2*bins_L, bins] projection folding inverse-L-DFT x truncate-to-
   n_fft x Hann x forward-DFT.  Exact up to f32 GEMM roundoff; checked
   vs A by SNR here.

Run: python tools/ab_gather.py [seconds] [tempo]
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from nodey_tpu.ops import pv  # noqa: E402
from nodey_tpu.ops.stft import _dft_matrices  # noqa: E402

PREC = jax.lax.Precision.HIGH


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _time(fn, x, iters=30):
    def probe(r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return jax.device_get(leaf.ravel()[:4])

    r = fn(x)
    probe(r)
    rtt = min(min(_timed(lambda: probe(r)) for _ in range(3)), 0.2)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(x)
        probe(r)
        ts.append((time.perf_counter() - t0 - rtt) / iters)
    return max(min(ts), 1e-7)


def build(N, tempo, rate):
    n_fft, hop, pos, dpos, pad_to = pv._pv_geometry(N, tempo, rate)
    K = len(pos)
    bins = n_fft // 2 + 1
    w = pv._pv_window(n_fft)
    cos_m, sin_m = _dft_matrices(n_fft)  # [n_fft, bins] each
    return n_fft, hop, pos, dpos, pad_to, K, bins, w, cos_m, sin_m


def variant_a(N, tempo, rate):
    n_fft, hop, pos, dpos, pad_to, K, bins, w, cos_m, sin_m = build(
        N, tempo, rate)
    wj = jnp.asarray(w)

    def fn(data):
        x = jnp.pad(data, ((0, 0), (0, max(0, pad_to - N))))
        starts = jnp.asarray(pos.astype(np.int32))
        frames = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(x, s, n_fft, axis=1),
            out_axes=1,
        )(starts) * wj[None, None, :]
        re = jnp.einsum("ckn,nb->ckb", frames, jnp.asarray(cos_m),
                        preferred_element_type=jnp.float32, precision=PREC)
        im = jnp.einsum("ckn,nb->ckb", frames, jnp.asarray(sin_m),
                        preferred_element_type=jnp.float32, precision=PREC)
        return re, im

    return jax.jit(fn)


def variant_b(N, tempo, rate):
    n_fft, hop, pos, dpos, pad_to, K, bins, w, cos_m, sin_m = build(
        N, tempo, rate)
    wj = jnp.asarray(w)

    def fn(data):
        x = jnp.pad(data, ((0, 0), (0, max(0, pad_to - N))))
        starts = jnp.asarray(pos.astype(np.int32))
        frames = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(x, s, n_fft, axis=1),
            out_axes=1,
        )(starts) * wj[None, None, :]
        frames = jax.lax.optimization_barrier(frames)
        return jnp.sum(frames[:, :, ::257], axis=2)

    return jax.jit(fn)


def variant_c(N, tempo, rate):
    n_fft, hop, pos, dpos, pad_to, K, bins, w, cos_m, sin_m = build(
        N, tempo, rate)
    L = n_fft + 128
    nblk = L // 128

    def fn(data):
        padN = -(-(pad_to + 128) // 128) * 128
        x = jnp.pad(data, ((0, 0), (0, padN - N)))
        xb = x.reshape(x.shape[0], padN // 128, 128)
        a = jnp.asarray((pos // 128).astype(np.int32))      # [K]
        idx = a[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
        g = xb[:, idx]                                      # [C, K, nblk, 128]
        g = g.reshape(x.shape[0], len(pos), L)
        g = jax.lax.optimization_barrier(g)
        return jnp.sum(g[:, :, ::257], axis=2)

    return jax.jit(fn)


def variant_d(N, tempo, rate):
    n_fft, hop, pos, dpos, pad_to, K, bins, w, cos_m, sin_m = build(
        N, tempo, rate)
    L = n_fft + 128
    nblk = L // 128
    binsL = L // 2 + 1

    # L-point real-DFT bases [L, binsL]
    nL = np.arange(L)[:, None] * np.arange(binsL)[None, :]
    angL = 2.0 * np.pi * nL / L
    cosL = np.cos(angL).astype(np.float32)
    sinL = np.sin(angL).astype(np.float32)

    # Fixed projection: inverse-L-DFT -> first n_fft samples -> Hann ->
    # forward n_fft real DFT.  shifted[n] = XR@CL + XI@SL rows n<n_fft.
    m = np.arange(binsL)
    alpha = np.full(binsL, 2.0 / L)
    alpha[0] = 1.0 / L
    if L % 2 == 0:
        alpha[-1] = 1.0 / L
    n = np.arange(n_fft)[:, None]
    # shifted[n] = sum_m alpha [ReG' cos(2 pi n m/L) - ImG' sin(...)] and
    # XIr carries MINUS Im (the bases above use +sin), so the XIr term
    # enters with +alpha*sin.
    CL = alpha[None, :] * np.cos(2.0 * np.pi * n * m[None, :] / L)   # [n_fft, binsL]
    SL = alpha[None, :] * np.sin(2.0 * np.pi * n * m[None, :] / L)
    wc = w[:, None] * cos_m                                          # [n_fft, bins]
    ws = w[:, None] * sin_m
    Mrr = (CL.T @ wc).astype(np.float32)   # [binsL, bins]
    Mrs = (CL.T @ ws).astype(np.float32)
    Mir = (SL.T @ wc).astype(np.float32)
    Mis = (SL.T @ ws).astype(np.float32)

    r = (pos % 128).astype(np.float64)
    theta = 2.0 * np.pi * r[:, None] * m[None, :] / L                # [K, binsL]
    ramp_c = np.cos(theta).astype(np.float32)
    ramp_s = np.sin(theta).astype(np.float32)

    def fn(data):
        padN = -(-(pad_to + 128) // 128) * 128
        x = jnp.pad(data, ((0, 0), (0, padN - N)))
        xb = x.reshape(x.shape[0], padN // 128, 128)
        a = jnp.asarray((pos // 128).astype(np.int32))
        idx = a[:, None] + jnp.arange(nblk, dtype=jnp.int32)[None, :]
        g = xb[:, idx].reshape(x.shape[0], K, L)            # [C, K, L]
        XR = jnp.einsum("ckl,lb->ckb", g, jnp.asarray(cosL),
                        preferred_element_type=jnp.float32, precision=PREC)
        XI = jnp.einsum("ckl,lb->ckb", g, jnp.asarray(sinL),
                        preferred_element_type=jnp.float32, precision=PREC)
        # roll by -r in time == multiply by e^{+2 pi i r m / L}; our XI
        # carries Im with NEGATIVE sign convention (basis sin without
        # minus), i.e. X = XR - i*XI.  Keep that convention through the
        # rotation: (XR - iXI)*(c + is) = (XR c + XI s) - i(XI c - XR s).
        XRr = XR * jnp.asarray(ramp_c)[None] + XI * jnp.asarray(ramp_s)[None]
        XIr = XI * jnp.asarray(ramp_c)[None] - XR * jnp.asarray(ramp_s)[None]
        # shifted[n] = sum alpha (Re cos + Im_true sin) with Im_true = -XIr:
        # = XRr@CL - XIr@(-SL)... fold signs: use SL as defined with its
        # minus; Im_true@SL_true == XIr @ SL  (SL defined = -alpha sin).
        re = jnp.einsum("ckb,bo->cko", XRr, jnp.asarray(Mrr),
                        preferred_element_type=jnp.float32, precision=PREC) \
           + jnp.einsum("ckb,bo->cko", XIr, jnp.asarray(Mir),
                        preferred_element_type=jnp.float32, precision=PREC)
        im = jnp.einsum("ckb,bo->cko", XRr, jnp.asarray(Mrs),
                        preferred_element_type=jnp.float32, precision=PREC) \
           + jnp.einsum("ckb,bo->cko", XIr, jnp.asarray(Mis),
                        preferred_element_type=jnp.float32, precision=PREC)
        return re, im

    return jax.jit(fn)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    tempo = float(sys.argv[2]) if len(sys.argv) > 2 else 1.25
    rate = 48_000
    N = int(seconds * rate)
    rng = np.random.default_rng(0)
    host = rng.standard_normal((2, N)).astype(np.float32)
    data = jax.device_put(jnp.asarray(host))

    a = jax.device_put(np.ones((2048, 2048), np.float32))
    f = jax.jit(lambda a: a @ a)
    jax.block_until_ready(f(a))
    t = _time(lambda x: f(x), a, iters=30)
    print(f"canary: {2*2048**3/t/1e9:.0f} GFLOP/s")

    # correctness first on a small clip
    Ns = rate  # 1 s
    ds = jax.device_put(jnp.asarray(host[:, :Ns]))
    ra, ia = variant_a(Ns, tempo, rate)(ds)
    rd, id_ = variant_d(Ns, tempo, rate)(ds)
    err = np.asarray(ra) - np.asarray(rd)
    snr = 10 * np.log10(float(np.sum(np.asarray(ra) ** 2))
                        / max(float(np.sum(err ** 2)), 1e-30))
    print(f"D vs A (re): SNR {snr:.1f} dB  max|d| "
          f"{float(np.max(np.abs(err))):.2e}")

    for name, mk in (("A fwd(cur)", variant_a), ("B gather", variant_b),
                     ("C rowgather", variant_c), ("D shift-thm", variant_d)):
        fn = mk(N, tempo, rate)
        t = _time(fn, data)
        print(f"{name:13s}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
