"""PV sub-stage profile at the config-4 shapes (VERDICT r3 #3: "finish the
abandoned PV sub-stage profile on a healthy relay").

Times CUMULATIVE PREFIXES of the _pv_impl pipeline (frames+fwd-DFT; +mag/ph;
+advance/scan; +lock; +inverse; +OLA) as separately jitted programs and
differences consecutive medians, so each stage is charged its cost AS
COMPOSED (XLA fusion across stage boundaries stays in effect for every
prefix).  Relay health is probed first (canary matmul) exactly like bench.py.

Run on the real chip:  python tools/profile_pv.py [seconds] [tempo]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

from nodey_tpu.ops import pv  # noqa: E402


def _stage_prefix(upto: str, tempo: float, rate: int, N: int, lock=True):
    """Build a jitted fn computing _pv_impl up to (incl.) stage `upto`."""
    n_fft, hop, pos, dpos, pad_to = pv._pv_geometry(N, tempo, rate)
    K = len(pos)
    bins = n_fft // 2 + 1
    w = jnp.asarray(pv._pv_window(n_fft))
    from nodey_tpu.ops.stft import _dft_matrices

    cos_m, sin_m = _dft_matrices(n_fft)

    def fn(data):
        x = jnp.pad(data, ((0, 0), (0, max(0, pad_to - N))))
        starts = jnp.asarray(pos.astype(np.int32))
        frames = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(x, s, n_fft, axis=1),
            out_axes=1,
        )(starts) * w[None, None, :]
        re = jnp.einsum("ckn,nb->ckb", frames, jnp.asarray(cos_m),
                        preferred_element_type=jnp.float32,
                        precision=pv.PV_PRECISION)
        im = jnp.einsum("ckn,nb->ckb", frames, jnp.asarray(sin_m),
                        preferred_element_type=jnp.float32,
                        precision=pv.PV_PRECISION)
        if upto == "fwd":
            return re + im
        mag = jnp.sqrt(re * re + im * im)
        ph = jnp.arctan2(im, re)
        if upto == "magph":
            return mag + ph
        b_i = jnp.arange(bins, dtype=jnp.int32)
        dpos_i = jnp.asarray(dpos[1:].astype(np.int32))
        omega_dpos = ((b_i[None, :] * dpos_i[:, None]) % n_fft
                      ).astype(jnp.float32) * np.float32(pv._TWO_PI / n_fft)
        ph_d = ph[:, 1:] - ph[:, :-1]
        dphi = ph_d - omega_dpos[None]
        wrapped = dphi - pv._TWO_PI * jnp.round(dphi / pv._TWO_PI)
        hop_over_dpos = jnp.asarray(
            (float(hop) / dpos[1:, None]).astype(np.float32))
        omega_hop = np.mod(np.arange(bins) * hop, n_fft).astype(
            np.float64) * (pv._TWO_PI / n_fft)
        adv = (jnp.asarray(omega_hop.astype(np.float32))[None, None, :]
               + wrapped * hop_over_dpos[None])
        ca, sa = jnp.cos(adv), jnp.sin(adv)

        def _cmul(a, b):
            return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

        c0, s0 = jnp.cos(ph[:, :1]), jnp.sin(ph[:, :1])
        pc, ps = lax.associative_scan(_cmul, (ca, sa), axis=1)
        cos_phi = jnp.concatenate([c0, c0 * pc - s0 * ps], axis=1)
        sin_phi = jnp.concatenate([s0, c0 * ps + s0 * pc], axis=1)
        if upto == "scan":
            return cos_phi + sin_phi
        if lock:
            cos_phi, sin_phi = pv.lock_phases(cos_phi, sin_phi, ph, mag)
        if upto == "lock":
            return cos_phi + sin_phi
        re_y = mag * cos_phi
        im_y = mag * sin_phi
        icos_m, isin_m = pv._idft_matrices(n_fft)
        y = jnp.einsum("ckb,bn->ckn", re_y, jnp.asarray(icos_m),
                       preferred_element_type=jnp.float32,
                       precision=pv.PV_PRECISION) + \
            jnp.einsum("ckb,bn->ckn", im_y, jnp.asarray(isin_m),
                       preferred_element_type=jnp.float32,
                       precision=pv.PV_PRECISION)
        y = y * w[None, None, :]
        if upto == "inv":
            return y
        y4 = y.reshape(2, K, 4, hop)
        ola = None
        for j in range(4):
            part = jnp.pad(y4[:, :, j, :], ((0, 0), (j, 3 - j), (0, 0)))
            ola = part if ola is None else ola + part
        out = ola.reshape(2, (K + 3) * hop)
        den = pv._ola_denominator(K, n_fft)
        return out / jnp.asarray(den)[None, :]

    return jax.jit(fn), (K, n_fft, bins)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _time(fn, x, iters=30):
    """bench.py's pattern: async-dispatch a loop, one completion probe,
    subtract the separately-measured probe RTT (the axon relay costs
    ~25 ms per device_get regardless of size)."""

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


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    tempo = float(sys.argv[2]) if len(sys.argv) > 2 else 1.25
    rate = 48_000
    N = int(seconds * rate)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((2, N)).astype(np.float32))
    data = jax.device_put(data)

    # relay canary
    a = jax.device_put(np.ones((2048, 2048), np.float32))
    f = jax.jit(lambda a: a @ a)
    jax.block_until_ready(f(a))
    t = _time(lambda x: f(x), a, iters=30)
    gflops = 2 * 2048**3 / t / 1e9
    print(f"canary matmul: {gflops:.0f} GFLOP/s "
          f"({'healthy' if gflops > 20000 else 'DEGRADED'})")

    stages = ["fwd", "magph", "scan", "lock", "inv", "ola"]
    prev = 0.0
    info = None
    for st in stages:
        fn, info = _stage_prefix(st, tempo, rate, N)
        t = _time(fn, data)
        print(f"prefix upto {st:6s}: {t*1e3:8.3f} ms  (stage +{(t-prev)*1e3:7.3f} ms)")
        prev = t
    K, n_fft, bins = info
    print(f"shapes: K={K} n_fft={n_fft} bins={bins}")
    # GEMM-only floor: 4 big GEMMs at HIGH precision
    flops = 4 * 2 * K * n_fft * bins * 2
    print(f"DFT GEMM FLOPs total: {flops/1e9:.1f} GF "
          f"(bf16x3 peak ~131 TF/s -> {flops/131e12*1e3:.2f} ms floor)")


if __name__ == "__main__":
    main()
