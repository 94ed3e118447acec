"""On-chip A/B: resample bank application with vs without the patch
stack.

Current (ops/resample.py apply_filter_bank, R>1 branch): build the
[C, nblk, B, Wp] patch tensor (B uniform-shift slices stacked — 115 MB
at 300 s stereo, measured 1.09 ms of the 3.56 ms total), then one
einsum against the [R*L, Wp] grouped bank.

Transposed candidate: y[c, g, :] = segs[c, g] @ H0 + segs[c, g+1] @ H1
where H = bank_g^T split at row Mg — the group-row windows overlap by
only Wp - Mg (< Mg), so ONE extra narrow GEMM replaces the whole patch
build.  Same nonzero arithmetic terms per output row; reduction order
differs (two partial sums), so parity is checked by SNR here and the
formulation would be TPU-dispatch-only if landed.

Run: python tools/ab_resample.py [seconds]
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from nodey_tpu.ops import resample as rs  # noqa: E402


def _timed(fn):
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


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
    in_rate, out_rate = 44_100, 48_000
    L, M = rs._rational(in_rate, out_rate)
    bank = jnp.asarray(rs._design_filter_bank(
        L, M, rs.DEFAULT_TAPS, rs.DEFAULT_BETA, rs.DEFAULT_CUTOFF))
    W = bank.shape[1]
    N = int(seconds * in_rate)
    G = -(-N // M)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((2, N)).astype(np.float32)))

    R = rs.group_factor(L, M)
    Mg, Wg = M * R, (R - 1) * M + W
    Wp = -(-Wg // 128) * 128
    print(f"L={L} M={M} W={W} R={R} Mg={Mg} Wp={Wp} G={G}")

    base = jax.jit(lambda x: rs.apply_filter_bank(x, G, M, W, bank))

    # transposed: grouped bank -> H = bank_g^T, split at Mg
    bank_np = np.asarray(bank)
    bank_g = np.zeros((R * L, Wp), np.float32)
    for j in range(R):
        bank_g[j * L : (j + 1) * L, j * M : j * M + W] = bank_np
    H0 = jnp.asarray(bank_g[:, :Mg].T)            # [Mg, R*L]
    H1t = bank_g[:, Mg:]
    H1 = jnp.asarray(H1t.T)                       # [Wp-Mg, R*L]
    ov = Wp - Mg

    def transposed(x):
        Gg = -(-G // R)
        need = (Gg + 1) * Mg
        xp = jnp.pad(x, ((0, 0), (0, max(0, need - x.shape[1]))))
        segs = xp[:, :need].reshape(2, Gg + 1, Mg)
        a = jnp.einsum("cgm,mo->cgo", segs[:, :Gg], H0,
                       preferred_element_type=jnp.float32,
                       precision=rs.BANK_PRECISION)
        b = jnp.einsum("cgm,mo->cgo", segs[:, 1:, :ov], H1,
                       preferred_element_type=jnp.float32,
                       precision=rs.BANK_PRECISION)
        return (a + b).reshape(2, Gg * R * L)[:, : G * L]

    tr = jax.jit(transposed)

    ya = np.asarray(base(x))
    yb = np.asarray(tr(x))
    err = ya - yb
    snr = 10 * np.log10(float(np.sum(ya ** 2))
                        / max(float(np.sum(err ** 2)), 1e-30))
    print(f"transposed vs base: SNR {snr:.1f} dB max|d| "
          f"{float(np.max(np.abs(err))):.2e}")

    for name, fn in (("base(patches)", base), ("transposed", tr)):
        t = _time(fn, x)
        print(f"{name:15s}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
