"""Raw GEMM ceilings at the headline's two hot shapes (v5e).

(a) spectrum-shaped [S, 1024] @ [1024, 1152] f32, HIGHEST / HIGH / bf16
(b) resample-shaped [M, 640] @ [640, 640] f32, HIGHEST
(c) the actual stft spectrum path for the same signal (framing incl.)

If (c) ~= (a) at HIGHEST, the spectrum is MXU-pass-bound and a Pallas
kernel cannot help (same passes on the same unit); if (c) >> (a), the
gap is framing/layout and a VMEM-resident kernel or better formulation
pays.  Run: python tools/ab_gemm_ceiling.py [seconds]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _time(fn, x, iters=20):
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
    rate = 48_000
    hop, n_fft = 512, 1024
    S = int(seconds * rate) // hop              # ~28125 rows per channel
    rng = np.random.default_rng(0)

    # (a) spectrum-shaped GEMM, 2 channels folded into M
    M = 2 * S
    A = jax.device_put(rng.standard_normal((M, n_fft)).astype(np.float32))
    B = jax.device_put(rng.standard_normal((n_fft, 1152)).astype(np.float32))
    for prec in ("highest", "high", "default"):
        p = {"highest": jax.lax.Precision.HIGHEST,
             "high": jax.lax.Precision.HIGH,
             "default": jax.lax.Precision.DEFAULT}[prec]
        f = jax.jit(lambda a, _B=B, _p=p: jnp.dot(
            a, _B, preferred_element_type=jnp.float32, precision=_p))
        t = _time(f, A)
        gf = 2 * M * n_fft * 1152 / 1e9
        print(f"spectrum-GEMM [{M},1024]@[1024,1152] {prec:8s}: "
              f"{t*1e3:7.3f} ms  ({gf/t/1e3:.1f} TF/s)")

    # (b) resample-shaped GEMM
    Mr = 2 * (-(-int(seconds * 44_100) // 588))   # group rows, 2ch
    Ar = jax.device_put(rng.standard_normal((Mr, 640)).astype(np.float32))
    Br = jax.device_put(rng.standard_normal((640, 640)).astype(np.float32))
    f = jax.jit(lambda a, _B=Br: jnp.dot(
        a, _B, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST))
    t = _time(f, Ar)
    gf = 2 * Mr * 640 * 640 / 1e9
    print(f"resample-GEMM [{Mr},640]@[640,640] highest : "
          f"{t*1e3:7.3f} ms  ({gf/t/1e3:.1f} TF/s)")

    # (c) the real spectrum path (framing + windowed basis + mag)
    from nodey_tpu.core.stream import Stream
    from nodey_tpu.ops import stft

    x = jax.device_put(
        rng.standard_normal((2, int(seconds * rate))).astype(np.float32))

    def run(d):
        st = Stream(data=d, length=jnp.int32(d.shape[1]), rate=rate)
        return stft.magnitude_spectrogram(st)

    f = jax.jit(run)
    try:
        t = _time(f, x)
        print(f"stft.spectrogram (real path)             : {t*1e3:7.3f} ms")
    except Exception as exc:
        print(f"stft path skipped: {exc}")


if __name__ == "__main__":
    main()
