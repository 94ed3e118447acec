"""On-chip A/B: WSOLA score-table frames-per-step batching (VERDICT r4 #6).

Measures, on the real chip:
  1. a bare-grid Pallas kernel (one 8x128 VMEM copy per step) — the
     irreducible per-grid-step sequencing cost;
  2. the production WSOLA stretch at 48 kHz with frames_per_step 1/2/4
     (identical argmax tables asserted device-side);
  3. the dma-only variant of the probe (two span_dma window copies per
     step, no compute) — DMA wait latency attribution.

Usage: python tools/ab_wsola_fps.py [seconds] [iters]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from nodey_tpu.ops import pallas_wsola, stretch as stretch_ops  # noqa: E402


def timed(fn, x, iters):
    y = fn(x)
    jax.block_until_ready(y)
    probe = jax.jit(lambda a: a[0, :1])
    jax.device_get(probe(jnp.zeros((1, 8), jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    jax.block_until_ready(y)
    jax.device_get(y[0][0, :1] if isinstance(y, tuple) else y[0, :1])
    return (time.perf_counter() - t0) / iters


def bare_grid(K, iters):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[pl.BlockSpec((8, 128), lambda k: (0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    fn = jax.jit(run)
    t = timed(fn, jnp.zeros((8, 128), jnp.float32), iters)
    return t / K


def dma_grid(K, span_dma, iters):
    def kernel(x_hbm, o_ref, win, sems):
        k = pl.program_id(0)

        limit = ((x_hbm.shape[1] - span_dma) // 128) * 128

        def dma(slot, which):
            start = (k * 128) % limit
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(pl.multiple_of(start, 128), span_dma)],
                win.at[slot, which],
                sems.at[slot, which],
            )

        slot = k % 2
        dma(slot, 0).start()
        dma(slot, 1).start()
        dma(slot, 0).wait()
        dma(slot, 1).wait()
        o_ref[...] = win[slot, 0, :, :128]

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(K,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((2, 128), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, 2, 2, span_dma), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )(x)

    fn = jax.jit(run)
    x = jnp.zeros((2, 1 << 20), jnp.float32)
    t = timed(fn, x, iters)
    return t / K


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print("devices:", jax.devices(), flush=True)

    rate = 48_000
    tempo = 1.25
    n = int(rate * seconds)
    rng = np.random.default_rng(5)
    x = jnp.asarray((0.3 * rng.standard_normal((2, n))).astype(np.float32))
    seq, seek, overlap = stretch_ops._params(rate)
    K = stretch_ops._out_chunks(n, tempo, seq, overlap)
    num = stretch_ops.tempo_num(seq, overlap, tempo) \
        if hasattr(stretch_ops, "tempo_num") else None
    print(f"K={K} seq={seq} seek={seek} overlap={overlap}")

    t_bare = bare_grid(K, iters)
    print(f"bare grid step: {t_bare * 1e6:.3f} us/step", flush=True)
    _, _, _, span_pad = pallas_wsola._geometry(seek, overlap)
    t_dma = dma_grid(K, span_pad + 128, iters)
    print(f"dma-only step:  {t_dma * 1e6:.3f} us/step", flush=True)

    tables = {}
    for fps in (1, 2, 4):
        fn = jax.jit(
            lambda d, f=fps: stretch_ops.wsola_stretch_at_rate(
                d, jnp.int32(d.shape[1]), tempo, rate
            )[0]
        )
        import os

        os.environ["NODEY_WSOLA_FPS"] = str(fps)
        t = timed(fn, x, iters)
        print(
            f"fps={fps}: {t * 1e3:.3f} ms total, "
            f"{t / K * 1e6:.3f} us/frame",
            flush=True,
        )
        # Table equality across fps (device path).
        tab = jax.device_get(
            jax.jit(
                lambda d, f=fps: pallas_wsola.wsola_score_table(
                    d, min(K, 64),
                    int(round((seq - overlap) * tempo * 65536)), 65536,
                    seq, seek, overlap, frames_per_step=f,
                )
            )(x)
        )
        tables[fps] = tab
    for fps in (2, 4):
        same = bool((tables[fps] == tables[1]).all())
        print(f"table fps={fps} == fps=1: {same}", flush=True)


if __name__ == "__main__":
    main()
