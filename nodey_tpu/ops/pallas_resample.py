"""Pallas TPU kernel for the rational polyphase resampler.

Same math as nodey_tpu.ops.resample (one [groups, W] x [W, L] matmul per
block of output groups) but hand-scheduled: the input stays in HBM and each
grid step DMAs its overlapping window into a VMEM scratch with double
buffering, overlapping the next window's DMA with the current block's MXU
matmul — overlapping windows (stride M, width W > M) don't fit
``BlockSpec`` index-map tiling, which is exactly the case for manual DMA.

The filter bank is identical to the XLA path's, so outputs agree to float32
rounding; tests/test_pallas.py holds the two paths together in interpreter
mode on CPU, and bench.py A/Bs them on the real chip.

Measured (v5e, 2026-08-16, probe-RTT-corrected, 60 s stereo 44.1->48 kHz):
XLA patch-GEMM 1.35 ms vs this kernel 1.51 ms, outputs bit-identical
(max|diff| = 0). XLA's fusion of the shifted-reshape patch build into the
GEMM edges out the hand-scheduled DMA pipeline, so the production path
(ops/resample.resample_data) stays on the XLA formulation; this kernel is
kept as the A/B reference and the template for manual-DMA windowed ops.
"""

from __future__ import annotations


import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodey_tpu.ops import resample as resample_ops

# Output groups of L samples computed per grid step. 128 groups keeps the
# matmul MXU-shaped ([128, W] x [W, L]) and the VMEM window modest
# (128*M + taps floats per channel).
BLOCK_GROUPS = 128


def _row_pad(M: int, taps: int) -> int:
    """Per-row load width: the 128-aligned superset of W plus one lane
    block for the alignment residue."""
    W = M + taps - 1
    return (-(-W // 128) + 1) * 128


def _window_len(M: int, taps: int) -> int:
    # Last row loads at ((BLOCK_GROUPS-1)*M // 128)*128 + row_pad; cover
    # it, rounded to the 128-lane tiling the DMA slice requires.
    raw = (BLOCK_GROUPS - 1) * M + _row_pad(M, taps)
    return -(-raw // 128) * 128


def resample_data_pallas(
    data,
    in_rate: int,
    out_rate: int,
    taps: int = resample_ops.DEFAULT_TAPS,
    beta: float = resample_ops.DEFAULT_BETA,
    cutoff: float = resample_ops.DEFAULT_CUTOFF,
    interpret: bool = False,
):
    """Resample [C, N] float32; matches resample_data to f32 rounding."""
    if in_rate == out_rate:
        return data
    L, M = resample_ops._rational(in_rate, out_rate)
    taps = resample_ops._effective_taps(L, M, taps)
    C, N = data.shape
    n_out = -(-N * L // M)
    G = -(-n_out // L)                       # total output groups
    GB = -(-G // BLOCK_GROUPS)               # grid steps
    W = M + taps - 1
    win = _window_len(M, taps)

    bank = jnp.asarray(
        resample_ops._design_filter_bank(L, M, taps, beta, cutoff)
    )  # [L, W]

    # Pad input so every window read is in-bounds:
    # leftmost read = -taps//2 + 1; rightmost = last DMA start + win.
    left = taps // 2 - 1
    need = (GB - 1) * BLOCK_GROUPS * M + win
    x = jnp.pad(data, ((0, 0), (left, max(0, need - left - N))))

    def kernel(x_hbm, bank_ref, out_ref, scratch, patches, sems):
        g = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def get_dma(slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(step * (BLOCK_GROUPS * M), win)],
                scratch.at[slot],
                sems.at[slot],
            )

        # Warm up the pipeline on the first step, then keep one DMA in
        # flight ahead of compute (double buffering, guide pattern).
        @pl.when(g == 0)
        def _():
            get_dma(0, 0).start()

        slot = g % 2

        @pl.when(g + 1 < n_steps)
        def _():
            get_dma((g + 1) % 2, g + 1).start()

        get_dma(slot, g).wait()

        # Gather the [BLOCK_GROUPS, W] patch matrix per channel into VMEM
        # scratch. Mosaic requires dynamic lane offsets to be provably
        # 128-aligned, so each row loads the 128-aligned superset and
        # absorbs the residue with one traced roll (i*M mod 128 cycles
        # through all residues since gcd(M, 128) == 1 for odd M).
        w_pad = _row_pad(M, taps)
        # Python-unrolled (static i): every load offset and roll shift is a
        # compile-time constant, so no alignment proof is needed. NB:
        # newaxis-via-indexing (row[:, None, :W]) lowers to an unsupported
        # gather in Mosaic — reshape instead.
        for i in range(BLOCK_GROUPS):
            start = i * M
            aligned = (start // 128) * 128
            row = scratch[slot, :, aligned : aligned + w_pad]  # [C, w_pad]
            if start % 128:
                row = pltpu.roll(row, w_pad - start % 128, 1)
            patches[:, i : i + 1, :] = row[:, :W].reshape(C, 1, W)
        for c in range(C):
            out_ref[c, :, :] = jnp.dot(
                patches[c], bank_ref[:].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # [BLOCK_GROUPS, L]

    out = pl.pallas_call(
        kernel,
        grid=(GB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bank resident in VMEM
        ],
        out_specs=pl.BlockSpec(
            (C, BLOCK_GROUPS, L),
            lambda g: (0, g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((C, GB * BLOCK_GROUPS, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, C, win), jnp.float32),
            pltpu.VMEM((C, BLOCK_GROUPS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, bank)

    return out.reshape(C, GB * BLOCK_GROUPS * L)[:, :n_out]


# Group rows per grid step for the GROUPED kernel below (each row is R*L
# output samples wide).
GROUP_ROWS = 128

# Probe memo: None = not yet probed; True/False = verdict for this process.
_KERNEL_READY: dict = {"ok": None, "probe_s": None}


def kernel_ready(deadline_s: float | None = None) -> bool:
    """Deadline-bounded Mosaic-compile probe gating the kernel default.

    Compiles AND runs the grouped kernel once on the live backend for the
    canonical 44.1->48 kHz stereo shape, in a daemon thread bounded by
    ``deadline_s`` (NODEY_RESAMPLE_KERNEL_PROBE_S, default 150 s — a
    healthy relay compiles this in 1.6-10 s and a persistent-cache hit
    loads in ~1-2 s; the hazard this guards is the erratic >20 min Mosaic
    compile observed through a wedged relay). Returns False on timeout or
    error and memoizes the verdict so the process never re-probes: the
    XLA 'patches' branch then serves every path, keeping the in-process
    formulation uniform. A timed-out compile thread is abandoned
    (daemon); its eventual completion changes nothing.

    NODEY_RESAMPLE_KERNEL_PROBE_S=0 disables the kernel default outright
    (always False) without pinning NODEY_RESAMPLE_FORM.

    Scope honesty: the probe bounds ITS OWN compile (one grid step of the
    flagship rate pair), not the production-shape compile that follows a
    'ready' verdict — a relay that turns erratic between the two can
    still stall the production compile unbounded. The remaining nets are
    the persistent compile cache (each production shape compiles once,
    ever), bench's per-section deadlines + wedge-retry (which re-execs
    with NODEY_RESAMPLE_FORM=patches), and the CLI's wedge watchdog
    hint. A same-process deadline on every production compile would need
    AOT lower/compile plumbing through the graph compiler; not done."""
    if _KERNEL_READY["ok"] is not None:
        return _KERNEL_READY["ok"]
    if deadline_s is None:
        deadline_s = float(
            os.environ.get("NODEY_RESAMPLE_KERNEL_PROBE_S", "150")
        )
    if deadline_s <= 0:
        _KERNEL_READY["ok"] = False
        return False

    import threading
    import time

    result: dict = {}

    def _probe() -> None:
        try:
            t0 = time.perf_counter()
            L, M = 160, 147  # 44.1 kHz -> 48 kHz, the flagship rate pair
            R = resample_ops.group_factor(L, M)
            taps = resample_ops._effective_taps(L, M, resample_ops.DEFAULT_TAPS)
            W = M + taps - 1
            bank = jnp.asarray(
                resample_ops._design_filter_bank(
                    L, M, taps, resample_ops.DEFAULT_BETA,
                    resample_ops.DEFAULT_CUTOFF,
                )
            )
            G = R * GROUP_ROWS  # exactly one grid step
            x = jnp.zeros((2, G * M), jnp.float32)
            fn = jax.jit(
                apply_filter_bank_grouped_pallas,
                static_argnames=("G", "M", "W", "interpret"),
            )
            y = fn(x, G=G, M=M, W=W, bank=bank, interpret=False)
            jax.device_get(y[0, :8])  # force full execution through the relay
            result["s"] = time.perf_counter() - t0
        except Exception as exc:  # compile/backend failure = not ready
            result["err"] = f"{type(exc).__name__}: {str(exc)[:200]}"

    th = threading.Thread(target=_probe, daemon=True)
    th.start()
    th.join(deadline_s)
    if th.is_alive() or "err" in result:
        _KERNEL_READY["ok"] = False
        _KERNEL_READY["probe_s"] = None if th.is_alive() else -1.0
    else:
        _KERNEL_READY["ok"] = True
        _KERNEL_READY["probe_s"] = result["s"]
    return _KERNEL_READY["ok"]


def apply_filter_bank_grouped_pallas(x, G: int, M: int, W: int, bank,
                                     interpret: bool = False):
    """Drop-in Pallas replacement for resample.apply_filter_bank's R>1
    patch-stack branch: same grouped math ([rows, Wp] windows at stride
    Mg against the zero-embedded [R*L, Wp] bank), but the patch matrix
    is built in VMEM from one DMA'd window per step — the XLA branch's
    [C, nblk, B, Wp] patch stack (1.09 ms of its 3.56 ms per 300 s
    stereo track, ~115 MB materialized through HBM) never exists.

    Numerics: the dot contracts the same Wp=640 terms against the same
    grouped bank at HIGHEST; Mosaic's reduction order may differ from
    XLA's einsum by last-ulp (the prior ungrouped kernel measured
    bit-identical — tests pin interpret mode bitwise vs the patches
    branch, and the chip A/B reports max|diff|).

    Layout notes (the whole point of this kernel):
    - window rows start at j*Mg (misaligned lanes); each row loads its
      128-aligned superset and absorbs the residue with one static
      pltpu.roll — Mosaic needs no alignment proof for unrolled static
      offsets (same trick as the ungrouped kernel above);
    - dot shape [GROUP_ROWS, Wp] x [Wp, R*L] = [128, 640] x [640, 640]
      for 44.1->48 kHz: MXU-shaped in every dimension, and the output
      block [128, 640] is lane-aligned so the flatten is free.
    """
    L = bank.shape[0]
    R = resample_ops.group_factor(L, M)
    assert R > 1, "grouped kernel requires a grouping win (R > 1)"
    C = x.shape[0]
    Mg = M * R
    Wg = (R - 1) * M + W
    Wp = -(-Wg // 128) * 128
    rowbuf = Wp + 128                       # aligned superset + residue
    Gg = -(-G // R)                         # group rows total
    GB = -(-Gg // GROUP_ROWS)               # grid steps
    step_in = GROUP_ROWS * Mg               # input advance per step
    win = -(-((GROUP_ROWS - 1) * Mg + rowbuf) // 128) * 128

    need = (GB - 1) * step_in + win
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    else:
        x = x[:, :need]

    # Zero-embedded grouped bank, transposed for the dot: [Wp, R*L].
    bank_gt = jnp.zeros((Wp, R * L), bank.dtype)
    for j in range(R):
        bank_gt = bank_gt.at[j * M : j * M + W, j * L : (j + 1) * L].set(
            bank.T
        )

    def kernel(x_hbm, bank_ref, out_ref, scratch, patches, sems):
        g = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def get_dma(slot, step):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(step * step_in, win)],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(g == 0)
        def _():
            get_dma(0, 0).start()

        slot = g % 2

        @pl.when(g + 1 < n_steps)
        def _():
            get_dma((g + 1) % 2, g + 1).start()

        get_dma(slot, g).wait()

        # Residue classes: rows j and j + p share a lane residue
        # ((p*Mg) % 128 == 0 with p = 128/gcd(Mg, 128)), so one roll
        # serves GROUP_ROWS/p rows — 32 rolls of [C, members, rowbuf]
        # instead of 128 rolls of [C, rowbuf] for 44.1->48 kHz (the
        # rolls were ~1 ms of the per-row variant's 2.2 ms per 300 s
        # stereo track).
        p = 128 // math.gcd(Mg, 128)
        if GROUP_ROWS % p == 0 and p < GROUP_ROWS:
            members = GROUP_ROWS // p
            for r in range(p):
                s = (r * Mg) % 128
                rows = [
                    scratch[
                        slot, :,
                        (((r + p * k) * Mg) // 128) * 128 :
                        (((r + p * k) * Mg) // 128) * 128 + rowbuf,
                    ]
                    for k in range(members)
                ]
                stacked = jnp.stack(rows, axis=1)   # [C, members, rowbuf]
                if s:
                    stacked = pltpu.roll(stacked, rowbuf - s, 2)
                for k in range(members):
                    patches[:, r + p * k : r + p * k + 1, :] = stacked[
                        :, k : k + 1, :Wp
                    ]
        else:
            for j in range(GROUP_ROWS):
                start = j * Mg
                aligned = (start // 128) * 128
                row = scratch[slot, :, aligned : aligned + rowbuf]
                if start % 128:
                    row = pltpu.roll(row, rowbuf - start % 128, 1)
                patches[:, j : j + 1, :] = row[:, :Wp].reshape(C, 1, Wp)
        # ONE dot for all channels: [C*GROUP_ROWS, Wp] x [Wp, R*L] —
        # fewer MXU pipeline fills than a per-channel dot loop.
        y = jnp.dot(
            patches[...].reshape(C * GROUP_ROWS, Wp), bank_ref[:],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[...] = y.reshape(C, GROUP_ROWS, R * L)

    out = pl.pallas_call(
        kernel,
        grid=(GB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # grouped bank resident
        ],
        out_specs=pl.BlockSpec(
            (C, GROUP_ROWS, R * L),
            lambda g: (0, g, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (C, GB * GROUP_ROWS, R * L), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((2, C, win), jnp.float32),
            pltpu.VMEM((C, GROUP_ROWS, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, bank_gt)

    return out.reshape(C, GB * GROUP_ROWS * R * L)[:, : G * L]
