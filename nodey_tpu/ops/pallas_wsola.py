"""Pallas TPU kernel for WSOLA splice scoring — the config-4/5 hot loop.

The blocked XLA path (ops/stretch._wsola_blocked) materializes two im2col
patch matrices per frame in HBM (~150 MB per 32-frame block): patch
construction is pure data movement, but at HBM bandwidth it costs ~2x the
scoring GEMM itself, and the per-frame window gathers add as much again
(measured: windows 17 ms + patches 16 ms + GEMM/argmax 8-24 ms per 30 s
stage on v5e). This kernel fuses the whole scoring pipeline per frame in
VMEM:

    DMA windows (~18 KB)  ->  patch build (VMEM, lane-blocked copies)
      ->  per-channel MXU GEMMs  ->  energy + rsqrt + row-argmax
        ->  write F[k] (one 3 KB argmax-table row)

HBM traffic collapses to ~45 MB per 1000 frames and the MXU becomes the
floor. The sequential WSOLA chain (b_k = F[k][b_{k-1}]) and the sample
assembly stay in XLA (ops/stretch.py) — they consume only the tiny F.

Patch layout: rows are stored PERMUTED as p = r*QR + q for real offset
a = q*128 + r, so each unrolled build step writes one contiguous
[QR, overlap] sublane block from a static lane slice — no lane-crossing
reshapes. The permutation is undone index-wise on the host (a_of_p /
p_of_a tables); sample values are never permuted.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nodey_tpu.ops import stretch as stretch_ops

LANE = 128


def _geometry(seek: int, overlap: int):
    n_cand = seek + 1
    qr = -(-n_cand // LANE)           # lane-blocks of rows (a = q*128 + r)
    rows = qr * LANE                  # padded candidate rows
    # Window span each side needs: offsets up to (rows-1) + overlap.
    span = rows - 1 + overlap
    span_pad = -(-span // LANE) * LANE
    return n_cand, qr, rows, span_pad


def wsola_score_table(
    x,
    K: int,
    num: int,
    den: int,
    seq: int,
    seek: int,
    overlap: int,
    precision=lax.Precision.HIGHEST,
    interpret: bool = False,
):
    """F'[k, p] = argmax_b' score(tail-row p of frame k-1, cand b' of
    frame k), permuted row/col layout (module docstring); int32 [K, rows].

    ``x`` must be padded so pos(K-1) + seek + seq stays in bounds (the
    _wsola_impl padding). Frame positions are computed in-kernel with the
    same overflow-safe decomposition as stretch_ops.frame_pos.
    """
    C, N = x.shape
    stride = seq - overlap
    n_cand, qr, rows, span_pad = _geometry(seek, overlap)
    if N < span_pad + stride:
        x = jnp.pad(x, ((0, 0), (0, span_pad + stride - N)))
        N = x.shape[1]

    head = x[:, :overlap]  # frame 0's tail row (raw clip head)
    max_start = N - span_pad

    def kernel(x_hbm, head_ref, out_ref, cand_win, tail_win, pats, sems):
        k = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def frame_pos(kk):
            # stretch_ops.frame_pos, inlined on kernel scalars.
            q, r = num // den, num % den
            k_hi = kk // 256
            k_lo = kk % 256
            a = k_hi * r
            a1 = a // den
            a0 = a % den
            rem = a0 * 256 + k_lo * r + den // 2
            return kk * q + a1 * 256 + rem // den

        def starts(step):
            pos = frame_pos(step)
            prev = jnp.where(step > 0, frame_pos(step - 1), 0)
            cand_s = jnp.clip(pos, 0, max_start)
            tail_s = jnp.clip(prev + stride, 0, max_start)
            return cand_s, tail_s

        def dma(slot, start, scratch, which):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(start, span_pad)],
                scratch.at[slot],
                sems.at[slot, which],
            )

        @pl.when(k == 0)
        def _():
            c0, t0 = starts(0)
            dma(0, c0, cand_win, 0).start()
            dma(0, t0, tail_win, 1).start()

        slot = k % 2

        @pl.when(k + 1 < n_steps)
        def _():
            c1, t1 = starts(k + 1)
            dma((k + 1) % 2, c1, cand_win, 0).start()
            dma((k + 1) % 2, t1, tail_win, 1).start()

        c_s, t_s = starts(k)
        dma(slot, c_s, cand_win, 0).wait()
        dma(slot, t_s, tail_win, 1).wait()

        # Patch build: for each lane offset r, roll the window left by r so
        # rows p = r*QR + q become the lane-ALIGNED slices
        # rolled[:, q*128 : q*128+overlap] — Mosaic cannot concatenate
        # vectors with mismatched lane offsets, but rolls realign them.
        # Fully static unrolled loop (128 rolls + aligned stacks).
        cw = cand_win[slot]   # [C, span_pad]
        tw = tail_win[slot]
        for r in range(LANE):
            # Left-shift by r == circular right-shift by span-r.
            shift = (span_pad - r) % span_pad
            cr = pltpu.roll(cw, shift, 1)
            tr = pltpu.roll(tw, shift, 1)
            cb = jnp.stack(
                [cr[:, q * LANE : q * LANE + overlap] for q in range(qr)],
                axis=1,
            )                                        # [C, QR, overlap]
            tb = jnp.stack(
                [tr[:, q * LANE : q * LANE + overlap] for q in range(qr)],
                axis=1,
            )
            pats[0, :, r * qr : (r + 1) * qr, :] = cb
            pats[1, :, r * qr : (r + 1) * qr, :] = tb

        cand = pats[0]        # [C, rows, overlap]
        tails = pats[1]

        energy = jnp.zeros((1, rows), dtype=jnp.float32)
        for c in range(C):
            energy = energy + jnp.sum(
                cand[c] * cand[c], axis=1
            )[None, :]

        # Column validity: real offset a(p) = (p % qr)*128 + p//qr < n_cand.
        p_iota = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        col_valid = ((p_iota % qr) * LANE + p_iota // qr) < n_cand
        inv_norm = lax.rsqrt(energy + 1e-9)

        @pl.when(k == 0)
        def _():
            h = jnp.zeros((1, rows), dtype=jnp.float32)
            for c in range(C):
                h = h + lax.dot_general(
                    head_ref[c][None, :], cand[c],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            best = jnp.argmax(
                jnp.where(col_valid, h * inv_norm, -jnp.inf), axis=1
            ).astype(jnp.int32)
            out_ref[0, :, :] = jnp.broadcast_to(best, (8, rows))

        @pl.when(k > 0)
        def _():
            scores = jnp.zeros((rows, rows), dtype=jnp.float32)
            for c in range(C):
                scores = scores + lax.dot_general(
                    tails[c], cand[c],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            ranked = jnp.where(col_valid, scores * inv_norm, -jnp.inf)
            # Output rows are sublane-padded to 8; row 0 carries the data.
            out_ref[0, :, :] = jnp.broadcast_to(
                jnp.argmax(ranked, axis=1).astype(jnp.int32)[None, :],
                (8, rows),
            )

    out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # head
        ],
        out_specs=pl.BlockSpec(
            (1, 8, rows), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, 8, rows), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, C, span_pad), jnp.float32),
            pltpu.VMEM((2, C, span_pad), jnp.float32),
            pltpu.VMEM((2, C, rows, overlap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x, head)
    return out[:, 0, :]


@functools.lru_cache(maxsize=8)
def _perm_tables(seek: int):
    n_cand, qr, rows, _sp = _geometry(seek, 2)
    p_idx = np.arange(rows)
    a_of_p = (p_idx % qr) * LANE + p_idx // qr          # permuted -> real
    p_of_a = np.zeros(rows, dtype=np.int64)
    p_of_a[a_of_p] = p_idx
    return (
        jnp.asarray(a_of_p.astype(np.int32)),
        jnp.asarray(p_of_a.astype(np.int32)),
    )


def splice_offsets(x, K, num, den, seq, seek, overlap,
                   precision=lax.Precision.HIGHEST, interpret=False):
    """Run the score-table kernel + the tiny sequential chain; returns the
    real-offset splice choices bs [K] int32 — the quantity the XLA
    assembly path consumes."""
    table = wsola_score_table(
        x, K, num, den, seq, seek, overlap,
        precision=precision, interpret=interpret,
    )
    a_of_p, p_of_a = _perm_tables(seek)

    def pick(b_prev_real, row):
        # table rows are indexed by permuted TAIL rows; the stored argmax
        # is a permuted CANDIDATE index. Frame 0's row is constant (head).
        b = a_of_p[row[p_of_a[b_prev_real]]]
        return b, b

    _, bs = lax.scan(pick, jnp.int32(0), table, unroll=16)
    return bs
