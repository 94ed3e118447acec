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
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LANE = 128


def _geometry(seek: int, overlap: int):
    n_cand = seek + 1
    qr = -(-n_cand // LANE)           # lane-blocks of rows (a = q*128 + r)
    rows = qr * LANE                  # padded candidate rows
    # Window span each side needs: offsets up to (rows-1) + overlap.
    span = rows - 1 + overlap
    span_pad = -(-span // LANE) * LANE
    return n_cand, qr, rows, span_pad


def score_frames_per_step(default: int = 1) -> int:
    """Frames scored per grid step (VERDICT r4 #6). Each frame's scoring
    is independent (the serial chain b_k = F[k][b_{k-1}] consumes only
    the tiny argmax table on the XLA side), so batching F frames per
    grid step amortizes the fixed per-step cost — grid sequencing, DMA
    issue/wait latency, the pl.when branches — measured at ~0.95 us of a
    ~1.9 us frame, the floor half the bound-fraction defense could not
    close. Per-frame GEMM operands and reduction order are UNCHANGED, so
    the table is bitwise identical at any F (test-pinned).
    NODEY_WSOLA_FPS overrides."""
    env = os.environ.get("NODEY_WSOLA_FPS")
    if env:
        try:
            return max(1, min(8, int(env)))
        except ValueError:
            return default
    return default


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
    frames_per_step: int | None = None,
):
    """F'[k, p] = argmax_b' score(tail-row p of frame k-1, cand b' of
    frame k), permuted row/col layout (module docstring); int32 [K, rows].

    ``x`` must be padded so pos(K-1) + seek + seq stays in bounds (the
    _wsola_impl padding). Frame positions are computed in-kernel with the
    same overflow-safe decomposition as stretch_ops.frame_pos.

    ``frames_per_step`` (default score_frames_per_step()): independent
    frames scored per grid step — F-fold fewer grid steps at identical
    per-frame arithmetic (bitwise-equal table; see score_frames_per_step).
    """
    C, N = x.shape
    F = frames_per_step or score_frames_per_step()
    stride = seq - overlap
    n_cand, qr, rows, span_pad = _geometry(seek, overlap)
    # HBM->VMEM copies must start lane-aligned: DMA a 128-aligned superset
    # window and fold the residual offset into the in-kernel rolls.
    span_dma = span_pad + LANE
    GB = -(-K // F)                  # grid steps (last may be partial)
    KP = GB * F                      # padded frame count
    # Pad so the LAST (padded) frame's lane-aligned DMA window (and its
    # successor's tail read at pos + stride) fits — otherwise cand_start
    # clips to max_start and the final frames score a left-shifted window.
    last_pos = ((KP - 1) * num + den // 2) // den
    need = last_pos + stride + span_dma
    if N < need:
        x = jnp.pad(x, ((0, 0), (0, need - N)))
        N = x.shape[1]

    head = x[:, :overlap]  # frame 0's tail row (raw clip head)
    max_start = N - span_dma

    def kernel(x_hbm, head_ref, out_ref, cand_win, tail_win, pats, sems):
        g = pl.program_id(0)
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

        def dma(slot, f, start, scratch, which):
            aligned = pl.multiple_of((start // LANE) * LANE, LANE)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(aligned, span_dma)],
                scratch.at[slot, f],
                sems.at[slot, f, which],
            )

        @pl.when(g == 0)
        def _():
            for f in range(F):
                c0, t0 = starts(f)
                dma(0, f, c0, cand_win, 0).start()
                dma(0, f, t0, tail_win, 1).start()

        slot = g % 2

        @pl.when(g + 1 < n_steps)
        def _():
            for f in range(F):
                c1, t1 = starts((g + 1) * F + f)
                dma((g + 1) % 2, f, c1, cand_win, 0).start()
                dma((g + 1) % 2, f, t1, tail_win, 1).start()

        # Column validity: rows p = r2*(8*qr) + q*8 + s map to real offset
        # a = 128q + 16s + r2 (< n_cand). Frame-independent.
        p_iota = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        r2_i = p_iota // (8 * qr)
        rem_i = p_iota % (8 * qr)
        col_valid = (
            LANE * (rem_i // 8) + 16 * (rem_i % 8) + r2_i
        ) < n_cand

        for f in range(F):
            k = g * F + f
            c_s, t_s = starts(k)
            dma(slot, f, c_s, cand_win, 0).wait()
            dma(slot, f, t_s, tail_win, 1).wait()

            # Patch build, two-level roll decomposition. A lane roll on a
            # [C, span] vector uses only C of 8 sublanes; instead
            # pre-shift the window onto all 8 sublanes (E[s] =
            # window <<16s), then only 16 fine rolls at FULL sublane
            # width cover every offset a = 128q + 16s + r2, rows stored
            # as p = r2*(8*qr) + q*8 + s. One traced pre-roll absorbs
            # the DMA alignment residue.
            d_c = c_s % LANE
            d_t = t_s % LANE
            cw = pltpu.roll(
                cand_win[slot, f], span_dma - d_c, 1
            )  # [C, span_dma]
            tw = pltpu.roll(tail_win[slot, f], span_dma - d_t, 1)

            def left(v, r):
                return pltpu.roll(v, (span_dma - r) % span_dma, 1)

            ce = jnp.stack([left(cw, 16 * s) for s in range(8)], axis=1)
            te = jnp.stack([left(tw, 16 * s) for s in range(8)], axis=1)
            # ce/te: [C, 8, span_dma]
            for r2 in range(16):
                cr = pltpu.roll(ce, (span_dma - r2) % span_dma, 2)
                tr = pltpu.roll(te, (span_dma - r2) % span_dma, 2)
                for q in range(qr):
                    p0 = r2 * (8 * qr) + q * 8
                    pats[0, :, p0 : p0 + 8, :] = cr[
                        :, :, q * LANE : q * LANE + overlap
                    ]
                    pats[1, :, p0 : p0 + 8, :] = tr[
                        :, :, q * LANE : q * LANE + overlap
                    ]

            cand = pats[0]        # [C, rows, overlap]
            tails = pats[1]

            energy = jnp.zeros((1, rows), dtype=jnp.float32)
            for c in range(C):
                energy = energy + jnp.sum(
                    cand[c] * cand[c], axis=1
                )[None, :]
            inv_norm = lax.rsqrt(energy + 1e-9)

            def write_tails(cand=cand, tails=tails, inv_norm=inv_norm, f=f):
                scores = jnp.zeros((rows, rows), dtype=jnp.float32)
                for c in range(C):
                    scores = scores + lax.dot_general(
                        tails[c], cand[c],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )
                ranked = jnp.where(col_valid, scores * inv_norm, -jnp.inf)
                # Output rows are sublane-padded to 8; row 0 carries the
                # data.
                out_ref[f, :, :] = jnp.broadcast_to(
                    jnp.argmax(ranked, axis=1).astype(jnp.int32)[None, :],
                    (8, rows),
                )

            if f == 0:
                # Frame 0 of the CLIP scores the raw head row instead of
                # a previous frame's tail; only step 0's first frame is
                # that frame.
                @pl.when(g == 0)
                def _(cand=cand, inv_norm=inv_norm):
                    h = jnp.zeros((1, rows), dtype=jnp.float32)
                    for c in range(C):
                        h = h + lax.dot_general(
                            head_ref[c][None, :], cand[c],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision,
                        )
                    best = jnp.argmax(
                        jnp.where(col_valid, h * inv_norm, -jnp.inf),
                        axis=1,
                    ).astype(jnp.int32)
                    out_ref[0, :, :] = jnp.broadcast_to(best, (8, rows))

                pl.when(g > 0)(write_tails)
            else:
                write_tails()

    out = pl.pallas_call(
        kernel,
        grid=(GB,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # head
        ],
        out_specs=pl.BlockSpec(
            (F, 8, rows), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((KP, 8, rows), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, F, C, span_dma), jnp.float32),
            pltpu.VMEM((2, F, C, span_dma), jnp.float32),
            pltpu.VMEM((2, C, rows, overlap), jnp.float32),
            pltpu.SemaphoreType.DMA((2, F, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            # Patches (9.4 MB) + scores (2.4 MB) + roll/stack temporaries
            # overflow the 16 MB default scoped-VMEM budget; v5e has the
            # headroom.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, head)
    return out[:K, 0, :]


@functools.lru_cache(maxsize=8)
def _perm_tables_np(seek: int):
    """NumPy permutation tables (cached as host arrays — caching traced
    jnp arrays would leak tracers across jit scopes)."""
    n_cand, qr, rows, _sp = _geometry(seek, 2)
    p_idx = np.arange(rows)
    r2 = p_idx // (8 * qr)
    q = (p_idx % (8 * qr)) // 8
    s = p_idx % 8
    a_of_p = LANE * q + 16 * s + r2                     # permuted -> real
    p_of_a = np.zeros(rows, dtype=np.int64)
    p_of_a[a_of_p] = p_idx
    return a_of_p.astype(np.int32), p_of_a.astype(np.int32)


def _perm_tables(seek: int):
    a_of_p, p_of_a = _perm_tables_np(seek)
    return jnp.asarray(a_of_p), jnp.asarray(p_of_a)


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


# -- serial-chain kernel (production path) ------------------------------------


def wsola_chain_pallas(
    x,
    K: int,
    num: int,
    den: int,
    seq: int,
    seek: int,
    overlap: int,
    interpret: bool = False,
):
    """Batch-safe entry: under ``vmap`` (e.g. ``CompiledGraph.run_batch``)
    the serial-chain kernel runs per clip via ``lax.map`` — the chain's
    SMEM carry is inherently per-clip, and Mosaic cannot batch an
    ANY-memory-space pallas_call anyway."""
    inner = functools.partial(
        _wsola_chain_pallas_impl,
        K=K, num=num, den=den, seq=seq, seek=seek, overlap=overlap,
        interpret=interpret,
    )
    wrapped = jax.custom_batching.custom_vmap(inner)

    @wrapped.def_vmap
    def _batch_rule(axis_size, in_batched, xs):  # noqa: ANN001
        del axis_size, in_batched
        return lax.map(inner, xs), True

    return wrapped(x)


def wsola_chain_assemble_pallas(
    x,
    K: int,
    num: int,
    den: int,
    seq: int,
    seek: int,
    overlap: int,
    interpret: bool = False,
):
    """Fused chain + assembly: returns (bs [K] int32, body [C, K*stride]).

    The kernel already holds the realized previous tail and the chosen
    candidate window in VMEM when the splice resolves, so each grid step
    also EMITS its stride of output audio (fade-blend head + direct body)
    — eliminating the separate XLA gather/overlap-add assembly pass.
    Blend arithmetic is identical to stretch._assemble_from_offsets
    (tail*fade_out + seg*fade_in in f32). Requires stride >= the padded
    overlap — no lane alignment needed; stores mask (true for the
    production 40/15/8 ms parameters at standard rates); callers gate on
    ``can_fuse_assembly``. Batch-safe like wsola_chain_pallas."""
    inner = functools.partial(
        _wsola_chain_pallas_impl,
        K=K, num=num, den=den, seq=seq, seek=seek, overlap=overlap,
        interpret=interpret, emit_audio=True,
    )
    wrapped = jax.custom_batching.custom_vmap(inner)

    @wrapped.def_vmap
    def _batch_rule(axis_size, in_batched, xs):  # noqa: ANN001
        del axis_size, in_batched
        return lax.map(inner, xs), (True, True)

    return wrapped(x)


def chunk_window_extra(seq: int, seek: int, overlap: int) -> int:
    """Extra input-window width the CHUNKED chain kernel needs beyond the
    scan path's pos + seek + seq bound: the lane-aligned DMA superset
    window reads up to pos + span_dma."""
    stride = seq - overlap
    n_cand = seek + 1
    rows = -(-n_cand // LANE) * LANE
    span = max(rows - 1 + overlap, seek + stride + overlap)
    span_dma = (-(-span // LANE) + 1) * LANE
    return max(0, span_dma - (seek + seq)) + LANE


def wsola_chunk_chain_pallas(
    x,
    head,
    k0,
    base,
    K: int,
    num: int,
    den: int,
    seq: int,
    seek: int,
    overlap: int,
    interpret: bool = False,
):
    """Chunked fused chain+emit: process frames k0..k0+K-1 whose windows
    live in ``x`` (the FIFO snapshot starting at absolute input position
    ``base``), seeding the chain from the carried ``head`` tail
    ([C, stride], lanes past the overlap ignored). Returns
    (bs [K] int32, body [C, K*stride]). Trailing frames whose windows
    exceed the buffered region clamp and produce garbage the caller
    masks; the caller re-runs them next chunk with the properly carried
    tail — identical semantics to the scan path's validity gating."""
    k0_base = jnp.stack(
        [jnp.asarray(k0, jnp.int32), jnp.asarray(base, jnp.int32)]
    )
    return _wsola_chain_pallas_impl(
        x, K=K, num=num, den=den, seq=seq, seek=seek, overlap=overlap,
        interpret=interpret, emit_audio=True, k0_base=k0_base,
        head_override=head,
    )


def can_fuse_assembly(seq: int, overlap: int) -> bool:
    # The kernel's rolls all run on 128-multiple scratch widths; the
    # stride appears only in slices and the output block's lane dim
    # (masked stores), so lane alignment is NOT required — only that one
    # stride covers the whole (padded) overlap read. On real TPU at
    # 44.1 kHz (stride 1412) the emitted audio matches the gather-path
    # assembly within float ulp (max |diff| 6e-8; identical splice
    # decisions) and the NumPy chain mirror exactly.
    stride = seq - overlap
    ov_pad = -(-overlap // LANE) * LANE
    return stride >= ov_pad


def _wsola_chain_pallas_impl(
    x,
    K: int,
    num: int,
    den: int,
    seq: int,
    seek: int,
    overlap: int,
    interpret: bool = False,
    emit_audio: bool = False,
    k0_base=None,
    head_override=None,
):
    """``k0_base``: optional int32 [2] = (k0, base) for CHUNKED execution —
    frame i scores at window position frame_pos(k0 + i) - base instead of
    frame_pos(i), and ``head_override`` (the carried tail, [C, head_w])
    seeds the chain instead of x's raw prefix. The caller must provide x
    wide enough that every VALID frame's lane-aligned DMA superset window
    fits (see chunk_window_extra); invalid trailing frames clamp to
    max_start and their outputs are discarded by the caller's masking."""
    """The greedy WSOLA chain run INSIDE one kernel: exact f32 splice
    offsets bs [K] int32.

    The score-table kernel above parallelizes the chain by scoring ALL
    721 possible tails per frame (721^2 dots on the MXU). But Mosaic grid
    steps execute sequentially on the core anyway — so carrying b_prev in
    SMEM lets each frame score only its ONE realized tail: 721 dots,
    evaluated as 48 shift-FMA passes over an 8-sublane pre-shifted window
    (row[b] = sum_v t[v] * w[b+v]; v = 8j+s), entirely on the VPU in
    exact f32 — the same arithmetic class as the CPU reference, ~700x less
    multiply work than the table, and no patch matrices at all. Window
    DMAs still double-buffer across frames (positions are
    data-independent even though splices are not).
    """
    C, N = x.shape
    stride = seq - overlap
    n_cand = seek + 1
    # Candidate row padded to lanes; window span covers candidate reads
    # AND next frame's tail read (offset b + stride + overlap).
    rows = -(-n_cand // LANE) * LANE
    span = max(rows - 1 + overlap, seek + stride + overlap)
    span_dma = (-(-span // LANE) + 1) * LANE
    # Lane rolls need a 128-multiple width; tails are carried at ov_pad
    # (padding lanes are never read: accesses are 8j + s < overlap).
    ov_pad = -(-overlap // LANE) * LANE
    # Pad so the LAST frame's lane-aligned DMA window fits: callers pad
    # only to last_pos + seek + seq, which is less than the 128-aligned
    # span_dma superset — without this, cand_start(K-1) would clip to
    # max_start and the final frames would score a left-shifted window.
    # (Chunk mode: positions are traced, so the caller sizes x instead.)
    if k0_base is None:
        last_pos = ((K - 1) * num + den // 2) // den
        need = max(last_pos + span_dma, span_dma + LANE)
        if N < need:
            x = jnp.pad(x, ((0, 0), (0, need - N)))
            N = x.shape[1]
    elif N < span_dma + LANE:
        x = jnp.pad(x, ((0, 0), (0, span_dma + LANE - N)))
        N = x.shape[1]
    if emit_audio and not can_fuse_assembly(seq, overlap):
        raise ValueError(
            f"emit_audio requires stride >= padded overlap "
            f"(seq={seq}, overlap={overlap})"
        )
    head_w = stride if emit_audio else ov_pad
    if head_override is not None:
        if head_override.shape != (C, head_w):
            raise ValueError(
                f"head_override must be [C, {head_w}], got "
                f"{head_override.shape}"
            )
        head = head_override
    else:
        head = x[:, :head_w]
    max_start = N - span_dma
    if emit_audio:
        # fades[0] = fade_in extended with 1s past the overlap, fades[1] =
        # fade_out extended with 0s: `tail*fades[1] + seg*fades[0]` then
        # yields the blended head AND the direct body in one expression
        # (tail lanes past the overlap are finite garbage times 0.0).
        # Same f32 arithmetic as stretch._assemble_from_offsets.
        f_in = np.ones(stride, dtype=np.float32)
        f_in[:overlap] = (
            np.arange(overlap, dtype=np.float32) + np.float32(0.5)
        ) / np.float32(overlap)
        fades = np.stack([f_in, np.float32(1.0) - f_in])
        fades[1, overlap:] = 0.0
        fades = jnp.asarray(fades)                      # [2, stride]
    if overlap % 8:
        raise ValueError(
            f"wsola_chain_pallas requires overlap % 8 == 0, got {overlap}"
        )
    # Sublane pre-shift factor: v = S*j + s. Larger S trades stack-build
    # rolls (S of them) for shift-FMA passes (overlap/S) — the step is
    # issue-bound, so minimize total op count.
    S = 16 if overlap % 16 == 0 else 8
    nj = overlap // S

    def kernel(x_hbm, head_ref, *rest):
        if k0_base is not None:
            k0b_ref, rest = rest[0], rest[1:]
        else:
            k0b_ref = None
        if emit_audio:
            fades_ref, bs_ref, body_ref, win, bprev, sems = rest
        else:
            (bs_ref, win, bprev, sems) = rest
            fades_ref = body_ref = None
        k = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def frame_pos(kk):
            q, r = num // den, num % den
            k_hi = kk // 256
            k_lo = kk % 256
            a = k_hi * r
            a1 = a // den
            a0 = a % den
            rem = a0 * 256 + k_lo * r + den // 2
            return kk * q + a1 * 256 + rem // den

        def cand_start(step):
            if k0b_ref is not None:
                pos = frame_pos(k0b_ref[0] + step) - k0b_ref[1]
            else:
                pos = frame_pos(step)
            return jnp.clip(pos, 0, max_start)

        def dma(slot, step):
            start = cand_start(step)
            aligned = pl.multiple_of((start // LANE) * LANE, LANE)
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(aligned, span_dma)],
                win.at[slot],
                sems.at[slot],
            )

        @pl.when(k == 0)
        def _():
            dma(0, 0).start()
            bprev[0, 0] = 0

        # THREE-slot rotation: slot k%3 = current, (k+1)%3 = prefetch,
        # (k+2)%3 = previous frame's window — still live because the tail
        # of frame k reads from it (a 2-slot ping-pong would overwrite it
        # with the k+1 prefetch).
        slot = k % 3

        @pl.when(k + 1 < n_steps)
        def _():
            dma((k + 1) % 3, k + 1).start()

        dma(slot, k).wait()
        c_s = cand_start(k)
        d = c_s % LANE
        w = pltpu.roll(win[slot], span_dma - d, 1)     # [C, span_dma]

        # Tail of the PREVIOUS frame at the realized splice: a slice of the
        # previous window, at offset b_prev + stride from pos(k-1).
        prev_s = cand_start(jnp.maximum(k - 1, 0))
        d_prev = prev_s % LANE
        off = bprev[0, 0] + stride + d_prev
        wprev = win[(k + 2) % 3]
        tail_roll = pltpu.roll(wprev, span_dma - off, 1)
        is_first = k == 0
        if emit_audio:
            # One wide tail covers both uses: scoring reads the first
            # ov_pad lanes, the emit blend the first stride lanes (lanes
            # past the overlap are zeroed by fade_out).
            tail_wide = jnp.where(
                is_first, head_ref[:, :], tail_roll[:, :stride]
            )                                           # [C, stride]
            tail = tail_wide[:, :ov_pad]
        else:
            tail = jnp.where(
                is_first, head_ref[:, :], tail_roll[:, :ov_pad]
            )                                           # [C, ov_pad]

        # The step is ISSUE-bound (~100 ns per Mosaic vector op), so every
        # op runs on ALL channels at once ([C, w] vectors, sublane-stacked)
        # and on the narrowest 128-multiple width that covers the reads:
        # scan_w lanes instead of the full span_dma window.
        #
        # Candidate ENERGY needs no per-tail work: it is the
        # width-`overlap` moving sum of w^2, built MASKLESS by binary
        # doubling (W_2w[i] = W_w[i] + W_w[i+w]) and set-bit combination —
        # every read stays inside scan_w for b < n_cand, so no iota/where
        # ops are issued. (The summation-order difference vs a serial sum,
        # ~1e-6 relative, only perturbs rsqrt normalization of near-ties.)
        scan_w = -(-(overlap + rows) // LANE) * LANE
        wsl = w[:, :scan_w]                             # [C, scan_w]
        partial = {1: wsl * wsl}
        width = 1
        while width * 2 <= overlap:
            prev = partial[width]
            partial[width * 2] = prev + pltpu.roll(
                prev, (scan_w - width) % scan_w, 1
            )
            width *= 2
        moving = None
        off = 0
        for bit in sorted(partial, reverse=True):
            if overlap & bit:
                part = partial[bit]
                if off:
                    part = pltpu.roll(part, (scan_w - off) % scan_w, 1)
                moving = part if moving is None else moving + part
                off += bit
        energy = jnp.sum(
            moving[:, :rows], axis=0, keepdims=True
        )                                               # [1, rows]

        # S-sublane pre-shift: E[s*C + c] = w_c << s; contribution of
        # v = S*j + s is then t_c[v] * E[s*C+c][b + S*j] — a STATIC lane
        # slice per j (Mosaic realigns lane offsets on the adds). The same
        # pre-shift applied to the tail turns the per-sublane scales
        # t_c[S*j + s] into static [SC, 1] lane slices — no scalar reads
        # in the hot loop. Four independent accumulators (seeded from the
        # first products, no zero-init ops) break the add dependency chain
        # so the VPU pipelines the shift-FMA passes.
        #
        # ONE roll serves BOTH stacks: window and tail ride the same
        # [C, scan_w + ov_pad] buffer, halving the 2*S pre-shift rolls
        # (the step is issue-bound — VERDICT r4 #6 decomposition). The
        # hot-loop reads never cross the seam, so every value read is
        # bitwise what the separate circular rolls produced: the window
        # side reads lanes S*j + b <= S*(nj-1) + rows - 1 and the rolled
        # pull i + s stays < scan_w; the tail side reads lane
        # scan_w + S*j whose pull scan_w + S*j + s <= scan_w + overlap
        # - 1 stays inside the tail half (splice decisions and goldens
        # are pinned on this).
        both = jnp.concatenate([wsl, tail], axis=1)     # [C, scan_w+ov_pad]
        bw = scan_w + ov_pad
        stacked = jnp.concatenate(
            [pltpu.roll(both, (bw - s) % bw, 1) for s in range(S)],
            axis=0,
        )                                               # [SC, bw]
        e = stacked[:, :scan_w]                         # [SC, scan_w]
        tstack = stacked[:, scan_w:]                    # [SC, ov_pad]
        accs = [None] * 4
        for j in range(nj):
            sliced = e[:, S * j : S * j + rows]         # [SC, rows]
            scale = tstack[:, S * j : S * j + 1]        # [SC, 1]
            prod = sliced * scale
            accs[j % 4] = prod if accs[j % 4] is None else accs[j % 4] + prod

        live = [a for a in accs if a is not None]
        while len(live) > 1:
            live = [
                live[i] + live[i + 1] if i + 1 < len(live) else live[i]
                for i in range(0, len(live), 2)
            ]
        row = jnp.sum(live[0], axis=0, keepdims=True)   # [1, rows]
        b_iota = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        ranked = jnp.where(
            b_iota < n_cand,
            row * lax.rsqrt(energy + 1e-9),
            -jnp.inf,
        )
        best = jnp.argmax(ranked, axis=1)[0].astype(jnp.int32)
        bprev[0, 0] = best
        bs_ref[0, :, :] = jnp.broadcast_to(best, (8, LANE))
        if emit_audio:
            # Emit this frame's stride of output: realign the window so
            # the chosen candidate starts at lane 0, then blend/copy in
            # one fused expression (see fades construction above).
            w_b = pltpu.roll(w, span_dma - best, 1)[:, :stride]
            body = (
                tail_wide * fades_ref[1:2, :] + w_b * fades_ref[0:1, :]
            )
            body_ref[0, :, :] = body

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, head]
    if k0_base is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(k0_base.astype(jnp.int32))
    bs_spec = pl.BlockSpec(
        (1, 8, LANE), lambda k: (k, 0, 0), memory_space=pltpu.VMEM
    )
    bs_shape = jax.ShapeDtypeStruct((K, 8, LANE), jnp.int32)
    if emit_audio:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # fades
        out_specs = [
            bs_spec,
            pl.BlockSpec(
                (1, C, stride), lambda k: (k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        out_shape = [
            bs_shape, jax.ShapeDtypeStruct((K, C, stride), jnp.float32)
        ]
        args.append(fades)
    else:
        out_specs = bs_spec
        out_shape = bs_shape
    args = tuple(args)
    out = pl.pallas_call(
        kernel,
        grid=(K,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, C, span_dma), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if emit_audio:
        bs, frames = out
        body = jnp.transpose(frames, (1, 0, 2)).reshape(C, K * stride)
        return bs[:, 0, 0], body
    return out[:, 0, 0]
