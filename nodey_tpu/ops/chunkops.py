"""Chunk-streaming primitives: device FIFOs and stateful op steps.

The reference streams audio as chains of ~1152-sample frames through bounded
per-edge channels (reference: include/processor/audio-stream.hpp:46-83,
include/config.hpp:53), so memory stays O(nodes x 16 frames) for any clip
length (SURVEY.md §5.7). The TPU equivalent implemented here: every stateful
node owns a small device-resident ring ("FIFO") carried through a jitted
chunk-step function — all shapes static, all control data-independent, state
threaded as a pytree (the explicit form of the state the reference kept
implicitly inside SwrContext/SoundTouch objects, SURVEY.md §7.3).

A FIFO is the pytree ``(buf [C, cap] f32, level int32)`` with the invariant
that ``buf[:, level:]`` is zero. Consuming reads a static-width window from
the front (real lookahead samples included) and advances by a traced amount;
samples past ``level`` read as zeros, which directly reproduces the
reference's drained-resampler silence semantics for early-EOF mixer inputs
(reference: src/processor/audio-amix.cpp:279-291).

Streaming op steps in this module are bitwise-exact against their offline
counterparts (ops/resample.resample_data, ops/stft.magnitude_spectrogram,
ops/stretch._wsola_impl): identical windows through identical kernels —
tested in tests/test_chunkops.py.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from nodey_tpu.ops import resample as resample_ops
from nodey_tpu.ops import stretch as stretch_ops


# -- FIFO ---------------------------------------------------------------------


class FifoState(NamedTuple):
    """Device-resident FIFO carry (buf [C, cap] f32, level int32).

    A NamedTuple (not a bare tuple) so the streaming compiler can find
    every FIFO in a node's state tree and surface its fill level as a
    per-edge gauge (the reference's per-link channel occupancy overlay,
    src/frontend/app.cpp:1574-1595) without touching node code."""

    buf: Any
    level: Any


def fifo_init(channels: int, cap: int):
    """Empty FIFO. ``cap`` must statically bound level + any single push."""
    return FifoState(jnp.zeros((channels, cap), dtype=jnp.float32),
                     jnp.int32(0))


def fifo_prefill(channels: int, cap: int, zeros: int):
    """FIFO pre-loaded with ``zeros`` silence samples (left-context padding
    or bimix_v2 placement offsets)."""
    return FifoState(jnp.zeros((channels, cap), dtype=jnp.float32),
                     jnp.int32(zeros))


def fifo_push(state, data, n):
    """Append ``data[:, :n]``; samples past ``n`` are masked off.

    Caller guarantees level + data.shape[1] <= cap statically (plan caps
    accordingly); dynamic_update_slice would silently clamp otherwise.
    """
    buf, level = state
    idx = jnp.arange(data.shape[1], dtype=jnp.int32)[None, :]
    data = jnp.where(idx < n, data, 0.0)
    # Write the m-wide block at offset level. Positions [level+n, level+m)
    # receive zeros, preserving the zero-tail invariant since the buffer
    # was zero there too.
    buf = lax.dynamic_update_slice(buf, data, (0, level))
    return FifoState(buf, level + jnp.int32(n))


def fifo_window(state, width: int):
    """Static-width snapshot from the front (zeros past level)."""
    buf, _ = state
    return buf[:, :width]


def fifo_advance(state, take):
    """Drop ``take`` samples from the front (traced), re-zeroing the tail."""
    buf, level = state
    C, cap = buf.shape
    rolled = jnp.roll(buf, -take, axis=1)
    new_level = jnp.maximum(level - take, 0)
    idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
    buf = jnp.where(idx < new_level, rolled, 0.0)
    return FifoState(buf, new_level)


def fifo_level(state):
    return state[1]


def round_up(n: int, q: int) -> int:
    return -(-n // q) * q


# -- streaming polyphase resampler --------------------------------------------


class ResamplePlan(NamedTuple):
    """Static geometry for one streaming rational resampler."""

    L: int
    M: int
    taps: int
    left_ctx: int      # taps//2 - 1 (the offline left zero-pad)
    right_ctx: int     # taps - 1 lookahead past the consumed segment
    push_cap: int      # max input samples pushed per step
    take_cap: int      # max input samples consumed per step (multiple of quant)
    cap: int           # FIFO capacity
    out_cap: int       # take_cap * L // M
    quant: int         # consumption quantum M * group_factor (phase unit)
    compat: Optional[str] = None   # resolved bank mode (None | 'swr')
    # Original (unreduced) rate pair: the compat bank is MEASURED per
    # rate pair through a real SwrContext, so the step must request the
    # bank at the same rates the plan derived its geometry from — the
    # reduced pair would be a different lru_cache key and a second
    # native measurement (at absurd Hz values).
    in_rate: int = 0
    out_rate: int = 0

    @property
    def rates(self) -> Tuple[int, int]:
        return self.M, self.L


def resample_plan(in_rate: int, out_rate: int, push_cap: int,
                  compat=None) -> ResamplePlan:
    L, M = resample_ops._rational(in_rate, out_rate)
    # Resolve compat HERE (plan time) so the traced step can't flip modes
    # mid-stream if the environment changes between plan and trace.
    compat = resample_ops.resolve_compat(compat)
    _bank, left_ctx, W = resample_ops.bank_spec(in_rate, out_rate, compat)
    taps = W - M + 1
    right_ctx = W - M   # conservative lookahead (== taps - 1 analytic)
    # Consume in multiples of M * group_factor so every step's local cycle
    # 0 sits at a global cycle phase of 0 (mod R) — required for bitwise
    # equality with the offline grouped GEMM (resample.apply_filter_bank).
    quant = M * resample_ops.group_factor(L, M)
    take_cap = round_up(push_cap, quant) + quant
    cap = left_ctx + right_ctx + quant + push_cap + take_cap
    return ResamplePlan(
        L=L, M=M, taps=taps, left_ctx=left_ctx, right_ctx=right_ctx,
        push_cap=push_cap, take_cap=take_cap, cap=cap,
        out_cap=take_cap * L // M, quant=quant, compat=compat,
        in_rate=in_rate, out_rate=out_rate,
    )


def resample_stream_init(plan: ResamplePlan, channels: int):
    """State: FIFO prefilled with the offline left zero-pad, plus the count
    of input samples still unconsumed at EOF flush time."""
    return fifo_prefill(channels, plan.cap, plan.left_ctx)


def resample_stream_step(plan: ResamplePlan, state, data, n, done):
    """Push ``data[:, :n]`` then consume as much M-aligned input as the
    lookahead allows (everything, zero-padded, once ``done``).

    Returns (state, out [C, out_cap], out_n, out_done). Output samples
    match the offline ``resample_data`` of the concatenated input exactly
    within one program (group windows and the filter bank are the same)
    and to the last ulp across program shapes — the grouped GEMM in
    ``resample.apply_filter_bank`` may reassociate the tap sum differently
    at different batch geometries (tests pin atol=3e-7).
    """
    L, M, taps = plan.L, plan.M, plan.taps
    state = fifo_push(state, data, n)
    level = fifo_level(state)
    avail = level - plan.left_ctx  # unconsumed input samples in the FIFO

    # Live: consume only segments whose full tap windows are materialized.
    # Done: consume everything, rounding the final partial group up into the
    # zero tail (the offline right pad). Consumption is quantized to
    # plan.quant = M * group_factor so the grouped GEMM's cycle-group phase
    # matches the offline render (see resample_plan).
    quant = plan.quant
    take_live = jnp.clip(
        (avail - plan.right_ctx) // quant * quant, 0, plan.take_cap
    )
    take_done = jnp.clip(-(-avail // quant) * quant, 0, plan.take_cap)
    take = jnp.where(done, take_done, take_live)
    out_n_done = (avail // M) * L + ((avail % M) * L + M - 1) // M
    out_n = jnp.where(
        done, jnp.clip(out_n_done, 0, plan.out_cap), take * L // M
    )

    G = plan.take_cap // M
    # Same bank the offline path uses under this plan's compat mode —
    # stream/offline byte-equality depends on identical tap values, so
    # request it at the plan's ORIGINAL rate pair (the compat bank is
    # measured per pair; the analytic bank only depends on (L, M)).
    bank_np, _left, W = resample_ops.bank_spec(
        plan.in_rate or plan.M, plan.out_rate or plan.L, plan.compat
    )
    bank = jnp.asarray(bank_np)
    window = fifo_window(state, plan.left_ctx + plan.take_cap + W)
    y = resample_ops.apply_filter_bank(window, G, M, W, bank)  # [C, G*L]
    idx = jnp.arange(y.shape[1], dtype=jnp.int32)[None, :]
    out = jnp.where(idx < out_n, y, 0.0)

    state = fifo_advance(state, take)
    out_done = done & (fifo_level(state) - plan.left_ctx <= 0)
    return state, out, out_n, out_done


# -- streaming STFT spectrum ---------------------------------------------------


class StftPlan(NamedTuple):
    n_fft: int
    hop: int
    push_cap: int
    frames_cap: int
    cap: int


def stft_plan(n_fft: int, hop: int, push_cap: int) -> StftPlan:
    frames_cap = push_cap // hop + 2
    cap = n_fft + push_cap + frames_cap * hop
    return StftPlan(
        n_fft=n_fft, hop=hop, push_cap=push_cap, frames_cap=frames_cap,
        cap=cap,
    )


def stft_stream_init(plan: StftPlan, channels: int):
    return fifo_init(channels, plan.cap)


def stft_stream_step(plan: StftPlan, state, data, n, done):
    """Emit complete STFT frames as their windows fill.

    Offline framing computes frames whose full n_fft window lies inside the
    clip ((N - n_fft)//hop + 1, ops/stft.magnitude_spectrogram); streaming
    emits a frame once n_fft samples past its hop-aligned start are
    buffered, never zero-padded tails — the concatenated frames equal the
    offline frame set exactly.
    """
    from nodey_tpu.ops import stft as stft_ops

    n_fft, hop = plan.n_fft, plan.hop
    state = fifo_push(state, data, n)
    level = fifo_level(state)
    frames = jnp.clip((level - n_fft) // hop + 1, 0, plan.frames_cap)
    # A done-flush emits nothing extra: offline never frames past the end.
    window = fifo_window(state, plan.frames_cap * hop + n_fft)
    C = window.shape[0]
    spec = stft_ops.magnitude_spectrogram(
        _FakeStream(window), n_fft=n_fft, hop=hop
    )  # [C, frames_cap + ..., bins] — static framing over the window
    spec = spec[:, : plan.frames_cap, :]
    fidx = jnp.arange(plan.frames_cap, dtype=jnp.int32)[None, :, None]
    spec = jnp.where(fidx < frames, spec, 0.0)
    state = fifo_advance(state, frames * hop)
    out_done = done & (
        (fifo_level(state) - n_fft) // hop + 1 <= 0
    )
    return state, spec, frames, out_done


class _FakeStream:
    """Minimal duck-typed stream for magnitude_spectrogram (data only)."""

    def __init__(self, data):
        self.data = data


# -- streaming WSOLA -----------------------------------------------------------


class WsolaPlan(NamedTuple):
    seq: int
    seek: int
    overlap: int
    stride_out: int
    num: int           # input step numerator  (pos_k = (k*num + den//2)//den)
    num_t: int         # round(tempo * 65536) — the output-length scale
    den: int
    push_cap: int
    k_cap: int         # frames processed per step
    window: int        # input window needed by k_cap frames
    cap: int
    out_cap: int       # overlap + k_cap * stride_out


def wsola_plan(tempo: float, rate: int, push_cap: int) -> WsolaPlan:
    seq, seek, overlap = stretch_ops._params(rate)
    stride_out = seq - overlap
    num = int(round(stride_out * tempo * 65536))
    den = 65536
    # Enough frames per step to keep up with the push rate, with slack so a
    # drained FIFO catches up after EOF.
    k_cap = max(1, int(math.ceil(push_cap * den / num)) + 2)
    window = (k_cap - 1) * num // den + seek + seq + 2
    # +chunk_window_extra: the Pallas chunk-chain kernel reads lane-aligned
    # DMA superset windows past pos + seek + seq (harmless slack for the
    # scan path — it reads a narrower snapshot).
    from nodey_tpu.ops import pallas_wsola

    window += pallas_wsola.chunk_window_extra(seq, seek, overlap)
    cap = window + push_cap + num // den + 2
    return WsolaPlan(
        seq=seq, seek=seek, overlap=overlap, stride_out=stride_out,
        num=num, num_t=int(round(tempo * 65536)), den=den,
        push_cap=push_cap, k_cap=k_cap, window=window, cap=cap,
        out_cap=overlap + k_cap * stride_out,
    )


def wsola_stream_init(plan: WsolaPlan, channels: int):
    """State: (fifo, tail [C, overlap], k int32, consumed int32, in_len int32,
    first bool)."""
    return (
        fifo_init(channels, plan.cap),
        jnp.zeros((channels, plan.overlap), dtype=jnp.float32),
        jnp.int32(0),              # next output frame index k
        jnp.int32(0),              # input samples dropped from FIFO front
        jnp.int32(0),              # total valid input samples pushed
        jnp.bool_(True),           # first-step flag (emits the raw head)
    )


def wsola_stream_step(plan: WsolaPlan, state, data, n, done):
    """Push a chunk and process every WSOLA frame that is ready.

    Frame k reads the input window at pos(k) = (k*num + den//2)//den.
    While live, a frame is processed once (a) its window is fully buffered
    AND (b) its full output chunk lies inside the output-length bound implied
    by the input received so far (floor(in_len*den/num_t)) — (b) guarantees
    mid-stream emissions are never retracted, since the bound only grows.
    Once ``done``, the remaining frames run against the FIFO's zero tail
    exactly like the offline right pad, and the final chunk is clamped to
    the exact stretched length. Splice decisions and samples equal the
    offline ``_wsola_impl`` chain (ops/stretch.py) — tested bitwise.

    Returns (state, out [C, out_cap], out_n, out_done). The raw first
    ``overlap`` input samples the offline path prepends (ops/stretch.py:141)
    lead the first emitted chunk.
    """
    fifo, tail, k0, consumed, in_len, first = state
    fifo = fifo_push(fifo, data, n)
    in_len = in_len + jnp.int32(n)
    level = fifo_level(fifo)

    # Output-length bound from the input seen so far; final once done.
    out_total = stretch_ops.scale_length_by_num(in_len, plan.num_t)
    # Frames fully inside the bound (live) / needed to cover it (done).
    k_live = jnp.maximum((out_total - plan.overlap) // plan.stride_out, 0)
    k_fin = jnp.where(
        out_total > plan.overlap,
        (out_total - plan.overlap + plan.stride_out - 1) // plan.stride_out,
        0,
    )
    k_bound = jnp.where(done, k_fin, k_live)

    # The step is gated until the raw head (offline prepends x[:, :overlap])
    # can be emitted and the tail seeded from real samples.
    can_start = done | ((level >= plan.overlap) & (out_total >= plan.overlap))
    started = can_start | ~first
    emit_head = first & can_start
    head = fifo_window(fifo, plan.overlap)
    tail = jnp.where(emit_head, head, tail)

    def frame_ready(k):
        # Window for frame k spans [pos(k), pos(k) + seek + seq) in absolute
        # input coordinates; ready when fully buffered (or at EOF, where the
        # zero tail stands in for the offline right pad).
        end = stretch_ops.frame_pos(k, plan.num, plan.den) + plan.seek + plan.seq
        return jnp.where(done, True, end <= consumed + level)

    base = consumed  # absolute input position of FIFO front
    x = fifo_window(fifo, plan.window + plan.push_cap)
    C = x.shape[0]

    kernel = _wsola_chunk_kernel(plan)
    if kernel != "scan":
        # Batched chunk kernels (Pallas serial chain / all-XLA blocked
        # score table): frames k0..k0+k_cap-1 scored and assembled in one
        # shot, seeded from the carried tail. Invalid trailing frames
        # (window not yet buffered / beyond the output bound) produce
        # garbage the masks below discard; they re-run next step from the
        # properly carried tail — exactly the scan path's validity
        # semantics, at ~2.8 us/frame (Pallas) or MXU-GEMM speed
        # (blocked) instead of the scan's ~17 ms/frame on TPU. The
        # Pallas serial chain is the TPU streaming default (see
        # _wsola_chunk_kernel); blocked is the geometry-universal
        # fallback for overlaps the kernel rejects.
        if kernel == "pallas":
            from nodey_tpu.ops import pallas_wsola

            head_k = jnp.pad(
                tail, ((0, 0), (0, plan.stride_out - plan.overlap))
            )
            bs, body = pallas_wsola.wsola_chunk_chain_pallas(
                x, head_k, k0, base, plan.k_cap,
                plan.num, plan.den, plan.seq, plan.seek, plan.overlap,
                interpret=_wsola_chunk_interpret(),
            )
            body = body.reshape(C, plan.k_cap * plan.stride_out)
        else:  # blocked
            bs, body = stretch_ops.wsola_chain_blocked(
                x, tail, k0, plan.k_cap,
                plan.num, plan.den, plan.seq, plan.seek, plan.overlap,
                win_start=base,
            )
        ks = k0 + jnp.arange(plan.k_cap, dtype=jnp.int32)
        ends = (
            stretch_ops.frame_pos(ks, plan.num, plan.den)
            + plan.seek + plan.seq
        )
        ready = jnp.where(done, True, ends <= consumed + level)
        valid = ready & (ks < k_bound) & started
        k_done = valid.sum().astype(jnp.int32)
        samp = jnp.arange(
            plan.k_cap * plan.stride_out, dtype=jnp.int32
        )[None, :]
        body = jnp.where(samp // plan.stride_out < k_done, body, 0.0)
        # Carry tail from the LAST VALID frame's realized window (the
        # scan's per-frame tail update, collapsed to one slice).
        k_last = jnp.maximum(k_done - 1, 0)
        pos_last = (
            stretch_ops.frame_pos(k0 + k_last, plan.num, plan.den) - base
        )
        b_last = jnp.take(bs, k_last)
        start = jnp.clip(
            pos_last + b_last + plan.stride_out,
            0, x.shape[1] - plan.overlap,
        )
        new_tail = lax.dynamic_slice(x, (0, start), (C, plan.overlap))
        tail = jnp.where(k_done > 0, new_tail, tail)
        return _wsola_emit(
            plan, fifo, tail, k0, consumed, in_len, first,
            emit_head, head, body, k_done, out_total, k_fin, done,
            can_start,
        )

    fade_in = (
        jnp.arange(plan.overlap, dtype=jnp.float32) + 0.5
    ) / plan.overlap
    fade_out = 1.0 - fade_in

    def step(carry, k):
        tail_c, count = carry
        valid = frame_ready(k) & (k < k_bound) & started
        pos = jnp.clip(
            stretch_ops.frame_pos(k, plan.num, plan.den) - base,
            0,
            x.shape[1] - (plan.seek + plan.seq),
        )
        window = lax.dynamic_slice(
            x, (0, pos), (C, plan.seek + plan.seq)
        )
        cand = window[:, : plan.seek + plan.overlap]
        # HIGHEST: the TPU backend's DEFAULT conv precision is single-pass
        # bf16 (measured, ROUND4.md §10), whose product noise flips
        # near-tie splice argmaxes — the scan path must reach the same
        # decisions as the exact-f32 Pallas chain and the CPU conv.
        corr = lax.conv_general_dilated(
            cand[None, :, :], tail_c[None, :, :],
            window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )[0, 0, : plan.seek + 1]
        energy = lax.conv_general_dilated(
            (cand * cand)[None, :, :],
            jnp.ones((1, C, plan.overlap), dtype=jnp.float32),
            window_strides=(1,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )[0, 0, : plan.seek + 1]
        score = corr * lax.rsqrt(energy + 1e-9)
        best = jnp.argmax(score).astype(jnp.int32)
        seg = lax.dynamic_slice(window, (0, best), (C, plan.seq))
        head_c = (
            tail_c * fade_out[None, :] + seg[:, : plan.overlap] * fade_in[None, :]
        )
        chunk = jnp.concatenate(
            [head_c, seg[:, plan.overlap :]], axis=1
        )[:, : plan.stride_out]
        new_tail = seg[:, plan.stride_out : plan.stride_out + plan.overlap]
        tail_out = jnp.where(valid, new_tail, tail_c)
        chunk = jnp.where(valid, chunk, 0.0)
        return (tail_out, count + valid.astype(jnp.int32)), chunk

    (tail, k_done), chunks = lax.scan(
        step,
        (tail, jnp.int32(0)),
        k0 + jnp.arange(plan.k_cap, dtype=jnp.int32),
    )
    body = jnp.transpose(chunks, (1, 0, 2)).reshape(
        C, plan.k_cap * plan.stride_out
    )
    return _wsola_emit(
        plan, fifo, tail, k0, consumed, in_len, first,
        emit_head, head, body, k_done, out_total, k_fin, done, can_start,
    )


def _wsola_emit(
    plan, fifo, tail, k0, consumed, in_len, first,
    emit_head, head, body, k_done, out_total, k_fin, done, can_start,
):
    """Shared emission/advance epilogue of wsola_stream_step (scan and
    Pallas-chunk paths): lead with the raw head on the first emission,
    clamp to the exact stretched length, advance the FIFO to pos(k_next)."""
    out = jnp.concatenate([jnp.where(emit_head, head, 0.0), body], axis=1)
    body_n = k_done * plan.stride_out
    out_n = jnp.where(emit_head, plan.overlap + body_n, body_n)
    # Final clamp to the exact stretched length (only bites once done:
    # live frames are fully inside the bound by construction).
    emitted = jnp.where(
        first, jnp.int32(0), plan.overlap + k0 * plan.stride_out
    )
    out_n = jnp.clip(jnp.minimum(out_n, out_total - emitted), 0, out.shape[1])
    # Shift the body left when no head leads it so valid data starts at 0.
    out = jnp.where(emit_head, out, jnp.roll(out, -plan.overlap, axis=1))
    idx = jnp.arange(out.shape[1], dtype=jnp.int32)[None, :]
    out = jnp.where(idx < out_n, out, 0.0)

    k_next = k0 + k_done
    # Advance the FIFO: keep everything from pos(k_next) onward.
    keep_from = stretch_ops.frame_pos(k_next, plan.num, plan.den)
    advance = jnp.clip(keep_from - consumed, 0, None)
    fifo = fifo_advance(fifo, advance)
    consumed = consumed + advance

    out_done = done & (k_next >= k_fin)
    state = (fifo, tail, k_next, consumed, in_len, first & ~can_start)
    return state, out, out_n, out_done


def _wsola_chunk_kernel(plan: "WsolaPlan") -> str:
    """Chunk-step kernel choice: 'scan' | 'blocked' | 'pallas'.

    CPU default: the per-frame conv scan (exact f32, fast there, and what
    the bitwise tests pin). TPU default: the Pallas serial-chain kernel
    (22 us/frame vs the blocked score table's 204 — 3.4 vs 31 ms per 6-s
    chunk on v5e — bitwise-equal to the offline Pallas render), falling
    back to the all-XLA blocked chain (stretch.wsola_chain_blocked) for
    geometries the kernel rejects (overlap % 8 != 0 or unfusable
    assembly; every standard rate's geometry is accepted). The earlier
    "Mosaic custom calls get a fresh cache key per process" measurement
    that made blocked the round-2 default was re-tested and falsified on
    current code: two fresh processes running the production streamed
    export produce byte-identical canonical IR, identical cache keys,
    and a persistent-cache HIT on the Mosaic-bearing step executable
    (second process: 0.2 s compile, 10 s total vs 62 s cold — ROUND4.md
    §9). NODEY_WSOLA_CHUNK_FORCE = 'pallas' | 'blocked' | 'scan'
    overrides (tests run pallas in interpret mode on CPU)."""
    import os

    from nodey_tpu.ops import pallas_wsola

    pallas_capable = (
        plan.overlap % 8 == 0
        and pallas_wsola.can_fuse_assembly(plan.seq, plan.overlap)
    )
    force = os.environ.get("NODEY_WSOLA_CHUNK_FORCE")
    if force == "scan":
        return "scan"
    if force == "blocked":
        return "blocked"
    if force == "pallas":
        return "pallas" if pallas_capable else "blocked"
    try:
        import jax

        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        return "pallas" if pallas_capable else "blocked"
    return "scan"


def _wsola_chunk_interpret() -> bool:
    try:
        import jax

        return jax.default_backend() != "tpu"
    except Exception:
        return True
