"""WSOLA time-stretch + pitch transposition (the SoundTouch replacement).

Reference behavior: Velocity/Pitch nodes drive SoundTouch with setRate(r) +
setPitch(p) (src/processor/audio-velocity.cpp:384-385, 457, 474); SoundTouch
factors that into an effective resampling rate ``r*p`` and an effective WSOLA
tempo ``1/p`` — reproduced here as two explicit stages:

1. ``wsola_stretch`` — waveform-similarity overlap-add. The data-dependent
   seek of the C++ original (a serial correlation loop per frame) becomes a
   TPU-friendly form: per output frame, ALL candidate offsets are scored at
   once with one small cross-correlation (a conv -> MXU matmul), followed by
   argmax + dynamic_slice. Frames run under ``lax.scan`` (the dependence on
   the previous frame's chosen splice is inherent to WSOLA).
2. transposition — reuse the polyphase resampler at a rational approximation
   of the factor (sub-cent accuracy), relabeling the output to the original
   nominal rate.

Window parameters follow SoundTouch's classic defaults (sequence 40 ms, seek
15 ms, overlap 8 ms) with linear crossfades. SoundTouch itself is not in the
image, so parity is held by property tests (duration, pitch tracking,
spectral purity, determinism) rather than sample-level goldens — the
reference's own output here is NOT bit-deterministic across builds either
(floating WSOLA seeks), which is why the north star allows a tolerance bar
for this path.
"""

from __future__ import annotations

import fractions
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import FMT_FLT, Stream
from nodey_tpu.ops import resample as resample_ops

SEQUENCE_MS = 40.0
SEEK_MS = 15.0
OVERLAP_MS = 8.0

# Matmul precision for blocked WSOLA splice scoring (see _wsola_blocked).
# HIGH = 3-pass bf16 on the TPU MXU: f32-class accuracy for argmax ranking
# at ~3x the speed of HIGHEST's 6-pass emulation.
SCORE_PRECISION = lax.Precision.HIGH


def _params(rate: int):
    seq = max(2, int(rate * SEQUENCE_MS / 1000.0)) & ~1
    seek = max(2, int(rate * SEEK_MS / 1000.0)) & ~1
    overlap = max(2, int(rate * OVERLAP_MS / 1000.0)) & ~1
    return seq, seek, overlap


def _out_chunks(capacity_in: int, tempo: float, seq: int, overlap: int) -> int:
    """Static number of scan steps needed to cover the stretched clip."""
    stride_out = seq - overlap
    cap_out = int(math.ceil(capacity_in / tempo)) + stride_out
    return max(1, -(-(cap_out - overlap) // stride_out))


def wsola_stretch_at_rate(data, length, tempo: float, rate: int):
    """Stretch [C, N] float32 by ``tempo`` (>1 = faster/shorter).

    Returns (out_data [C, M], out_length) where out_length ~= length/tempo.
    Identity when tempo == 1."""
    if tempo == 1.0:
        return data, length
    return _wsola_impl(data, length, float(tempo), int(rate))


def frame_pos(k, num, den=65536):
    """floor((k*num + den//2) / den) in overflow-safe traced int32 arithmetic.

    ``k*num`` overflows int32 beyond ~17 output frames for typical tempos
    (num ~ 1e8), so the product is carry-decomposed: with q = num//den,
    r = num%den, k = 256*k_hi + k_lo and A = k_hi*r = 65536*A1 + A0,

        pos = k*q + A1*256 + (A0*256 + k_lo*r + den//2) // den

    every intermediate stays below 2^25 for k < 8.4M frames (~74 h of
    output). Shared by the offline scan and the streaming step so both
    paths make identical splice decisions."""
    q, r = num // den, num % den
    k_hi = k // 256
    k_lo = k % 256
    a = k_hi * r
    a1 = a // den
    a0 = a % den
    rem = a0 * 256 + k_lo * r + den // 2
    return k * q + a1 * 256 + rem // den


def _wsola_scan(x, tail0, k0, K, num, den, seq, seek, overlap, win_start=0):
    """Scan WSOLA frames k in [k0, k0+K) over ``x``.

    ``x`` must cover absolute input positions
    [pos(k0) - win_start, pos(k0+K-1) - win_start + seek + seq). The carry is
    the previous output tail — the ONLY state WSOLA threads between frames,
    which is what makes exact chunked/streaming execution possible
    (SURVEY.md §7 hard part 3)."""
    C = x.shape[0]
    stride_out = seq - overlap
    fade_in = (jnp.arange(overlap, dtype=jnp.float32) + 0.5) / overlap
    fade_out = 1.0 - fade_in

    def step(tail, k):
        pos = frame_pos(k, num, den) - win_start
        window = lax.dynamic_slice(x, (0, pos), (C, seek + seq))
        # Normalized cross-correlation of the previous output tail against
        # every candidate offset in one conv (SoundTouch's seekBestOverlap
        # scored serially; here all `seek` offsets score in parallel).
        cand = window[:, : seek + overlap]
        # HIGHEST: the TPU backend's DEFAULT conv precision is single-pass
        # bf16 (measured, ROUND4.md §10) — product noise there flips
        # near-tie splice argmaxes, and this scan path defines the splice
        # decisions every other WSOLA formulation is held bitwise to.
        corr = lax.conv_general_dilated(
            cand[None, :, :],              # [1, C, seek+overlap]
            tail[None, :, :],              # [1, C, overlap] (OIH: 1 out feat)
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )[0, 0, :seek + 1]
        energy = lax.conv_general_dilated(
            (cand * cand)[None, :, :],
            jnp.ones((1, C, overlap), dtype=jnp.float32),
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )[0, 0, :seek + 1]
        score = corr * lax.rsqrt(energy + 1e-9)
        best = jnp.argmax(score).astype(jnp.int32)

        seg = lax.dynamic_slice(window, (0, best), (C, seq))
        head = tail * fade_out[None, :] + seg[:, :overlap] * fade_in[None, :]
        chunk = jnp.concatenate([head, seg[:, overlap:]], axis=1)[
            :, :stride_out
        ]
        new_tail = seg[:, stride_out : stride_out + overlap]
        return new_tail, chunk

    tail, chunks = lax.scan(
        step, tail0, k0 + jnp.arange(K, dtype=jnp.int32)
    )
    # chunks: [K, C, stride_out] -> [C, K*stride_out]
    body = jnp.transpose(chunks, (1, 0, 2)).reshape(C, K * stride_out)
    return tail, body


_BLOCKED_MIN_FRAMES = 64  # short clips keep the simple scan (faster compile)


def _wsola_impl(data, length, tempo, rate):
    C, N = data.shape
    seq, seek, overlap = _params(rate)
    stride_out = seq - overlap
    K = _out_chunks(N, tempo, seq, overlap)

    # Integer stepping for input positions: pos_k = round(k*stride_out*tempo).
    num = int(round(stride_out * tempo * 65536))
    den = 65536

    # Pad the input so every window read is in-bounds: the last frame reads
    # [pos(K-1), pos(K-1) + seek + seq).
    last_pos = ((K - 1) * num + den // 2) // den
    pad_to = last_pos + seek + seq + 2
    x = jnp.pad(data, ((0, 0), (0, max(0, pad_to - N))))

    if K >= _BLOCKED_MIN_FRAMES and overlap % 8 == 0 and _use_pallas_scoring():
        from nodey_tpu.ops import pallas_wsola

        # Serial-chain kernel: exact f32 VPU scoring of only the realized
        # tail per frame (see ops/pallas_wsola.wsola_chain_pallas) — both
        # faster and numerically stricter than the parallel score-table
        # kernel at MXU precision. When the geometry allows, the kernel
        # also EMITS the assembled audio directly (the windows are already
        # in VMEM at splice time), skipping the XLA gather/overlap-add.
        if pallas_wsola.can_fuse_assembly(seq, overlap):
            _bs, body = pallas_wsola.wsola_chain_assemble_pallas(
                x, K, num, den, seq, seek, overlap,
            )
        else:
            bs = pallas_wsola.wsola_chain_pallas(
                x, K, num, den, seq, seek, overlap,
            )
            body = _assemble_from_offsets(
                x, bs, K, num, den, seq, seek, overlap
            )
    elif K >= _BLOCKED_MIN_FRAMES:
        body = _wsola_blocked(x, K, num, den, seq, seek, overlap)
    else:
        tail0 = x[:, :overlap]
        _, body = _wsola_scan(
            x, tail0, jnp.int32(0), K, num, den, seq, seek, overlap
        )
    out = jnp.concatenate([x[:, :overlap], body], axis=1)

    out_length = jnp.minimum(
        _scale_length_exact(length, tempo), out.shape[1]
    )
    idx = jnp.arange(out.shape[1])[None, :]
    out = jnp.where(idx < out_length, out, 0.0)
    return out, out_length


def _use_pallas_scoring() -> bool:
    """TPU backend only: the Pallas splice-scoring kernel
    (ops/pallas_wsola.py) fuses window DMA + im2col + GEMM + argmax in
    VMEM; CPU keeps the XLA blocked path (exact f32, used by all tests)."""
    import os

    if os.environ.get("NODEY_WSOLA_NO_PALLAS"):
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _assemble_from_offsets(x, bs, K, num, den, seq, seek, overlap, block=64):
    """Sample assembly given precomputed splice offsets ``bs`` [K].

    Block-scanned (span slice + per-frame window slices) so peak memory is
    one block of segments; blend arithmetic identical to the other paths.
    """
    C = x.shape[0]
    stride = seq - overlap
    win_w = seek + seq
    nblk = -(-K // block)
    Kp = nblk * block
    bs = jnp.pad(bs, (1, Kp - K))          # bs_prev at index k, bs at k+1
    fade_in = (jnp.arange(overlap, dtype=jnp.float32) + 0.5) / overlap
    fade_out = 1.0 - fade_in
    head = x[:, :overlap]
    span_w = (block + 1) * (num // den + 1) + win_w + 64
    # Small K (just past the blocked-path gate) can leave x narrower than
    # one block span; pad so the dynamic block slice always fits (the
    # clamps keep every frame read inside the real samples).
    if x.shape[1] < span_w:
        x = jnp.pad(x, ((0, 0), (0, span_w - x.shape[1])))

    def block_step(_carry, blk):
        k0 = blk * block
        span_start = jnp.clip(
            frame_pos(k0 - 1, num, den), 0, x.shape[1] - span_w
        )
        span = lax.dynamic_slice(x, (0, span_start), (C, span_w))
        b_pair = lax.dynamic_slice(bs, (k0,), (block + 1,))

        def one(i):
            k = k0 + i
            pos_c = jnp.clip(
                frame_pos(k, num, den) - span_start, 0, span_w - win_w
            )
            pos_p = jnp.clip(
                frame_pos(k - 1, num, den) - span_start, 0, span_w - win_w
            )
            seg = lax.dynamic_slice(
                span, (0, pos_c + b_pair[i + 1]), (C, seq)
            )
            tail = lax.dynamic_slice(
                span, (0, pos_p + b_pair[i] + stride), (C, overlap)
            )
            tail = jnp.where((blk == 0) & (i == 0), head, tail)
            blended = (
                tail * fade_out[None, :] + seg[:, :overlap] * fade_in[None, :]
            )
            return jnp.concatenate(
                [blended, seg[:, overlap:]], axis=1
            )[:, :stride]

        chunks = jax.vmap(one)(jnp.arange(block, dtype=jnp.int32))
        return _carry, chunks

    _, all_chunks = lax.scan(
        block_step, jnp.int32(0), jnp.arange(nblk, dtype=jnp.int32)
    )  # [nblk, block, C, stride]
    body = jnp.transpose(all_chunks, (2, 0, 1, 3)).reshape(C, Kp * stride)
    return body[:, : K * stride]


def _wsola_blocked(x, K, num, den, seq, seek, overlap, block=32):
    """Offline whole-clip wrapper over ``wsola_chain_blocked`` (head tail,
    frame 0, window at origin)."""
    _bs, body = wsola_chain_blocked(
        x, x[:, :overlap], jnp.int32(0), K, num, den, seq, seek, overlap,
        block=block,
    )
    return body


def wsola_chain_blocked(
    x, tail0, k0, K, num, den, seq, seek, overlap,
    win_start=0, block=32,
):
    """WSOLA restructured for the MXU: precompute ALL candidate scores, then
    chain splice choices with a trivial scan.

    The serial dependence in WSOLA is only through the previous frame's
    chosen tail — and every possible tail is itself a slice of the input:
    tail(k-1, a) = x[pos(k-1) + a + stride_out : +overlap]. So the full
    score matrix S_k[a, b] = <tail(k-1, a), cand(k, b)> * rsqrt(E_k[b]) is
    computable for EVERY frame in parallel as one batched GEMM over im2col
    patch matrices ([seek+1, C*overlap] x [C*overlap, seek+1] per frame) —
    the heavy work rides the MXU across frames, and the inherently
    sequential part shrinks to `row = S[k, b_prev]; b_k = argmax(row)` — a
    721-element slice+argmax per frame instead of two convolutions.
    Processing runs in blocks of ``block`` frames under an outer scan so
    patch/score materialization stays bounded (~150 MB at 48 kHz).

    Score values match the per-frame conv formulation to the ulp; argmax
    ties can therefore flip between formulations — acceptable under the
    WSOLA tolerance bar (the reference's SoundTouch output is not
    bit-stable across builds either; see module docstring).

    Generalized chain form (the streaming chunk step's TPU default uses it
    too, which keeps time-variant streaming pure-XLA: geometry-universal,
    and persistently cacheable across processes where Mosaic custom calls
    get per-process cache keys): frames k in [k0, k0+K) read ``x`` at
    ``frame_pos(k) - win_start``; frame k0's previous tail is the carried
    ``tail0``. Returns (bs [K] int32 chosen offsets, body
    [C, K*stride_out]).
    """
    C = x.shape[0]
    stride = stride_out = seq - overlap
    win_w = seek + seq          # covers cand [b, b+overlap) and tails
    n_cand = seek + 1
    nblocks = -(-K // block)
    Kp = nblocks * block

    fade_in = (jnp.arange(overlap, dtype=jnp.float32) + 0.5) / overlap
    fade_out = 1.0 - fade_in
    head = tail0

    # Per-block contiguous span + within-span window extraction: ONE
    # dynamic_slice from the big input, then small slices from the span —
    # measurably faster than gathering every window from the full clip.
    # Chunk windows can be narrower than the nominal span; cap at x.
    span_w = min((block + 1) * (num // den + 1) + win_w + 64, x.shape[1])

    def frame_windows(kf, count):
        """[count, C, win_w] input windows for frames kf..kf+count-1."""
        span_start = jnp.clip(
            frame_pos(kf, num, den) - win_start, 0, x.shape[1] - span_w
        )
        span = lax.dynamic_slice(x, (0, span_start), (C, span_w))

        def one(k):
            pos = jnp.clip(
                frame_pos(k, num, den) - win_start - span_start,
                0, span_w - win_w,
            )
            return lax.dynamic_slice(span, (0, pos), (C, win_w))

        return jax.vmap(one)(kf + jnp.arange(count, dtype=jnp.int32))

    def im2col(w, start):
        """[F, C, nq*s, overlap] patch rows of w at offsets start..start+seek
        (rows a = q*s + r to match the historical two-level layout, a few
        rows of overrun padding at the tail).

        ONE gather (advanced indexing with a static [A, overlap] index
        matrix) instead of the earlier ~400 slice/reshape/stack layout ops:
        identical element values feeding identical einsum shapes (so CPU
        splice decisions are unchanged bitwise), at less than half the
        XLA compile time (measured: the chunkops test file dropped from
        202 s to 91 s on CPU, compile-dominated). Runtime cost of the
        gather is memory-bound and far below the scoring GEMM it feeds."""
        s = 32
        nq = -(-n_cand // s)                  # row groups of stride s
        A = nq * s
        F = w.shape[0]
        # Row a covers w[start + a, start + a + overlap); pad so the
        # overrun rows past n_cand index in-bounds (their scores are
        # sliced off before the argmax).
        need = start + A + overlap
        z = jnp.pad(w, ((0, 0), (0, 0), (0, max(0, need - w.shape[2]))))
        a_idx = jnp.arange(A, dtype=jnp.int32)
        idx = start + a_idx[:, None] + jnp.arange(overlap, dtype=jnp.int32)
        return jnp.take(z, idx, axis=2)       # [F, C, A, overlap]

    def block_step(b_prev, blk):
        kf = k0 + blk * block
        # Windows for frames kf-1 .. kf+block-1 (kf-1 supplies the tails of
        # the first frame; its position clips to 0 for blk == 0, where the
        # tail0 override makes it unused).
        w_all = frame_windows(kf - 1, block + 1)
        w_prev, w_cur = w_all[:-1], w_all[1:]

        cand = im2col(w_cur, 0)                      # [B, C, A, ov]
        tails = im2col(w_prev, stride)               # [B, C, A, ov]
        # Frame 0's "previous tail" is the raw head regardless of b_prev.
        tails = jnp.where(
            (blk == 0)
            & (jnp.arange(block) == 0)[:, None, None, None],
            head[None, :, None, :],
            tails,
        )
        energy = jnp.sum(cand * cand, axis=(1, 3))   # [B, A]
        # Per-channel batched GEMMs summed — the construction-native layout
        # needs no transpose into interleaved [a, C*ov] rows. f32 operands;
        # matmul precision set by SCORE_PRECISION (module constant, default
        # HIGH ~ f32-accurate ranking at a fraction of HIGHEST's cost on
        # the MXU). On CPU every setting is exact f32, keeping splice
        # decisions consistent with the per-frame conv formulation the
        # scan/streaming paths use. Do NOT cast inputs to bf16 —
        # single-pass products flip near-tie argmaxes audibly often
        # (measured: 24% of samples at tempo 2.0 on CPU).
        scores = sum(
            jnp.einsum(
                "fav,fbv->fab", tails[:, c], cand[:, c],
                preferred_element_type=jnp.float32,
                precision=SCORE_PRECISION,
            )
            for c in range(C)
        )
        scores = scores[:, :n_cand, :n_cand] * lax.rsqrt(
            energy[:, None, :n_cand] + 1e-9
        )

        # Row-argmax BEFORE the chain: F[k][a] = best b given b_{k-1} = a.
        # The sequential part of WSOLA then shrinks to one integer gather
        # per frame (b_k = F[k][b_{k-1}]) — the argmaxes batch on the VPU.
        F = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # [B, n_cand]

        def pick(bp, f):
            b = f[bp]
            return b, b

        b_last, bs = lax.scan(pick, b_prev, F, unroll=16)  # bs: [B]

        # Assembly: seg_k from w_cur at b_k, previous tail from w_prev at
        # b_{k-1} (+stride); frame 0's tail is the head.
        bs_prev = jnp.concatenate([b_prev[None], bs[:-1]])

        def assemble(w_p, w_c, bp, b, i):
            seg = lax.dynamic_slice(w_c, (0, b), (C, seq))
            tail = lax.dynamic_slice(
                w_p, (0, bp + stride_out), (C, overlap)
            )
            tail = jnp.where((blk == 0) & (i == 0), head, tail)
            blended = tail * fade_out[None, :] + seg[:, :overlap] * fade_in[None, :]
            return jnp.concatenate(
                [blended, seg[:, overlap:]], axis=1
            )[:, :stride]

        chunks = jax.vmap(assemble)(
            w_prev, w_cur, bs_prev, bs,
            jnp.arange(block, dtype=jnp.int32),
        )  # [B, C, stride]
        return b_last, (chunks, bs)

    _, (all_chunks, all_bs) = lax.scan(
        block_step, jnp.int32(0), jnp.arange(nblocks, dtype=jnp.int32)
    )  # [nblocks, B, C, stride], [nblocks, B]
    body = jnp.transpose(all_chunks, (2, 0, 1, 3)).reshape(C, Kp * stride)
    return all_bs.reshape(Kp)[:K], body[:, : K * stride]


def _scale_length_exact(length, tempo: float):
    """floor(length * 65536 / round(tempo * 65536)) in overflow-safe int32
    arithmetic (traced). float32 division loses ulps above 2^24 samples
    (~6 min at 48 kHz), drifting the reported master length on long clips;
    this carry-decomposed integer form is exact for any out-length < 2^31."""
    return scale_length_by_num(length, int(round(tempo * 65536)))


def scale_length_by_num(length, num: int):
    """floor(length * 65536 / num) in overflow-safe traced int32 arithmetic
    (num = round(tempo * 65536); shared by the offline path above and the
    streaming WSOLA step, ops/chunkops.py)."""
    q1 = length // num
    r1 = length % num                     # < num <= ~196k
    s = (r1 * 256) // num                 # products stay < 2^26
    t = (r1 * 256) % num
    return q1 * 65536 + s * 256 + (t * 256) // num


def wsola_stream_plan(tempo: float, rate: int, chunk_frames: int):
    """Static plan for exact chunked/streaming WSOLA execution."""
    seq, seek, overlap = _params(rate)
    num = int(round((seq - overlap) * tempo * 65536))
    return {
        "seq": seq,
        "seek": seek,
        "overlap": overlap,
        "stride_out": seq - overlap,
        "num": num,
        "den": 65536,
        "chunk_frames": chunk_frames,
        # Input window needed by one chunk of frames starting at k0:
        # pos(k0) .. pos(k0 + chunk_frames - 1) + seek + seq.
        "window": (chunk_frames - 1) * num // 65536 + seek + seq + 2,
    }


def wsola_stream_step(plan, x_window, tail, k0):
    """One streaming WSOLA step: process ``chunk_frames`` output frames.

    ``x_window``: [C, plan['window']] input slice starting at absolute input
    position pos(k0) (zero-padded past EOF). ``tail``: carry from the
    previous step (for the first step: the clip's first ``overlap`` samples).
    Returns (new_tail, out_chunk [C, chunk_frames*stride_out]). Splice
    decisions equal the whole-clip path; samples agree to float rounding
    (tested)."""
    win_start = frame_pos(k0, plan["num"], plan["den"])
    return _wsola_scan(
        x_window,
        tail,
        k0,
        plan["chunk_frames"],
        plan["num"],
        plan["den"],
        plan["seq"],
        plan["seek"],
        plan["overlap"],
        win_start=win_start,
    )


def _rational_factor(factor: float, max_den: int = 600):
    """Approximate an arbitrary transposition factor as L/M with sub-cent
    error (SoundTouch's transposer interpolates continuously; a <=1e-5
    relative rational approximation is far below audibility and keeps the
    polyphase bank small)."""
    frac = fractions.Fraction(factor).limit_denominator(max_den)
    return frac.numerator, frac.denominator


def transpose_rate(data, length, factor: float):
    """Resample [C, N] by ``factor`` (>1 = fewer samples, higher pitch when
    relabeled at the same nominal rate)."""
    if factor == 1.0:
        return data, length
    num, den = _rational_factor(factor)
    # consume `num` input samples per `den` output samples: in_rate=num,
    # out_rate=den in resampler terms.
    out = resample_ops.resample_data(data, num, den)
    out_length = (length // num) * den + ((length % num) * den + num - 1) // num
    idx = jnp.arange(out.shape[1])[None, :]
    out = jnp.where(idx < out_length, out, 0.0)
    return out, out_length


def soundtouch_like(ctx, stream: Stream, rate: float, pitch: float,
                    algorithm: str = "wsola",
                    pv_transient: bool = False,
                    preserve_formants: bool = False) -> Stream:
    """Apply the SoundTouch (rate, pitch) pair to a stream.

    Effective decomposition (SoundTouch semantics):
        transposition factor = rate * pitch
        WSOLA tempo          = 1 / pitch   (virtualTempo == 1 in both nodes)
    Tempo runs first, then transposition (SoundTouch orders by rate for
    cache reasons; the stages commute in the linear-signal sense).

    ``algorithm`` selects the tempo-stage family: "wsola" (default,
    reference parity — audio-velocity.cpp drives SoundTouch's WSOLA) or
    "pv" (ops/pv.py phase vocoder — a different artifact profile,
    optionally with onset phase reset via ``pv_transient`` and
    formant-preserving transposition via ``preserve_formants`` — the PV
    stage pre-warps magnitudes by the liftered envelope so the downstream
    resample lands the formants back where they started; slower on
    chip despite its parallel structure, see that module's measured
    numbers).
    """
    eff_rate = rate * pitch
    eff_tempo = 1.0 / pitch

    data, length = stream.data, stream.length
    if abs(eff_tempo - 1.0) > 1e-9:
        if algorithm == "pv":
            from nodey_tpu.ops import pv as pv_ops

            data, length = pv_ops.pv_stretch_at_rate(
                data, length, eff_tempo, stream.rate,
                transient=pv_transient,
                formant_ratio=(eff_rate if preserve_formants else 1.0),
            )
        else:
            data, length = wsola_stretch_at_rate(
                data, length, eff_tempo, stream.rate
            )
    if abs(eff_rate - 1.0) > 1e-9:
        data, length = transpose_rate(data, length, eff_rate)
    return Stream(
        data=data,
        length=length,
        rate=stream.rate,
        channels=stream.channels,
        fmt=FMT_FLT,
        t0_us=stream.t0_us,
    )


# -- NumPy reference (host-side mirror for tests) ---------------------------


def wsola_stretch_reference(
    data: np.ndarray, tempo: float, rate: int = 48_000
) -> np.ndarray:
    """Direct NumPy mirror of the device WSOLA (same parameters/decisions)."""
    C, N = data.shape
    seq, seek, overlap = _params(rate)
    stride_out = seq - overlap
    K = _out_chunks(N, tempo, seq, overlap)
    num = int(round(stride_out * tempo * 65536))
    den = 65536
    pad = seek + seq + 2
    x = np.pad(data, ((0, 0), (0, pad + max(0, num // den * K + pad - N))))
    fade_in = (np.arange(overlap, dtype=np.float32) + 0.5) / overlap
    fade_out = 1.0 - fade_in

    out = [x[:, :overlap].copy()]
    tail = x[:, :overlap].copy()
    for k in range(K):
        pos = (k * num + den // 2) // den
        window = x[:, pos : pos + seek + seq]
        scores = np.empty(seek + 1, dtype=np.float32)
        for o in range(seek + 1):
            cand = window[:, o : o + overlap]
            corr = float((tail * cand).sum())
            energy = float((cand * cand).sum())
            scores[o] = corr / math.sqrt(energy + 1e-9)
        best = int(np.argmax(scores))
        seg = window[:, best : best + seq]
        head = tail * fade_out[None, :] + seg[:, :overlap] * fade_in[None, :]
        chunk = np.concatenate([head, seg[:, overlap:]], axis=1)[:, :stride_out]
        out.append(chunk)
        tail = seg[:, stride_out : stride_out + overlap].copy()
    return np.concatenate(out, axis=1)
