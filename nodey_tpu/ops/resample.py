"""Rational polyphase resampling as one MXU matmul per block.

Replaces every libswresample call site in the reference (mixer input
normalization, audio-amix.cpp:206-243; bimix sides, audio-bimix.cpp:196-243;
preview output, audio-io.cpp:532-615; the Audio_resampler utility,
include/utility/sw-resample.hpp:14-71).

Design (TPU-first, not a translation):

* For a rational rate change L/M (reduced), output sample j lies at input
  position t_j = j*M/L. Group outputs into blocks of L: within a group all L
  phase filters read from one shared input window of width W = M + T - 1
  (T = taps per output). Embedding each phase's taps at its integer offset
  into a [L, W] filter bank turns the whole resample into

      y[c, g*L + p] = sum_w  x[c, g*M + w] * H[p, w]

  — overlapping [G, W] patch rows (built from ceil(W/M) shifted M-aligned
  reshapes, no gathers) against the bank in ONE explicit GEMM on the MXU
  (see ``apply_filter_bank``). No scalar loops, no per-sample control flow.

* The filter bank is a Kaiser windowed sinc designed host-side in float64
  (NumPy) and baked into the program as a constant. Parameters default to
  libswresample's quality point (cutoff 0.97 of the narrower Nyquist,
  Kaiser beta 9, 32 input taps) and each phase is normalized to unit DC gain
  like swr's build_filter — golden tests in tests/test_resample.py hold the
  device path to >= 90 dB SNR against the real libswresample via the native
  oracle (nodey_tpu/host/native/swr_shim.cpp).

Channel rematrix constants match libswresample's defaults (measured through
the oracle): mono->stereo duplicates at -3 dB (1/sqrt(2)), stereo->mono sums
at -3 dB.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.stream import FMT_FLT, Stream

# Matmul precision for every bank GEMM. The TPU backend's DEFAULT matmul
# precision is single-pass bf16 — measured on-chip: the resampled master
# was bitwise-equal to an explicit precision="bfloat16" run and only
# 53.5 dB from f32 truth, silently voiding the >=90 dB oracle bar on
# device. HIGHEST (6-pass bf16 emulation) is bitwise-identical to the
# float32 setting on this backend and costs config 2 0.82 ms vs 0.57 ms
# per 30 s clip (ROUND4.md §10) — correctness is worth 1.4x here.
# NODEY_RESAMPLE_PRECISION=high opts into 3-pass bf16 (98.8 dB vs f32,
# still above the bar) for throughput-first deployments.
BANK_PRECISION = (
    lax.Precision.HIGH
    if os.environ.get("NODEY_RESAMPLE_PRECISION") == "high"
    else lax.Precision.HIGHEST
)

# libswresample default rematrix gain (measured: see SURVEY/M1 notes).
SQRT1_2 = 0.7071067811865476

# Filter quality point.
DEFAULT_TAPS = 32      # input-sample support per output (swr filter_size)
DEFAULT_BETA = 9.0     # Kaiser beta (swr kaiser_beta default)
DEFAULT_CUTOFF = 0.97  # fraction of the narrower Nyquist (swr cutoff)
MAX_PHASES = 8192      # rational-phase ceiling before refusing


@functools.lru_cache(maxsize=64)
def _design_filter_bank(
    L: int, M: int, taps: int, beta: float, cutoff: float
) -> np.ndarray:
    """Build the [L, W] embedded polyphase filter bank (float64 -> float32).

    Phase p reads input window positions w in [o_p, o_p + taps) where
    o_p = floor(p*M/L); tap i weights input sample at integer position
    k = o_p - taps/2 + 1 + i relative to the output's input-time t = p*M/L,
    so the sinc argument is t - k. Each phase normalized to sum 1 (unit DC
    gain, as swr does).

    When downsampling, the tap support stretches by M/L (libswresample scales
    its filter_size the same way) so the transition band stays proportional
    to the narrower Nyquist. Callers must pass taps through
    ``_effective_taps`` already."""
    W = M + taps - 1
    bank = np.zeros((L, W), dtype=np.float64)
    # Cutoff as cycles/input-sample: 0.5 * min(1, L/M) * cutoff.
    fc = 0.5 * min(1.0, L / M) * cutoff
    half = taps / 2.0
    for p in range(L):
        t = p * M / L
        o = math.floor(t)
        d = t - o
        i = np.arange(taps, dtype=np.float64)
        # Input integer positions k = o - taps/2 + 1 + i; argument t - k.
        arg = d + half - 1.0 - i
        h = 2.0 * fc * np.sinc(2.0 * fc * arg)
        # Kaiser window over the tap span (centered on the output position).
        x = arg / half
        x = np.clip(x, -1.0, 1.0)
        w = np.i0(beta * np.sqrt(1.0 - x * x)) / np.i0(beta)
        h = h * w
        h /= h.sum()
        bank[p, o : o + taps] = h
    return bank.astype(np.float32)


def _rational(in_rate: int, out_rate: int):
    g = math.gcd(in_rate, out_rate)
    return out_rate // g, in_rate // g  # L, M


def _effective_taps(L: int, M: int, taps: int) -> int:
    """Stretch tap support by M/L when downsampling (swr's filter_size
    scaling), kept even."""
    if M > L:
        taps = -(-taps * M // L)
        taps += taps & 1
    return taps


def out_capacity(capacity: int, in_rate: int, out_rate: int) -> int:
    L, M = _rational(in_rate, out_rate)
    return -(-capacity * L // M)


def _out_length(length, L: int, M: int):
    """ceil(length*L/M) in int32-safe arithmetic (traced)."""
    return (length // M) * L + ((length % M) * L + M - 1) // M


def resolve_compat(compat=None):
    """Resolve the resampler compatibility mode: an explicit argument wins;
    otherwise NODEY_RESAMPLE_COMPAT ('swr' = measured libswresample banks,
    see host/resample_ref.measure_swr_bank); default None = the analytic
    exact-rational design (the numerically cleaner side, PARITY.md)."""
    if compat is not None:
        return compat or None
    import os

    return os.environ.get("NODEY_RESAMPLE_COMPAT") or None


def bank_spec(in_rate: int, out_rate: int, compat=None,
              taps: int = DEFAULT_TAPS, beta: float = DEFAULT_BETA,
              cutoff: float = DEFAULT_CUTOFF):
    """(bank ndarray [L, W], left, W) for the rate pair under ``compat``:
    patch for output group g reads input [g*M - left, g*M - left + W)."""
    L, M = _rational(in_rate, out_rate)
    compat = resolve_compat(compat)
    if compat == "swr":
        from nodey_tpu.host.resample_ref import measure_swr_bank

        bank, left, W = measure_swr_bank(in_rate, out_rate)
        if left < 0:
            # Keep the group-window convention non-anticipating: re-add
            # leading zero columns instead of a negative left pad.
            bank = np.pad(bank, ((0, 0), (-left, 0)))
            W += -left
            left = 0
        if W < M + 1:
            bank = np.pad(bank, ((0, 0), (0, M + 1 - W)))
            W = M + 1
        return bank, left, W
    if compat is not None:
        raise ProcessorRuntimeError(
            "Unknown resampler compatibility mode",
            "Supported: 'swr' (measured libswresample-equivalent banks).",
            f"compat={compat!r}",
        )
    taps = _effective_taps(L, M, taps)
    W = M + taps - 1
    return _design_filter_bank(L, M, taps, beta, cutoff), taps // 2 - 1, W


def resample_data(data, in_rate: int, out_rate: int,
                  taps: int = DEFAULT_TAPS, beta: float = DEFAULT_BETA,
                  cutoff: float = DEFAULT_CUTOFF, compat=None):
    """Resample [C, N] float32 to ceil(N*L/M) output samples (traced)."""
    if in_rate == out_rate:
        return data
    L, M = _rational(in_rate, out_rate)
    if L > MAX_PHASES:
        raise ProcessorRuntimeError(
            "Unsupported resampling ratio",
            f"Rate pair {in_rate}->{out_rate} needs {L} phases "
            f"(max {MAX_PHASES}).",
            "resample_data",
        )
    C, N = data.shape
    n_out = -(-N * L // M)
    G = -(-n_out // L)  # groups of L outputs
    bank_np, left, W = bank_spec(
        in_rate, out_rate, compat, taps=taps, beta=beta, cutoff=cutoff
    )
    bank = jnp.asarray(bank_np)

    # Input index 0 of the patch window corresponds to original sample
    # -left; pad accordingly, and right-pad to cover the last group.
    k_shifts = -(-W // M)  # shifted M-aligned segments per patch
    segs_needed = G + k_shifts
    right = max(0, segs_needed * M - left - N)
    x = jnp.pad(data, ((0, 0), (left, right)))

    y = apply_filter_bank(x, G, M, W, bank)
    return y[:, :n_out]


def group_factor(L: int, M: int) -> int:
    """Cycle-group factor R for the lane-aligned GEMM formulation.

    With R cycles per patch row, the GEMM's output minor dim becomes R*L
    and its contraction dim (R-1)*M + W; R = 128/gcd(L, 128) makes R*L a
    lane multiple, so the result needs NO misaligned relayout (the
    dominant cost of the ungrouped form: [C, G, L] -> [C, G*L] with L=160
    costs ~2.5 ms per 300 s track on v5e). The grouped bank is mostly
    zeros, so MACs grow by Wg/W (~3.3x for 44.1->48 kHz) — a good trade:
    the MXU eats the extra FLOPs far faster than the VPU relayouts it
    replaces (measured 5.70 -> 2.74 ms per 300 s stereo track).

    R affects float summation grouping, so every execution path (offline,
    chunked streaming, sp-sharded) must use the same R at the same global
    cycle phase — chunk/shard planners align boundaries to M*R via
    _chunk_quantum. Returns 1 (ungrouped) when grouping can't win:
    small M (the patch path is cheap there), no alignment gain, a MAC
    blowup past the trade-off point, or a grouped bank too large to keep
    MXU-resident."""
    if M <= 8:
        return 1
    R = 128 // math.gcd(L, 128)
    if R == 1 or R > 8:
        return 1
    W = M + _effective_taps(L, M, DEFAULT_TAPS) - 1
    Wg = (R - 1) * M + W
    if Wg > 5 * W:  # MAC blowup beyond what relayout savings repay
        return 1
    if R * L > 2048 or R * L * Wg > 2_000_000:
        return 1
    return R


# Process-wide grouped-GEMM formulation, decided once (resolve_form).
# Within one process every execution path (offline, chunked streaming,
# sp-sharded) must share a single formulation so the float summation
# grouping is uniform — mixed forms agree only to last-ulp.
_FORM_STATE: dict = {"resolved": None, "override": None}


class form_override:
    """Scoped formulation pin for one trace (used by the STREAMING
    planner to keep chunk programs on the XLA patches branch: streamed
    exports are transport/LAME-bound at ~20-45x realtime, so the
    kernel's ~1.4 ms/track win buys nothing there, while its Mosaic
    compile + the kernel_ready probe cost every fresh process ~60-100 s
    of cold start — measured on the cold-process bench probe. Offline
    programs keep the probed kernel default. The offline-vs-streamed
    formulation split parallels the PV one documented in PARITY.md;
    cross-path agreement stays within the kernel-vs-patches 7e-7
    envelope and is bit-exact on CPU where both sides run patches)."""

    def __init__(self, form: str):
        self.form = form

    def __enter__(self):
        self.prev = _FORM_STATE["override"]
        _FORM_STATE["override"] = self.form
        return self

    def __exit__(self, *exc):
        _FORM_STATE["override"] = self.prev
        return False


def resolve_form(probe_deadline_s: float | None = None) -> str:
    """Decide (once per process) which grouped-GEMM formulation to use.

    MUST be called OUTSIDE any jax trace — the Runner / stream planner
    call it right before tracing. On the TPU backend the default is the
    grouped Pallas 'kernel' (measured 1.65x faster at steady state:
    2.2 ms vs 3.6 ms per 300 s stereo track, max|diff| 7e-7 vs patches,
    bitwise in interpret mode), GUARDED by a deadline-bounded probe
    compile (``pallas_resample.kernel_ready``): Mosaic compiles through
    this rig's relay are erratic (observed 1.6 s to >20 min for the same
    kernel in one session), so a probe that misses its deadline falls the
    process back to the XLA 'patches' branch instead of risking an
    unbounded compile on the production path. Elsewhere (CPU tests,
    goldens) the default stays 'patches'.

    ``NODEY_RESAMPLE_FORM`` pins a formulation explicitly:
    'patches' — superblock patch-stack XLA branch (the CPU golden path);
    'kernel' — grouped Pallas kernel, no probe gate;
    'transposed' — no-patch-stack transposed GEMM (measured slower on
    v5e, faster on CPU; kept for experiments);
    'auto' / unset — the probed default above."""
    force = os.environ.get("NODEY_RESAMPLE_FORM")
    if force in ("transposed", "patches", "kernel"):
        # Env force is re-read at every dispatch; deliberately NOT pinned
        # into _FORM_STATE so a transient override (tests, A/B tools)
        # doesn't outlive its environment.
        return force
    if _FORM_STATE["resolved"]:
        return _FORM_STATE["resolved"]
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        from nodey_tpu.ops import pallas_resample

        ok = pallas_resample.kernel_ready(probe_deadline_s)
        _FORM_STATE["resolved"] = "kernel" if ok else "patches"
    else:
        _FORM_STATE["resolved"] = "patches"
    return _FORM_STATE["resolved"]


def form_in_use() -> str | None:
    """The resolved formulation, or None if nothing has resolved yet
    (diagnostics/bench reporting)."""
    force = os.environ.get("NODEY_RESAMPLE_FORM")
    if force in ("transposed", "patches", "kernel"):
        return force
    return _FORM_STATE["resolved"]


def _bank_form() -> str:
    """Formulation for THIS trace (see resolve_form for the dispatch).

    When called before any entry point resolved the form — a direct
    library call being traced right now — probing is off the table (a
    probe compile must not run inside a live trace), so the process pins
    the safe 'patches' branch; Runner/stream-planner paths resolve
    eagerly before tracing and get the probed TPU default."""
    force = os.environ.get("NODEY_RESAMPLE_FORM")
    if force in ("transposed", "patches", "kernel"):
        return force
    if _FORM_STATE["override"]:
        return _FORM_STATE["override"]
    if _FORM_STATE["resolved"]:
        return _FORM_STATE["resolved"]
    try:
        from jax._src import core as _jcore  # no public alias in jax 0.9

        clean = _jcore.trace_state_clean()
    except Exception:
        clean = False
    if clean:
        return resolve_form()
    _FORM_STATE["resolved"] = "patches"
    return "patches"


def apply_filter_bank(x, G: int, M: int, W: int, bank):
    """Apply the [L, W] polyphase bank to ``x`` where patch g reads
    ``x[:, g*M : g*M + W]``; returns [C, G*L].

    Overlapping [G, W] patch rows are built from ceil(W/M) shifted M-aligned
    reshapes (no gather, no strided conv — TPU-friendly layout ops), then
    ONE explicit GEMM hits the MXU. A strided conv_general_dilated lowers
    poorly here (~2 TFLOP/s measured); the explicit GEMM formulation reaches
    full MXU throughput. Shared by the single-device and sp-sharded paths so
    outputs agree exactly — callers must start local cycle 0 at a global
    cycle that is a multiple of group_factor(L, M) (see _chunk_quantum),
    since the grouped GEMM's summation grouping is phase-dependent."""
    C = x.shape[0]
    L = bank.shape[0]
    R = group_factor(L, M)
    if R == 1 and -(-W // M) > 4:
        # Many small shifts (tiny M, e.g. integer upsampling): the patch
        # matrix is cheap relative to per-shift GEMM overheads — keep it.
        k_shifts = -(-W // M)
        segs_needed = G + k_shifts
        need = segs_needed * M
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        segs = x[:, :need].reshape(C, segs_needed, M)
        patches = jnp.concatenate(
            [segs[:, i : i + G, :] for i in range(k_shifts)], axis=-1
        )[:, :, :W]             # [C, G, W]
        y = jnp.einsum(
            "cgw,lw->cgl", patches, bank,
            preferred_element_type=jnp.float32, precision=BANK_PRECISION,
        )                       # [C, G, L]
        return y.reshape(C, G * L)
    if R > 1 and _bank_form() == "kernel":
        from jax.custom_batching import custom_vmap

        from nodey_tpu.ops import pallas_resample

        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False

        @custom_vmap
        def _kernel_call(xx, bk):
            return pallas_resample.apply_filter_bank_grouped_pallas(
                xx, G, M, W, bk, interpret=not on_tpu
            )

        @_kernel_call.def_vmap
        def _kernel_call_batched(axis_size, in_batched, xb, bk):
            # Batched serving (vmap over independent clips): the
            # manual-DMA kernel does not lower under vmap (an
            # ANY-memory-space operand can't grow a batch block dim),
            # and a collapsed B*C channel count would blow the VMEM
            # scratch budget — so the batched program takes the XLA
            # superblock branch instead. Same grouped math: bitwise in
            # interpret mode, 7e-7 on chip (tests pin the first, bench
            # A/B the second), so per-clip outputs stay within the
            # documented kernel-vs-patches envelope. ``bank`` rides as a
            # real operand (a closure leaks the ORIGINAL trace's tracer
            # into the vmap rule when the caller's trace is itself being
            # transformed — seen as "No constant handler for
            # DynamicJaxprTracer" from compile_graph_dp's unjitted
            # trace-then-vmap).
            if not in_batched[0] or in_batched[1]:
                # A batched bank (alone or with a batched input) means
                # genuinely different filters per element — no
                # production call site does this (the bank is a
                # trace-time constant), but handle it correctly rather
                # than crash on the 2-D unpack / silently use bank[0].
                if not in_batched[0]:
                    xb = jnp.broadcast_to(xb, (axis_size,) + xb.shape)
                if not in_batched[1]:
                    bk = jnp.broadcast_to(bk, (axis_size,) + bk.shape)
                y = jax.lax.map(
                    lambda ab: _apply_grouped_superblock(
                        ab[0], G, M, W, ab[1]
                    ),
                    (xb, bk),
                )
                return y, True
            B, C, N_ = xb.shape
            y = _apply_grouped_superblock(
                xb.reshape(B * C, N_), G, M, W, bk
            )
            return y.reshape(B, C, -1), True

        return _kernel_call(x, bank)
    if R > 1 and _bank_form() == "transposed":
        # TRANSPOSED grouped GEMM (TPU default): y[c, g, :] =
        # segs[c, g] @ H0 + segs[c, g+1, :ov] @ H1 with H = bank_g^T
        # split at row Mg — consecutive group-row windows overlap by
        # only ov = Wp - Mg < Mg, so one extra narrow GEMM replaces the
        # whole [C, nblk, B, Wp] patch stack of the superblock branch
        # below (measured 1.09 ms of its 3.56 ms per 300 s stereo track
        # on v5e; this form also reads the input once per pass instead
        # of materializing ~2x input).  Same nonzero arithmetic terms
        # per output row; the 640-wide reduction is split 588+52 with an
        # explicit add, so cross-FORMULATION agreement is ulp-level
        # (156 dB measured) — which is why the dispatch is per-backend,
        # never mixed within one: all paths (offline, chunked, sharded)
        # share this function and therefore the same formulation.
        Mg = M * R
        Wg = (R - 1) * M + W
        Wp = -(-Wg // 128) * 128
        ov = Wp - Mg
        Gg = -(-G // R)
        bank_g = jnp.zeros((R * L, Wp), bank.dtype)
        for j in range(R):
            bank_g = bank_g.at[
                j * L : (j + 1) * L, j * M : j * M + W
            ].set(bank)
        H0 = bank_g[:, :Mg].T                        # [Mg, R*L] constant
        H1 = bank_g[:, Mg:].T                        # [ov, R*L] constant
        need = (Gg + 1) * Mg
        if x.shape[1] < need:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        segs = x[:, :need].reshape(C, Gg + 1, Mg)
        y = jnp.einsum(
            "cgm,mo->cgo", segs[:, :Gg], H0,
            preferred_element_type=jnp.float32, precision=BANK_PRECISION,
        ) + jnp.einsum(
            "cgm,mo->cgo", segs[:, 1:, :ov], H1,
            preferred_element_type=jnp.float32, precision=BANK_PRECISION,
        )
        return y.reshape(C, Gg * R * L)[:, : G * L]
    if R > 1:
        return _apply_grouped_superblock(x, G, M, W, bank)
    # Ungrouped decomposed per-shift GEMM: patch[g][i*M + m] = segs[g+i][m],
    # one GEMM per M-aligned shift reading the contiguous segs view — the
    # [C, G, W] patch matrix is never materialized.
    k_shifts = -(-W // M)
    segs_needed = G + k_shifts
    need = segs_needed * M
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    segs = x[:, :need].reshape(C, segs_needed, M)
    y = None
    for i in range(k_shifts):
        w0 = i * M
        w1 = min(W, w0 + M)
        part = jnp.einsum(
            "cgm,lm->cgl",
            segs[:, i : i + G, : w1 - w0],
            bank[:, w0:w1],
            preferred_element_type=jnp.float32, precision=BANK_PRECISION,
        )
        y = part if y is None else y + part
    return y.reshape(C, G * L)


def _apply_grouped_superblock(x, G: int, M: int, W: int, bank):
    """The R > 1 grouped-GEMM XLA branch ('patches' form), shared by the
    direct dispatch and the Pallas kernel's batched-vmap fallback."""
    C = x.shape[0]
    L = bank.shape[0]
    R = group_factor(L, M)
    # SUPERBLOCK grouped GEMM. Two alignment problems die at once:
    #   * output rows are [R*L], a lane multiple (e.g. 640 for
    #     44.1->48 kHz), so the final flatten is a FREE reshape
    #     instead of a ~2.5 ms misaligned relayout per 300 s track;
    #   * the INPUT is viewed in superblocks of B = 128/gcd(Mg,128)
    #     group rows (SUP = Mg*B, a lane multiple — 18816 for
    #     44.1->48 kHz), an ALIGNED free reshape; each group row's
    #     window is then one of B UNIFORM-shift static slices, which
    #     lower far cheaper than the row-rotating relayout of a
    #     [*, Mg] reshape (measured 2.75 -> 1.53 ms per 300 s).
    # Every output contracts over the SAME Wp-wide window against
    # bank_g (columns outside its [j*M, j*M+W) support are zero), so
    # the arithmetic terms are identical for every group row and the
    # slice index j never affects values — cross-path agreement needs
    # only the existing M*R phase alignment, not SUP alignment.
    # (XLA's K-reduction tiling can still differ between PROGRAMS of
    # different shapes, so offline-vs-chunked agreement is last-ulp —
    # see test_chunkops — while within a program it is exact; the
    # end-to-end byte-equal MP3 tests and on-TPU bitwise checks pass.)
    Mg = M * R
    Wg = (R - 1) * M + W
    Wp = -(-Wg // 128) * 128        # padded contraction width
    B = 128 // math.gcd(Mg, 128)    # group rows per superblock
    SUP = Mg * B
    Gg = -(-G // R)
    nblk = max(1, -(-Gg // B))
    halo = -(-max(0, Wp - Mg) // 128) * 128
    need = (nblk + 1) * SUP         # +1 zero block feeds the halo
    if x.shape[1] < need:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
    segs = x[:, :need].reshape(C, nblk + 1, SUP)
    big = segs[:, :nblk, :]
    if halo:
        big = jnp.concatenate(
            [big, segs[:, 1 : nblk + 1, :halo]], axis=2
        )                           # [C, nblk, SUP + halo]
    bank_g = jnp.zeros((R * L, Wp), bank.dtype)
    for j in range(R):
        bank_g = bank_g.at[
            j * L : (j + 1) * L, j * M : j * M + W
        ].set(bank)
    # ONE batched GEMM over all B uniform-shift slices. A per-slice
    # einsum loop lowers to B separate convolutions that each re-read
    # the [R*L, Wp] grouped bank from HBM (x the f32 multi-pass
    # decomposition): for 44.1->48 kHz that is ~420 MB of traffic for
    # an 11.5 MB clip — measured HBM-bound at exactly XLA's modeled
    # optimum. Stacking the slices first materializes the patch
    # tensor once (~2x input size) and contracts it against ONE bank
    # read per pass: ~6x less traffic, same arithmetic terms per
    # output row (the slice index never affects values — see above).
    patches = jnp.stack(
        [
            jax.lax.slice_in_dim(big, j * Mg, j * Mg + Wp, axis=2)
            for j in range(B)
        ],
        axis=2,
    )                               # [C, nblk, B, Wp]
    y = jnp.einsum(
        "cbjm,lm->cbjl", patches, bank_g,
        preferred_element_type=jnp.float32, precision=BANK_PRECISION,
    )                               # [C, nblk, B, R*L]
    return y.reshape(C, nblk * B * R * L)[:, : G * L]


def resample_data_reference(data: np.ndarray, in_rate: int, out_rate: int,
                            taps: int = DEFAULT_TAPS,
                            beta: float = DEFAULT_BETA,
                            cutoff: float = DEFAULT_CUTOFF) -> np.ndarray:
    """NumPy reference of the device path (direct per-output dot products)."""
    if in_rate == out_rate:
        return data
    L, M = _rational(in_rate, out_rate)
    taps = _effective_taps(L, M, taps)
    bank = _design_filter_bank(L, M, taps, beta, cutoff)
    C, N = data.shape
    n_out = -(-N * L // M)
    left = taps // 2 - 1
    G = -(-n_out // L)
    W = M + taps - 1
    need = (G - 1) * M + W
    x = np.pad(data, ((0, 0), (left, max(0, need - left - N))))
    y = np.zeros((C, G * L), dtype=np.float64)
    for g in range(G):
        window = x[:, g * M : g * M + W]
        y[:, g * L : (g + 1) * L] = window @ bank.T
    return y[:, :n_out].astype(np.float32)


def resample_stream(stream: Stream, out_rate: int) -> Stream:
    """Resample a Stream, tracking valid length and format tag."""
    if stream.rate == out_rate:
        return stream
    L, M = _rational(stream.rate, out_rate)
    data = resample_data(stream.data, stream.rate, out_rate)
    # Zero the tail beyond the valid output length (padding hygiene).
    n_out_len = _out_length(stream.length, L, M)
    idx = jnp.arange(data.shape[-1])[None, :]
    data = jnp.where(idx < n_out_len, data, 0.0)
    return Stream(
        data=data,
        length=n_out_len,
        rate=out_rate,
        channels=stream.channels,
        fmt=FMT_FLT,
        t0_us=stream.t0_us,
    )


def to_stereo(stream: Stream) -> Stream:
    """Channel-normalize to stereo with swr's default -3 dB mono upmix."""
    if stream.channels == 2:
        return stream
    data = jnp.concatenate([stream.data, stream.data], axis=0) * SQRT1_2
    return stream.with_data(data, fmt=FMT_FLT)


def to_mono(stream: Stream) -> Stream:
    """Channel-normalize to mono with swr's default -3 dB downmix."""
    if stream.channels == 1:
        return stream
    data = (stream.data[0:1] + stream.data[1:2]) * SQRT1_2
    return stream.with_data(data, fmt=FMT_FLT)


def to_rate_and_stereo(stream: Stream, out_rate: int) -> Stream:
    """The preview/mixer input normalization: 48 kHz stereo float
    (reference: audio-io.cpp:532-615, audio-amix.cpp:206-243)."""
    return resample_stream(to_stereo(stream), out_rate)


def to_rate_and_stereo_many(
    streams: Sequence[Stream], out_rate: int
) -> List[Stream]:
    """Batched mixer-input normalization: inputs sharing (rate, buffer
    width) resample in ONE call, their channels stacked into the batch
    dimension. Every formulation treats the channel axis as an
    independent batch (per-row dots / 'c' einsum batch), so per-stream
    outputs are BITWISE the one-at-a-time path's (test-pinned for
    patches, transposed and kernel-interpret). Per-stream valid-length
    masking and t0 are applied after the split, exactly as
    resample_stream does.

    NOT used by the mixer (mix._common_grid): measured SLOWER on chip
    under the kernel form — one C=4 launch ran the flagship headline at
    9.4 ms vs 8.7 ms for two C=2 launches (2026-08-21; the larger
    per-step VMEM window footprint outweighs the halved grid overhead).
    Kept as tested infrastructure for formulations where batching wins
    (it does on CPU patches)."""
    stereo = [to_stereo(s) for s in streams]
    out: List[Optional[Stream]] = [None] * len(stereo)
    groups: Dict[Tuple[int, int], List[int]] = {}
    for i, s in enumerate(stereo):
        if s.rate == out_rate:
            out[i] = s
        else:
            groups.setdefault((s.rate, s.data.shape[1]), []).append(i)
    for (rate, _n), idxs in groups.items():
        if len(idxs) == 1:
            i = idxs[0]
            out[i] = resample_stream(stereo[i], out_rate)
            continue
        L, M = _rational(rate, out_rate)
        stacked = jnp.concatenate([stereo[i].data for i in idxs], axis=0)
        y = resample_data(stacked, rate, out_rate)
        for j, i in enumerate(idxs):
            s = stereo[i]
            data = y[2 * j : 2 * j + 2]
            n_out_len = _out_length(s.length, L, M)
            idx = jnp.arange(data.shape[-1])[None, :]
            out[i] = Stream(
                data=jnp.where(idx < n_out_len, data, 0.0),
                length=n_out_len,
                rate=out_rate,
                channels=2,
                fmt=FMT_FLT,
                t0_us=s.t0_us,
            )
    return out  # type: ignore[return-value]
