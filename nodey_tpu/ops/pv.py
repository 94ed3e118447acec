"""Phase-vocoder time stretch — the parallel alternative to WSOLA.

Why this exists: the node-graph's tempo stage has two algorithm families
(the north star names both: "SoundTouch pitch/tempo (WSOLA/phase-vocoder)").
The reference ships only SoundTouch's WSOLA
(/root/reference/src/processor/audio-velocity.cpp:384-457), whose defining
data dependence — frame k's splice candidates are scored against the tail
CHOSEN at frame k-1 — makes it an inherently serial chain. On TPU that chain
is the measured ceiling of every velocity/pitch graph (~2.8 us/frame on the
VPU, ROUND4.md §8): the MXU sits idle because no formulation can batch
across frames without changing the splice decisions.

The phase vocoder has no such dependence. Every per-frame quantity —
analysis DFT, instantaneous frequency, synthesis DFT — is independent, and
the single cross-frame coupling (synthesis phase accumulation) is a prefix
sum, which XLA computes in O(log K) depth. The whole stretch is therefore
three batched [K, n_fft] x [n_fft, bins] GEMMs riding the MXU plus
elementwise VPU work, instead of K dependent correlation searches.

Pipeline (classical Flanagan/Golden analysis-synthesis with simplified
Laroche-Dolson identity phase locking):

1. analysis frames at hop_a ~= hop * tempo (integer positions, one static
   gather), periodic-Hann windowed, real DFT via MXU matmul
   (ops/stft._dft_matrices — same basis, same reasoning: explicit GEMM
   beats the generic FFT lowering at audio frame sizes);
2. per-bin instantaneous frequency from wrapped phase deltas over the
   ACTUAL integer hop of each frame (positions are rounded, so hops vary
   by +-1 sample; using the true hop keeps tones locked);
3. synthesis phase = cumsum of hop * omega_inst (parallel prefix sum),
   then identity phase locking: non-peak bins are re-phased rigidly with
   their dominant spectral peak, which removes most of the classic PV
   "phasiness" while staying embarrassingly parallel (the simplified
   post-pass variant of Laroche & Dolson 1999 — locking is applied after
   bin-wise propagation rather than threaded through it);
4. inverse real DFT (two more MXU GEMMs), synthesis window, overlap-add at
   hop = n_fft/4 (75% overlap), divide by the exact window-squared
   coverage.

Quality/precision: PV output has no sample-level oracle (neither SoundTouch
nor the reference computes it), so unlike the WSOLA path there is no bitwise
decision contract to protect — the GEMMs default to 3-pass bf16
(``Precision.HIGH``, 98.8 dB vs f32 on this backend, ROUND4.md §10) for
throughput; ``NODEY_PV_PRECISION=highest`` opts into the bitwise-f32 6-pass
variant.

Measured outcome (v5e, ROUND4.md §11): the MXU-friendly structure does NOT
out-run the serial chain — WSOLA needs ~20x fewer FLOPs and the VPU runs
it at ~790 GFLOP/s, so it stays ~7x faster single-clip (2.3 vs 17.2 ms for
30 s stereo) and ~12x faster batched (B=8 vmap). Pick "pv" for the
phase-vocoder artifact profile (rigid per-peak phase, no splice seams —
the usual choice for polyphonic material at large ratios); it is still
>=1700x real-time as a stage and >=450x inside the full config-4 graph.

This module is OPT-IN per node (``algorithm: "pv"`` on velocity/pitch
processors); the default stays the reference-parity WSOLA.
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from nodey_tpu.ops.stft import _dft_matrices

# Spectral-flux threshold for transient phase reset (opt-in,
# ``transient=True`` / the velocity node's ``pv_transient`` param).
# Flux is the relu'd magnitude increase of a frame over its predecessor,
# normalized by the predecessor's total magnitude: ~0 for steady or
# decaying material (negative deltas clip to zero), O(0.1) for vibrato
# and slow modulation, >> 1 at an attack out of quiet. 1.0 ("the new
# energy exceeds everything that was there before") only fires on real
# onsets — a pure tone never resets (pinned by test), so reconstruction
# paths stay bitwise-identical with the flag on.
PV_TRANSIENT_FLUX = 1.0


def _cmul_seg(a, b):
    """Segmented phasor combine: (cos, sin, reset), ``b`` later in time.

    A reset element's phasor is an ABSOLUTE target (e^{i*ph}), not a
    relative advance, so everything before it is discarded; otherwise the
    phasors multiply. Associative (the standard "product since last
    segment boundary" monoid), so it rides lax.associative_scan, the
    chunked carry combine, and the cross-shard ppermute doubling
    unchanged."""
    ac, as_, ar = a
    bc, bs, br = b
    mc = ac * bc - as_ * bs
    ms = ac * bs + as_ * bc
    return (
        jnp.where(br, bc, mc),
        jnp.where(br, bs, ms),
        ar | br,
    )


def transient_resets(mag_prev, mag, threshold: float = PV_TRANSIENT_FLUX):
    """Per-frame transient detection by normalized positive spectral flux.

    ``mag_prev``/``mag`` are [..., bins] magnitude planes of consecutive
    frames (broadcast over leading axes); returns a boolean [...] mask.
    Shared by the offline, streaming, and sp-sharded paths so reset
    DECISIONS are identical everywhere (the three paths see the same
    magnitudes up to their documented last-ulp caveats)."""
    rise = jnp.maximum(mag - mag_prev, 0.0).sum(axis=-1)
    base = mag_prev.sum(axis=-1)
    return rise > threshold * (base + np.float32(1e-6))


# Cepstral lifter length for formant-envelope estimation (bins of
# quefrency kept). n_fft//32 = 64 at 48 kHz keeps envelope detail up to
# ~1.3 ms quefrency — smooth enough to ride over harmonics of any f0
# above ~750 Hz while tracking vocal-tract-scale resonances; the
# standard speech/music operating point for lifter-based envelopes.
PV_FORMANT_LIFTER_DIV = 32


@functools.lru_cache(maxsize=8)
def _cepstral_matrices(n_fft: int):
    """[Q, B] analysis and [B, Q] synthesis cosine matrices for the
    low-quefrency (liftered) reconstruction of a log-magnitude spectrum.

    For a real, even spectrum known on the B = n_fft/2+1 rfft bins, the
    real cepstrum is a weighted cosine transform (interior bins count
    twice for their mirror images); keeping quefrencies |q| < Q and
    transforming back yields the smooth spectral envelope. Both directions
    are small dense GEMMs — [C*K, B] x [B, Q] x [Q, B] — so envelope
    estimation rides the MXU like every other PV pass (float64 design,
    float32 storage)."""
    B = n_fft // 2 + 1
    Q = max(8, n_fft // PV_FORMANT_LIFTER_DIV)
    b = np.arange(B, dtype=np.float64)
    q = np.arange(Q, dtype=np.float64)
    cos_qb = np.cos(2.0 * np.pi * np.outer(q, b) / n_fft)   # [Q, B]
    w = np.full(B, 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    w[-1] = 1.0 / n_fft
    analysis = cos_qb * w[None, :]                          # [Q, B]
    dup = np.full(Q, 2.0)
    dup[0] = 1.0
    synthesis = cos_qb.T * dup[None, :]                     # [B, Q]
    return (analysis.astype(np.float32), synthesis.astype(np.float32))


def _formant_correction(mag, n_fft: int, ratio: float):
    """Pre-warp magnitudes so a DOWNSTREAM resample by ``ratio`` keeps the
    original spectral envelope (formants).

    The SoundTouch decomposition realizes a pitch shift as PV tempo
    stretch followed by playback-rate resampling; the resample maps the
    spectrum S(w) -> S(w/ratio), dragging the envelope (the chipmunk
    effect). Multiplying each frame's magnitudes by
    exp(E_log(w*ratio) - E_log(w)) — E_log the liftered log envelope —
    makes the post-resample envelope land back on E_log. Per-frame,
    batched, stateless: identical math offline / streamed / sharded.
    Frequencies past Nyquist/ratio clamp to the top bin (flat
    extension)."""
    B = mag.shape[-1]
    ana, syn = _cepstral_matrices(n_fft)
    log_mag = jnp.log(mag + np.float32(1e-8))
    ce = jnp.einsum(
        "...b,qb->...q", log_mag, jnp.asarray(ana),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    env = jnp.einsum(
        "...q,bq->...b", ce, jnp.asarray(syn),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    pos = np.minimum(np.arange(B, dtype=np.float64) * float(ratio), B - 1)
    lo = pos.astype(np.int32)
    hi = np.minimum(lo + 1, B - 1)
    frac = jnp.asarray((pos - lo).astype(np.float32))
    env_w = (
        env[..., jnp.asarray(lo)] * (1.0 - frac)
        + env[..., jnp.asarray(hi)] * frac
    )
    return mag * jnp.exp(env_w - env)


PV_PRECISION = (
    lax.Precision.HIGHEST
    if os.environ.get("NODEY_PV_PRECISION") == "highest"
    else lax.Precision.HIGH
)

_TWO_PI = 2.0 * math.pi


def pv_params(rate: int):
    """(n_fft, hop): smallest power of two covering ~40 ms (the same
    psychoacoustic window SoundTouch's SEQUENCE_MS targets), 75% overlap."""
    n_fft = 512
    while n_fft < rate * 0.04:
        n_fft *= 2
    return n_fft, n_fft // 4


@functools.lru_cache(maxsize=8)
def _pv_window(n_fft: int) -> np.ndarray:
    """Periodic Hann: sum_k w^2(n - k*hop) == 1.5 exactly at hop n_fft/4."""
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(_TWO_PI * n / n_fft)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_matrices(n_fft: int):
    """Inverse real-DFT bases [bins, n_fft]: x_n = Re X @ icos + Im X @ isin
    (conjugate-symmetric expansion folded into the c_b = {1,2,...,2,1}/N
    column weights; taking only the real part of the complex inverse)."""
    bins = n_fft // 2 + 1
    k = np.arange(bins)[:, None] * np.arange(n_fft)[None, :]
    ang = _TWO_PI * k / n_fft
    c = np.full((bins, 1), 2.0 / n_fft)
    c[0, 0] = 1.0 / n_fft
    c[-1, 0] = 1.0 / n_fft
    return (
        (c * np.cos(ang)).astype(np.float32),
        (-c * np.sin(ang)).astype(np.float32),
    )


def _pv_geometry(N: int, tempo: float, rate: int):
    """Static frame geometry for a clip of capacity ``N``.

    Returns (n_fft, hop, pos [K] int analysis positions, dpos [K] actual
    integer hops, pad_to). All numpy/python — resolved at trace time so the
    gather below is static (XLA requirement; SURVEY.md §7).

    Positions use the SAME 16.16 fixed-point law as the streaming step
    (stretch.frame_pos): pos_k = (k*num + 32768) >> 16 with
    num = round(hop*tempo*65536) — offline and chunked renders see
    byte-identical analysis geometry."""
    n_fft, hop = pv_params(rate)
    out_cap = int(math.ceil(N / tempo)) + hop
    K = max(2, -(-out_cap // hop) + 1)
    num = pv_hop_num(hop, tempo)
    pos = (np.arange(K, dtype=np.int64) * num + 32768) >> 16
    dpos = np.diff(pos, prepend=pos[:1])
    dpos[0] = hop
    # Rounded positions step by >=1 for any tempo >= 1/hop; guard anyway so
    # omega_inst's division is always defined.
    dpos = np.maximum(dpos, 1)
    pad_to = int(pos[-1]) + n_fft + 2
    return n_fft, hop, pos, dpos, pad_to


def pv_hop_num(hop: int, tempo: float) -> int:
    """16.16 fixed-point analysis-hop numerator shared by the offline
    geometry and the streaming plan."""
    return int(round(hop * tempo * 65536))


def _hs_last_valid(seed):
    """Inclusive "last valid" prefix scan along the final (bin) axis via
    Hillis-Steele doubling SHIFTS, not ``lax.associative_scan``.

    ``seed`` is an (idx, *values) tuple; idx < 0 marks an invalid slot.
    Result[i] = seed values at the largest j <= i with idx[j] >= 0 (or
    the untouched invalid slot if none). Because the combine only ever
    SELECTS seed values, any correct scan order is bitwise identical to
    any other — tests assert exact equality vs ``associative_scan``.

    Why not associative_scan: on TPU, one lane-axis associative_scan is
    ~5 ms at [2, 2252, 1025] — but COMPOSED in the same program with the
    K-axis phasor scan of _pv_impl it inflates to ~46 ms (each fast
    alone; a barrier between them does not help). associative_scan
    lowers to odd/even recursion whose stride-2 lane slices relayout
    badly when two such scans on different axes coexist; this
    formulation uses only contiguous slices + selects and keeps the
    composed program at ~10 ms (measured on v5e, jax 0.9)."""
    arrs = list(seed)
    n = arrs[0].shape[-1]
    s = 1
    while s < n:
        valid = arrs[0] >= 0
        updated = []
        for i, a in enumerate(arrs):
            pad = jnp.full_like(
                a[..., :s], -1 if i == 0 else 0
            )
            sh = jnp.concatenate([pad, a[..., : n - s]], axis=-1)
            updated.append(jnp.where(valid, a, sh))
        arrs = updated
        s *= 2
    return tuple(arrs)


def _lock_to_peaks(cos_phi, sin_phi, ph_in, mag):
    """Simplified identity phase locking (Laroche & Dolson 1999).

    ``cos_phi``/``sin_phi`` [C, K, B] are the propagated synthesis phases
    in PHASOR form (see _pv_impl — angles are never materialized on the
    accumulation path); non-peak bins are re-phased rigidly with their
    nearest dominant peak: phi[b] <- phi[peak] + (ph_in[b] - ph_in[peak]),
    i.e. phasor[b] <- phasor[peak] * e^{i(ph_in[b]-ph_in[peak])}. Fully
    vectorized: peaks are local maxima over +-2 bins; each bin adopts the
    nearer of its previous/next peak.

    Peak VALUES ride the same last-valid scans that find peak positions
    (a combine over (idx, cp, sp, ph) tuples — see _hs_last_valid)
    instead of a take_along_axis by peak index: the general gather was
    measured at ~20 s of XLA CPU compile at [2, 752, 1025] vs 2.5 s for
    the value scans, with bitwise-identical output."""
    C, K, B = mag.shape
    neg = jnp.full_like(mag[..., :1], -1.0)

    def shift(x, s):
        if s > 0:
            return jnp.concatenate([neg.repeat(s, -1), x[..., :-s]], -1)
        return jnp.concatenate([x[..., -s:], neg.repeat(-s, -1)], -1)

    is_peak = (
        (mag > shift(mag, 1))
        & (mag >= shift(mag, -1))
        & (mag > shift(mag, 2))
        & (mag >= shift(mag, -2))
    )
    b_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32), mag.shape)

    seed = (
        jnp.where(is_peak, b_idx, -1),
        jnp.where(is_peak, cos_phi, 0.0),
        jnp.where(is_peak, sin_phi, 0.0),
        jnp.where(is_peak, ph_in, 0.0),
    )
    # Previous peak (position + its phasor/phase), or idx -1 if none yet.
    prev = _hs_last_valid(seed)
    # Next peak: same scan over the reversed axis.
    rev = tuple(jnp.flip(x, -1) for x in seed)
    nxt = tuple(jnp.flip(x, -1) for x in _hs_last_valid(rev))
    prev_i, nxt_i = prev[0], nxt[0]
    bi = jnp.arange(B, dtype=jnp.int32)
    use_prev = (prev_i >= 0) & ((nxt_i < 0) | (bi - prev_i <= nxt_i - bi))
    has_peak = (prev_i >= 0) | (nxt_i >= 0)
    cp = jnp.where(use_prev, prev[1], nxt[1])
    sp = jnp.where(use_prev, prev[2], nxt[2])
    pph = jnp.where(use_prev, prev[3], nxt[3])
    # No peak either side (silent frame): keep the bin's own phase.
    cp = jnp.where(has_peak, cp, cos_phi)
    sp = jnp.where(has_peak, sp, sin_phi)
    pph = jnp.where(has_peak, pph, ph_in)

    d = ph_in - pph  # |d| < 2*pi
    cd, sd = jnp.cos(d), jnp.sin(d)
    return (
        jnp.where(is_peak, cos_phi, cp * cd - sp * sd),
        jnp.where(is_peak, sin_phi, cp * sd + sp * cd),
    )


def lock_phases(cos_phi, sin_phi, ph_in, mag):
    """Backend-dispatched identity locking.

    TPU defaults to the VMEM-resident Pallas kernel
    (``ops/pallas_lock.py`` — the XLA doubling scans are HBM-bound, ~10
    of the locked pipeline's 17 ms at 30 s stereo); everywhere else the
    pure-XLA ``_lock_to_peaks``. ``NODEY_PV_LOCK_FORCE='pallas'|'xla'``
    overrides (tests run the kernel in interpret mode on CPU, pinned
    bitwise against the XLA path)."""
    force = os.environ.get("NODEY_PV_LOCK_FORCE")
    if force == "xla":
        return _lock_to_peaks(cos_phi, sin_phi, ph_in, mag)
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if force == "pallas" or on_tpu:
        from nodey_tpu.ops import pallas_lock

        return pallas_lock.lock_to_peaks_pallas(
            cos_phi, sin_phi, ph_in, mag, interpret=not on_tpu
        )
    return _lock_to_peaks(cos_phi, sin_phi, ph_in, mag)


def _fwd_backend():
    """Analysis-DFT dispatch: 'shift' (aligned row-gather + shift
    theorem) on TPU or when forced, else 'gather' (the vmapped
    dynamic_slice formulation).  ``NODEY_PV_FWD_FORCE`` overrides."""
    force = os.environ.get("NODEY_PV_FWD_FORCE")
    if force in ("shift", "gather"):
        return force
    try:
        if jax.default_backend() == "tpu":
            return "shift"
    except Exception:
        pass
    return "gather"


def _basis_backend() -> str:
    """DFT-basis/projection materialization dispatch (VERDICT r4 #5).

    'device' (TPU default): the big basis matrices (cosL/sinL, the
    Mrr..Mis projection folds, the inverse-DFT bases and the OLA
    denominator) are built IN-PROGRAM from int32 iota + trig (exact
    range reduction: products mod N computed in int32 before the f32
    angle scale) and, for the projections, one K-independent GEMM fold.
    XLA does not constant-fold iota-rooted expressions, so the
    executable carries kilobytes where the literal form baked ~56 MB
    for a 10 s clip (measured; a 128 MB cache entry took minutes to
    re-ship through a degraded relay per fresh process —
    ROUND6.md §16). Costs a fixed ~0.5-0.8 ms of setup arithmetic per
    dispatch — irrelevant for the one-dispatch offline export this
    path serves.

    'host' (CPU default): float64 numpy literals, bit-stable with the
    frozen goldens. NODEY_PV_BASIS overrides either way; parity between
    the two is pinned by tests (>= 95 dB end to end on CPU)."""
    force = os.environ.get("NODEY_PV_BASIS")
    if force in ("device", "host"):
        return force
    try:
        if jax.default_backend() == "tpu":
            return "device"
    except Exception:
        pass
    return "host"


def _dft_trig_dev(rows: int, cols: int, modulus: int):
    """[rows, cols] (cos, sin) of 2*pi*(r*c mod modulus)/modulus built on
    device by COMPLEX PREFIX DOUBLING: never a baked f32 literal, and
    also never a full-plane transcendental/index pass.

    Column m of the table is the unit phasor w_r^m with w_r =
    exp(i*2*pi*r/modulus). Precompute the log2(cols) bit rotations
    P_j = w_r^(2^j) as tiny [rows] trig vectors (angles reduced mod
    ``modulus`` in EXACT int32 — naive f32 cos(r*2^j*w) would lose ~4
    digits at the corner), then grow the table by doubling: columns
    [2^j, 2^(j+1)) = columns [0, 2^j) rotated by P_j (one complex
    multiply per plane). Total: O(log cols) plane ops + rows*cols
    complex multiplies — measured 4-8x cheaper than the per-element
    int32-mod + cos/sin formulation (0.18 ms -> ~0.03 ms per
    [2176, 1089] table on v5e), which materialized two int32 index
    planes and a transcendental per element. Column m accumulates
    <= popcount(m) <= log2(cols) unit-rotation roundings (~2^-24 each):
    ~125-130 dB vs the float64 tables, pinned by tests."""
    assert (rows - 1) * (modulus - 1) < 2**31, "int32 angle overflow"
    return _phasor_powers_dev(lax.iota(jnp.int32, rows), cols, modulus)


def _phasor_powers_dev(r, cols: int, modulus: int):
    """[len(r), cols] (cos, sin) of 2*pi*(r*c mod modulus)/modulus for an
    int32 row-angle vector ``r`` (callers guarantee
    max(r)*(modulus-1) < 2^31) — shared by _dft_trig_dev (r = iota) and
    the shift-theorem residue ramp (r = pos mod 128, a [K] constant).

    Two-factor outer form: columns a*B + b for B ~ sqrt(cols) come from
    one complex multiply of a [rows, A] stride table (powers of w^B) and
    a [rows, B] fine table — both built by concat-doubling at tiny
    widths — so the full plane is WRITTEN ONCE with ~6 flops/element
    (pure concat-doubling to full width re-copies the growing prefix
    every stage, ~4x the final plane in traffic)."""

    def doubling(n_cols: int, base_step: int):
        C = jnp.ones((r.shape[0], 1), jnp.float32)
        S = jnp.zeros((r.shape[0], 1), jnp.float32)
        built = 1
        while built < n_cols:
            step = (built * base_step) % modulus
            ang = ((r * step) % modulus).astype(jnp.float32) * np.float32(
                _TWO_PI / modulus
            )
            cj, sj = jnp.cos(ang)[:, None], jnp.sin(ang)[:, None]
            C, S = (
                jnp.concatenate([C, C * cj - S * sj], axis=1),
                jnp.concatenate([S, C * sj + S * cj], axis=1),
            )
            built *= 2
        return C[:, :n_cols], S[:, :n_cols]

    if cols <= 64:
        return doubling(cols, 1)
    B = 1 << (cols.bit_length() // 2)
    A = -(-cols // B)
    smC, smS = doubling(B, 1)                 # [rows, B], powers 0..B-1
    stC, stS = doubling(A, B)                 # [rows, A], powers of w^B
    C = stC[:, :, None] * smC[:, None, :] - stS[:, :, None] * smS[:, None, :]
    S = stC[:, :, None] * smS[:, None, :] + stS[:, :, None] * smC[:, None, :]
    rows = r.shape[0]
    return (
        C.reshape(rows, A * B)[:, :cols],
        S.reshape(rows, A * B)[:, :cols],
    )


def _pv_window_dev(n_fft: int):
    """Periodic Hann built on device (matches _pv_window)."""
    n = lax.iota(jnp.float32, n_fft)
    return 0.5 - 0.5 * jnp.cos(n * np.float32(_TWO_PI / n_fft))


def _shift_matrices_dev(n_fft: int):
    """Device-built twin of _shift_matrices: same operator, the
    projection folds (CL.T @ wc etc.) computed by one K-independent
    in-program GEMM at PV_PRECISION instead of a float64 host product —
    the f32 fold differs from the f64 literal by ~1e-6 relative, inside
    the >= 95 dB parity bar the shift formulation itself carries."""
    L = n_fft + 128
    binsL = L // 2 + 1
    bins = n_fft // 2 + 1
    cosL, sinL = _dft_trig_dev(L, binsL, L)

    alpha = jnp.full((binsL,), 2.0 / L, jnp.float32)
    alpha = alpha.at[0].set(1.0 / L)
    if L % 2 == 0:
        alpha = alpha.at[-1].set(1.0 / L)
    cosNL, sinNL = _dft_trig_dev(n_fft, binsL, L)
    CL = alpha[None, :] * cosNL
    SL = alpha[None, :] * sinNL
    # _dft_matrices' convention is (cos, MINUS sin) — the forward real
    # DFT's imaginary basis; _dft_trig_dev returns +sin, so negate.
    cos_m_d, negsin = _dft_trig_dev(n_fft, bins, n_fft)
    sin_m_d = -negsin
    w = _pv_window_dev(n_fft)
    wc = w[:, None] * cos_m_d
    ws = w[:, None] * sin_m_d

    def fold(a, b):
        return jnp.einsum(
            "nb,no->bo", a, b,
            preferred_element_type=jnp.float32, precision=PV_PRECISION,
        )

    return cosL, sinL, fold(CL, wc), fold(SL, wc), fold(CL, ws), fold(SL, ws)


@functools.lru_cache(maxsize=8)
def _shift_matrices(n_fft: int):
    """Static matrices for the shift-theorem analysis DFT.

    The irregular 16.16 frame positions make the naive per-frame gather
    a lane-unaligned dynamic_slice per frame — measured 2.7 ms of the
    3.35 ms forward side at 30 s stereo / 48 kHz on v5e, vs 0.34 ms for
    a 128-aligned row gather (tools/ab_gather.py, 2026-08-20).  So:
    gather an L = n_fft + 128 window at the position rounded DOWN to
    the 128-sample block (alignment the TPU lane layout likes), take
    its L-point real DFT (GEMMs), undo the residual r = pos mod 128 by
    the circular-shift theorem (a static per-frame phase ramp — the
    roll never wraps needed samples because r + n_fft < L), and project
    back to the windowed n_fft-bin spectrum with a fixed
    [binsL, bins] matrix folding inverse-L-DFT -> truncate-to-n_fft ->
    Hann -> forward DFT.  Exact up to f32 GEMM roundoff (>=95 dB vs the
    direct formulation, CPU-checked in tests).

    Returns (cosL, sinL [L, binsL], Mrr, Mir, Mrs, Mis [binsL, bins]).
    """
    L = n_fft + 128
    binsL = L // 2 + 1
    bins = n_fft // 2 + 1
    nL = np.arange(L)[:, None] * np.arange(binsL)[None, :]
    angL = 2.0 * np.pi * nL / L
    cosL = np.cos(angL).astype(np.float32)
    sinL = np.sin(angL).astype(np.float32)

    m = np.arange(binsL)
    alpha = np.full(binsL, 2.0 / L)
    alpha[0] = 1.0 / L
    if L % 2 == 0:
        alpha[-1] = 1.0 / L
    n = np.arange(n_fft)[:, None]
    # XIr carries MINUS Im (the bases above use +sin), so the XIr term
    # of the inverse enters with +alpha*sin.
    CL = alpha[None, :] * np.cos(2.0 * np.pi * n * m[None, :] / L)
    SL = alpha[None, :] * np.sin(2.0 * np.pi * n * m[None, :] / L)
    w = _pv_window(n_fft).astype(np.float64)
    cos_m, sin_m = _dft_matrices(n_fft)
    wc = w[:, None] * cos_m
    ws = w[:, None] * sin_m
    return (
        cosL,
        sinL,
        (CL.T @ wc).astype(np.float32),
        (SL.T @ wc).astype(np.float32),
        (CL.T @ ws).astype(np.float32),
        (SL.T @ ws).astype(np.float32),
    )


def _fwd_dft_shift(data, pos, n_fft: int):
    """Windowed analysis DFT at irregular static positions ``pos`` via
    aligned block row-gather + frequency-domain sub-block shift (see
    _shift_matrices).  Returns (re, im) [C, K, bins] matching the
    direct gather formulation to f32 GEMM roundoff.  Computes its own
    padding from ``pos`` (the last window read bounds it; _pv_geometry's
    pad_to serves the gather formulation's slice bound only)."""
    C, N = data.shape
    K = len(pos)
    L = n_fft + 128
    binsL = L // 2 + 1
    if _basis_backend() == "device":
        cosL, sinL, Mrr, Mir, Mrs, Mis = _shift_matrices_dev(n_fft)
    else:
        cosL, sinL, Mrr, Mir, Mrs, Mis = _shift_matrices(n_fft)

    a = (pos // 128).astype(np.int64)
    padN = int(a[-1]) * 128 + L
    x = jnp.pad(data, ((0, 0), (0, max(0, padN - N))))
    xb = x.reshape(C, padN // 128, 128)
    idx = jnp.asarray(a[:, None].astype(np.int32)) + jnp.arange(
        L // 128, dtype=jnp.int32
    )[None, :]
    g = xb[:, idx].reshape(C, K, L)                  # aligned row gather

    XR = jnp.einsum("ckl,lb->ckb", g, jnp.asarray(cosL),
                    preferred_element_type=jnp.float32,
                    precision=PV_PRECISION)
    XI = jnp.einsum("ckl,lb->ckb", g, jnp.asarray(sinL),
                    preferred_element_type=jnp.float32,
                    precision=PV_PRECISION)

    # Ramp phasors w^(r*m) for r = pos mod 128: a [K] constant through
    # the doubling construction — never a [K, binsL] f32 literal, and no
    # [K, binsL] int-mod/transcendental plane either (the per-element
    # form cost ~0.3 ms per dispatch at K~4000 on v5e).
    # optimization_barrier: with a literal [K] root (no iota) XLA would
    # constant-fold the whole doubling chain back into a [K, binsL]
    # plane pair in the executable — the exact baking this formulation
    # exists to avoid.
    r_i = lax.optimization_barrier(
        jnp.asarray((pos % 128).astype(np.int32))
    )
    rc, rs = _phasor_powers_dev(r_i, binsL, L)
    rc, rs = rc[None], rs[None]
    XRr = XR * rc + XI * rs
    XIr = XI * rc - XR * rs

    re = jnp.einsum("ckb,bo->cko", XRr, jnp.asarray(Mrr),
                    preferred_element_type=jnp.float32,
                    precision=PV_PRECISION) \
        + jnp.einsum("ckb,bo->cko", XIr, jnp.asarray(Mir),
                     preferred_element_type=jnp.float32,
                     precision=PV_PRECISION)
    im = jnp.einsum("ckb,bo->cko", XRr, jnp.asarray(Mrs),
                    preferred_element_type=jnp.float32,
                    precision=PV_PRECISION) \
        + jnp.einsum("ckb,bo->cko", XIr, jnp.asarray(Mis),
                     preferred_element_type=jnp.float32,
                     precision=PV_PRECISION)
    return re, im


def _pv_impl(data, tempo: float, rate: int, lock: bool = True,
             transient: bool = False, formant_ratio: float = 1.0):
    """Stretch [C, N] by ``tempo`` (>1 = faster/shorter); returns the
    overlap-added output [C, (K+3)*hop] (unmasked — caller trims).

    ``transient=True`` adds phase reset at detected onsets (normalized
    positive spectral flux > PV_TRANSIENT_FLUX): the reset frame's
    synthesis phase snaps back to its analysis phase, so attacks keep
    the original waveform's phase alignment instead of the smeared
    accumulated phase — the standard transient fix for the phase
    vocoder. TPU-first formulation: a reset is a segment boundary in the
    phasor prefix, handled by the associative ``_cmul_seg`` combine in
    the SAME log-depth scan (no serial pass, no control flow)."""
    C, N = data.shape
    n_fft, hop, pos, dpos, pad_to = _pv_geometry(N, tempo, rate)
    K = len(pos)
    bins = n_fft // 2 + 1

    if _fwd_backend() == "shift":
        re, im = _fwd_dft_shift(data, pos, n_fft)
    else:
        if _basis_backend() == "device":
            # (cos, MINUS sin): _dft_matrices' forward-DFT convention.
            cos_m, _psin = _dft_trig_dev(n_fft, bins, n_fft)
            sin_m = -_psin
            w = _pv_window_dev(n_fft)
        else:
            cos_m, sin_m = _dft_matrices(n_fft)
            w = jnp.asarray(_pv_window(n_fft))
        x = jnp.pad(data, ((0, 0), (0, max(0, pad_to - N))))
        # One batched slice-gather for all frames: vmapped dynamic_slice
        # keeps the HLO index literal at K entries (vs a [K, n_fft] 2D
        # literal, which costs ~3x the XLA CPU compile at equal runtime).
        starts = jnp.asarray(pos.astype(np.int32))
        frames = jax.vmap(
            lambda s: lax.dynamic_slice_in_dim(x, s, n_fft, axis=1),
            out_axes=1,
        )(starts) * w[None, None, :]                 # [C, K, n_fft]

        re = jnp.einsum(
            "ckn,nb->ckb", frames, jnp.asarray(cos_m),
            preferred_element_type=jnp.float32, precision=PV_PRECISION,
        )
        im = jnp.einsum(
            "ckn,nb->ckb", frames, jnp.asarray(sin_m),
            preferred_element_type=jnp.float32, precision=PV_PRECISION,
        )
    # Fused phase path (ops/pallas_phase.py): mag/phase extraction,
    # instantaneous-frequency wrap, K-axis phasor prefix, identity lock
    # and the mag*phasor synthesis products in ONE VMEM-resident kernel
    # (the XLA formulation below streams each intermediate plane through
    # HBM).  Same math; prefix association order differs, so outputs
    # agree to f32 round-off — tests pin >=110 dB vs this XLA path.
    # Option paths the kernel does not implement fall back below.
    if not transient and formant_ratio == 1.0:
        backend = _phase_backend()
        if backend is not None:
            from nodey_tpu.ops import pallas_phase

            re_y, im_y = pallas_phase.phase_path_pallas(
                re, im, dpos, hop, n_fft, lock=lock,
                interpret=backend == "interpret",
            )
            return _pv_synth(re_y, im_y, n_fft, hop)

    mag = jnp.sqrt(re * re + im * im)
    ph = jnp.arctan2(im, re)                         # [C, K, bins]
    raw_mag = mag
    if formant_ratio != 1.0:
        # Transient flux below reads raw_mag (detection is about the
        # INPUT); locking and synthesis use the corrected magnitudes.
        mag = _formant_correction(mag, n_fft, formant_ratio)

    # Phase advance per synthesis frame, kept SMALL for f32: the raw
    # advance hop*omega_inst grows to ~1.6e3 rad/frame at the top bin and
    # its prefix sum to ~1e5 rad, where f32 resolution is ~0.01 rad —
    # measured 57 dB of reconstruction noise with a naive cumsum. Split it:
    # the deterministic hop*omega term reduces mod 2pi EXACTLY at trace
    # time ((b*hop) % n_fft — multiples of pi/2 at 75% overlap), and the
    # measured deviation (wrapped phase delta, |.| <= pi, scaled by
    # hop/dpos) stays O(1) by construction.
    # (b * dpos_k) mod n_fft in int32 on device (max product ~1.6e6, no
    # overflow; a [K-1, bins] f32 constant would bake ~100 MB into the
    # HLO for long clips).
    b_i = jnp.arange(bins, dtype=jnp.int32)
    dpos_i = jnp.asarray(dpos[1:].astype(np.int32))
    omega_dpos = (
        (b_i[None, :] * dpos_i[:, None]) % n_fft
    ).astype(jnp.float32) * np.float32(_TWO_PI / n_fft)  # [K-1, bins]
    ph_d = ph[:, 1:] - ph[:, :-1]                    # [C, K-1, bins]
    dphi = ph_d - omega_dpos[None]
    wrapped = dphi - _TWO_PI * jnp.round(dphi / _TWO_PI)
    hop_over_dpos = jnp.asarray(
        (float(hop) / dpos[1:, None]).astype(np.float32)
    )                                                # [K-1, 1]
    omega_hop = np.mod(
        np.arange(bins) * hop, n_fft
    ).astype(np.float64) * (_TWO_PI / n_fft)         # [bins] exact mod 2pi
    adv = (
        jnp.asarray(omega_hop.astype(np.float32))[None, None, :]
        + wrapped * hop_over_dpos[None]
    )                                                # [C, K-1, bins] O(1)

    # Prefix-accumulate as unit PHASORS, not angles: a complex prefix
    # product (lax.associative_scan, O(log K) depth) rotates by each
    # small advance with ~1e-7 error per combine INDEPENDENT of the
    # accumulated total — the f32-stable form of phase integration.
    ca, sa = jnp.cos(adv), jnp.sin(adv)

    def _cmul(a, b):
        return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

    c0, s0 = jnp.cos(ph[:, :1]), jnp.sin(ph[:, :1])
    if transient:
        reset = transient_resets(raw_mag[:, :-1], raw_mag[:, 1:])[..., None]
        ca = jnp.where(reset, jnp.cos(ph[:, 1:]), ca)
        sa = jnp.where(reset, jnp.sin(ph[:, 1:]), sa)
        pc, ps, pr = lax.associative_scan(
            _cmul_seg, (ca, sa, jnp.broadcast_to(reset, ca.shape)), axis=1
        )
        # Frames after a reset are already absolute; earlier ones rotate
        # off frame 0's analysis phase exactly as before.
        cos1 = jnp.where(pr, pc, c0 * pc - s0 * ps)
        sin1 = jnp.where(pr, ps, c0 * ps + s0 * pc)
        cos_phi = jnp.concatenate([c0, cos1], axis=1)
        sin_phi = jnp.concatenate([s0, sin1], axis=1)
    else:
        pc, ps = lax.associative_scan((lambda a, b: _cmul(a, b)), (ca, sa),
                                      axis=1)
        cos_phi = jnp.concatenate([c0, c0 * pc - s0 * ps], axis=1)
        sin_phi = jnp.concatenate([s0, c0 * ps + s0 * pc], axis=1)
    if lock:
        cos_phi, sin_phi = lock_phases(cos_phi, sin_phi, ph, mag)

    return _pv_synth(mag * cos_phi, mag * sin_phi, n_fft, hop)


def _phase_backend():
    """Fused-phase-kernel dispatch: 'pallas' on TPU (or forced),
    'interpret' when forced for CPU tests, None -> XLA path."""
    force = os.environ.get("NODEY_PV_PHASE_FORCE")
    if force == "xla":
        return None
    if force == "interpret":
        return "interpret"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    if force == "pallas" or on_tpu:
        return "pallas"
    return None


def _pv_synth(re_y, im_y, n_fft: int, hop: int):
    """Synthesis tail shared by the XLA and fused phase paths: inverse
    real-DFT GEMMs, WOLA window, overlap-add at hop = n_fft/4 (each
    frame is 4 hop-subframes; subframe j of frame k lands on output row
    k + j — four shifted adds, no scatter), exact coverage divide."""
    C, K, _bins = re_y.shape
    on_device = _basis_backend() == "device"
    if on_device:
        bins = n_fft // 2 + 1
        cos_i, sin_i = _dft_trig_dev(bins, n_fft, n_fft)
        cval = jnp.full((bins, 1), 2.0 / n_fft, jnp.float32)
        cval = cval.at[0, 0].set(1.0 / n_fft).at[-1, 0].set(1.0 / n_fft)
        icos_m, isin_m = cval * cos_i, -cval * sin_i
        w = _pv_window_dev(n_fft)
    else:
        w = jnp.asarray(_pv_window(n_fft))
        icos_m, isin_m = _idft_matrices(n_fft)
    y = jnp.einsum(
        "ckb,bn->ckn", re_y, jnp.asarray(icos_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    ) + jnp.einsum(
        "ckb,bn->ckn", im_y, jnp.asarray(isin_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    y = y * w[None, None, :]                         # WOLA synthesis window

    y4 = y.reshape(C, K, 4, hop)
    ola = None
    for j in range(4):
        part = jnp.pad(y4[:, :, j, :], ((0, 0), (j, 3 - j), (0, 0)))
        ola = part if ola is None else ola + part    # [C, K+3, hop]
    out = ola.reshape(C, (K + 3) * hop)

    if on_device and K >= 8:
        # Interior coverage is exactly 1.5 (periodic Hann, 75% overlap);
        # only the 3-hop edge ramps deviate — divide the three regions
        # separately (two small literals + one scalar) instead of baking
        # an O(clip length) [(K+3)*hop] f32 constant (2.4 MB at 10 s,
        # linear in clip length; XLA folds even a concat-of-constants
        # denominator back into one big literal).
        head, tail = _ola_denominator_edges(n_fft)
        e = 3 * hop
        return jnp.concatenate(
            [
                out[:, :e] / jnp.asarray(head)[None, :],
                out[:, e:-e] / np.float32(1.5),
                out[:, -e:] / jnp.asarray(tail)[None, :],
            ],
            axis=1,
        )
    den = _ola_denominator(K, n_fft)
    return out / jnp.asarray(den)[None, :]


@functools.lru_cache(maxsize=8)
def _ola_denominator_edges(n_fft: int):
    """(head [3*hop], tail [3*hop]) edge ramps of the OLA coverage — the
    only K-dependent-constant-free pieces the device-basis branch needs
    (rows 0..2 and K..K+2 of the coverage only depend on the window,
    never on K, for any K >= 4)."""
    hop = n_fft // 4
    den = _ola_denominator(8, n_fft)
    return den[: 3 * hop].copy(), den[-3 * hop:].copy()


@functools.lru_cache(maxsize=32)
def _ola_denominator(K: int, n_fft: int) -> np.ndarray:
    """Exact window-squared coverage sum_k w^2(n - k*hop) over the OLA
    output (1.5 in the interior for periodic Hann at 75% overlap; partial
    at the edges). Dividing by the TRUE partial sum keeps unit-hop
    reconstruction exact right up to the edges; the floor only guards the
    first/last few samples where coverage vanishes."""
    hop = n_fft // 4
    w2 = _pv_window(n_fft).astype(np.float64) ** 2
    den = np.zeros(((K + 3) * hop,), dtype=np.float64)
    w2v = w2.reshape(4, hop)
    for j in range(4):
        den.reshape(-1, hop)[j : j + K] += w2v[j]
    return np.maximum(den, 1e-2).astype(np.float32)


def pv_stretch_at_rate(data, length, tempo: float, rate: int,
                       lock: bool = True, transient: bool = False,
                       formant_ratio: float = 1.0):
    """Stretch [C, N] float32 by ``tempo`` (>1 = faster/shorter).

    Same contract as stretch.wsola_stretch_at_rate — returns
    (out_data [C, M], out_length) with out_length = floor(length/tempo) via
    the shared exact integer scaling, so swapping algorithm never changes a
    graph's timing math. Identity when tempo == 1 — formant pre-warp
    therefore needs a RUNNING tempo stage: pitch nodes and
    keep_pitch velocity nodes always pair transposition with tempo, but
    a keep_pitch=False velocity node (pure tape-speed) has tempo 1 and
    the flag has no effect there (documented in the node's param help).
    ``transient`` enables onset phase reset; ``formant_ratio`` pre-warps
    magnitudes for a downstream resample by that ratio (see _pv_impl /
    _formant_correction)."""
    if tempo == 1.0:
        return data, length
    from nodey_tpu.ops.stretch import _scale_length_exact

    out = _pv_impl(data, float(tempo), int(rate), lock=lock,
                   transient=transient,
                   formant_ratio=float(formant_ratio))
    out_length = jnp.minimum(
        _scale_length_exact(length, float(tempo)), out.shape[1]
    )
    mask = jnp.arange(out.shape[1])[None, :]
    return jnp.where(mask < out_length, out, 0.0), out_length


# -- streaming (chunked) phase vocoder --------------------------------------
#
# PV streams naturally on TPU: every per-frame quantity is independent, so a
# chunk is just a BATCH of frames (one MXU GEMM per DFT pass), and the only
# cross-chunk state is (a) the input FIFO, (b) the previous frame's analysis
# phase (for instantaneous frequency), (c) the accumulated synthesis phasor
# (one complex [C, bins] carry — the prefix product factorizes across chunk
# boundaries), and (d) the 3*hop overlap-add tail. Geometry is the shared
# 16.16 law, so chunked output equals the offline render up to f32
# re-association of the phasor products (the offline path accumulates in
# associative_scan tree order, the chunked path per-chunk + carry).


import typing as _t


class PvStreamPlan(_t.NamedTuple):
    n_fft: int
    hop: int           # synthesis hop (n_fft // 4)
    num: int           # analysis-hop numerator, den 65536 (pv_hop_num)
    num_t: int         # round(tempo * 65536) — output-length law
    push_cap: int
    k_cap: int         # frames processed per step
    window: int        # input window needed by k_cap frames
    cap: int           # FIFO capacity
    out_cap: int       # k_cap * hop
    lock: bool
    transient: bool = False
    formant_ratio: float = 1.0


def pv_stream_plan(tempo: float, rate: int, push_cap: int,
                   lock: bool = True,
                   transient: bool = False,
                   formant_ratio: float = 1.0) -> PvStreamPlan:
    n_fft, hop = pv_params(rate)
    num = pv_hop_num(hop, tempo)
    k_cap = max(1, -(-push_cap * 65536 // num) + 2)
    window = (k_cap - 1) * num // 65536 + n_fft + 2
    cap = window + push_cap + num // 65536 + 2
    return PvStreamPlan(
        n_fft=n_fft, hop=hop, num=num, num_t=int(round(tempo * 65536)),
        push_cap=push_cap, k_cap=k_cap, window=window, cap=cap,
        out_cap=k_cap * hop, lock=lock, transient=transient,
        formant_ratio=float(formant_ratio),
    )


@functools.lru_cache(maxsize=8)
def _ola_row_partials(n_fft: int) -> np.ndarray:
    """P1[r] = sum_{j<=r} w^2 row j, [4, hop]: the window-squared coverage
    of OLA output row k is P1[min(3, k)] for every emitted row (rows in the
    end-partial region lie beyond the trimmed output length — see
    pv_stream_step), floored like the offline _ola_denominator."""
    hop = n_fft // 4
    w2v = (_pv_window(n_fft).astype(np.float64) ** 2).reshape(4, hop)
    return np.maximum(np.cumsum(w2v, axis=0), 1e-2).astype(np.float32)


def pv_stream_init(plan: PvStreamPlan, channels: int):
    """State: (fifo, carry_c, carry_s [C, bins] synthesis phasor,
    ph_prev [C, bins] last frame's analysis phase, mag_prev [C, bins]
    last frame's magnitudes (transient flux context; zeros before frame
    0, where the seed masks resets anyway), ola_tail [C, 3*hop],
    k int32 next frame, consumed int32, in_len int32)."""
    from nodey_tpu.ops.chunkops import fifo_init

    bins = plan.n_fft // 2 + 1
    return (
        fifo_init(channels, plan.cap),
        jnp.ones((channels, bins), dtype=jnp.float32),
        jnp.zeros((channels, bins), dtype=jnp.float32),
        jnp.zeros((channels, bins), dtype=jnp.float32),
        jnp.zeros((channels, bins), dtype=jnp.float32),
        jnp.zeros((channels, 3 * plan.hop), dtype=jnp.float32),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
    )


def pv_stream_step(plan: PvStreamPlan, state, data, n, done):
    """Push a chunk, analyze/synthesize every frame that is ready, emit
    final OLA rows.

    Frame k reads [pos(k), pos(k) + n_fft); output row k (hop samples at
    output offset k*hop) is final once frame k is synthesized, because no
    later frame touches it. Live frames are additionally gated to rows
    fully inside the output-length bound implied by the input so far
    (monotone — mid-stream emissions are never retracted); at EOF the FIFO's
    zero tail stands in for the offline right pad and the final chunk is
    clamped to the exact stretched length. Every emitted row has coverage
    P1[min(3, k)] — the trimmed output never reaches the end-partial
    rows (out_total <= (K_offline-2)*hop by the offline K formula), which
    is why start partials + interior are the only denominators needed.

    Returns (state, out [C, out_cap], out_n, out_done)."""
    from nodey_tpu.ops.chunkops import (
        fifo_advance, fifo_level, fifo_push, fifo_window,
    )
    from nodey_tpu.ops.stretch import frame_pos, scale_length_by_num

    n_fft, hop = plan.n_fft, plan.hop
    F = plan.k_cap
    bins = n_fft // 2 + 1

    fifo, cc, cs, ph_prev, mag_prev, tail, k0, consumed, in_len = state
    fifo = fifo_push(fifo, data, n)
    in_len = in_len + jnp.int32(n)
    level = fifo_level(fifo)

    out_total = scale_length_by_num(in_len, plan.num_t)
    k_fin = jnp.maximum((out_total + hop - 1) // hop, 0)
    k_bound = jnp.where(done, k_fin, out_total // hop)

    ks = k0 + jnp.arange(F, dtype=jnp.int32)
    pos = frame_pos(ks, plan.num)
    ready = jnp.where(done, True, pos + n_fft <= consumed + level)
    valid = ready & (ks < k_bound)          # a prefix: both terms monotone
    k_done = valid.sum().astype(jnp.int32)

    x = fifo_window(fifo, plan.window + plan.push_cap)
    C = x.shape[0]
    w = jnp.asarray(_pv_window(n_fft))
    rel = jnp.clip(pos - consumed, 0, x.shape[1] - n_fft)
    frames = jax.vmap(
        lambda s: lax.dynamic_slice(x, (0, s), (C, n_fft)), out_axes=1
    )(rel) * w[None, None, :]                # [C, F, n_fft]

    cos_m, sin_m = _dft_matrices(n_fft)
    re = jnp.einsum(
        "ckn,nb->ckb", frames, jnp.asarray(cos_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    im = jnp.einsum(
        "ckn,nb->ckb", frames, jnp.asarray(sin_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    mag = jnp.sqrt(re * re + im * im)
    ph = jnp.arctan2(im, re)                 # [C, F, bins]
    raw_mag = mag
    if plan.formant_ratio != 1.0:
        # Flux context and the mag_prev carry stay RAW (detection is
        # about the input); locking/synthesis use corrected magnitudes —
        # per-frame and stateless, so chunked == offline exactly as for
        # every other per-frame pass.
        mag = _formant_correction(mag, n_fft, plan.formant_ratio)

    # Phase advance per frame over its ACTUAL integer hop (same split as
    # the offline path: exact (b*dpos) mod n_fft plus the O(1) measured
    # deviation scaled by hop/dpos).
    pos_prev = jnp.where(ks >= 1, frame_pos(jnp.maximum(ks - 1, 0), plan.num), 0)
    dpos = jnp.maximum(pos - pos_prev, 1)    # [F] int32
    b_i = jnp.arange(bins, dtype=jnp.int32)
    omega_dpos = (
        (b_i[None, :] * dpos[:, None]) % n_fft
    ).astype(jnp.float32) * np.float32(_TWO_PI / n_fft)   # [F, bins]
    ph_all = jnp.concatenate([ph_prev[:, None, :], ph], axis=1)
    dphi = ph_all[:, 1:] - ph_all[:, :-1] - omega_dpos[None]
    wrapped = dphi - _TWO_PI * jnp.round(dphi / _TWO_PI)
    omega_hop = np.mod(
        np.arange(bins) * hop, n_fft
    ).astype(np.float64) * (_TWO_PI / n_fft)
    adv = (
        jnp.asarray(omega_hop.astype(np.float32))[None, None, :]
        + wrapped * (np.float32(hop) / dpos[None, :, None].astype(jnp.float32))
    )
    # Global frame 0 seeds the accumulation with its own analysis phase
    # (carry starts at identity); invalid frames rotate by identity so the
    # carry is exactly the product over the valid prefix.
    adv = jnp.where((ks == 0)[None, :, None], ph, adv)
    vmask = valid[None, :, None]
    if plan.transient:
        # Same decisions as the offline path: flux of each frame vs its
        # predecessor (the carry supplies the cross-chunk context). Frame
        # 0 is the seed, never a reset; invalid frames stay identity.
        mag_all = jnp.concatenate([mag_prev[:, None, :], raw_mag], axis=1)
        reset = (
            transient_resets(mag_all[:, :-1], mag_all[:, 1:])
            & (ks > 0)[None, :] & valid[None, :]
        )[..., None]                                  # [C, F, 1]
        adv = jnp.where(reset, ph, adv)
    ca = jnp.where(vmask, jnp.cos(adv), 1.0)
    sa = jnp.where(vmask, jnp.sin(adv), 0.0)

    def _cmul(a, b):
        return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])

    if plan.transient:
        pc, ps, pr = lax.associative_scan(
            _cmul_seg, (ca, sa, jnp.broadcast_to(reset, ca.shape)), axis=1
        )
        cos_phi = jnp.where(pr, pc, cc[:, None, :] * pc - cs[:, None, :] * ps)
        sin_phi = jnp.where(pr, ps, cc[:, None, :] * ps + cs[:, None, :] * pc)
    else:
        pc, ps = lax.associative_scan(_cmul, (ca, sa), axis=1)
        cos_phi = cc[:, None, :] * pc - cs[:, None, :] * ps
        sin_phi = cc[:, None, :] * ps + cs[:, None, :] * pc

    # Carries from the LAST VALID frame (unlocked — locking is synthesis-
    # only, exactly like the offline path).
    j_last = jnp.clip(k_done - 1, 0, F - 1)
    take = lambda a: lax.dynamic_slice(
        a, (0, j_last, 0), (C, 1, a.shape[2])
    )[:, 0, :]
    cc = jnp.where(k_done > 0, take(cos_phi), cc)
    cs = jnp.where(k_done > 0, take(sin_phi), cs)
    ph_prev = jnp.where(k_done > 0, take(ph), ph_prev)
    mag_prev = jnp.where(k_done > 0, take(raw_mag), mag_prev)

    if plan.lock:
        lcos, lsin = lock_phases(cos_phi, sin_phi, ph, mag)
    else:
        lcos, lsin = cos_phi, sin_phi

    icos_m, isin_m = _idft_matrices(n_fft)
    y = jnp.einsum(
        "ckb,bn->ckn", mag * lcos, jnp.asarray(icos_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    ) + jnp.einsum(
        "ckb,bn->ckn", mag * lsin, jnp.asarray(isin_m),
        preferred_element_type=jnp.float32, precision=PV_PRECISION,
    )
    y = y * w[None, None, :] * vmask.astype(jnp.float32)

    # OLA over [k0*hop, (k0+F+3)*hop): 4 shifted adds + the carried tail.
    y4 = y.reshape(C, F, 4, hop)
    acc = None
    for j in range(4):
        part = jnp.pad(y4[:, :, j, :], ((0, 0), (j, 3 - j), (0, 0)))
        acc = part if acc is None else acc + part
    acc = acc.reshape(C, (F + 3) * hop)
    acc = acc.at[:, : 3 * hop].add(tail)
    tail = lax.dynamic_slice(acc, (0, k_done * hop), (C, 3 * hop))

    # Divide emitted rows by their exact coverage (start partials, then
    # the 1.5 interior).
    P1 = jnp.asarray(_ola_row_partials(n_fft))            # [4, hop]
    den = P1[jnp.clip(ks, 0, 3)].reshape(F * hop)
    out = acc[:, : F * hop] / den[None, :]

    emitted = k0 * hop
    out_n = jnp.clip(
        jnp.minimum(k_done * hop, out_total - emitted), 0, plan.out_cap
    )
    idx = jnp.arange(plan.out_cap, dtype=jnp.int32)[None, :]
    out = jnp.where(idx < out_n, out, 0.0)

    k_next = k0 + k_done
    keep_from = frame_pos(k_next, plan.num)
    advance = jnp.clip(keep_from - consumed, 0, None)
    fifo = fifo_advance(fifo, advance)
    consumed = consumed + advance

    out_done = done & (k_next >= k_fin)
    new_state = (fifo, cc, cs, ph_prev, mag_prev, tail, k_next, consumed,
                 in_len)
    return new_state, out, out_n, out_done


# -- NumPy reference (host-side mirror for tests) ---------------------------


def pv_stretch_reference(
    data: np.ndarray, tempo: float, rate: int, lock: bool = True,
    transient: bool = False,
) -> np.ndarray:
    """Direct NumPy mirror of the device phase vocoder (same geometry,
    same propagation, same locking rule, same transient-reset rule) in
    float64 — the quality yardstick the float32 device path is compared
    against. The mirror's reset is the sequential statement ("at an
    onset, phase := analysis phase, then keep integrating"); the device
    path expresses the identical recurrence as a segmented prefix scan."""
    C, N = data.shape
    n_fft, hop, pos, dpos, pad_to = _pv_geometry(N, tempo, rate)
    K = len(pos)
    bins = n_fft // 2 + 1
    w = _pv_window(n_fft).astype(np.float64)
    x = np.pad(data.astype(np.float64), ((0, 0), (0, max(0, pad_to - N))))
    idx = pos[:, None] + np.arange(n_fft)[None, :]
    frames = x[:, idx] * w[None, None, :]
    spec = np.fft.rfft(frames, axis=-1)
    mag, ph = np.abs(spec), np.angle(spec)

    omega = _TWO_PI * np.arange(bins) / n_fft
    dp = dpos[1:, None].astype(np.float64)
    dphi = ph[:, 1:] - ph[:, :-1] - omega[None, None, :] * dp[None]
    wrapped = dphi - _TWO_PI * np.round(dphi / _TWO_PI)
    omega_inst = omega[None, None, :] + wrapped / dp[None]
    if transient:
        rise = np.maximum(mag[:, 1:] - mag[:, :-1], 0.0).sum(axis=-1)
        base = mag[:, :-1].sum(axis=-1)
        reset = rise > PV_TRANSIENT_FLUX * (base + 1e-6)  # [C, K-1]
        phi = np.empty_like(ph)
        phi[:, 0] = ph[:, 0]
        for k in range(1, K):
            adv = phi[:, k - 1] + hop * omega_inst[:, k - 1]
            phi[:, k] = np.where(reset[:, k - 1][:, None], ph[:, k], adv)
    else:
        phi = np.concatenate(
            [ph[:, :1], ph[:, :1] + np.cumsum(hop * omega_inst, axis=1)],
            axis=1,
        )
    if lock:
        phi = _lock_to_peaks_np(phi, ph, mag)

    y = np.fft.irfft(mag * np.exp(1j * phi), n=n_fft, axis=-1)
    y = y * w[None, None, :]
    out = np.zeros((C, (K + 3) * hop))
    y4 = y.reshape(C, K, 4, hop)
    ov = out.reshape(C, -1, hop)
    for j in range(4):
        ov[:, j : j + K] += y4[:, :, j, :]
    den = _ola_denominator(K, n_fft).astype(np.float64)
    return (out / den[None, :]).astype(np.float32)


def _lock_to_peaks_np(phi, ph_in, mag):
    C, K, B = mag.shape
    pad = np.full((C, K, 2), -1.0)
    m = np.concatenate([pad, mag, pad], axis=-1)
    is_peak = (
        (mag > m[..., 1:B + 1])
        & (mag >= m[..., 3:B + 3])
        & (mag > m[..., 0:B])
        & (mag >= m[..., 4:B + 4])
    )
    b_idx = np.arange(B)
    prev_peak = np.maximum.accumulate(
        np.where(is_peak, b_idx, -1), axis=-1
    )
    next_peak = np.flip(
        np.minimum.accumulate(
            np.flip(np.where(is_peak, b_idx, B), -1), axis=-1
        ),
        -1,
    )
    use_prev = (prev_peak >= 0) & (
        (next_peak >= B) | (b_idx - prev_peak <= next_peak - b_idx)
    )
    peak = np.where(use_prev, prev_peak, next_peak)
    peak = np.clip(peak, 0, B - 1)
    has_peak = (prev_peak >= 0) | (next_peak < B)
    peak = np.where(has_peak, peak, b_idx)
    phi_pk = np.take_along_axis(phi, peak, axis=-1)
    ph_pk = np.take_along_axis(ph_in, peak, axis=-1)
    return np.where(is_peak, phi, phi_pk + (ph_in - ph_pk))
