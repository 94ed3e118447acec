"""STFT magnitude spectrogram (the FFTW promise the reference never shipped;
reference: README.md:28, xmake.lua:15 — zero call sites).

TPU-native design: the real DFT is ONE large batched GEMM against an
explicit Hann-windowed basis — framing never materializes the overlapped
frame matrix. When ``hop`` divides ``n_fft`` (every product config), the
frame matrix factors into ``k = n_fft//hop`` hop-aligned RESHAPES of the
signal, so the windowed DFT is ``k`` GEMMs against the matching basis
row-blocks summed — the overlap duplication rides the MXU's contraction,
not HBM. Measured on v5e (300 s stereo, n_fft 1024, hop 512, HIGHEST):
5.27 ms for the materialize-frames+window+2-GEMM formulation vs 4.81 ms
for this one. A 128x8 Cooley-Tukey GEMM factorization (4x fewer MACs) was
prototyped and REJECTED: 10.1 ms — the small-contraction stages and
twiddle/butterfly elementwise passes cost more than the saved FLOPs
(2026-08-19 on-chip A/B; the direct big GEMM is the right MXU shape).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from nodey_tpu.core.stream import Stream

# Matmul precision for the DFT GEMMs. The spectrum GEMM is PASS-bound on
# v5e — re-measured 2026-08-21 with probe-corrected timing (an earlier
# note claiming identical walls across precisions was wrong):
# DEFAULT 2.17 / HIGH 3.02 / HIGHEST 4.87 ms per 300 s stereo track.
# Quality vs a float64 reference spectrogram, same day, on chip:
# DEFAULT (1-pass bf16) 55.8 dB — too low; HIGH (3-pass) 99.8 dB;
# HIGHEST (6-pass, bitwise f32) 141 dB. The spectrum output feeds the
# editor's spectrogram view and the preview's analysis taps — never the
# audio path — so HIGH's ~100 dB (above even the 90 dB AUDIO oracle
# bar, and ~20 dB past any display dynamic range) is the right default;
# it cuts the headline pipeline's second-largest term by 1.85 ms.
# NODEY_STFT_PRECISION={default,high,highest} overrides (the audio-path
# GEMMs keep their own HIGHEST policy — see resample.BANK_PRECISION).
STFT_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}.get(
    os.environ.get("NODEY_STFT_PRECISION", "").lower(),
    jax.lax.Precision.HIGH,
)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT basis [n_fft, n_fft//2+1] (cos, -sin), float32.

    On TPU an explicit DFT matmul rides the MXU and beats the generic FFT
    lowering for the frame sizes a spectrogram uses (n_fft <= 4096):
    frames x basis is one [F, n_fft] x [n_fft, bins] GEMM per part.
    (Shared with ops/pv.py — unwindowed.)
    """
    k = np.arange(n_fft)[:, None] * np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k / n_fft
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=8)
def _windowed_stacked_basis(n_fft: int) -> np.ndarray:
    """Hann-windowed stacked real-DFT basis [n_fft, 2*bins] = [w·cos | w·-sin].

    Folding the analysis window into the basis (in float64, cast once)
    deletes the windowed-frames elementwise pass — ~460 MB of HBM traffic
    per 300 s stereo clip — and stacking re|im into one matrix reads the
    frame operand once instead of twice."""
    w = np.hanning(n_fft)
    k = np.arange(n_fft)[:, None] * np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k / n_fft
    return np.concatenate(
        [np.cos(ang) * w[:, None], -np.sin(ang) * w[:, None]], axis=1
    ).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _windowed_basis_blocks(n_fft: int, hop: int):
    """The stacked windowed basis split into k = n_fft//hop row blocks of
    [hop, 2*bins] — block i multiplies the i-th hop-aligned reshape of the
    signal (see magnitude_spectrogram)."""
    b = _windowed_stacked_basis(n_fft)
    k = n_fft // hop
    return tuple(b[i * hop : (i + 1) * hop] for i in range(k))


def magnitude_spectrogram(
    stream: Stream, n_fft: int = 1024, hop: int = 512, use_matmul: bool = True
):
    """Return ``[channels, frames, n_fft//2 + 1]`` float32 magnitudes.

    Frames starting beyond the valid length contain window-of-padding zeros;
    consumers can derive the valid frame count from the stream length
    (frames_valid = max(0, (length - n_fft) // hop + 1)).
    """
    data = stream.data  # [C, N]
    C, N = data.shape
    num_frames = max(0, (N - n_fft) // hop + 1)
    bins = n_fft // 2 + 1
    if num_frames == 0:
        return jnp.zeros((C, 0, bins), dtype=jnp.float32)
    if use_matmul and n_fft <= 4096:
        if n_fft % hop == 0:
            # Fast path: frame f = concat(segs[f+i] for i in range(k)), so
            # sum_i segs[:, i : i+F] @ B_rows[i*hop:(i+1)*hop] IS the
            # windowed DFT of every frame — zero frame materialization,
            # each addend a well-shaped [C*F, hop] x [hop, 2*bins] GEMM.
            k = n_fft // hop
            segs_needed = num_frames - 1 + k
            pad = segs_needed * hop - N
            x = jnp.pad(data, ((0, 0), (0, pad))) if pad > 0 else data
            segs = x[:, : segs_needed * hop].reshape(C, segs_needed, hop)
            y = None
            for i, blk in enumerate(_windowed_basis_blocks(n_fft, hop)):
                t = jnp.einsum(
                    "cfn,nk->cfk",
                    segs[:, i : i + num_frames],
                    jnp.asarray(blk),
                    precision=STFT_PRECISION,
                    preferred_element_type=jnp.float32,
                )
                y = t if y is None else y + t
        else:
            frames = _frame(data, num_frames, n_fft, hop)  # [C, F, n_fft]
            y = jnp.einsum(
                "cfn,nk->cfk",
                frames,
                jnp.asarray(_windowed_stacked_basis(n_fft)),
                precision=STFT_PRECISION,
                preferred_element_type=jnp.float32,
            )
        re, im = y[..., :bins], y[..., bins:]
        return jnp.sqrt(re * re + im * im)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    frames = _frame(data, num_frames, n_fft, hop)
    windowed = frames * window[None, None, :]
    spec = jnp.fft.rfft(windowed, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)


def _frame(data, num_frames: int, n_fft: int, hop: int):
    """Overlapping framing without gathers.

    When hop divides n_fft the frame matrix is k = n_fft/hop shifted
    hop-aligned reshapes concatenated — pure layout ops that XLA fuses,
    avoiding TPU's slow scalar gather path. Irregular hops fall back to a
    (static) gather."""
    C, N = data.shape
    if n_fft % hop == 0:
        k = n_fft // hop
        segs_needed = num_frames - 1 + k
        pad = segs_needed * hop - N
        x = jnp.pad(data, ((0, 0), (0, max(0, pad))))
        segs = x[:, : segs_needed * hop].reshape(C, segs_needed, hop)
        parts = [segs[:, i : i + num_frames, :] for i in range(k)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    )
    return data[:, idx]


def magnitude_spectrogram_reference(
    data: np.ndarray, n_fft: int = 1024, hop: int = 512
) -> np.ndarray:
    """NumPy reference implementation for tests."""
    C, N = data.shape
    num_frames = max(0, (N - n_fft) // hop + 1)
    window = np.hanning(n_fft).astype(np.float32)
    out = np.zeros((C, num_frames, n_fft // 2 + 1), dtype=np.float32)
    for f in range(num_frames):
        seg = data[:, f * hop : f * hop + n_fft] * window[None, :]
        out[:, f, :] = np.abs(np.fft.rfft(seg, axis=-1))
    return out
