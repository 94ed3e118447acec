"""STFT magnitude spectrogram (the FFTW promise the reference never shipped;
reference: README.md:28, xmake.lua:15 — zero call sites).

Device-side ``jnp.fft.rfft`` over Hann-windowed frames: framing is a reshape
of a strided slice (static hop), the FFT batches over all frames at once —
one large batched FFT instead of FFTW's per-frame plans.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from nodey_tpu.core.stream import Stream

# Matmul precision for the DFT GEMMs. HIGHEST is bitwise f32 semantics
# on this backend (the silent default is single-pass bf16, ~53 dB —
# ROUND4.md §10). NODEY_STFT_PRECISION=high opts the spectrum DISPLAY
# path into 3-pass bf16 (~99 dB, far beyond display needs) for
# throughput-first deployments; the default stays exact because the
# audio_spectrum node's output is a tested product, not just pixels.
STFT_PRECISION = (
    jax.lax.Precision.HIGH
    if os.environ.get("NODEY_STFT_PRECISION") == "high"
    else jax.lax.Precision.HIGHEST
)


@functools.lru_cache(maxsize=8)
def _dft_matrices(n_fft: int):
    """Real-DFT basis [n_fft, n_fft//2+1] (cos, -sin), float32.

    On TPU an explicit DFT matmul rides the MXU and beats the generic FFT
    lowering for the frame sizes a spectrogram uses (n_fft <= 4096):
    frames x basis is one [F, n_fft] x [n_fft, bins] GEMM per part.
    """
    k = np.arange(n_fft)[:, None] * np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k / n_fft
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


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
    if num_frames == 0:
        return jnp.zeros((C, 0, n_fft // 2 + 1), dtype=jnp.float32)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    frames = _frame(data, num_frames, n_fft, hop)  # [C, F, n_fft]
    windowed = frames * window[None, None, :]
    if use_matmul and n_fft <= 4096:
        cos_m, sin_m = _dft_matrices(n_fft)
        # Explicit HIGHEST: the TPU backend's default matmul precision is
        # single-pass bf16 (~53 dB vs f32, measured on-chip — ROUND4.md
        # §10), which would put silent bf16 noise across the whole
        # spectrum display and the audio_spectrum node's tested output.
        # HIGHEST is bitwise-equal to f32 semantics on this backend.
        re = jnp.einsum(
            "cfn,nk->cfk", windowed, jnp.asarray(cos_m),
            preferred_element_type=jnp.float32,
            precision=STFT_PRECISION,
        )
        im = jnp.einsum(
            "cfn,nk->cfk", windowed, jnp.asarray(sin_m),
            preferred_element_type=jnp.float32,
            precision=STFT_PRECISION,
        )
        return jnp.sqrt(re * re + im * im)
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
