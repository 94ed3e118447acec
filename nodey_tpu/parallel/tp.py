"""Tensor parallelism: wide-axis (filter/bin) sharding (SURVEY.md §2.6 TP).

The sp mesh (parallel/sharded.py) splits the TIME axis; TP splits the
WIDE axis of a single kernel — here the frequency-bin axis of the
convolution reverb's partitioned real-DFT convolution (ops/reverb.py),
the framework's FLOP-heaviest wide kernel (F = 4096, BINS = 2049,
K <= ~190 IR partitions).

Decomposition (all under one ``shard_map`` over the ``tp`` axis):

1. **Forward DFT** — the analysis bases [F, BINS] shard on their BIN
   columns; each device computes its bin slice of Xr/Xi with the exact
   per-column dot products of the single-device GEMM (bitwise).
2. **Frequency-domain delay line** — Hr/Hi shard on bins; the K shifted
   multiply-adds are per-bin elementwise: zero communication, bitwise.
3. **all_gather(tp)** of the locked Yr/Yi bin slices (the one ICI hop).
4. **Inverse DFT** — the stacked inverse basis [2*BINS, F] shards on its
   OUTPUT (time-sample) columns; each device computes its sample slice
   with the FULL gathered spectrum, so every output sample is the same
   single dot product over 2*BINS the unsharded GEMM computes (bitwise).
5. **all_gather(tp)** of the output sample slices.

Exactness contract: the decomposition adds NO approximation — steps 3/5
only move data and the zero pad columns contribute exact zeros — but the
per-shard GEMMs have different shapes than the unsharded ones
(BINS padded to a tp multiple; N-dim sliced), and XLA's dot tiling order
varies with shape, so the result is exact MODULO GEMM reduction-order
re-association: measured >= 135 dB SNR / max-abs ~3.6e-7 on a unit-peak
signal at tp in {2, 4, 8} (f32 ulp level; pinned in tests/test_tp.py on
the 8-device CPU mesh). Bitwise equality across different GEMM tilings
is not achievable on this backend; this is the same class of floor as
the streamed reverb's re-anchored hop grid (ops/reverb.py docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nodey_tpu.ops import reverb as reverb_ops
from nodey_tpu.parallel.ops import shard_map


def _padded_bins(tp: int) -> int:
    return -(-reverb_ops._BINS // tp) * tp


@functools.lru_cache(maxsize=8)
def _tp_mats(tp: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cos, -sin) forward bases zero-padded on the bin axis to a tp
    multiple, and the inverse basis zero-ROW-padded to match the gathered
    [2*BINS_pad] spectrum layout [Yr_pad | Yi_pad]."""
    cos_m, msin_m = reverb_ops._fwd_mats()
    bins_pad = _padded_bins(tp)
    pad = bins_pad - reverb_ops._BINS
    cos_p = np.pad(cos_m, ((0, 0), (0, pad)))
    msin_p = np.pad(msin_m, ((0, 0), (0, pad)))
    inv = reverb_ops._inv_mat()                       # [2*BINS, F]
    bins = reverb_ops._BINS
    inv_p = np.concatenate([
        np.pad(inv[:bins], ((0, pad), (0, 0))),       # Yr rows
        np.pad(inv[bins:], ((0, pad), (0, 0))),       # Yi rows
    ], axis=0)                                        # [2*bins_pad, F]
    return cos_p, msin_p, inv_p


def partitioned_conv_tp(x, hr: np.ndarray, hi: np.ndarray, out_len: int,
                        mesh: Mesh, axis: str = "tp"):
    """``ops.reverb.partitioned_conv`` with the bin/sample axes sharded
    over ``mesh[axis]``; bitwise-equal output (see module docstring).

    ``x`` [C, N] (replicated); ``hr``/``hi`` host constants [C, K, BINS].
    Returns the host-ready [C, out_len] device array (replicated)."""
    tp = mesh.shape[axis]
    P_SZ, F = reverb_ops.PARTITION, reverb_ops._F
    bins_pad = _padded_bins(tp)
    if F % tp:
        raise ValueError(f"tp={tp} must divide F={F}")
    cos_p, msin_p, inv_p = _tp_mats(tp)
    pad = bins_pad - reverb_ops._BINS
    hr_p = np.pad(np.asarray(hr), ((0, 0), (0, 0), (0, pad)))
    hi_p = np.pad(np.asarray(hi), ((0, 0), (0, 0), (0, pad)))

    c, n = x.shape
    k = hr_p.shape[1]
    t = -(-out_len // P_SZ)
    need = t * P_SZ
    if need > n:
        x = jnp.pad(x, ((0, 0), (0, need - n)))
    else:
        x = x[:, :need]

    local = functools.partial(_conv_local, axis=axis, k=k)

    seg = reverb_ops._segments(x)                     # [C, T, F]
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),                    # seg replicated
            P(None, axis),          # cos columns (bins)
            P(None, axis),          # -sin columns (bins)
            P(None, None, axis),    # Hr bins
            P(None, None, axis),    # Hi bins
            P(None, axis),          # inverse OUTPUT columns (samples)
        ),
        out_specs=P(),
        check_vma=False,
    )
    y = fn(
        seg,
        jnp.asarray(cos_p), jnp.asarray(msin_p),
        jnp.asarray(hr_p), jnp.asarray(hi_p),
        jnp.asarray(inv_p),
    )
    out = y[..., P_SZ:].reshape(c, t * P_SZ)
    return out[:, :out_len]


def _conv_local(seg, cos_l, msin_l, hr_l, hi_l, inv_l, *, axis, k):
    """Per-device body of the tp partitioned convolution (module-level so
    the dp x sp x tp composition, parallel/dp_sp_tp.py, reuses the exact
    same math under its own shard_map)."""
    # [C, T, F] x [F, bins_local]: this shard's bin columns (bitwise
    # per column vs the unsharded GEMM).
    xr = jnp.einsum(
        "ctf,fb->ctb", seg, cos_l,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    xi = jnp.einsum(
        "ctf,fb->ctb", seg, msin_l,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    yr = jnp.zeros_like(xr)
    yi = jnp.zeros_like(xi)
    for kk in range(k):
        if kk:
            sxr = jnp.pad(xr[:, :-kk], ((0, 0), (kk, 0), (0, 0)))
            sxi = jnp.pad(xi[:, :-kk], ((0, 0), (kk, 0), (0, 0)))
        else:
            sxr, sxi = xr, xi
        hrk = hr_l[:, kk][:, None, :]
        hik = hi_l[:, kk][:, None, :]
        yr = yr + sxr * hrk - sxi * hik
        yi = yi + sxr * hik + sxi * hrk
    # One ICI hop: gather every shard's bin slice -> full spectrum.
    yr_full = lax.all_gather(yr, axis, axis=2, tiled=True)
    yi_full = lax.all_gather(yi, axis, axis=2, tiled=True)
    # Inverse: this shard's OUTPUT sample columns, full-spectrum dot
    # (same reduction order as the unsharded GEMM -> bitwise).
    y_loc = jnp.einsum(
        "ctb,bf->ctf",
        jnp.concatenate([yr_full, yi_full], axis=-1), inv_l,
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return lax.all_gather(y_loc, axis, axis=2, tiled=True)


def reverb_tp(x, rate: int, decay_s: float, pre_delay_ms: float,
              damping: float, wet: float, dry: float,
              mesh: Mesh, axis: str = "tp"):
    """The reverb node's wet/dry law (ops/reverb.reverb_stream:216-245,
    tail growth included) with the convolution tensor-parallel over
    ``mesh[axis]``; bitwise vs the single-device node math."""
    channels, n = x.shape
    hr, hi, _ln = reverb_ops.ir_partitions(
        rate, channels, float(decay_s), float(pre_delay_ms),
        float(damping),
    )
    ln_total = reverb_ops.ir_length(rate, decay_s, pre_delay_ms)
    cap_out = n + -(-ln_total // reverb_ops.PARTITION) \
        * reverb_ops.PARTITION
    wetpath = partitioned_conv_tp(x, hr, hi, cap_out, mesh, axis)
    drypath = jnp.pad(x, ((0, 0), (0, cap_out - n)))
    return (jnp.float32(dry) * drypath + jnp.float32(wet) * wetpath,
            n + ln_total - 1)
