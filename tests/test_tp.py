"""Tensor parallelism — wide-axis (bin/sample) sharding of the reverb's
partitioned convolution (parallel/tp.py, SURVEY.md §2.6 TP row).

The TP decomposition adds no approximation (gathers only move data; pad
columns are exact zeros), but XLA's GEMM tiling order varies with shape,
so the contract is exact-modulo-reduction-order: >= 130 dB SNR and
f32-ulp max-abs vs ops.reverb.partitioned_conv (measured 135-138 dB at
tp in {2, 4, 8}). Runs on the 8-virtual-device CPU mesh (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nodey_tpu.ops import reverb as reverb_ops
from nodey_tpu.parallel import tp
from nodey_tpu.parallel.mesh import make_mesh


def _ir(rate, channels, decay_s=0.3):
    return reverb_ops.ir_partitions(rate, channels, decay_s, 5.0, 0.4)


@pytest.mark.parametrize("tp_size", [2, 4, 8])
def test_partitioned_conv_tp_ulp_exact(tp_size):
    rate = 48_000
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (0.3 * rng.standard_normal((2, rate))).astype(np.float32)
    )
    hr, hi, ln = _ir(rate, 2)
    out_len = x.shape[1] + ln - 1
    ref = np.asarray(
        reverb_ops.partitioned_conv(x, hr, hi, out_len)
    ).astype(np.float64)
    mesh = make_mesh({"tp": tp_size})
    got = np.asarray(
        tp.partitioned_conv_tp(x, hr, hi, out_len, mesh)
    ).astype(np.float64)
    err = ref - got
    snr = 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-300))
    assert snr >= 130.0, snr
    assert np.abs(err).max() <= 1e-6 * np.abs(ref).max()


def test_reverb_tp_matches_node_math():
    """reverb_tp reproduces the reverb node's wet/dry + tail-growth law
    to f32-ulp level (ops/reverb.reverb_stream)."""
    from nodey_tpu.core.stream import Stream

    rate = 48_000
    rng = np.random.default_rng(1)
    n = rate // 2
    x = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    decay_s, pre_ms, damping, wet, dry = 0.25, 4.0, 0.3, 0.35, 0.8

    stream = Stream(
        data=jnp.asarray(x), length=jnp.int32(n), rate=rate,
        channels=2, fmt="flt", t0_us=0.0,
    )
    ref = reverb_ops.reverb_stream(stream, decay_s, pre_ms, damping,
                                   wet, dry)
    ref_len = int(ref.length)
    ref_data = np.asarray(ref.data)[:, :ref_len].astype(np.float64)

    mesh = make_mesh({"tp": 4})
    got, got_len = tp.reverb_tp(
        jnp.asarray(x), rate, decay_s, pre_ms, damping, wet, dry, mesh
    )
    assert int(got_len) == ref_len
    gd = np.asarray(got)[:, :ref_len].astype(np.float64)
    err = ref_data - gd
    snr = 10 * np.log10(
        (ref_data ** 2).sum() / max((err ** 2).sum(), 1e-300)
    )
    assert snr >= 130.0, snr


def test_tp_rejects_non_divisor():
    mesh = make_mesh({"tp": 3})
    rng = np.random.default_rng(2)
    x = jnp.asarray(
        (0.1 * rng.standard_normal((1, 48_000))).astype(np.float32)
    )
    hr, hi, ln = _ir(48_000, 1)
    with pytest.raises(ValueError):
        tp.partitioned_conv_tp(x, hr, hi, x.shape[1] + ln - 1, mesh)
