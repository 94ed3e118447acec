"""Sharded pipeline ops: time-axis (sp) sharding with halo exchange and
batch (dp) sharding over tracks.

The polyphase resampler's receptive field is its tap span; sharding the time
axis therefore needs a halo exchange of tap-sized edges between neighbor
shards — ICI traffic via ``lax.ppermute`` under ``shard_map``, the moral
equivalent of the reference's frame hand-off between pipeline stages
(SURVEY.md §5.7/§5.8). With shard lengths aligned to the downsample stride M,
local outputs concatenate to the EXACT single-device result (tested on the
8-device CPU mesh in tests/test_sharding.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map as _shard_map_mod

shard_map = (
    _shard_map_mod if callable(_shard_map_mod)
    else _shard_map_mod.shard_map  # pre-0.8 module layout
)

from nodey_tpu.ops import resample as resample_ops


def _halo_exchange(x, left_halo: int, right_halo: int, axis_name: str):
    """Fetch tail/head slices from the previous/next shard along
    ``axis_name`` (time order = device order). Edge shards receive zeros,
    matching the zero padding of the unsharded op."""
    size = lax.axis_size(axis_name)
    left = jnp.zeros((x.shape[0], left_halo), x.dtype)
    right = jnp.zeros((x.shape[0], right_halo), x.dtype)
    if size > 1:
        if left_halo:
            # device i sends its tail to device i+1
            left = lax.ppermute(
                x[:, -left_halo:],
                axis_name,
                [(i, i + 1) for i in range(size - 1)],
            )
        if right_halo:
            # device i sends its head to device i-1
            right = lax.ppermute(
                x[:, :right_halo],
                axis_name,
                [(i + 1, i) for i in range(size - 1)],
            )
    return jnp.concatenate([left, x, right], axis=1)


def halo_exchange_nd(x, left_halo: int, right_halo: int, axis_name: str):
    """``_halo_exchange`` generalized to ``[..., N]`` (time axis last).

    Device i receives the previous shards' tails as its left halo and the
    next shards' heads as its right halo; edge shards receive zeros
    (matching the zero padding of the unsharded computation). Halos WIDER
    than one shard fetch from multiple neighbors — ceil(halo/N) ppermute
    hops each way (short clips sharded wide, or small-quantum graphs
    whose receptive-field halo exceeds the per-shard chunk; a one-hop
    exchange would silently clamp the slice and corrupt the window)."""
    size = lax.axis_size(axis_name)
    N = x.shape[-1]

    def from_left(hop: int, width: int):
        """The LAST ``width`` samples of shard (i - hop), zeros off-edge.
        Only the needed slice rides the interconnect."""
        seg = x[..., N - width :]
        if size <= hop:
            return jnp.zeros_like(seg)
        return lax.ppermute(
            seg, axis_name, [(i, i + hop) for i in range(size - hop)]
        )

    def from_right(hop: int, width: int):
        """The FIRST ``width`` samples of shard (i + hop), zeros off-edge."""
        seg = x[..., :width]
        if size <= hop:
            return jnp.zeros_like(seg)
        return lax.ppermute(
            seg, axis_name, [(i + hop, i) for i in range(size - hop)]
        )

    parts = []
    if left_halo:
        hops = -(-left_halo // N)
        # Farthest hop contributes only the remainder; nearer hops are
        # full shards (their every sample lands inside the halo).
        widths = [left_halo - (hops - 1) * N] + [N] * (hops - 1)
        parts.extend(
            from_left(h, w)
            for h, w in zip(range(hops, 0, -1), widths)
        )
    parts.append(x)
    if right_halo:
        hops = -(-right_halo // N)
        widths = [N] * (hops - 1) + [right_halo - (hops - 1) * N]
        parts.extend(
            from_right(h, w)
            for h, w in zip(range(1, hops + 1), widths)
        )
    return jnp.concatenate(parts, axis=-1)


def sharded_resample(
    mesh: Mesh,
    data,
    in_rate: int,
    out_rate: int,
    sp_axis: str = "sp",
    batch_axes: tuple = (),
):
    """Resample ``[..., C, N]`` with the time axis sharded over ``sp_axis``.

    N must be divisible by (M * sp) where L/M is the reduced ratio — callers
    pad to ``sharded_time_quantum`` first. Batched leading axes shard over
    ``batch_axes`` (dp). Exactness: local groups start at multiples of M, so
    concatenated local outputs equal the single-device polyphase output.
    """
    L, M = resample_ops._rational(in_rate, out_rate)
    taps = resample_ops._effective_taps(L, M, resample_ops.DEFAULT_TAPS)
    sp = mesh.shape[sp_axis]
    N = data.shape[-1]
    quant = M * resample_ops.group_factor(L, M) * sp
    if N % quant != 0:
        raise ValueError(
            f"time length {N} not divisible by M*group*sp={quant}"
        )

    left_halo = taps // 2 - 1
    # Last local group g_last reads window [g_last*M, g_last*M + W);
    # W = M + taps - 1, so the read extends taps - 1 past the shard end.
    right_halo = taps - 1

    batch_spec = [None] * (data.ndim - 2)
    for i, ax in enumerate(batch_axes):
        batch_spec[i] = ax
    spec_in = P(*batch_spec, None, sp_axis)
    spec_out = P(*batch_spec, None, sp_axis)

    def local_fn(x_local):
        # x_local: [..., C, N/sp]
        lead = x_local.shape[:-2]
        x2 = x_local.reshape((-1,) + x_local.shape[-2:])

        def one(x):
            ext = _halo_exchange(x, left_halo, right_halo, sp_axis)
            # Local patch-GEMM over the extended buffer; local group g reads
            # ext[:, g*M : g*M + W] == global window, since ext index 0 is
            # shard_start - (taps//2 - 1). Same kernel as the unsharded path
            # (resample_ops.apply_filter_bank) so outputs match exactly.
            Gl = x.shape[-1] // M
            W = M + taps - 1
            bank = jnp.asarray(
                resample_ops._design_filter_bank(
                    L, M, taps,
                    resample_ops.DEFAULT_BETA, resample_ops.DEFAULT_CUTOFF,
                )
            )
            return resample_ops.apply_filter_bank(ext, Gl, M, W, bank)

        y2 = jax.vmap(one)(x2)
        return y2.reshape(lead + y2.shape[-2:])

    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec_in,), out_specs=spec_out,
    )
    return fn(data)


def sharded_time_quantum(mesh: Mesh, in_rate: int, out_rate: int,
                         sp_axis: str = "sp") -> int:
    """Pad quantum that makes a time length valid for sharded_resample."""
    L, M = resample_ops._rational(in_rate, out_rate)
    # Shard boundaries must also respect the grouped GEMM's cycle-group
    # phase (resample.group_factor) for bitwise sharded == single-device.
    return M * resample_ops.group_factor(L, M) * mesh.shape[sp_axis]


def shard_batch(mesh: Mesh, array, dp_axis: str = "dp"):
    """Place a [B, ...] array with its batch dim sharded over ``dp_axis``."""
    spec = P(dp_axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))
