"""dp x sp x tp composed in ONE jitted step (SURVEY.md §2.6 checklist).

Each parallelism axis is proven alone elsewhere — dp/sp by
``parallel/sharded.py`` (batch of clips x time shards with ppermute
halos), tp by ``parallel/tp.py`` (the reverb convolution's bin/sample
columns). This module composes all three over a single 3-axis
``jax.sharding.Mesh``:

1. **Stage 1 (dp x sp)** — the user's validated flagship DAG
   (audio_input -> gain -> amix-with-44.1->48k-polyphase -> spectrum ->
   audio_output) runs under ``compile_graph_sharded``'s shard_map: the
   clip batch shards over ``dp``, the sample axis over ``sp`` with
   halo exchange, replicated over ``tp``.
2. **Resharding hop** — the master [B, C, T] leaves stage 1 sharded
   (dp, -, sp) and enters stage 2 as (dp, -, -): XLA inserts the
   all_gather over ``sp`` on ICI. This is the inter-stage collective a
   real 3D-parallel deployment pays.
3. **Stage 2 (dp x tp)** — a convolution-reverb master-bus tail
   (ops/reverb.py partitioned real-DFT convolution, the node math of
   ``audio_reverb``): batch stays dp-sharded, the DFT bin / output
   sample columns shard over ``tp`` with the exact per-column GEMMs of
   ``parallel/tp.py`` (same ``_conv_local`` body).

Exactness contract: stage 1 is bitwise vs the single-device program
(tests/test_sharded_graph.py); stage 2 is exact modulo GEMM
reduction-order (>= 130 dB SNR, f32-ulp max-abs — tests/test_tp.py).
The composition therefore matches the single-device pipeline
(compiler.compile_graph -> ops.reverb.partitioned_conv) at f32-ulp
level, asserted in tests/test_dp_sp_tp.py and exercised as
``dryrun_multichip`` phase 6.

Reference analog: the reference runs one fiber per node on one desktop
thread (src/infra/runner.cpp:65-140); this is what the same DAG looks
like spread over a TPU pod slice's batch, time, and width axes at once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nodey_tpu.core import compiler
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import reverb as reverb_ops
from nodey_tpu.parallel import sharded, tp as tp_mod
from nodey_tpu.parallel.ops import shard_map


@dataclasses.dataclass
class DpSpTpCompiled:
    """The composed program plus the geometry needed to feed/check it."""

    fn: Any                       # jitted step: args -> (out [B,C,cap_out], glen [B])
    mesh: Mesh
    stage1: sharded.ShardedCompiledGraph
    cap_master: int               # stage-1 master capacity (per clip)
    cap_out: int                  # reverb output capacity (per clip)
    out_rate: int
    ir_len: int
    dp_axis: str

    def run(self, arrays: Dict[str, np.ndarray],
            lengths: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
        args = {}
        for key in self.stage1.input_keys:
            data = jnp.asarray(arrays[key])
            length = jnp.asarray(lengths[key], dtype=jnp.int32)
            dspec, lspec = self.stage1._arg_specs(data.ndim)
            args[key] = (
                jax.device_put(data, NamedSharding(self.mesh, dspec)),
                jax.device_put(length, NamedSharding(self.mesh, lspec)),
            )
        out, glen = self.fn(args)
        return np.asarray(out), np.asarray(glen)


def compile_flagship_reverb_dpsptp(
    graph: Graph,
    sources: Dict[Tuple[int, str], compiler.SourceSpec],
    mesh: Mesh,
    *,
    decay_s: float = 0.25,
    pre_delay_ms: float = 4.0,
    damping: float = 0.3,
    wet: float = 0.35,
    dry: float = 0.8,
    dp_axis: str = "dp",
    sp_axis: str = "sp",
    tp_axis: str = "tp",
    halo_seconds: float = 0.25,
) -> DpSpTpCompiled:
    """Compile ``graph`` for dp x sp execution and append a tp-sharded
    reverb master-bus tail, all inside one ``jax.jit``."""
    for axis in (dp_axis, sp_axis, tp_axis):
        if axis not in mesh.shape:
            raise ValueError(f"mesh must carry a '{axis}' axis")
    prog = sharded.compile_graph_sharded(
        graph, sources, mesh, mode="export", sp_axis=sp_axis,
        dp_axis=dp_axis, halo_seconds=halo_seconds, jit=False,
    )
    meta = prog.output_meta["master"]
    out_rate = int(meta["rate"])
    channels = int(meta.get("channels", 2))
    plan = prog.plan
    cap_master = plan.sp * plan.chunk * out_rate // plan.in_rate

    # Reverb geometry (mirrors tp.reverb_tp / ops.reverb.reverb_stream).
    tp_size = mesh.shape[tp_axis]
    hr, hi, _ln = reverb_ops.ir_partitions(
        out_rate, channels, float(decay_s), float(pre_delay_ms),
        float(damping),
    )
    ir_len = reverb_ops.ir_length(out_rate, decay_s, pre_delay_ms)
    p_sz = reverb_ops.PARTITION
    cap_out = cap_master + -(-ir_len // p_sz) * p_sz
    t = -(-cap_out // p_sz)
    need = t * p_sz
    k = hr.shape[1]
    cos_p, msin_p, inv_p = tp_mod._tp_mats(tp_size)
    pad = tp_mod._padded_bins(tp_size) - reverb_ops._BINS
    hr_p = np.pad(np.asarray(hr), ((0, 0), (0, 0), (0, pad)))
    hi_p = np.pad(np.asarray(hi), ((0, 0), (0, 0), (0, pad)))

    def conv_body(seg, cos_l, msin_l, hr_l, hi_l, inv_l):
        # seg [B_loc, C, T, F]: vmap the exact tp conv body over the
        # local batch slice — tp collectives run under the vmap.
        return jax.vmap(
            lambda s: tp_mod._conv_local(
                s, cos_l, msin_l, hr_l, hi_l, inv_l, axis=tp_axis, k=k
            )
        )(seg)

    conv = shard_map(
        conv_body,
        mesh=mesh,
        in_specs=(
            P(dp_axis, None, None, None),   # seg: batch over dp
            P(None, tp_axis),               # cos columns (bins)
            P(None, tp_axis),               # -sin columns (bins)
            P(None, None, tp_axis),         # Hr bins
            P(None, None, tp_axis),         # Hi bins
            P(None, tp_axis),               # inverse OUTPUT columns
        ),
        out_specs=P(dp_axis, None, None, None),
        check_vma=False,
    )
    consts = tuple(
        jnp.asarray(a) for a in (cos_p, msin_p, hr_p, hi_p, inv_p)
    )

    def step(args):
        outs = prog.fn(args)                  # shard_map #1: (dp, sp)
        master, glen = outs["master"]         # [B, C, cap_master], [B]
        # Mask past each clip's valid length so the reverb tail is fed
        # the same zeros the single-device composition feeds it.
        idx = jnp.arange(cap_master, dtype=jnp.int32)
        master = jnp.where(
            idx[None, None, :] < glen[:, None, None], master, 0.0
        )
        x = jnp.pad(master, ((0, 0), (0, 0), (0, need - cap_master)))
        seg = jax.vmap(reverb_ops._segments)(x)     # [B, C, T, F]
        y = conv(seg, *consts)                # shard_map #2: (dp, tp)
        wetp = y[..., p_sz:].reshape(
            x.shape[0], channels, t * p_sz
        )[..., :cap_out]
        dryp = jnp.pad(
            master, ((0, 0), (0, 0), (0, cap_out - cap_master))
        )
        out = jnp.float32(dry) * dryp + jnp.float32(wet) * wetp
        return out, glen + jnp.int32(ir_len - 1)

    return DpSpTpCompiled(
        fn=jax.jit(step), mesh=mesh, stage1=prog,
        cap_master=cap_master, cap_out=cap_out, out_rate=out_rate,
        ir_len=ir_len, dp_axis=dp_axis,
    )


def reference_pipeline(
    graph: Graph,
    sources: Dict[Tuple[int, str], compiler.SourceSpec],
    arrays: Dict[str, np.ndarray],
    lengths: Dict[str, int],
    cap_master: int,
    cap_out: int,
    out_rate: int,
    *,
    decay_s: float = 0.25,
    pre_delay_ms: float = 4.0,
    damping: float = 0.3,
    wet: float = 0.35,
    dry: float = 0.8,
) -> Tuple[np.ndarray, int]:
    """Single-device composition of the same pipeline for ONE clip:
    the unsharded fused graph program -> masked master ->
    ops.reverb.partitioned_conv -> the same wet/dry law."""
    channels = next(iter(sources.values())).channels
    caps = {
        k: dataclasses.replace(spec, capacity=arrays[
            compiler.external_key(*k)
        ].shape[-1])
        for k, spec in sources.items()
    }
    inner = compiler.compile_graph(graph, caps, mode="export")
    args = {
        key: (jnp.asarray(arrays[key]), jnp.int32(lengths[key]))
        for key in inner.input_keys
    }
    out = inner.fn(args)
    master, glen = out["master"]
    master = np.array(master)[:, :cap_master]
    glen = int(glen)
    master[:, glen:] = 0.0

    hr, hi, _ln = reverb_ops.ir_partitions(
        out_rate, channels, float(decay_s), float(pre_delay_ms),
        float(damping),
    )
    ir_len = reverb_ops.ir_length(out_rate, decay_s, pre_delay_ms)
    wetp = np.asarray(
        reverb_ops.partitioned_conv(
            jnp.asarray(master), hr, hi, cap_out
        )
    )[:, :cap_out]
    dryp = np.pad(master, ((0, 0), (0, cap_out - cap_master)))
    return (
        np.float32(dry) * dryp + np.float32(wet) * wetp,
        glen + ir_len - 1,
    )
