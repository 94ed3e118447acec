"""Sequence-parallel (sp) execution of TIME-VARIANT processing chains.

Round-1 left one honest restriction on the mesh runtime: graphs containing
velocity/pitch stages could ride it only as whole clips over dp
(parallel/sharded.compile_graph_dp), because WSOLA's serial splice chain
(/root/reference/src/processor/audio-velocity.cpp:384-457) makes the
SAMPLE axis unshardable.  The phase-vocoder tempo stage (ops/pv.py,
selectable per node via ``algorithm="pv"``) removes that obstruction: its
only cross-frame coupling is an associative phasor prefix, which
parallel/pv_sharded.py shards over the mesh with a log-depth ``ppermute``
scan.  This module composes that stage with the LTI stage algebra so a
whole velocity/pitch CHAIN — the config-4 benchmark shape
(resample -> pitch -> velocity) — runs time-sharded across devices.

Composition model: one ``shard_map`` body chains per-stage local steps,
each mapping (local chunk [C, c_in], global length) -> (local chunk
[C, c_out], global length):

* **gain** (audio_vol, flt) — elementwise, no communication;
* **resample** (audio_resample / transposition) — ``halo_exchange_nd``
  fetches the polyphase receptive field (left = bank left-pad, right =
  W - M), then the SAME patch-GEMM kernel as the offline path
  (ops/resample.apply_filter_bank) evaluates this shard's output groups
  at their global phase: per-shard chunks are aligned to M * group_factor
  so local cycle 0 sits on a global group boundary and concatenated
  shard outputs equal the single-device program;
* **pv tempo** (velocity/pitch with ``algorithm="pv"``) —
  parallel/pv_sharded.pv_sharded_local_step: frames split evenly over
  shards, cross-shard synthesis-phasor prefix via ppermute doubling, OLA
  tail handoff to the right neighbor;
* **limiter** (audio_limiter) — ops/dynamics.limiter_sharded_local: the
  max-plus envelope recurrence is associative too, so each shard scans its
  chunk locally and a log-depth ``ppermute`` doubling forms the exclusive
  cross-shard max-plus prefix (ONE scalar per shard rides ICI per step —
  the streaming carry evaluated spatially). Length/rate-preserving, so it
  imposes no alignment on the planner;
* **compressor** (audio_compressor) —
  ops/dynamics.compressor_sharded_local: the same move twice — the
  max-plus release prefix plus an affine doubling for the one-pole attack
  smoother (its per-step weight alpha^(d*chunk) is static, so again only
  one scalar per shard rides ICI). Length/rate-preserving;
* **gate** (audio_gate) — ops/dynamics.gate_sharded_local: the
  compressor's spatialized detector with the gate's static expansion
  curve. Length/rate-preserving;
* **tremolo / chorus** (audio_tremolo, audio_chorus) —
  ops/modfx.{tremolo,chorus}_sharded_local: ANALYTIC time variance —
  the LFO phase at global sample t is an exact modular-integer residue
  each shard derives from its axis offset, so the tremolo needs zero
  communication and the chorus only a finite-receptive-field halo
  exchange. Length/rate-preserving;
* **EQ / filter** (audio_eq, audio_filter) —
  ops/biquad.cascade_sharded_local: IIR sections (infinite impulse
  response — overlap-discard can never be exact) run their first-order
  scans locally and cross shards via exact AR(1) state prefixes with
  static pole-power weights. Length/rate-preserving.

Alignment planning runs BACKWARD through the chain: each resample stage
requires its input chunk divisible by M * lcm(R, req/gcd(L, req)) where
``req`` is everything downstream's requirement; a PV stage ABSORBS the
downstream requirement into its free K_per parameter (its output chunk is
K_per * hop with K_per rounded up — plan_pv_sharded(k_per_align=...)) and
resets ``req`` to 1 for its input side.  The forward pass then fixes
chunk sizes and the input capacity (``sp * c0``).

Agreement contract vs the single-device compiled graph
(core/compiler.compile_graph over the same nodes): LTI stages reproduce
the offline dot products at the same global phases (exact within a
program; last-ulp across program shapes — the standing grouped-GEMM
caveat, ops/resample.apply_filter_bank); a single PV stage agrees up to
f32 re-association of the phasor products (>= ~70 dB,
tests/test_pv_sharded).  Chains with TWO PV stages agree only to ~50 dB
— NOT a sharding defect: the phase vocoder's instantaneous-frequency
estimate (arctan2 of near-zero bins) is chaotic, and a controlled
experiment on the offline path alone shows a 96.7 dB input perturbation
to the second stage already costs 52 dB of output agreement (49 dB with
lock=False, so peak-pick flips are not the driver; tests/test_tv_sharded
docstring records the numbers).
WSOLA-algorithm nodes are rejected with a pointer to compile_graph_dp —
that serialization is a measured property of the algorithm, not a gap
(ROUND4.md config-4 proof).
"""

from __future__ import annotations

import dataclasses
import fractions
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nodey_tpu.core import compiler
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import pv as pv_ops
from nodey_tpu.ops import resample as resample_ops
from nodey_tpu.parallel.ops import halo_exchange_nd, shard_map
from nodey_tpu.parallel.pv_sharded import (
    PvShardPlan,
    plan_pv_sharded,
    pv_sharded_local_step,
)


# -- stage descriptors ------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _GainStage:
    volume: float


@dataclasses.dataclass
class _ResampleStage:
    """One polyphase stage: either an audio_resample node (law = the
    Stream length law, rate changes) or a SoundTouch transposition
    (nominal rate unchanged, transpose_rate's ceil law on the UNREDUCED
    num/den pair — mirrored exactly so lengths match the offline trace)."""

    L: int
    M: int
    W: int
    left: int
    R: int
    bank: np.ndarray
    law_num: int          # length law: ceil(length * law_den / law_num)
    law_den: int
    rate_out: int         # nominal rate after this stage


@dataclasses.dataclass(frozen=True)
class _LimiterStage:
    """audio_limiter: length/rate-preserving, but NOT LTI (the envelope is
    a max-plus recurrence) — it shards via the cross-shard max-plus prefix
    (ops/dynamics.limiter_sharded_local), the same spatialized-carry move
    the PV stage makes for its phasor chain."""

    threshold: float
    c: float


@dataclasses.dataclass(frozen=True)
class _CompressorStage:
    """audio_compressor: like the limiter but with TWO cross-shard
    prefixes (max-plus release + affine attack smoother,
    ops/dynamics.compressor_sharded_local)."""

    params: Any


@dataclasses.dataclass(frozen=True)
class _DeesserStage:
    """audio_deesser: split-band compressor — the exact sharded band
    (biquad.cascade_sharded_local) feeding the spatialized detector
    (ops/dynamics.deesser_sharded_local)."""

    sections: Tuple[Any, ...]
    params: Any


@dataclasses.dataclass(frozen=True)
class _TremoloStage:
    """audio_tremolo: analytic time variance — the LFO gain at sample t
    is a pure function of the global index, which each shard derives
    from its axis offset (ops/modfx.tremolo_sharded_local). ZERO
    communication. Length/rate-preserving."""

    rate_hz: float
    depth: float
    sample_rate: int


@dataclasses.dataclass(frozen=True)
class _ChorusStage:
    """audio_chorus: LFO-modulated FIR delay — finite receptive field
    via halo exchange plus the same shard-offset phase derivation
    (ops/modfx.chorus_sharded_local). Length/rate-preserving."""

    rate_hz: float
    base_ms: float
    depth_ms: float
    voices: int
    wet: float
    dry: float
    sample_rate: int


@dataclasses.dataclass(frozen=True)
class _PhaserStage:
    """audio_phaser: swept-allpass cascade — time-varying-pole scans
    whose per-stage state crosses shards via a log2(sp) ppermute
    doubling of DYNAMIC affine summaries, plus a one-sample left halo
    per stage (ops/phaser.phaser_sharded_local).
    Length/rate-preserving."""

    rate_hz: float
    f_min_hz: float
    f_max_hz: float
    stages: int
    wet: float
    dry: float
    sample_rate: int


@dataclasses.dataclass(frozen=True)
class _PanStage:
    """audio_pan: memoryless per-channel gain (ops/fadepan.pan_array) —
    zero communication; may widen mono to stereo."""

    pan: float


@dataclasses.dataclass(frozen=True)
class _WidthStage:
    """audio_width: memoryless mid/side channel matrix
    (ops/fadepan.width_array) — zero communication."""

    width: float


@dataclasses.dataclass(frozen=True)
class _FadeStage:
    """audio_fade: analytic time variance — the envelope gain at sample
    t is a pure function of the global index, derived from the shard's
    axis offset (ops/fadepan.fade_sharded_local). ZERO communication."""

    spec: Any


@dataclasses.dataclass(frozen=True)
class _GateStage:
    """audio_gate: the compressor's spatialized two-prefix detector with
    the gate's static curve (ops/dynamics.gate_sharded_local)."""

    params: Any


@dataclasses.dataclass(frozen=True)
class _BiquadStage:
    """audio_eq / audio_filter: IIR sections (infinite impulse response,
    so overlap-discard can never be exact) shard via exact cross-shard
    state prefixes — first-order scalar doublings with static pole-power
    weights (ops/biquad.cascade_sharded_local)."""

    sections: Tuple[Any, ...]


@dataclasses.dataclass
class _PvStage:
    tempo: float
    rate: int
    transient: bool = False              # onset phase reset (ops/pv.py)
    formant_ratio: float = 1.0           # envelope pre-warp (ops/pv.py)
    plan: Optional[PvShardPlan] = None   # filled by the forward pass


_EPS = 1e-9


# -- chain extraction -------------------------------------------------------


def _linear_chain(graph: Graph) -> List[int]:
    """Topological node list of a single linear chain
    input -> ... -> output; raises for any other shape."""
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput

    starts = [
        nid for nid, n in graph.nodes.items()
        if isinstance(n.processor, AudioInput)
    ]
    if len(starts) != 1:
        raise ProcessorRuntimeError(
            "Chain sharding needs exactly one input node",
            "compile_chain_sp_tv shards linear chains; multi-input graphs "
            "run via compile_graph_sharded (LTI) or compile_graph_dp.",
            f"found {len(starts)} audio_input nodes",
        )
    succ: Dict[int, List[int]] = {}
    for link in graph.links.values():
        a = graph.pins[link.from_pin].parent
        b = graph.pins[link.to_pin].parent
        succ.setdefault(a, []).append(b)

    order = [starts[0]]
    seen = {starts[0]}
    while True:
        nxt = succ.get(order[-1], [])
        if not nxt:
            break
        if len(nxt) != 1 or nxt[0] in seen:
            raise ProcessorRuntimeError(
                "Graph is not a linear chain",
                "compile_chain_sp_tv shards single-path chains only; "
                "fan-out/fan-in graphs run via compile_graph_sharded or "
                "compile_graph_dp.",
                f"node {order[-1]} has successors {sorted(nxt)}",
            )
        order.append(nxt[0])
        seen.add(nxt[0])
    if not isinstance(graph.nodes[order[-1]].processor, AudioOutput):
        raise ProcessorRuntimeError(
            "Chain does not terminate in an audio output",
            "The last node of the chain must be audio_output.",
            f"terminal node {order[-1]}",
        )
    return order


def _resample_stage(in_rate: int, out_rate: int, law_num: int,
                    law_den: int, nominal_rate: int) -> _ResampleStage:
    L, M = resample_ops._rational(in_rate, out_rate)
    bank_np, left, W = resample_ops.bank_spec(in_rate, out_rate, None)
    return _ResampleStage(
        L=L, M=M, W=W, left=left, R=resample_ops.group_factor(L, M),
        bank=bank_np, law_num=law_num, law_den=law_den,
        rate_out=nominal_rate,
    )


def _extract_stages(graph: Graph, rate: int) -> Tuple[List[Any], int]:
    """Map chain nodes to stage descriptors; returns (stages, out_rate)."""
    from nodey_tpu.processors.audio_vol import AudioVol
    from nodey_tpu.processors.compressor import AudioCompressor
    from nodey_tpu.processors.equalizer import AudioEq, AudioFilter
    from nodey_tpu.processors.deesser import AudioDeesser
    from nodey_tpu.processors.gate import AudioGate
    from nodey_tpu.processors.modulation import (
        AudioChorus,
        AudioPhaser,
        AudioTremolo,
    )
    from nodey_tpu.processors.pan import AudioPan, AudioWidth
    from nodey_tpu.processors.fade import AudioFade
    from nodey_tpu.processors.limiter import AudioLimiter
    from nodey_tpu.processors.resample_node import AudioResample
    from nodey_tpu.processors.velocity import (
        PitchModifier,
        VelocityModifier,
    )
    from nodey_tpu.ops import dynamics as dynamics_ops
    from nodey_tpu.ops.stretch import _rational_factor

    order = _linear_chain(graph)
    stages: List[Any] = []
    for nid in order[1:-1]:
        proc = graph.nodes[nid].processor
        if isinstance(proc, AudioVol):
            stages.append(_GainStage(volume=float(proc.volume)))
        elif isinstance(proc, AudioLimiter):
            threshold, c = dynamics_ops.limiter_params(
                float(proc.threshold_db), float(proc.release_ms), rate
            )
            stages.append(_LimiterStage(threshold=threshold, c=c))
        elif isinstance(proc, AudioCompressor):
            stages.append(_CompressorStage(
                params=dynamics_ops.compressor_params(
                    proc.threshold_db, proc.ratio, proc.knee_db,
                    proc.attack_ms, proc.release_ms, proc.makeup_db,
                    rate,
                )
            ))
        elif isinstance(proc, AudioDeesser):
            sections, params = proc._pieces(rate)
            stages.append(_DeesserStage(
                sections=tuple(sections), params=params,
            ))
        elif isinstance(proc, AudioTremolo):
            if proc.depth > 0.0:               # depth 0 = passthrough
                stages.append(_TremoloStage(
                    rate_hz=float(proc.rate_hz),
                    depth=float(proc.depth), sample_rate=rate,
                ))
        elif isinstance(proc, AudioChorus):
            if not (proc.wet == 0.0 and proc.dry == 1.0):
                stages.append(_ChorusStage(
                    rate_hz=float(proc.rate_hz),
                    base_ms=float(proc.base_ms),
                    depth_ms=float(proc.depth_ms),
                    voices=int(proc.voices), wet=float(proc.wet),
                    dry=float(proc.dry), sample_rate=rate,
                ))
        elif isinstance(proc, AudioPhaser):
            if not proc._is_noop:
                stages.append(_PhaserStage(
                    rate_hz=float(proc.rate_hz),
                    f_min_hz=float(proc.f_min_hz),
                    f_max_hz=float(proc.f_max_hz),
                    stages=int(proc.stages), wet=float(proc.wet),
                    dry=float(proc.dry), sample_rate=rate,
                ))
        elif isinstance(proc, AudioPan):
            stages.append(_PanStage(pan=float(proc.pan)))
        elif isinstance(proc, AudioWidth):
            if float(proc.width) != 1.0:       # width 1 = passthrough
                stages.append(_WidthStage(width=float(proc.width)))
        elif isinstance(proc, AudioFade):
            fspec = proc._spec(rate)
            if not fspec.is_noop:
                stages.append(_FadeStage(spec=fspec))
        elif isinstance(proc, AudioGate):
            stages.append(_GateStage(
                params=dynamics_ops.gate_params(
                    proc.threshold_db, proc.ratio, proc.range_db,
                    proc.attack_ms, proc.release_ms, rate,
                )
            ))
        elif isinstance(proc, (AudioEq, AudioFilter)):
            sections = proc._sections(rate)
            if sections:                    # all-flat EQ = passthrough
                stages.append(_BiquadStage(sections=tuple(sections)))
        elif isinstance(proc, AudioResample):
            target = int(proc.target_rate)
            if target == rate:
                continue
            L, M = resample_ops._rational(rate, target)
            # Stream law: ceil(length * L / M) — resample_ops._out_length.
            stages.append(_resample_stage(rate, target, M, L, target))
            rate = target
        elif isinstance(proc, (VelocityModifier, PitchModifier)):
            if isinstance(proc, VelocityModifier):
                st_rate = float(proc.velocity)
                st_pitch = (1.0 / st_rate) if proc.keep_pitch else 1.0
            else:
                st_rate = 1.0
                st_pitch = 2.0 ** (float(proc.pitch) / 12.0)
            eff_tempo = 1.0 / st_pitch
            eff_rate = st_rate * st_pitch
            if abs(eff_tempo - 1.0) > _EPS:
                if getattr(proc, "algorithm", "wsola") != "pv":
                    raise ProcessorRuntimeError(
                        "WSOLA tempo stages cannot shard the sample axis",
                        "The WSOLA splice chain is serial by construction "
                        "(ROUND4.md config-4 proof); set the node's "
                        "algorithm to 'pv' for sequence-parallel "
                        "execution, or run the graph via compile_graph_dp.",
                        f"node {nid}",
                    )
                stages.append(_PvStage(
                    tempo=eff_tempo, rate=rate,
                    transient=bool(getattr(proc, "pv_transient", False)),
                    formant_ratio=(
                        eff_rate
                        if getattr(proc, "preserve_formants", False)
                        else 1.0
                    ),
                ))
            if abs(eff_rate - 1.0) > _EPS:
                num, den = _rational_factor(eff_rate)
                # transpose_rate's law: ceil(length * den / num) on the
                # UNREDUCED pair; nominal rate does not change.
                stages.append(
                    _resample_stage(num, den, num, den, rate)
                )
        else:
            raise ProcessorRuntimeError(
                "Unsupported node in sharded chain",
                "compile_chain_sp_tv supports audio_vol, audio_limiter, "
                "audio_compressor, audio_deesser, audio_gate, "
                "audio_tremolo, "
                "audio_chorus, audio_phaser, audio_pan, audio_width, "
                "audio_fade, audio_eq, audio_filter, audio_resample and "
                "velocity/pitch (algorithm='pv') between input and "
                "output.",
                f"node {nid}: {type(proc).__name__}",
            )
    return stages, rate


# -- planning ---------------------------------------------------------------


@dataclasses.dataclass
class ChainPlan:
    stages: List[Any]
    sp: int
    in_rate: int
    out_rate: int
    capacity: int         # global input capacity (sp * chunk_in)
    chunk_in: int
    chunk_out: int

    @property
    def out_capacity(self) -> int:
        return self.sp * self.chunk_out


def plan_chain(graph: Graph, rate: int, max_length: int, mesh: Mesh,
               sp_axis: str = "sp") -> ChainPlan:
    """Backward alignment pass + forward size pass over the chain."""
    sp = int(mesh.shape[sp_axis])
    stages, out_rate = _extract_stages(graph, rate)

    # Backward: required divisor of each stage's INPUT chunk. PV stages
    # absorb the downstream requirement into k_per and reset it.
    req = 1
    pv_aligns: Dict[int, int] = {}
    for i in range(len(stages) - 1, -1, -1):
        st = stages[i]
        if isinstance(st, _ResampleStage):
            t_req = req // math.gcd(st.L, req)
            req = st.M * (st.R * t_req // math.gcd(st.R, t_req))
        elif isinstance(st, _PvStage):
            _, hop = pv_ops.pv_params(st.rate)
            pv_aligns[i] = req // math.gcd(hop, req)
            req = 1

    chunk_in = -(-max(max_length, 1) // sp)
    chunk_in = -(-chunk_in // req) * req
    capacity = sp * chunk_in

    # Forward: fix chunk sizes and PV plans.
    c = chunk_in
    for i, st in enumerate(stages):
        if isinstance(st, _ResampleStage):
            assert c % st.M == 0, (c, st.M)
            c = c * st.L // st.M
        elif isinstance(st, _PvStage):
            st.plan = plan_pv_sharded(
                st.tempo, st.rate, sp * c, sp,
                k_per_align=max(pv_aligns.get(i, 1), 1),
            )
            c = st.plan.out_chunk
    return ChainPlan(
        stages=stages, sp=sp, in_rate=rate, out_rate=out_rate,
        capacity=capacity, chunk_in=chunk_in, chunk_out=c,
    )


# -- local steps ------------------------------------------------------------


def _resample_local(st: _ResampleStage, x, length, axis_name: str):
    """This shard's output groups of the global polyphase program."""
    c = x.shape[-1]
    ext = halo_exchange_nd(x, st.left, st.W - st.M, axis_name)
    gl = c // st.M
    y = resample_ops.apply_filter_bank(
        ext, gl, st.M, st.W, jnp.asarray(st.bank)
    )                                     # [C, gl * L]
    out_len = (length // st.law_num) * st.law_den + (
        (length % st.law_num) * st.law_den + st.law_num - 1
    ) // st.law_num
    idx0 = lax.axis_index(axis_name) * (gl * st.L)
    mask = (idx0 + jnp.arange(gl * st.L, dtype=jnp.int32))[None, :] < out_len
    return jnp.where(mask, y, 0.0), out_len


@dataclasses.dataclass
class TvShardedChain:
    """A time-variant chain compiled for sp execution on a mesh."""

    fn: Any
    mesh: Mesh
    plan: ChainPlan
    input_key: str
    sp_axis: str

    def run(self, data: np.ndarray, length: int):
        """Execute [C, n] (auto-padded to the plan capacity); returns
        (out [C, out_capacity] numpy, out_length int)."""
        cap = self.plan.capacity
        if data.shape[-1] > cap:
            raise ProcessorRuntimeError(
                "Clip exceeds planned capacity",
                "Re-plan the chain with a larger max_length.",
                f"{data.shape[-1]} > {cap}",
            )
        if data.shape[-1] < cap:
            data = np.pad(data, ((0, 0), (0, cap - data.shape[-1])))
        x = jax.device_put(
            jnp.asarray(data),
            NamedSharding(self.mesh, P(None, self.sp_axis)),
        )
        out, out_len = self.fn(x, jnp.int32(length))
        return np.asarray(out), int(out_len)


def compile_chain_sp_tv(
    graph: Graph,
    sources: Dict[Tuple[int, str], compiler.SourceSpec],
    mesh: Mesh,
    max_length: Optional[int] = None,
    sp_axis: str = "sp",
    lock: bool = True,
    jit: bool = True,
) -> TvShardedChain:
    """Compile a linear time-variant chain for sp execution over ``mesh``.

    ``sources`` must hold exactly one flt source; ``max_length`` defaults
    to its capacity. The result's ``run`` pads the clip to the planned
    capacity automatically."""
    if len(sources) != 1:
        raise ProcessorRuntimeError(
            "Chain sharding needs exactly one source",
            "Multi-source graphs run via compile_graph_sharded (LTI) or "
            "compile_graph_dp.",
            f"{len(sources)} sources",
        )
    (nid, pin), spec = next(iter(sources.items()))
    if spec.fmt != "flt":
        raise ProcessorRuntimeError(
            "Chain sharding requires flt sources",
            "Convert the source to float32 before sharding.",
            f"fmt={spec.fmt}",
        )
    plan = plan_chain(
        graph, spec.rate, max_length or spec.capacity, mesh, sp_axis
    )

    def local_step(x, length):
        ln = length
        for st in plan.stages:
            if isinstance(st, _GainStage):
                x = x * jnp.float32(st.volume)
            elif isinstance(st, _LimiterStage):
                from nodey_tpu.ops import dynamics as dynamics_ops

                x = dynamics_ops.limiter_sharded_local(
                    x, st.threshold, st.c, sp_axis, plan.sp
                )
            elif isinstance(st, _CompressorStage):
                from nodey_tpu.ops import dynamics as dynamics_ops

                x = dynamics_ops.compressor_sharded_local(
                    x, st.params, sp_axis, plan.sp
                )
            elif isinstance(st, _DeesserStage):
                from nodey_tpu.ops import dynamics as dynamics_ops

                x = dynamics_ops.deesser_sharded_local(
                    x, list(st.sections), st.params, sp_axis, plan.sp
                )
                # The band's IIR tail rings past the valid length;
                # re-mask like the biquad stage.
                gidx = lax.axis_index(sp_axis) * x.shape[-1] + jnp.arange(
                    x.shape[-1], dtype=jnp.int32
                )
                x = jnp.where(gidx[None, :] < ln, x, 0.0)
            elif isinstance(st, _TremoloStage):
                from nodey_tpu.ops import modfx as modfx_ops

                x = modfx_ops.tremolo_sharded_local(
                    x, st.rate_hz, st.depth, st.sample_rate, sp_axis
                )
            elif isinstance(st, _ChorusStage):
                from nodey_tpu.ops import modfx as modfx_ops

                x = modfx_ops.chorus_sharded_local(
                    x, ln, st.rate_hz, st.base_ms, st.depth_ms,
                    st.voices, st.wet, st.dry, st.sample_rate, sp_axis
                )
            elif isinstance(st, _PhaserStage):
                from nodey_tpu.ops import phaser as phaser_ops

                x = phaser_ops.phaser_sharded_local(
                    x, ln, st.rate_hz, st.f_min_hz, st.f_max_hz,
                    st.stages, st.wet, st.dry, st.sample_rate,
                    sp_axis, plan.sp
                )
            elif isinstance(st, _PanStage):
                from nodey_tpu.ops import fadepan as fadepan_ops

                x = fadepan_ops.pan_sharded_local(x, st.pan)
            elif isinstance(st, _WidthStage):
                from nodey_tpu.ops import fadepan as fadepan_ops

                if x.shape[0] == 2:        # mono has no side signal
                    x = fadepan_ops.width_array(x, st.width)
            elif isinstance(st, _FadeStage):
                from nodey_tpu.ops import fadepan as fadepan_ops

                x = fadepan_ops.fade_sharded_local(
                    x, st.spec, sp_axis, length=ln
                )
            elif isinstance(st, _GateStage):
                from nodey_tpu.ops import dynamics as dynamics_ops

                x = dynamics_ops.gate_sharded_local(
                    x, st.params, sp_axis, plan.sp
                )
            elif isinstance(st, _BiquadStage):
                from nodey_tpu.ops import biquad as biquad_ops

                x = biquad_ops.cascade_sharded_local(
                    x, list(st.sections), sp_axis, plan.sp
                )
                # IIR tails ring past the valid length; re-mask so the
                # zero-padding invariant survives the stage.
                gidx = lax.axis_index(sp_axis) * x.shape[-1] + jnp.arange(
                    x.shape[-1], dtype=jnp.int32
                )
                x = jnp.where(gidx[None, :] < ln, x, 0.0)
            elif isinstance(st, _ResampleStage):
                x, ln = _resample_local(st, x, ln, sp_axis)
            else:
                x, ln = pv_sharded_local_step(
                    st.plan, x, ln, sp_axis, lock=lock,
                    transient=st.transient,
                    formant_ratio=st.formant_ratio,
                )
        return x, ln

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, sp_axis), P()),
        out_specs=(P(None, sp_axis), P()),
        check_vma=False,
    )
    if jit:
        fn = jax.jit(fn)
    return TvShardedChain(
        fn=fn, mesh=mesh, plan=plan,
        input_key=compiler.external_key(nid, pin), sp_axis=sp_axis,
    )
