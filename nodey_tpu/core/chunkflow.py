"""Chunk-flow compilation: the graph as one jitted *streaming* step function.

The offline compiler (core/compiler.py) renders whole clips in one fused
program. This module compiles the SAME validated DAG into an incremental
form — the TPU equivalent of the reference's fiber-per-node streaming
runtime (reference: src/infra/runner.cpp:65-140, frames flowing through
capacity-16 bounded channels, include/processor/audio-stream.hpp:46-83):

    step(states, chunk_args) -> (states', chunk_outputs)

* Every edge carries a fixed-width chunk (``ChunkStream``): a [C, width]
  float32 buffer, a traced valid count, and a traced done flag — the
  batched-world form of the reference's AVFrame packets + per-channel EOF
  (audio-stream.hpp:76-79).
* Every stateful node owns a device-resident carry (FIFOs, resampler tap
  history, WSOLA tails — ops/chunkops.py) threaded through the step as a
  pytree, so host memory and HBM stay O(nodes x chunk) for any clip length
  (SURVEY.md §5.7).
* The step is ONE fused XLA program per chunk: node order is still
  topological SSA; only the carry distinguishes it from the offline path.

Node authors implement ``plan_stream`` (static chunk-width/state planning)
and ``lower_stream`` (per-chunk lowering) next to their offline ``lower``;
all 11 built-in node types implement both, so ANY valid graph — including
time-variant WSOLA chains the overlap-discard path cannot handle — streams
with bounded memory, exactly matching its offline render (tolerance: ulp).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from nodey_tpu.core.compiler import SourceSpec, external_key, topo_order
from nodey_tpu.core.errors import LogicError, ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import chunkops


@dataclasses.dataclass(frozen=True)
class ChunkSpec:
    """Static description of one edge's chunk format.

    ``cadence`` is the NOMINAL valid samples delivered per step (the
    steady-state arrival rate, known statically: sources deliver their
    chunk width, resamplers scale by the rate ratio, WSOLA by 1/tempo).
    Lockstep merges require equal cadences on every input — a faster
    branch would grow its alignment FIFO without bound (the reference's
    per-edge channels would instead backpressure the producer,
    audio-stream.hpp:46-83). -1 marks "unknown" for internal stage specs
    that never reach a merge."""

    rate: int
    channels: int
    fmt: str
    width: int          # static chunk buffer width (valid n <= width)
    t0_us: float = 0.0
    cadence: float = -1.0

    def replace(self, **kw) -> "ChunkSpec":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass
class ChunkStream:
    """One traced chunk on an edge: data [C, width], valid count, EOF flag."""

    data: Any
    n: Any              # int32 — valid samples in this chunk
    done: Any           # bool — no more chunks follow this one
    spec: ChunkSpec

    def with_data(self, data, **spec_overrides) -> "ChunkStream":
        spec = self.spec.replace(
            channels=data.shape[0], width=data.shape[1], **spec_overrides
        )
        return ChunkStream(data=data, n=self.n, done=self.done, spec=spec)

    # Convenience delegates so shared validators (e.g. the velocity nodes'
    # sample-rate guard) work on offline Streams and ChunkStreams alike.
    @property
    def rate(self) -> int:
        return self.spec.rate

    @property
    def channels(self) -> int:
        return self.spec.channels

    @property
    def fmt(self) -> str:
        return self.spec.fmt


def zero_chunk(spec: ChunkSpec) -> ChunkStream:
    return ChunkStream(
        data=jnp.zeros((spec.channels, spec.width), dtype=jnp.float32),
        n=jnp.int32(0),
        done=jnp.bool_(True),
        spec=spec,
    )


class StreamPlanCtx:
    """Static planning context (no traced values).

    ``hints`` carries per-node planning parameters the executor knows but
    nodes don't — today the chunk width for device-synthesized sources
    (audio_generator), snapped to the same shared time quantum as the
    decode feeds so lockstep merges see exactly proportional cadences.
    """

    def __init__(
        self,
        mode: str,
        sources: Dict[Tuple[int, str], SourceSpec],
        hints: Optional[Dict[int, Dict[str, Any]]] = None,
    ):
        self.mode = mode
        self.node_id: Optional[int] = None
        self._sources = sources
        self.hints: Dict[int, Dict[str, Any]] = hints or {}
        self.output_specs: Dict[str, Any] = {}

    def external_spec(self, node_id: int, pin: str) -> ChunkSpec:
        spec = self._sources.get((node_id, pin))
        if spec is None:
            raise LogicError(f"No source bound for node {node_id} pin {pin}")
        return ChunkSpec(
            rate=spec.rate, channels=spec.channels, fmt=spec.fmt,
            width=spec.capacity, t0_us=spec.t0_us,
            cadence=float(spec.capacity),
        )

    def emit_spec(self, key: str, meta: Dict[str, Any]) -> None:
        if key in self.output_specs:
            raise LogicError(f"Duplicate emitted output '{key}'")
        self.output_specs[key] = meta


class StreamLowerCtx:
    """Per-trace context for one streaming step."""

    def __init__(
        self,
        mode: str,
        sources: Dict[Tuple[int, str], SourceSpec],
        args: Dict[str, Any],
    ):
        self.mode = mode
        self.node_id: Optional[int] = None
        self._sources = sources
        self._args = args
        self.outputs: Dict[str, Any] = {}

    def external(self, node_id: int, pin: str) -> ChunkStream:
        spec = self._sources.get((node_id, pin))
        if spec is None:
            raise LogicError(f"No source bound for node {node_id} pin {pin}")
        data, n, done = self._args[external_key(node_id, pin)]
        if data.dtype == jnp.int16:
            # s16 wire format: the host ships native 16-bit samples (half
            # the PCIe/relay bytes); dequantization s/32768 — exactly
            # FFmpeg's s16->flt conversion — runs fused into the step.
            data = data.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        return ChunkStream(
            data=data, n=n, done=done,
            spec=ChunkSpec(
                rate=spec.rate, channels=spec.channels, fmt=spec.fmt,
                width=spec.capacity, t0_us=spec.t0_us,
            ),
        )

    def emit(self, key: str, chunk_or_array: Any) -> None:
        if key in self.outputs:
            raise LogicError(f"Duplicate emitted output '{key}'")
        if isinstance(chunk_or_array, ChunkStream):
            c = chunk_or_array
            self.outputs[key] = (c.data, c.n, c.done)
        else:
            self.outputs[key] = chunk_or_array


@dataclasses.dataclass
class StreamCompiled:
    """A compiled streaming graph program."""

    step: Any                       # jitted (states, args) -> (states, outs)
    init_states: Dict[str, Any]
    input_keys: List[str]
    output_meta: Dict[str, Any]     # key -> {"kind", "rate"/"hop"...}
    mode: str
    chunk_in: Dict[str, int]        # input key -> chunk width
    batch_steps: int = 1            # chunks per device dispatch
    # Stable labels for the per-step "__gauges__" output: one entry per
    # FifoState found in the state tree, "<node_id>/<state path>". The
    # executor surfaces these as per-edge fill ratios (the reference's
    # per-link occupancy overlay, app.cpp:1574-1595).
    gauge_keys: Tuple[str, ...] = ()


GAUGES_KEY = "__gauges__"


def _find_fifos(states: Dict[str, Any]):
    """(label, FifoState) pairs in deterministic order; labels are
    '<node_id>/<pytree path>'."""
    from jax import tree_util

    found = []
    for nid in sorted(states, key=lambda s: int(s)):
        flat = tree_util.tree_flatten_with_path(
            states[nid],
            is_leaf=lambda x: isinstance(x, chunkops.FifoState),
        )[0]
        for path, leaf in flat:
            if isinstance(leaf, chunkops.FifoState):
                label = nid + "/" + "".join(str(k) for k in path)
                found.append((label, leaf))
    return found


def compile_stream_graph(
    graph: Graph,
    sources: Dict[Tuple[int, str], SourceSpec],
    mode: str = "export",
    jit: bool = True,
    donate_state: bool = True,
    batch_steps: int = 1,
    plan_hints: Optional[Dict[int, Dict[str, Any]]] = None,
) -> StreamCompiled:
    """Validate, plan and trace the graph's streaming step function.

    ``sources`` binds each (audio_input node, output pin) to a SourceSpec
    whose ``capacity`` is the per-chunk input width for that stream.

    ``batch_steps`` > 1 wraps the chunk step in a ``lax.scan`` over a
    leading chunk axis: ``step(states, argsb)`` then takes per-key
    ``(block [k, C, W], n [k], last [k])`` and returns outputs stacked
    the same way. One device dispatch (and one h2d / one d2h) then
    carries k chunks — k-fold fewer relay round trips (~12% faster
    export wall measured; RSS-neutral, ROUND4.md §21) — while the
    per-chunk math (and every carry hand-off) stays IDENTICAL to the
    k=1 program: the scan body is the same traced step, so output is
    byte-identical.
    """
    graph.check_graph()
    order = topo_order(graph)
    input_keys = sorted(external_key(nid, pin) for (nid, pin) in sources)

    node_wiring: Dict[int, List[Tuple[str, int]]] = {nid: [] for nid in order}
    for link in graph.links.values():
        to_pin = graph.pins[link.to_pin]
        node_wiring[to_pin.parent].append(
            (to_pin.attribute.identifier, link.from_pin)
        )

    # -- plan pass: static chunk specs + initial states ----------------------
    plan_ctx = StreamPlanCtx(mode, sources, hints=plan_hints)
    pin_specs: Dict[int, ChunkSpec] = {}
    init_states: Dict[str, Any] = {}
    for nid in order:
        node = graph.nodes[nid]
        in_specs = {
            name: pin_specs[from_pin]
            for name, from_pin in node_wiring[nid]
            if from_pin in pin_specs
        }
        plan_ctx.node_id = nid
        try:
            out_specs, state = node.processor.plan_stream(plan_ctx, in_specs)
        except ProcessorRuntimeError as exc:
            info = node.processor.info()
            if f"[node {nid}" not in exc.detail:
                # type(exc) keeps subclasses (UnstreamableGraphError)
                # so callers can dispatch fallbacks on them.
                raise type(exc)(
                    exc.message, exc.explanation,
                    f"{exc.detail} [node {nid}: {info.identifier}]",
                ) from exc
            raise
        init_states[str(nid)] = state
        for pin_name, spec in out_specs.items():
            pin_id = node.pin_name_map.get(pin_name)
            if pin_id is None:
                raise LogicError(f"Node {nid} planned unknown pin '{pin_name}'")
            pin_specs[pin_id] = spec
    output_meta = dict(plan_ctx.output_specs)
    # Per-edge occupancy gauges: every FifoState in the state tree gets a
    # fill-ratio slot in a tiny "__gauges__" output vector (one f32 per
    # FIFO). Keys/caps are static (same tree structure every step).
    gauge_keys = tuple(
        label for label, _ in _find_fifos(init_states)
    )
    gauge_caps = jnp.asarray(
        [leaf.buf.shape[1] for _, leaf in _find_fifos(init_states)],
        dtype=jnp.float32,
    ) if gauge_keys else None
    if gauge_keys:
        output_meta[GAUGES_KEY] = {"kind": "gauges", "keys": gauge_keys}

    # -- trace pass: the chunk step ------------------------------------------
    # STREAMING programs pin the XLA patches resampler branch for their
    # whole trace (resample.form_override): streamed exports are
    # transport/LAME-bound at ~20-45x realtime, so the Pallas kernel
    # buys nothing here, while its Mosaic compile + the kernel_ready
    # probe cost fresh processes ~60-100 s of cold start (measured on
    # the cold-process bench probe). Offline programs keep the probed
    # kernel default; NODEY_RESAMPLE_FORM still overrides both. The
    # context must wrap the BODY — jit traces lazily at first call, not
    # here — and, unlike the in-trace fallback pin, it never touches the
    # process-wide resolution.
    from nodey_tpu.ops import resample as _resample

    def step(states: Dict[str, Any], args: Dict[str, Any]):
        with _resample.form_override("patches"):
            return _step_body(states, args)

    def _step_body(states: Dict[str, Any], args: Dict[str, Any]):
        ctx = StreamLowerCtx(mode, sources, args)
        pin_values: Dict[int, ChunkStream] = {}
        new_states: Dict[str, Any] = {}
        for nid in order:
            node = graph.nodes[nid]
            inputs = {
                name: pin_values[from_pin]
                for name, from_pin in node_wiring[nid]
                if from_pin in pin_values
            }
            ctx.node_id = nid
            try:
                outs, new_state = node.processor.lower_stream(
                    ctx, inputs, states[str(nid)]
                )
            except ProcessorRuntimeError as exc:
                info = node.processor.info()
                if f"[node {nid}" not in exc.detail:
                    raise type(exc)(
                        exc.message, exc.explanation,
                        f"{exc.detail} [node {nid}: {info.identifier}]",
                    ) from exc
                raise
            new_states[str(nid)] = new_state
            for pin_name, value in outs.items():
                pin_id = node.pin_name_map.get(pin_name)
                if pin_id is None:
                    raise LogicError(
                        f"Node {nid} lowered unknown pin '{pin_name}'"
                    )
                pin_values[pin_id] = value
        if gauge_keys:
            levels = jnp.stack([
                leaf.level.astype(jnp.float32)
                for _, leaf in _find_fifos(new_states)
            ])
            ctx.outputs[GAUGES_KEY] = levels / gauge_caps
        return new_states, ctx.outputs

    if batch_steps > 1:
        inner_step = step

        def step(states, argsb):  # noqa: F811 — the scanned form
            from jax import lax as _lax

            # Explicit length: a source-synthesized graph (generator-only)
            # has NO external inputs, so scan cannot infer k from argsb.
            return _lax.scan(inner_step, states, argsb, length=batch_steps)

    if jit:
        step_fn = jax.jit(
            step, donate_argnums=(0,) if donate_state else ()
        )
    else:
        step_fn = step

    chunk_in = {
        external_key(nid, pin): spec.capacity
        for (nid, pin), spec in sources.items()
    }
    return StreamCompiled(
        step=step_fn,
        init_states=init_states,
        input_keys=input_keys,
        output_meta=output_meta,
        mode=mode,
        chunk_in=chunk_in,
        batch_steps=max(1, int(batch_steps)),
        gauge_keys=gauge_keys,
    )


# -- shared building blocks for node lower_stream implementations -------------


def to_stereo_chunk(chunk: ChunkStream) -> ChunkStream:
    """Stateless -3 dB mono upmix (ops/resample.to_stereo semantics)."""
    from nodey_tpu.ops.resample import SQRT1_2

    if chunk.spec.channels == 2:
        return chunk
    data = jnp.concatenate([chunk.data, chunk.data], axis=0) * jnp.float32(
        SQRT1_2
    )
    return chunk.with_data(data, fmt="flt")


def to_mono_chunk(chunk: ChunkStream) -> ChunkStream:
    """Stateless -3 dB stereo downmix."""
    from nodey_tpu.ops.resample import SQRT1_2

    if chunk.spec.channels == 1:
        return chunk
    data = (chunk.data[0:1] + chunk.data[1:2]) * jnp.float32(SQRT1_2)
    return chunk.with_data(data, fmt="flt")


def side_mono_chunk(chunk: ChunkStream) -> ChunkStream:
    """Bimix side prep: stereo-normalize then average the two channels
    (reference: src/processor/audio-bimix.cpp:310-316)."""
    s = to_stereo_chunk(chunk)
    mono = (s.data[0:1] + s.data[1:2]) * jnp.float32(0.5)
    return s.with_data(mono)


def plan_resample_stage(spec: ChunkSpec, out_rate: int):
    """(ChunkSpec, state, plan) for a streaming resampler after ``spec``;
    plan is None when no rate change is needed."""
    from nodey_tpu.ops import chunkops

    if spec.rate == out_rate:
        return spec, None, None
    plan = chunkops.resample_plan(spec.rate, out_rate, spec.width)
    state = chunkops.resample_stream_init(plan, spec.channels)
    cadence = (
        spec.cadence * out_rate / spec.rate if spec.cadence > 0 else -1.0
    )
    out_spec = spec.replace(
        rate=out_rate, width=plan.out_cap, fmt="flt", cadence=cadence
    )
    return out_spec, state, plan


def run_resample_stage(plan, state, chunk: ChunkStream, out_rate: int):
    """Apply a planned streaming resampler stage to one chunk."""
    from nodey_tpu.ops import chunkops

    if plan is None:
        return state, chunk
    state, out, out_n, out_done = chunkops.resample_stream_step(
        plan, state, chunk.data, chunk.n, chunk.done
    )
    spec = chunk.spec.replace(rate=out_rate, width=plan.out_cap, fmt="flt")
    return state, ChunkStream(data=out, n=out_n, done=out_done, spec=spec)


def plan_aligned_merge(specs: List[ChunkSpec], prefills: List[int]):
    """Per-input FIFOs for sample-aligned merging; ``prefills`` are leading
    silence counts (bimix_v2 placement offsets; 0 elsewhere).

    Returns (static_plan, fifo_states) — the static geometry must live on
    the planning processor, NOT in the jitted carry (jit would trace it)."""
    from nodey_tpu.ops import chunkops

    known = [s.cadence for s in specs if s.cadence > 0]
    if known and max(known) > min(known) * (1 + 1e-6):
        # A faster branch would outrun the aligned take (min over live
        # inputs) and silently overflow its FIFO — reject at plan time.
        from nodey_tpu.core.errors import UnstreamableGraphError

        raise UnstreamableGraphError(
            "Mixer inputs arrive at different rates",
            "Streaming a mixer whose branches produce different "
            "audio-seconds per step (e.g. one side through a velocity/"
            "pitch change) is not supported by lockstep chunk execution; "
            "use the offline render/export path for this graph.",
            f"per-step arrivals at 48 kHz: {[round(c, 2) for c in known]}",
        )
    take_cap = max(s.width for s in specs)
    states = []
    for s, pre in zip(specs, prefills):
        cap = pre + 2 * s.width + take_cap + 4
        states.append(chunkops.fifo_prefill(s.channels, cap, pre))
    return {"take_cap": take_cap}, states


def run_aligned_merge(merge_plan, fifo_states, chunks: List[ChunkStream]):
    """Push chunks into their FIFOs; pop one aligned window per input.

    Returns (new_fifo_states, windows [C, take_cap] list, take, done). An
    input whose stream is done reads zeros past its level — the reference's
    drained-resampler silence (audio-amix.cpp:279-291); output runs until
    the LONGEST input is exhausted.
    """
    from nodey_tpu.ops import chunkops

    take_cap = merge_plan["take_cap"]
    fifos = []
    levels = []
    dones = []
    for st, c in zip(fifo_states, chunks):
        st = chunkops.fifo_push(st, c.data, c.n)
        fifos.append(st)
        levels.append(chunkops.fifo_level(st))
        dones.append(c.done)

    # Aligned take: bounded by every still-live input's level; once all
    # inputs are done, drain the longest.
    inf = jnp.int32(2**30)
    live_min = inf
    max_level = jnp.int32(0)
    all_done = jnp.bool_(True)
    for lvl, dn in zip(levels, dones):
        live_min = jnp.minimum(live_min, jnp.where(dn, inf, lvl))
        max_level = jnp.maximum(max_level, lvl)
        all_done = all_done & dn
    take = jnp.where(all_done, max_level, live_min)
    take = jnp.clip(take, 0, take_cap)

    windows = [chunkops.fifo_window(st, take_cap) for st in fifos]
    idx = jnp.arange(take_cap, dtype=jnp.int32)[None, :]
    windows = [jnp.where(idx < take, w, 0.0) for w in windows]
    fifos = [chunkops.fifo_advance(st, take) for st in fifos]

    drained = all_done
    for st in fifos:
        drained = drained & (chunkops.fifo_level(st) <= 0)
    return fifos, windows, take, drained
