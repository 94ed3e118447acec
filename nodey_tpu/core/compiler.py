"""The graph compiler: DAG -> one fused jitted XLA program.

This replaces the reference's Runner (reference: src/infra/runner.cpp:11-154),
which spawned one Boost.Fiber per node and one bounded channel per edge. On
TPU the validated DAG is topologically ordered host-side (the same derived
maps check_graph uses, graph.cpp:162-282) and every node's ``lower()`` emits
JAX ops into a single traced function — edges become SSA values, fan-out is
free value reuse (the XLA analog of the reference's per-link product fan-out,
runner.cpp:35-50), and XLA fuses the whole graph into large VPU/MXU kernels.

External inputs (decoded clips) and sink outputs are the only real I/O; they
form the jitted function's signature.
"""

from __future__ import annotations

import dataclasses
import heapq
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nodey_tpu.core.errors import LogicError
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.stream import Stream


@dataclasses.dataclass(frozen=True)
class SourceSpec:
    """Static description of one external (decoded) input stream."""

    rate: int
    channels: int
    fmt: str
    capacity: int  # padded buffer length (static shape)
    t0_us: float = 0.0


class LowerCtx:
    """Per-trace context handed to every node's ``lower()``.

    Carries the run mode (the Process_context analog — reference:
    include/processor/audio-io.hpp:62-69), resolves external inputs to traced
    arrays, and collects sink outputs.
    """

    def __init__(
        self,
        mode: str,
        sources: Dict[Tuple[int, str], SourceSpec],
        args: Dict[str, Any],
    ):
        self.mode = mode  # "export" | "preview"
        self.node_id: Optional[int] = None  # set by the compiler per node
        self._sources = sources
        self._args = args
        self.outputs: Dict[str, Any] = {}
        self.output_meta: Dict[str, Any] = {}

    def external(self, node_id: int, pin: str) -> Stream:
        spec = self._sources.get((node_id, pin))
        if spec is None:
            raise LogicError(f"No source bound for node {node_id} pin {pin}")
        data, length = self._args[external_key(node_id, pin)]
        if data.dtype == jnp.int16:
            # s16 ingest wire: dequantize s/32768 (exactly FFmpeg's
            # s16->flt conversion) fused into the program.
            data = data.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        return Stream(
            data=data,
            length=length,
            rate=spec.rate,
            channels=spec.channels,
            fmt=spec.fmt,
            t0_us=spec.t0_us,
        )

    def emit(self, key: str, value: Any, meta: Optional[Dict] = None) -> None:
        if key in self.outputs:
            raise LogicError(f"Duplicate emitted output '{key}'")
        if isinstance(value, Stream):
            self.outputs[key] = (value.data, value.length)
            self.output_meta[key] = {
                "kind": "stream",
                "rate": value.rate,
                "channels": value.channels,
                "fmt": value.fmt,
                "t0_us": value.t0_us,
            }
        else:
            self.outputs[key] = value
            self.output_meta[key] = {"kind": "array", **(meta or {})}


def external_key(node_id: int, pin: str) -> str:
    return f"n{node_id}:{pin}"


def topo_order(graph: Graph) -> List[int]:
    """Kahn topological order over nodes (deterministic: smallest ID first).

    Link-level in-degrees over the same derived maps the reference's
    check_graph builds (reference: src/infra/graph.cpp:162-282)."""
    downstream: Dict[int, List[int]] = {nid: [] for nid in graph.nodes}
    incoming = {nid: 0 for nid in graph.nodes}
    for link in graph.links.values():
        src = graph.pins[link.from_pin].parent
        dst = graph.pins[link.to_pin].parent
        downstream[src].append(dst)
        incoming[dst] += 1

    ready = [nid for nid, cnt in incoming.items() if cnt == 0]
    heapq.heapify(ready)
    order: List[int] = []
    while ready:
        nid = heapq.heappop(ready)
        order.append(nid)
        for dst in downstream[nid]:
            incoming[dst] -= 1
            if incoming[dst] == 0:
                heapq.heappush(ready, dst)
    if len(order) != len(graph.nodes):
        raise LogicError("topo_order called on a cyclic graph")
    return order


@dataclasses.dataclass
class CompiledGraph:
    """A compiled, jitted graph program plus its I/O metadata."""

    fn: Callable
    input_keys: List[str]
    output_meta: Dict[str, Any]
    mode: str
    _batched_fn: Optional[Callable] = None

    def run(
        self,
        arrays: Dict[str, np.ndarray],
        lengths: Dict[str, int],
    ) -> Dict[str, Any]:
        """Execute on device; returns host numpy results.

        ``arrays[key]`` must already be padded to the compiled capacity.
        """
        args = {
            key: (jnp.asarray(arrays[key]), jnp.int32(lengths[key]))
            for key in self.input_keys
        }
        out = self.fn(args)
        return jax.tree_util.tree_map(np.asarray, out)

    def run_device(
        self,
        arrays: Dict[str, np.ndarray],
        lengths: Dict[str, int],
    ) -> Dict[str, Any]:
        """Execute and leave outputs device-resident (no HBM->host pull)."""
        args = {
            key: (jnp.asarray(arrays[key]), jnp.int32(lengths[key]))
            for key in self.input_keys
        }
        return self.fn(args)

    def run_batch(
        self,
        arrays: Dict[str, np.ndarray],   # [B, C, capacity] per key
        lengths: Dict[str, np.ndarray],  # [B] per key
        mesh=None,
        dp_axis: str = "dp",
    ) -> Dict[str, Any]:
        """Data-parallel serving: vmap the fused program over a clip batch.

        The TPU-scale version of the reference's per-file fan-out
        (audio-io.cpp:242-279): B independent clips run as one batched
        program. With ``mesh`` given, the batch dim shards over ``dp_axis``
        so clips spread across chips (jax.sharding handles the rest — no
        per-clip dispatch)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        args = {
            key: (
                jnp.asarray(arrays[key]),
                jnp.asarray(lengths[key], dtype=jnp.int32),
            )
            for key in self.input_keys
        }
        if mesh is not None:
            def shard(leaf):
                spec = P(dp_axis, *([None] * (leaf.ndim - 1)))
                return jax.device_put(leaf, NamedSharding(mesh, spec))

            args = jax.tree_util.tree_map(shard, args)
        if self._batched_fn is None:
            self._batched_fn = jax.jit(jax.vmap(self.fn))
        # Outputs stay device-resident (like ``fn``): a serving loop keeps
        # dispatching while egress fetches only what it needs — fetching
        # the whole batch here would serialize every dispatch behind a
        # full-batch d2h transfer.
        return self._batched_fn(args)


# Node identifiers whose lowering rate-converts (velocity/pitch resample
# to realize the factor; the explicit resampler by definition). Any
# OTHER resample site is reachable only via a non-48 kHz source, which
# _graph_may_resample checks separately.
_RESAMPLING_NODE_IDS = frozenset(
    {"velocity_modifier", "pitch_modifier", "audio_resample"}
)


def _graph_may_resample(graph: Graph, sources) -> bool:
    from nodey_tpu import config as _cfg

    if any(spec.rate != _cfg.SAMPLE_RATE for spec in sources.values()):
        return True
    return any(
        node.processor.info().identifier in _RESAMPLING_NODE_IDS
        for node in graph.nodes.values()
    )


def compile_graph(
    graph: Graph,
    sources: Dict[Tuple[int, str], SourceSpec],
    mode: str = "export",
    jit: bool = True,
) -> CompiledGraph:
    """Validate, topologically order and trace the graph into one program.

    ``sources`` binds every (audio_input node, output pin) to a SourceSpec.
    Raises the graph error taxonomy from check_graph and the three-part
    ProcessorRuntimeError from node lowering — the same error surface the
    reference's Runner + poll_state routing exposes (app.cpp:2097-2149).
    """
    graph.check_graph()
    # Pin the process-wide resampler formulation BEFORE tracing: on TPU
    # the probed default is the grouped Pallas kernel, and the probe
    # (a deadline-bounded compile) must not run inside the trace below
    # (ops/resample.resolve_form). Probing costs ~1-2 s cached (up to
    # the deadline behind a wedged relay), so only graphs that can
    # actually resample pay it: a non-48 kHz source, or a node whose
    # lowering rate-converts (velocity/pitch shift, explicit resampler).
    # A miss here is safe, not wrong — an unresolved in-trace dispatch
    # pins the XLA patches branch (resample._bank_form).
    if _graph_may_resample(graph, sources):
        from nodey_tpu.ops import resample as _resample

        _resample.resolve_form()
    order = topo_order(graph)
    input_keys = sorted(external_key(nid, pin) for (nid, pin) in sources)

    # Pre-compute per-node input wiring: node -> [(input pin name, from pin)].
    node_wiring: Dict[int, List[Tuple[str, int]]] = {nid: [] for nid in order}
    for link in graph.links.values():
        to_pin = graph.pins[link.to_pin]
        node_wiring[to_pin.parent].append(
            (to_pin.attribute.identifier, link.from_pin)
        )

    meta_holder: Dict[str, Any] = {}

    def program(args: Dict[str, Any]) -> Dict[str, Any]:
        from nodey_tpu.core.errors import ProcessorRuntimeError

        ctx = LowerCtx(mode, sources, args)
        pin_values: Dict[int, Stream] = {}  # output pin id -> Stream
        for nid in order:
            node = graph.nodes[nid]
            node_inputs = {
                name: pin_values[from_pin]
                for name, from_pin in node_wiring[nid]
                if from_pin in pin_values
            }
            ctx.node_id = nid
            try:
                outs = node.processor.lower(ctx, node_inputs)
            except ProcessorRuntimeError as exc:
                # Attribute the failure to its node, like the reference's
                # per-fiber capture keyed by processor resource
                # (runner.cpp:87-136, app.cpp:2097-2122).
                info = node.processor.info()
                if f"[node {nid}" not in exc.detail:
                    raise ProcessorRuntimeError(
                        exc.message,
                        exc.explanation,
                        f"{exc.detail} [node {nid}: {info.identifier}]",
                    ) from exc
                raise
            for pin_name, value in outs.items():
                pin_id = node.pin_name_map.get(pin_name)
                if pin_id is None:
                    raise LogicError(
                        f"Node {nid} lowered unknown pin '{pin_name}'"
                    )
                pin_values[pin_id] = value
        meta_holder.update(ctx.output_meta)
        return ctx.outputs

    # Abstract-eval once (no FLOPs) to surface lowering errors eagerly and
    # record the emitted outputs' static metadata.
    abstract_args = {
        external_key(nid, pin): (
            jax.ShapeDtypeStruct((spec.channels, spec.capacity), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32),
        )
        for (nid, pin), spec in sources.items()
    }
    jax.eval_shape(program, abstract_args)

    fn = jax.jit(program) if jit else program
    return CompiledGraph(
        fn=fn,
        input_keys=input_keys,
        output_meta=dict(meta_holder),
        mode=mode,
    )
