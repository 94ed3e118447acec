"""Diagnostics: the engine-side data feed of the reference's overlay
(reference: src/frontend/app.cpp:1493-1600 — FPS/RSS/graph counts/processor
states/per-edge channel fill), re-targeted at what matters on TPU
(SURVEY.md §5.1/§5.5): per-run stage timings, RTF, memory, queue occupancy,
and optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict, Optional

from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import RunMetrics


def get_working_set_bytes() -> int:
    """Process RSS (reference: src/utility/system.cpp:12-44 reads
    /proc/self/status VmRSS the same way)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def graph_counts(graph: Graph) -> Dict[str, int]:
    """Node/pin/link tallies (reference overlay: app.cpp:1535-1542)."""
    return {
        "nodes": len(graph.nodes),
        "pins": len(graph.pins),
        "links": len(graph.links),
        "singletons": len(graph.singleton_node_map),
    }


def run_report(
    graph: Graph,
    metrics: RunMetrics,
    queue_stats: Optional[Any] = None,
) -> Dict[str, Any]:
    """One run's diagnostics dict — the metrics set SURVEY.md §5.5 calls
    for: audio-seconds, wall, RTF, per-stage split, memory, occupancy."""
    report: Dict[str, Any] = {
        "graph": graph_counts(graph),
        "audio_seconds": round(metrics.audio_seconds, 3),
        "wall_seconds": round(metrics.wall_seconds, 4),
        "rtf": round(metrics.rtf, 1),
        "stages": {
            "decode_s": round(metrics.decode_seconds, 4),
            "compile_s": round(metrics.compile_seconds, 4),
            "device_s": round(metrics.device_seconds, 4),
            "encode_s": round(metrics.encode_seconds, 4),
        },
        "rss_bytes": get_working_set_bytes(),
    }
    if queue_stats is not None:
        report["egress_queue"] = {
            "capacity": queue_stats.capacity,
            "fill_ratio": round(queue_stats.fill_ratio, 3),
            "pushed": queue_stats.pushed,
            "popped": queue_stats.popped,
            "producer_waits": queue_stats.producer_waits,
            "consumer_waits": queue_stats.consumer_waits,
        }
    return report


def profile_node_times(
    runner, mode: str = "export", iters: int = 3
) -> Dict[int, Dict[str, Any]]:
    """Approximate per-NODE device time via cumulative prefix programs
    (SURVEY.md §5.5 'per-node kernel time'; the overlay's per-processor
    tallies, reference app.cpp:1556-1568, re-targeted at kernel cost).

    One fused XLA program has no per-node boundaries (fusion is the whole
    point), so node k's cost is measured as the time delta between the
    compiled prefix programs nodes[0..k] and nodes[0..k-1] — each prefix
    reduced to a scalar so egress stays off the measurement. Deltas are
    approximate under fusion (a node may fuse into its consumer) and are
    clamped at zero. Each prefix compiles separately — intended as an
    opt-in diagnosis tool (`cli run --profile-nodes`), not a hot path.
    """
    import time

    import jax
    import jax.numpy as jnp

    from nodey_tpu.core import compiler as gc
    from nodey_tpu.core.stream import Stream

    graph = runner.graph
    arrays, lengths, sources = runner._decode_inputs()
    graph.check_graph()
    order = gc.topo_order(graph)

    node_wiring: Dict[int, Any] = {nid: [] for nid in order}
    for link in graph.links.values():
        to_pin = graph.pins[link.to_pin]
        node_wiring[to_pin.parent].append(
            (to_pin.attribute.identifier, link.from_pin)
        )

    def prefix_program(upto: int):
        def program(args):
            ctx = gc.LowerCtx(mode, sources, args)
            pin_values: Dict[int, Stream] = {}
            acc = jnp.float32(0.0)
            for nid in order[: upto + 1]:
                node = graph.nodes[nid]
                inputs = {
                    name: pin_values[from_pin]
                    for name, from_pin in node_wiring[nid]
                    if from_pin in pin_values
                }
                ctx.node_id = nid
                outs = node.processor.lower(ctx, inputs)
                for pin_name, value in outs.items():
                    pin_values[node.pin_name_map[pin_name]] = value
                    acc = acc + jnp.sum(value.data)
            for key, value in ctx.outputs.items():
                leaf = value[0] if isinstance(value, tuple) else value
                acc = acc + jnp.sum(leaf)
            return acc

        return jax.jit(program)

    device_args = {
        gc.external_key(nid, pin): (
            jnp.asarray(arrays[gc.external_key(nid, pin)]),
            jnp.int32(lengths[gc.external_key(nid, pin)]),
        )
        for (nid, pin) in sources
    }

    prefix_times = []
    for k in range(len(order)):
        fn = prefix_program(k)
        out = fn(device_args)
        jax.device_get(out)  # scalar fetch doubles as the completion probe
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(device_args)
            jax.device_get(out)
            times.append(time.perf_counter() - t0)
        prefix_times.append(min(times))

    report: Dict[int, Dict[str, Any]] = {}
    prev = 0.0
    for k, nid in enumerate(order):
        info = graph.nodes[nid].processor.info()
        delta = max(0.0, prefix_times[k] - prev)
        prev = prefix_times[k]
        report[nid] = {
            "identifier": info.identifier,
            "device_s": round(delta, 6),
            "cumulative_s": round(prefix_times[k], 6),
        }
    return report


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace context when a directory is given — the TPU
    replacement for the reference's (absent) tracing, SURVEY.md §5.1."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
