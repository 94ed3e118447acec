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
