"""Streaming execution: real-time preview and chunked long-clip rendering.

Two modes on top of the fused offline program (core.compiler):

1. **Preview streaming** (StreamingSession): decoded inputs are uploaded to
   HBM once, the fused graph renders the full preview mix on device (at
   1000x real-time this costs milliseconds), and a producer thread streams
   playback-buffer-sized blocks HBM -> host through a bounded queue (cap 16,
   the reference's channel depth) while the consumer paces at 1.0x. The
   queue's occupancy gauge is the diagnostics feed (SURVEY.md §5.1). This
   inverts the reference's incremental pipeline — compute leads, I/O
   streams — which strictly lowers first-sample latency while preserving
   the bounded-memory hand-off.

2. **Chunked rendering** (render_chunked): for clips too long for one HBM
   residency, the graph runs per time-chunk with a left halo sized by the
   pipeline's receptive field, discarding halo-derived output (overlap-
   discard). Chunk lengths stay multiples of every resampler's input stride
   M and the STFT hop so chunk outputs concatenate exactly. Valid for the
   LTI node set (gain/mix/resample/split/spectrum/output); time-variant
   nodes (velocity/pitch WSOLA) need the sequential carry path and fall
   back to whole-clip rendering.
"""

from __future__ import annotations

import dataclasses
import math
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from nodey_tpu import config as cfg
from nodey_tpu.core import compiler
from nodey_tpu.core.errors import (
    ProcessorRuntimeError,
    UnstreamableGraphError,
)
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner
from nodey_tpu.host.streamio import BoundedBlockQueue, RealtimePacer

# Nodes whose offline lowering is time-invariant + stride-aligned, making
# overlap-discard chunking exact.
_LTI_NODES = {
    "audio_input", "audio_output", "audio_volume_adjust", "audio_amix",
    "audio_bimix", "audio_bimix_v2", "audio_split", "audio_resample",
    "audio_spectrum", "audio_reverb", "audio_delay", "audio_pan",
    "audio_width",
}


@dataclasses.dataclass
class StreamStats:
    blocks: int = 0
    underruns: int = 0
    fill_ratio: float = 0.0
    rtf_compute: float = 0.0


def start_block_egress(
    master,
    length: int,
    block_samples: int,
    queue: BoundedBlockQueue,
    stop: threading.Event,
    errors: list,
) -> threading.Thread:
    """Start a producer thread streaming a device-resident master to a
    bounded queue in [C, <=block_samples] host blocks.

    Shared by the preview StreamingSession and the export pipeline so the
    egress path (pad-to-blocks, jitted dynamic_slice fetch, backpressure,
    EOF, error capture) exists exactly once. Producer exceptions land in
    ``errors`` for the consumer to re-raise."""
    channels = master.shape[0]
    n_blocks = max(1, -(-length // block_samples))
    pad = n_blocks * block_samples - master.shape[1]
    if pad > 0:
        master = jnp.pad(master, ((0, 0), (0, pad)))
    fetch = jax.jit(
        lambda m, i: jax.lax.dynamic_slice(
            m, (0, i * block_samples), (channels, block_samples)
        )
    )

    def produce() -> None:
        try:
            for b in range(n_blocks):
                if stop.is_set():
                    break
                block = np.asarray(fetch(master, b))
                valid = min(block_samples, length - b * block_samples)
                if not queue.push(block[:, :valid], stop=stop):
                    break
        except BaseException as exc:
            errors.append(exc)
        finally:
            queue.set_eof()

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    return thread


class StreamingSession:
    """Real-time preview: device-resident render + block egress pipeline."""

    def __init__(
        self,
        graph: Graph,
        block_samples: int = cfg.BUFFER_SIZE * 8,
        queue_capacity: int = cfg.AUDIO_STREAM_BUFFER_SIZE,
    ):
        self.runner = Runner(graph)
        self.block_samples = block_samples
        self.queue = BoundedBlockQueue(queue_capacity)
        self._stop = threading.Event()
        self._producer: Optional[threading.Thread] = None
        self._producer_errors: list = []
        self._master = None  # device array [2, N]
        self._length = 0
        self._executor = None
        self.stats = StreamStats()

    def start(self, streamed: bool = True) -> "StreamingSession":
        """Start the preview pipeline.

        ``streamed=True`` (default): chunk-by-chunk execution through the
        chunk-flow compiler — device memory stays flat for any clip length
        (the reference's O(16-frame) bound, SURVEY.md §5.7). ``False``
        keeps the whole-clip-in-HBM fast path (lowest first-sample latency
        for short clips)."""
        if streamed:
            return self._start_streamed()
        return self._start_whole_clip()

    def _start_streamed(self) -> "StreamingSession":
        from nodey_tpu.core.stream_executor import StreamExecutor

        # Half-second chunks keep first-sample latency low while amortizing
        # dispatch overhead. Spectrum-tap frames are NOT accumulated —
        # nothing consumes them on the realtime path, and collecting them
        # device-resident would grow HBM with clip length, defeating the
        # bounded-memory point of streaming.
        self._executor = StreamExecutor(
            self.runner.graph, mode="preview", chunk_seconds=0.5,
            collect_frames=False,
        )

        def produce() -> None:
            try:
                metrics = self._executor.run(
                    sink=lambda block: self.queue.push(block, stop=self._stop)
                )
                self._length = int(metrics.audio_seconds * cfg.SAMPLE_RATE)
                self.stats.rtf_compute = metrics.rtf
            except UnstreamableGraphError:
                # Lockstep streaming rejects mixers whose branches run at
                # different tempos BEFORE producing any block; preview
                # them through the whole-clip path instead (it handles
                # these graphs exactly), feeding the same queue.
                try:
                    self._start_whole_clip()
                    self._producer.join()
                    return  # whole-clip egress set the queue EOF
                except BaseException as exc:
                    self._producer_errors.append(exc)
            except BaseException as exc:
                self._producer_errors.append(exc)
            finally:
                self.queue.set_eof()

        self._producer = threading.Thread(target=produce, daemon=True)
        self._producer.start()
        return self

    def _start_whole_clip(self) -> "StreamingSession":
        """Render the preview mix on device and start the egress producer."""
        import time

        arrays, lengths, sources = self.runner._decode_inputs()
        compiled, _ = self.runner._compile(sources, "preview")
        args = {
            key: (jnp.asarray(arrays[key]), jnp.int32(lengths[key]))
            for key in compiled.input_keys
        }
        t0 = time.perf_counter()
        out = compiled.fn(args)
        if "preview" not in out:
            raise ProcessorRuntimeError(
                "Preview produced no audio",
                "The graph has no audio_output node receiving a stream.",
                "preview output missing",
            )
        master, length = out["preview"]
        self._length = int(jax.device_get(length))
        compute_s = time.perf_counter() - t0
        audio_s = self._length / cfg.SAMPLE_RATE
        self.stats.rtf_compute = audio_s / compute_s if compute_s else 0.0
        self._master = master
        self._producer = start_block_egress(
            master, self._length, self.block_samples, self.queue,
            self._stop, self._producer_errors,
        )
        return self

    def blocks(self, realtime: bool = False) -> Iterator[np.ndarray]:
        """Consumer iterator; paces at 1.0x when realtime."""
        pacer = RealtimePacer() if realtime else None
        while True:
            block = self.queue.pop(stop=self._stop)
            if block is None:
                break
            if pacer is not None:
                pacer.wait(block.shape[1])
            self.stats.blocks += 1
            self.stats.fill_ratio = self.queue.stats.fill_ratio
            yield block
        self.stats.underruns = self.queue.stats.consumer_waits
        if self._producer_errors:
            raise self._producer_errors[0]

    def stop(self) -> None:
        """Cooperative cancellation — the stop_source analog
        (reference: include/infra/runner.hpp:47, runner.cpp:53-63)."""
        self._stop.set()
        if self._executor is not None:
            self._executor.stop()
        self.queue.set_eof()
        if self._producer is not None:
            self._producer.join(timeout=5.0)

    @property
    def duration_seconds(self) -> float:
        return self._length / cfg.SAMPLE_RATE


def _chunk_quantum(graph: Graph, in_rate: int) -> int:
    """Chunk-length quantum (in INPUT samples): every rate conversion the
    graph can perform must see chunk boundaries at multiples of its input
    stride M, and the end-to-end input->output coordinate mapping must be
    integral, so chunk outputs concatenate exactly. Take the lcm of M over
    every ordered pair of reachable rates (conversions may occur in either
    direction, e.g. an audio_resample node going 48k -> 32k), plus every
    STFT hop."""
    from nodey_tpu.ops.resample import _rational
    from nodey_tpu.ops.resample import group_factor as _group_factor

    q = 1
    rates = {in_rate, 48_000}
    for node in graph.nodes.values():
        target = getattr(node.processor, "target_rate", None)
        if target:
            rates.add(int(target))
        hop = getattr(node.processor, "hop", None)
        if hop:
            q = math.lcm(q, int(hop))
    for a in rates:
        for b in rates:
            if a != b:
                L, M = _rational(a, b)
                # The grouped GEMM (resample.group_factor) sums R cycles
                # per patch row; chunk/shard boundaries must respect the
                # group phase for bitwise offline==chunked==sharded.
                q = math.lcm(q, M * _group_factor(L, M))
    return q


def supports_chunked(graph: Graph) -> bool:
    return all(
        node.processor.info().identifier in _LTI_NODES
        for node in graph.nodes.values()
    )


def stream_supported(graph: Graph) -> bool:
    """True when every node implements chunk-streaming lowering
    (core/chunkflow.py). All built-in node types do — including the
    time-variant WSOLA nodes that ``supports_chunked`` (the overlap-discard
    fast path) must reject."""
    from nodey_tpu.core.registry import Processor

    return all(
        type(node.processor).plan_stream is not Processor.plan_stream
        for node in graph.nodes.values()
    )


def render_chunked(
    graph: Graph,
    chunk_seconds: float = 30.0,
    halo_seconds: float = 0.25,
    progress: Optional[Callable[[float], None]] = None,
):
    """Overlap-discard chunked export render for LTI graphs.

    Returns (master [2 or C, n], rate, fmt). Memory high-water on device is
    one chunk + halo regardless of clip length (the TPU answer to the
    reference's O(nodes x 16 frames) streaming bound, SURVEY.md §5.7).
    """
    if not supports_chunked(graph):
        raise ProcessorRuntimeError(
            "Graph not chunkable",
            "Time-variant nodes (velocity/pitch) require whole-clip "
            "rendering; use Runner.render instead.",
            "render_chunked",
        )
    runner = Runner(graph)
    arrays, lengths, sources = runner._decode_inputs()
    if not sources:
        raise ProcessorRuntimeError(
            "Graph has no inputs",
            "Chunked rendering requires at least one audio_input slot.",
            "render_chunked",
        )

    # One common input rate keeps chunk alignment simple; mixed-rate graphs
    # fall back to whole-clip rendering.
    rates = {spec.rate for spec in sources.values()}
    if len(rates) != 1:
        raise ProcessorRuntimeError(
            "Mixed input rates not chunkable",
            "Chunked rendering currently requires equal input rates.",
            f"rates: {sorted(rates)}",
        )
    in_rate = rates.pop()
    # Nonzero pts start offsets shift bimix_v2 placement beyond the input
    # grid this chunk planner trims to; those graphs stream via the
    # chunk-flow executor or render whole-clip instead.
    if any(spec.t0_us for spec in sources.values()):
        raise ProcessorRuntimeError(
            "Stream start offsets not chunkable",
            "Inputs with pts start offsets (t0_us != 0) require whole-clip "
            "or chunk-flow streaming execution.",
            "render_chunked",
        )

    quantum = _chunk_quantum(graph, in_rate)
    chunk = max(1, int(chunk_seconds * in_rate) // quantum) * quantum
    # The halo must cover every node's receptive field; tail-growing
    # nodes (convolution reverb) declare theirs via ``receptive_seconds``
    # (processors/reverb.py) — same contract the sp mesh planner uses.
    max_receptive_s = max(
        [float(getattr(n.processor, "receptive_seconds", 0.0))
         for n in graph.nodes.values()]
        + [0.0]
    )
    halo_s = max(halo_seconds, max_receptive_s)
    halo = -(-int(halo_s * in_rate) // quantum) * quantum

    total = max(lengths.values())
    # Tail-growing nodes emit past the input end: render enough chunks
    # to cover the grown output.
    tail_in = int(max_receptive_s * in_rate)
    n_chunks = max(1, -(-(total + tail_in) // chunk))

    # Window = left halo + chunk + right halo; both halos are discarded from
    # the output (the right halo covers the resampler taps reading past the
    # chunk end).
    window = halo + chunk + halo
    chunk_sources = {
        key: dataclasses.replace(spec, capacity=window)
        for key, spec in sources.items()
    }
    compiled = compiler.compile_graph(graph, chunk_sources, mode="export")

    pieces = []
    spectra_pieces: Dict[str, list] = {}
    spectra_dropped = []
    out_meta = None
    out_len_total = 0
    for c in range(n_chunks):
        start = c * chunk - halo
        cargs: Dict[str, np.ndarray] = {}
        clens: Dict[str, int] = {}
        for key in compiled.input_keys:
            src = arrays[key]
            buf = np.zeros((src.shape[0], window), dtype=src.dtype)
            lo = max(0, start)
            hi = min(src.shape[1], start + window)
            if hi > lo:
                buf[:, lo - start : hi - start] = src[:, lo:hi]
            cargs[key] = buf
            # Valid samples within this chunk window for this input.
            clens[key] = max(0, min(lengths[key] - start, window))
        out = compiled.run(cargs, clens)
        data, length = out["master"]
        meta = compiled.output_meta["master"]
        out_meta = meta
        out_rate = meta["rate"]
        # Exact output coordinates of the halo and chunk in this window —
        # the quantum guarantees integrality; guard it in case a processor
        # introduces a rate outside the set _chunk_quantum saw.
        if (halo * out_rate) % in_rate or (chunk * out_rate) % in_rate:
            raise ProcessorRuntimeError(
                "Chunk alignment failure",
                "The graph converts to a sample rate the chunk planner did "
                "not account for; use whole-clip rendering.",
                f"in_rate={in_rate} out_rate={out_rate} chunk={chunk} "
                f"halo={halo}",
            )
        halo_out = halo * out_rate // in_rate
        chunk_out = chunk * out_rate // in_rate
        piece = np.asarray(data)[:, halo_out : halo_out + chunk_out]
        pieces.append(piece)
        # This chunk's contribution to the global output length — the
        # same clip algebra the sp mesh psums (parallel/sharded.py), so
        # tail-growing nodes (reverb) report their grown length exactly.
        out_len_total += max(0, min(int(length) - halo_out, chunk_out))
        # Spectrum taps: keep the frames whose hop-aligned starts fall in
        # this chunk's own region (same trim the sharded executor applies;
        # frames that don't align to the chunk grid are dropped, recorded).
        for key, m in compiled.output_meta.items():
            if m["kind"] != "array" or key in spectra_dropped:
                continue
            hop, node_rate = m.get("hop"), m.get("rate")
            if (
                not hop or not node_rate
                or (halo * node_rate) % in_rate
                or (chunk * node_rate) % in_rate
            ):
                spectra_dropped.append(key)
                spectra_pieces.pop(key, None)
                continue
            halo_r = halo * node_rate // in_rate
            chunk_r = chunk * node_rate // in_rate
            if halo_r % hop or chunk_r % hop:
                spectra_dropped.append(key)
                spectra_pieces.pop(key, None)
                continue
            f0 = halo_r // hop
            frames = np.asarray(out[key])[:, f0 : f0 + chunk_r // hop, :]
            spectra_pieces.setdefault(key, []).append(frames)
        if progress is not None:
            progress(min(total, (c + 1) * chunk) / in_rate)

    master = np.concatenate(pieces, axis=1)
    master = master[:, :out_len_total]
    spectra = {}
    for key, parts in spectra_pieces.items():
        m = compiled.output_meta[key]
        full = np.concatenate(parts, axis=1)
        # Offline framing stops at the last window fully inside the clip.
        total_r = total * m["rate"] // in_rate
        frames_valid = max(0, (total_r - m["n_fft"]) // m["hop"] + 1)
        spectra[key] = full[:, :frames_valid, :]
    return master, out_meta["rate"], out_meta["fmt"], spectra


