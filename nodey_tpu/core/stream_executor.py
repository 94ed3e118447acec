"""The streaming executor: decode ∥ h2d ∥ device chunk-step ∥ d2h ∥ sink.

This is the production driver for chunk-flow programs (core/chunkflow.py) —
the piece that makes the framework compute WHILE decoding, like the
reference's decode-fiber → channel → DSP-fiber → sink pipeline
(reference: src/processor/audio-io.cpp:86-226 feeding capacity-16 channels;
sink backpressure at :620-636). Stage overlap:

  [decode threads]   one per input stream (native StreamDecoder when the
                     FFmpeg runtime is present; whole-clip fallback
                     otherwise), pushing chunk blocks into bounded host
                     queues — the analog of the reference's per-file decode
                     fibers (audio-io.cpp:242-279), actually concurrent.
  [pump loop]        assembles per-source chunk args, uploads (h2d is fast;
                     ~1 GB/s through this rig's relay), dispatches the
                     jitted step (async), hands device-resident outputs to
                     the egress queue without blocking on them.
  [egress thread]    pulls device chunks to host (the slow direction
                     through the relay) while the NEXT chunks compute.
  [sink]             the caller consumes host blocks (LAME encode, WAV
                     write, realtime playback pacer).

Memory is bounded by queue depths x chunk size on host and by the carry
FIFOs on device — O(nodes x chunk) for any clip length (SURVEY.md §5.7).
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from nodey_tpu import config as cfg
from nodey_tpu.core import chunkflow, compiler
from nodey_tpu.core.errors import LogicError, ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host.streamio import BoundedBlockQueue


@dataclasses.dataclass
class StreamMetrics:
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    compile_seconds: float = 0.0
    steps: int = 0
    decode_wait_seconds: float = 0.0   # pump stalls waiting on decode
    egress_wait_seconds: float = 0.0   # pump stalls on egress backpressure
    d2h_busy_seconds: float = 0.0      # egress thread's SERIAL d2h exposure
    d2h_fetch_seconds: float = 0.0     # sum of in-flight fetch durations
    sink_busy_seconds: float = 0.0     # sink thread inside sink() (LAME…)
    rss_peak_bytes: int = 0            # host RSS high-water mark this run

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0


_log = __import__("logging").getLogger("nodey_tpu.stream")


def _rss_bytes() -> int:
    """Process RSS (reference: src/utility/system.cpp:12-44 reads
    /proc/self/status VmRSS the same way). 0 where /proc is absent."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


class _RssGuard:
    """Bounded-memory watchdog for long exports (multi-hour relay runs
    creep ~2 MB/chunk from per-RPC client bookkeeping, ROUND3.md §12 —
    the reference's streaming memory is O(16 frames) by construction,
    audio-stream.hpp:48, and a production export must not OOM the host).

    Samples RSS at most every ``interval_s`` on the pump thread, keeps
    the high-water mark, and enforces two env-tunable ceilings:
    NODEY_RSS_SOFT_MB (default 4096) — one warning + a gc.collect() per
    run; NODEY_RSS_HARD_MB (default 16384, 0 disables) — a structured
    ProcessorRuntimeError, failing the run loudly BEFORE the kernel's
    OOM killer fails it silently."""

    def __init__(self, metrics: StreamMetrics, interval_s: float = 2.0):
        self.metrics = metrics
        self.interval_s = interval_s
        self.soft = float(os.environ.get("NODEY_RSS_SOFT_MB", "4096")) * 2**20
        self.hard = float(os.environ.get("NODEY_RSS_HARD_MB", "16384")) * 2**20
        self._warned = False
        self._next = 0.0
        self.check(force=True)

    def check(self, force: bool = False) -> None:
        now = time.monotonic()
        if not force and now < self._next:
            return
        self._next = now + self.interval_s
        rss = _rss_bytes()
        if rss > self.metrics.rss_peak_bytes:
            self.metrics.rss_peak_bytes = rss
        if self.soft and rss > self.soft and not self._warned:
            self._warned = True
            import gc

            gc.collect()
            _log.warning(
                "stream RSS %.0f MB crossed the soft ceiling %.0f MB "
                "(NODEY_RSS_SOFT_MB); collected garbage — peak is "
                "recorded in metrics.rss_peak_bytes",
                rss / 2**20, self.soft / 2**20,
            )
        if self.hard and rss > self.hard:
            raise ProcessorRuntimeError(
                "Streaming run exceeded the host memory ceiling",
                f"Process RSS reached {rss / 2**20:.0f} MB, over the "
                f"enforced NODEY_RSS_HARD_MB={self.hard / 2**20:.0f} "
                "ceiling. Raise the ceiling for very long exports, or "
                "split the export.",
                f"rss_bytes={rss} steps={self.metrics.steps}",
            )


class _SourceFeed:
    """Decode-ahead thread for one input stream.

    Pops yield (block [C, chunk], n, is_last). Uses the native streaming
    decoder when available so host memory stays bounded; falls back to
    whole-clip decode sliced into chunks (WAV-only Python path)."""

    def __init__(
        self, path: str, chunk_seconds: float, queue_depth: int = 4
    ):
        self.path = path
        self.queue = BoundedBlockQueue(queue_depth)
        self.errors: List[BaseException] = []
        self._stop = threading.Event()
        # Probe format up front (raises the structured decode error early,
        # like the reference's pre-start validation, audio-io.cpp:234-240).
        self._decoder = None
        try:
            self._decoder = host_decode.StreamDecoder(path)
            self.rate = self._decoder.rate
            self.channels = self._decoder.channels
            self.fmt = self._decoder.fmt
            self.t0_us = self._decoder.pts0_us
            self._whole = None
        except ProcessorRuntimeError:
            decoded = host_decode.decode_file(path)
            self.rate = decoded.rate
            self.channels = decoded.channels
            self.fmt = decoded.fmt
            self.t0_us = decoded.pts0_us
            self._whole = decoded.data
        self.chunk = max(1, int(chunk_seconds * self.rate))
        # s16 sources ride the wire as native int16 (half the relay/PCIe
        # bytes); round(x*32768) is the exact inverse of the decoder's
        # s/32768 for integer-origin samples. The jitted step dequantizes
        # (chunkflow.StreamLowerCtx.external).
        self.wire_dtype = (
            np.int16 if self.fmt == host_decode.FMT_S16 else np.float32
        )
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self) -> None:
        self._thread.start()

    def _blocks(self) -> Iterator[np.ndarray]:
        if self._decoder is not None:
            with self._decoder as dec:
                yield from dec.blocks(self.chunk)
        else:
            data = self._whole
            for start in range(0, data.shape[1], self.chunk):
                yield data[:, start : start + self.chunk]

    def _quantize(self, block: np.ndarray) -> np.ndarray:
        if self.wire_dtype is np.float32:
            return block
        return np.clip(
            np.round(block * 32768.0), -32768, 32767
        ).astype(np.int16)

    def _run(self) -> None:
        try:
            pending: Optional[np.ndarray] = None
            for block in self._blocks():
                block = self._quantize(block)
                if self._stop.is_set():
                    return
                if pending is not None:
                    if not self.queue.push((pending, False), stop=self._stop):
                        return
                pending = block
            # Final block carries the EOF mark (one-block lookahead so the
            # last chunk is flagged in the same step it is delivered).
            if pending is not None:
                self.queue.push((pending, True), stop=self._stop)
        except BaseException as exc:  # surfaced by the pump
            self.errors.append(exc)
        finally:
            self.queue.set_eof()

    def pop(self, stop) -> Tuple[np.ndarray, int, bool]:
        item = self.queue.pop(stop=stop)
        if item is None:
            if self.errors:
                raise self.errors[0]
            return np.zeros((self.channels, 0), dtype=self.wire_dtype), 0, True
        block, last = item
        return block, block.shape[1], last

    def stop(self) -> None:
        self._stop.set()


class StreamExecutor:
    """Executes a graph incrementally; yields host master blocks."""

    def __init__(
        self,
        graph: Graph,
        mode: str = "export",
        chunk_seconds: float = 2.0,
        egress_depth: int = cfg.AUDIO_STREAM_BUFFER_SIZE,
        master_wire: str = "f32",
        collect_frames: bool = True,
        batch_steps: int = 1,
        egress_workers: int = 0,
    ):
        cfg.enable_compile_cache()  # library embedders get the persistent cache too
        import os as _os

        self.graph = graph
        self.mode = mode
        self.chunk_seconds = chunk_seconds
        self.egress_depth = egress_depth
        # Concurrent d2h fetch depth (0 = env NODEY_D2H_WORKERS, default
        # 2): overlapping device_get round trips lifts egress throughput
        # when the transport is RTT-bound (the axon relay often is).
        if egress_workers <= 0:
            try:
                egress_workers = int(
                    _os.environ.get("NODEY_D2H_WORKERS", "2")
                )
            except ValueError:
                egress_workers = 2
        self.egress_workers = max(1, egress_workers)
        # batch_steps > 1: lax.scan k chunk steps into ONE device dispatch
        # (chunkflow.compile_stream_graph batch_steps) — one h2d put, one
        # execute and one d2h fetch then carry k chunks: k-fold fewer
        # relay round trips (~12% faster export wall measured on the
        # relay rig; RSS-neutral — ROUND4.md §21). Per-chunk math is
        # unchanged (same traced step as the scan body), so output is
        # byte-identical. Export-only: preview keeps k=1 for realtime
        # pacing/cancel granularity.
        self.batch_steps = max(1, int(batch_steps))
        # master_wire="s16": when the master's fmt is s16, quantize on
        # device (the Mp3Encoder's exact clip(trunc(x*32768)) semantics)
        # and ship int16 — half the d2h bytes; the sink receives int16
        # blocks it can hand to LAME's s16 path without re-quantizing.
        if master_wire not in ("f32", "s16"):
            raise LogicError(f"Unknown master_wire '{master_wire}'")
        self.master_wire = master_wire
        # collect_frames=False drops spectrum-tap frame outputs instead of
        # accumulating them in HBM — export sinks don't consume them, and
        # collecting would make device memory grow with clip length.
        self.collect_frames = collect_frames
        self.metrics = StreamMetrics()
        self._stop = threading.Event()
        self.spectra: Dict[str, np.ndarray] = {}
        # Master-output format metadata {rate, channels, fmt}; published
        # right after compile, before the first sink call — lazy sinks
        # (e.g. the LAME encoder) read it on their first block.
        self.master_meta: Optional[Dict[str, Any]] = None
        # Live-introspection handles (the per-link fill gauges of the
        # reference diagnostics overlay, app.cpp:1574-1595): run() parks its
        # stage queues here so a UI poll thread can read their occupancy
        # mid-run via live_stats().
        self._feeds: Dict[str, "_SourceFeed"] = {}
        self._stage_queues: Dict[str, BoundedBlockQueue] = {}
        # Latest per-FIFO fill vector (tiny device array) + its labels —
        # the chunk-flow counterpart of the reference's per-LINK channel
        # fill (audio-stream.cpp:63,75): resolved only when a UI polls.
        self._latest_gauges = None
        self._gauge_keys: Tuple[str, ...] = ()

    def _open_feeds(self):
        import math

        feeds: Dict[str, _SourceFeed] = {}
        sources: Dict[Tuple[int, str], compiler.SourceSpec] = {}
        pins: Dict[str, Tuple[int, str]] = {}
        generators: Dict[int, int] = {}  # node id -> sample rate
        for nid, node in self.graph.nodes.items():
            proc = node.processor
            ident = proc.info().identifier
            if ident == "audio_generator":
                # Device-synthesized source: no host feed; it only needs a
                # chunk width consistent with the decode feeds' cadence.
                generators[nid] = int(proc.rate)
                continue
            if ident != cfg.AUDIO_INPUT_NODE_NAME:
                continue
            for i, path in enumerate(proc.file_paths):
                feed = _SourceFeed(path, chunk_seconds=self.chunk_seconds)
                key = compiler.external_key(nid, f"output_{i}")
                feeds[key] = feed
                pins[key] = (nid, f"output_{i}")
        # Snap every source's chunk to a shared time quantum (1/gcd of the
        # rates) so all sources — decode feeds AND on-device generators —
        # deliver EXACTLY the same audio-seconds per step: lockstep merges
        # require exactly proportional cadences (chunkflow.
        # plan_aligned_merge), and independent per-rate rounding would
        # drift their alignment FIFOs on long clips.
        hints: Dict[int, Dict[str, int]] = {}
        if feeds or generators:
            g = 0
            for feed in feeds.values():
                g = math.gcd(g, feed.rate)
            for rate in generators.values():
                g = math.gcd(g, rate)
            m = max(1, round(self.chunk_seconds * g))
            for key, feed in feeds.items():
                feed.chunk = m * feed.rate // g
                sources[pins[key]] = compiler.SourceSpec(
                    rate=feed.rate, channels=feed.channels, fmt=feed.fmt,
                    capacity=feed.chunk, t0_us=float(feed.t0_us),
                )
            for nid, rate in generators.items():
                hints[nid] = {"chunk_width": m * rate // g}
        if not feeds and not generators:
            raise ProcessorRuntimeError(
                "Graph has no inputs",
                "Streaming execution requires at least one audio_input "
                "slot or a signal-generator node.",
                "StreamExecutor",
            )
        return feeds, sources, hints

    def run(
        self,
        sink: Callable[[np.ndarray], None],
        progress: Optional[Callable[[float], None]] = None,
        max_flush_steps: int = 10_000,
    ) -> StreamMetrics:
        """Pump the full pipeline; calls ``sink(block)`` on the consumer
        thread for every host master block, in order."""
        wall0 = time.perf_counter()
        feeds, sources, plan_hints = self._open_feeds()
        t0 = time.perf_counter()
        compiled = chunkflow.compile_stream_graph(
            self.graph, sources, mode=self.mode,
            batch_steps=self.batch_steps, plan_hints=plan_hints,
        )
        self.metrics.compile_seconds = time.perf_counter() - t0
        self._gauge_keys = compiled.gauge_keys
        master_key = "master" if self.mode == "export" else "preview"
        if master_key not in compiled.output_meta:
            raise ProcessorRuntimeError(
                f"{self.mode.capitalize()} produced no audio",
                "The graph has no audio_output node receiving a stream.",
                f"{master_key} output missing",
            )
        self.master_meta = dict(compiled.output_meta[master_key])
        out_rate = compiled.output_meta[master_key]["rate"]
        quantize = None
        if (
            self.master_wire == "s16"
            and self.master_meta.get("fmt") == host_decode.FMT_S16
        ):
            import jax

            quantize = jax.jit(
                lambda x: jnp.clip(
                    jnp.trunc(x * jnp.float32(32768.0)), -32768, 32767
                ).astype(jnp.int16)
            )
            self.master_meta["wire"] = "s16"
        frames_keys = [
            k for k, m in compiled.output_meta.items()
            if m["kind"] == "frames"
        ] if self.collect_frames else []

        for feed in feeds.values():
            feed.start()

        egress_q = BoundedBlockQueue(self.egress_depth)
        egress_errors: List[BaseException] = []
        sink_done = threading.Event()
        written = [0]

        host_q = BoundedBlockQueue(self.egress_depth)
        self._feeds = feeds
        self._stage_queues = {"egress": egress_q, "host": host_q}

        def egress():
            # One device_get per chunk resolves (data, n) in a single relay
            # round trip; the valid-length scalar is never fetched on the
            # pump thread (each scalar get is a ~40 ms round trip on this
            # rig, and it would also serialize the pump with device compute).
            #
            # Depth-N d2h (VERDICT r2 #2): up to ``egress_workers`` fetches
            # run CONCURRENTLY on a small pool, order preserved by a
            # pending deque — when the transport is RTT-bound rather than
            # bandwidth-saturated, overlapping round trips multiplies
            # effective egress throughput. d2h_busy_seconds stays the
            # SERIAL exposure (time this thread waits on the oldest
            # fetch); d2h_fetch_seconds sums the in-flight durations.
            import collections
            import concurrent.futures

            import jax

            def fetch(it):
                t0 = time.perf_counter()
                out = jax.device_get(it)
                self.metrics.d2h_fetch_seconds += time.perf_counter() - t0
                return out

            pool = None
            if self.egress_workers > 1:
                pool = concurrent.futures.ThreadPoolExecutor(
                    max_workers=self.egress_workers
                )
            pending = collections.deque()
            try:
                eof = False
                while True:
                    if pool is not None:
                        while not eof and len(pending) < self.egress_workers:
                            nxt = egress_q.pop(stop=self._stop)
                            if nxt is None:
                                eof = True
                                break
                            pending.append(pool.submit(fetch, nxt))
                        if not pending:
                            break
                        t0 = time.perf_counter()
                        host, n = pending.popleft().result()
                        self.metrics.d2h_busy_seconds += (
                            time.perf_counter() - t0
                        )
                    else:
                        item = egress_q.pop(stop=self._stop)
                        if item is None:
                            break
                        t0 = time.perf_counter()
                        host, n = jax.device_get(item)
                        self.metrics.d2h_busy_seconds += (
                            time.perf_counter() - t0
                        )
                    if host.ndim == 3:
                        # Batched dispatch: one fetched [k, C, W] array
                        # fans out to k ordered host blocks.
                        stopped = False
                        for i in range(host.shape[0]):
                            ni = int(n[i])
                            if not ni:
                                continue
                            if not host_q.push(
                                host[i][:, :ni], stop=self._stop
                            ):
                                stopped = True
                                break
                        if stopped:
                            break
                        continue
                    n = int(n)
                    if not n:
                        continue
                    if not host_q.push(host[:, :n], stop=self._stop):
                        break
            except BaseException as exc:
                egress_errors.append(exc)
                self._stop.set()
            finally:
                if pool is not None:
                    pool.shutdown(wait=False, cancel_futures=True)
                host_q.set_eof()

        def consume():
            # The sink (LAME encode / WAV write / playback) runs on its own
            # thread so encoding overlaps the next chunk's d2h.
            try:
                while True:
                    host = host_q.pop(stop=self._stop)
                    if host is None:
                        break
                    t0 = time.perf_counter()
                    sink(host)
                    self.metrics.sink_busy_seconds += (
                        time.perf_counter() - t0
                    )
                    written[0] += host.shape[1]
                    if progress is not None:
                        progress(written[0] / out_rate)
            except BaseException as exc:
                egress_errors.append(exc)
                self._stop.set()
            finally:
                sink_done.set()

        egress_thread = threading.Thread(target=egress, daemon=True)
        egress_thread.start()
        sink_thread = threading.Thread(target=consume, daemon=True)
        sink_thread.start()

        states = compiled.init_states
        source_done = {key: False for key in compiled.input_keys}
        frame_chunks: Dict[str, List] = {k: [] for k in frames_keys}
        rss_guard = _RssGuard(self.metrics)
        try:
            flush_steps = 0
            kb = self.batch_steps
            while not self._stop.is_set():
                rss_guard.check()
                args = {}
                for key in compiled.input_keys:
                    feed = feeds[key]
                    chunk = compiled.chunk_in[key]
                    if kb == 1:
                        if source_done[key]:
                            block = np.zeros(
                                (feed.channels, chunk),
                                dtype=feed.wire_dtype,
                            )
                            n, last = 0, True
                        else:
                            t0 = time.perf_counter()
                            raw, n, last = feed.pop(self._stop)
                            self.metrics.decode_wait_seconds += (
                                time.perf_counter() - t0
                            )
                            block = np.zeros(
                                (feed.channels, chunk),
                                dtype=feed.wire_dtype,
                            )
                            if n:
                                block[:, :n] = raw
                            source_done[key] = last
                        args[key] = (
                            jnp.asarray(block), jnp.int32(n),
                            jnp.bool_(last),
                        )
                        continue
                    # Batched dispatch: k chunks per key stacked on a
                    # leading axis, shipped in ONE h2d put. A source that
                    # EOFs mid-batch pads its remaining slots with the
                    # same (zeros, n=0, last=True) the k=1 path feeds
                    # after EOF.
                    blocks = np.zeros(
                        (kb, feed.channels, chunk), dtype=feed.wire_dtype
                    )
                    ns = np.zeros((kb,), dtype=np.int32)
                    lasts = np.zeros((kb,), dtype=bool)
                    for j in range(kb):
                        if source_done[key]:
                            lasts[j] = True
                            continue
                        t0 = time.perf_counter()
                        raw, n, last = feed.pop(self._stop)
                        self.metrics.decode_wait_seconds += (
                            time.perf_counter() - t0
                        )
                        if n:
                            blocks[j, :, :n] = raw
                        ns[j] = n
                        lasts[j] = last
                        source_done[key] = last
                    args[key] = (
                        jnp.asarray(blocks), jnp.asarray(ns),
                        jnp.asarray(lasts),
                    )
                states, outs = compiled.step(states, args)
                self.metrics.steps += kb
                # Per-edge FIFO gauges: keep only the latest (tiny) device
                # vector; live_stats resolves it lazily when a UI polls,
                # so the hot loop never fetches it.
                if compiled.gauge_keys:
                    g = outs.get("__gauges__")
                    if g is not None:
                        self._latest_gauges = g[-1] if kb > 1 else g
                data, n, odone = outs[master_key]
                # Device-resident hand-off: the egress thread resolves
                # (data, n) in one d2h round trip while the next step
                # computes. The pump thread never touches device results
                # in the steady state — every scalar fetch here would be
                # a blocking relay round trip serialized with compute.
                if quantize is not None:
                    data = quantize(data)
                t0 = time.perf_counter()
                pushed = egress_q.push((data, n), stop=self._stop)
                self.metrics.egress_wait_seconds += (
                    time.perf_counter() - t0
                )
                if not pushed:
                    break
                for k in frames_keys:
                    fdata, f_n, _fd = outs[k]
                    frame_chunks[k].append((fdata, f_n))
                if all(source_done.values()):
                    # odone can only be true once every source has EOF'd,
                    # so the scalar fetch is confined to the short flush
                    # phase after the last real chunk. Batched dispatch:
                    # done when the batch's LAST chunk reports done (done
                    # is monotone — extra post-done scan iterations emit
                    # n=0 chunks the egress skips).
                    finished = (
                        bool(np.asarray(odone)[-1]) if kb > 1
                        else bool(odone)
                    )
                    if finished:
                        break
                    flush_steps += kb
                    if flush_steps > max_flush_steps:
                        raise ProcessorRuntimeError(
                            "Streaming execution stalled",
                            "The graph did not signal completion while "
                            "flushing node state after EOF.",
                            f"steps={self.metrics.steps}",
                        )
        finally:
            egress_q.set_eof()
            # Wait for the drain (both threads set their downstream EOF in
            # their finally blocks, so sink_done fires even on errors).
            drained = sink_done.wait(timeout=600.0)
            self._stop.set()
            for feed in feeds.values():
                feed.stop()
        if egress_errors:
            raise egress_errors[0]
        if not drained:
            # A silent timeout would truncate the sink's output while
            # reporting success — fail loudly instead.
            raise ProcessorRuntimeError(
                "Streaming sink drain timed out",
                "The egress/sink pipeline did not finish within 600 s "
                "of the last chunk; output may be incomplete.",
                f"steps={self.metrics.steps}",
            )
        for key in feeds:
            if feeds[key].errors:
                raise feeds[key].errors[0]

        for k, chunks in frame_chunks.items():
            if chunks:
                import jax

                resolved = jax.device_get(chunks)  # one bulk d2h at the end
                parts = []
                for d, n in resolved:
                    if d.ndim == 4:                 # batched: [k, C, T, bins]
                        parts.extend(
                            d[i][:, : int(n[i]), :]
                            for i in range(d.shape[0]) if int(n[i])
                        )
                    elif int(n):
                        parts.append(d[:, :n, :])
                if parts:
                    self.spectra[k] = np.concatenate(parts, axis=1)

        self.metrics.wall_seconds = time.perf_counter() - wall0
        self.metrics.audio_seconds = written[0] / out_rate
        return self.metrics

    def stop(self) -> None:
        """Cooperative cancellation (the stop_source analog,
        reference: include/infra/runner.hpp:47)."""
        self._stop.set()

    def live_stats(self) -> Dict[str, Any]:
        """Mid-run stage occupancy for a polling UI — the per-link fill
        gauge of the reference diagnostics overlay (app.cpp:1574-1595)
        mapped onto the real queues of this pipeline: per-source decode-
        ahead, device→host egress, and host→sink. Safe to call from any
        thread (reads plain ints maintained under the queues' own locks)."""
        stats: Dict[str, Any] = {
            "steps": self.metrics.steps,
            "sink_busy_seconds": round(self.metrics.sink_busy_seconds, 3),
            "d2h_busy_seconds": round(self.metrics.d2h_busy_seconds, 3),
            "rss_peak_bytes": self.metrics.rss_peak_bytes,
        }
        if self._feeds:
            stats["decode_fill"] = min(
                f.queue.stats.fill_ratio for f in self._feeds.values()
            )
            # Per-source run state (the reference overlay's per-processor
            # Running/Finished tallies, app.cpp:1556-1568): key is the
            # external input key "n<node>:<pin>".
            stats["sources"] = {
                key: {
                    "fill": feed.queue.stats.fill_ratio,
                    "done": feed.queue.eof,
                }
                for key, feed in self._feeds.items()
            }
        for name, q in self._stage_queues.items():
            stats[f"{name}_fill"] = q.stats.fill_ratio
        # Per-edge chunk-flow FIFO fills (the reference's per-link channel
        # gauges, app.cpp:1574-1595 / audio-stream.cpp:63,75): one lazy
        # d2h fetch of a few floats, only on poll — never in the hot loop.
        g = self._latest_gauges
        if g is not None and self._gauge_keys:
            try:
                vals = np.asarray(g)
                stats["edges"] = {
                    key: round(float(v), 4)
                    for key, v in zip(self._gauge_keys, vals)
                }
            except Exception:
                pass  # a mid-teardown fetch must not kill the poll
        return stats
