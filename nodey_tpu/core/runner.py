"""The Runner: orchestrates decode -> compile -> execute -> sink.

Replaces the reference Runner's fiber orchestration
(reference: src/infra/runner.cpp:11-154) and the App's preview/export
plumbing (src/frontend/app.cpp:2001-2094):

* per-node fibers -> one fused jitted program (core.compiler)
* per-edge channels -> SSA values
* Process_context injection -> the ``mode`` argument
* per-fiber exception capture -> the state machine below: errors land in
  ``self.error`` with state Error, mirroring Processor_resource
  (runner.hpp:36-50), and are re-raised to the caller with the three-part
  user error shape intact
* progress atomic -> the ``progress`` callback
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import json
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from nodey_tpu import config as cfg
from nodey_tpu.core import compiler
from nodey_tpu.core.errors import (
    NodeyError,
    ProcessorRuntimeError,
    RunCancelled,
    UnstreamableGraphError,
)
from nodey_tpu.core.graph import Graph
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import encode as host_encode


class RunnerState(enum.Enum):
    """reference: include/infra/runner.hpp:25-31."""

    READY = "ready"
    RUNNING = "running"
    FINISHED = "finished"
    ERROR = "error"


@dataclasses.dataclass
class RunMetrics:
    """Per-run metrics (SURVEY.md §5.5): RTF is the north-star number."""

    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    decode_seconds: float = 0.0
    compile_seconds: float = 0.0
    device_seconds: float = 0.0
    encode_seconds: float = 0.0
    # "streamed" | "offline"; export_streamed sets "offline" when an
    # UnstreamableGraphError forced the whole-clip fallback, so the CLI
    # reports the path actually taken.
    mode: str = "offline"
    # Host RSS high-water mark observed during the run (streamed paths
    # sample it on the pump thread; the _RssGuard ceiling in
    # stream_executor enforces a bound — the reference's analog is its
    # O(16-frame) channel memory, audio-stream.hpp:48).
    rss_peak_bytes: int = 0

    @property
    def rtf(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0


@dataclasses.dataclass
class RunResult:
    master: Optional[np.ndarray]  # [channels, n] float32 (valid length only)
    rate: int
    fmt: str
    spectra: Dict[str, np.ndarray]
    metrics: RunMetrics
    # Device-resident master (set when rendered with fetch=False) — lets the
    # export path stream HBM->host egress overlapped with encoding.
    device_master: Optional[Any] = None
    master_length: int = 0


def _bucket(n: int, quantum: int) -> int:
    """Round a clip length up to the padding quantum so recompiles are rare."""
    return max(quantum, -(-n // quantum) * quantum)


class Runner:
    """Executes a validated graph in export or preview mode."""

    def __init__(self, graph: Graph, exec_config: cfg.ExecConfig = cfg.DEFAULT_EXEC):
        cfg.enable_compile_cache()  # library embedders get the persistent cache too
        import threading

        self.graph = graph
        self.exec_config = exec_config
        self.state = RunnerState.READY
        self.error: Optional[BaseException] = None
        self._compile_cache: Dict[str, compiler.CompiledGraph] = {}
        # Per-stage StreamMetrics of the most recent streamed export
        # (None when the run took the offline fallback or never streamed).
        self.last_stream_metrics = None
        self._active_executor = None
        # Cooperative cancellation for ALL run paths (the stop_source
        # analog, reference: include/infra/runner.hpp:47): checked between
        # offline stages (decode/compile/dispatch/fetch), per egress block
        # in export(), and inside the streaming executor's hot loops.
        self._stop_event = threading.Event()

    def stop(self) -> None:
        """Cooperatively cancel whatever run is in flight — offline render,
        block-egress export, or streamed export. Chunk-granular, like the
        reference's per-node stop tokens checked in every hot loop
        (src/infra/runner.cpp:53-63; src/processor/audio-io.cpp:173). The
        cancelled call raises :class:`RunCancelled` and the runner returns
        to READY (the reference's Ready-after-teardown)."""
        self._stop_event.set()
        executor = self._active_executor
        if executor is not None:
            executor.stop()

    # Backwards-compatible name (pre-round-3 API; the server uses it).
    stop_streaming = stop

    def _check_cancel(self, where: str) -> None:
        if self._stop_event.is_set():
            raise RunCancelled(where)

    @staticmethod
    def _remove_partial(path: str) -> None:
        """Delete the truncated output of a cancelled export (the
        reference leaves no partial artifact either — its teardown joins
        the sink fiber before the file handle closes)."""
        import contextlib
        import os

        with contextlib.suppress(OSError):
            os.remove(path)

    # -- decode -------------------------------------------------------------

    def _decode_inputs(self):
        """Decode every audio_input slot host-side, files in parallel.

        The per-file fan-out the reference runs as nested decode fibers
        (audio-io.cpp:242-279) maps to a thread pool here — the native
        FFmpeg shim releases the GIL inside libavcodec, so multi-file
        projects decode concurrently."""
        from concurrent.futures import ThreadPoolExecutor

        arrays: Dict[str, np.ndarray] = {}
        lengths: Dict[str, int] = {}
        sources: Dict[Tuple[int, str], compiler.SourceSpec] = {}
        slots = []
        for nid, node in self.graph.nodes.items():
            proc = node.processor
            if proc.info().identifier != cfg.AUDIO_INPUT_NODE_NAME:
                continue
            slots.extend(
                (nid, i, path) for i, path in enumerate(proc.file_paths)
            )
        if not slots:
            return arrays, lengths, sources
        with ThreadPoolExecutor(max_workers=min(8, len(slots))) as pool:
            decoded_all = list(
                pool.map(lambda s: host_decode.decode_file(s[2]), slots)
            )
        for (nid, i, path), decoded in zip(slots, decoded_all):
            n = decoded.num_samples
            capacity = _bucket(n, self.exec_config.pad_quantum)
            if decoded.fmt == host_decode.FMT_S16:
                # s16 sources ingest as native int16 — half the
                # PCIe/relay bytes; round(x*32768) exactly inverts the
                # decoder's s/32768 and the jitted program dequantizes
                # (compiler.LowerCtx.external).
                padded = np.zeros(
                    (decoded.channels, capacity), dtype=np.int16
                )
                padded[:, :n] = np.clip(
                    np.round(decoded.data * 32768.0), -32768, 32767
                ).astype(np.int16)
            else:
                padded = np.zeros(
                    (decoded.channels, capacity), dtype=np.float32
                )
                padded[:, :n] = decoded.data
            key = compiler.external_key(nid, f"output_{i}")
            arrays[key] = padded
            lengths[key] = n
            sources[(nid, f"output_{i}")] = compiler.SourceSpec(
                rate=decoded.rate,
                channels=decoded.channels,
                fmt=decoded.fmt,
                capacity=capacity,
                t0_us=float(decoded.pts0_us),
            )
        return arrays, lengths, sources

    # -- compile ------------------------------------------------------------

    def _graph_fingerprint(self, sources, mode: str) -> str:
        """Cache key over graph structure + node params + source formats.

        Node params must come from live state (not serialize(): the gain
        node's volume is deliberately absent there, SURVEY.md §2.2)."""
        payload = {
            "serde": self.graph.serialize(),
            "params": {
                str(nid): sorted(
                    (k, repr(v)) for k, v in vars(node.processor).items()
                )
                for nid, node in self.graph.nodes.items()
            },
            "sources": sorted(
                (nid, pin, dataclasses.astuple(spec))
                for (nid, pin), spec in sources.items()
            ),
            "mode": mode,
        }
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True, default=str).encode()
        ).hexdigest()

    def _compile(self, sources, mode: str) -> Tuple[compiler.CompiledGraph, float]:
        key = self._graph_fingerprint(sources, mode)
        cached = self._compile_cache.get(key)
        if cached is not None:
            return cached, 0.0
        t0 = time.perf_counter()
        compiled = compiler.compile_graph(self.graph, sources, mode=mode)
        dt = time.perf_counter() - t0
        self._compile_cache[key] = compiled
        return compiled, dt

    # -- execute ------------------------------------------------------------

    def render(self, mode: str = "export", fetch: bool = True,
               _nested: bool = False) -> RunResult:
        """Run the graph once; returns the master mix (+ spectra).

        ``mode='export'`` leaves the master at native rate for the encoder
        (LAME resamples, like the reference); ``mode='preview'`` produces
        clamped 48 kHz stereo (reference: do_preview, audio-io.cpp:504-637).
        ``fetch=False`` keeps the master device-resident (RunResult.
        device_master) so the caller can stream the egress.

        Cancellation (``Runner.stop()``) is stage-granular here — checked
        after decode, compile, and dispatch; the fused device program itself
        is sub-second at the framework's RTF targets. ``_nested`` keeps a
        stop set during an enclosing export() visible to this call.
        """
        import jax

        if not _nested:
            self._stop_event.clear()
        self.state = RunnerState.RUNNING
        self.error = None
        metrics = RunMetrics()
        wall0 = time.perf_counter()
        try:
            t0 = time.perf_counter()
            arrays, lengths, sources = self._decode_inputs()
            metrics.decode_seconds = time.perf_counter() - t0
            self._check_cancel("after decode")

            compiled, metrics.compile_seconds = self._compile(sources, mode)
            self._check_cancel("after compile")

            # Time the device stage to COMPLETION: dispatch is async (and
            # block_until_ready is unreliable on the axon relay), so the
            # scalar length fetch doubles as the completion probe.
            t0 = time.perf_counter()
            outputs = compiled.run_device(arrays, lengths)
            master = None
            device_master = None
            master_len = 0
            rate = cfg.SAMPLE_RATE
            fmt = "flt"
            spectra: Dict[str, np.ndarray] = {}
            master_key = "master" if mode == "export" else "preview"
            for key, meta in compiled.output_meta.items():
                if meta["kind"] == "stream" and key == master_key:
                    data, length = outputs[key]
                    master_len = int(jax.device_get(length))
                    rate = meta["rate"]
                    fmt = meta["fmt"]
                    device_master = data
            metrics.device_seconds = time.perf_counter() - t0
            self._check_cancel("after device dispatch")
            # Host transfers happen after the compute timing window.
            if fetch and device_master is not None:
                master = np.asarray(device_master)[:, :master_len]
                device_master = None
            for key, meta in compiled.output_meta.items():
                if meta["kind"] == "array":
                    spectra[key] = np.asarray(outputs[key])

            metrics.wall_seconds = time.perf_counter() - wall0
            metrics.audio_seconds = master_len / rate if rate else 0.0
            from nodey_tpu.core.stream_executor import _rss_bytes

            metrics.rss_peak_bytes = _rss_bytes()
            self.state = RunnerState.FINISHED
            return RunResult(
                master=master, rate=rate, fmt=fmt, spectra=spectra,
                metrics=metrics, device_master=device_master,
                master_length=master_len,
            )
        except RunCancelled:
            # Not an error: the reference tears the Runner down and lands
            # back in Editing with no popup (app.cpp:1949-1957).
            self.state = RunnerState.READY
            raise
        except BaseException as exc:
            # Error capture mirrors the reference's per-fiber catch
            # (runner.cpp:87-136) + poll_state routing (app.cpp:2097-2149).
            self.state = RunnerState.ERROR
            self.error = exc
            raise

    def export(
        self,
        path: str,
        kbps: int = 320,
        progress: Optional[Callable[[float], None]] = None,
        block_seconds: float = 4.0,
    ) -> RunMetrics:
        """Render + encode (reference: create_export_runner,
        app.cpp:2042-2094, and do_export, audio-io.cpp:640-844). ``.wav``
        paths take the lossless WavWriter sink instead of LAME.

        The master stays device-resident; egress streams block-by-block
        through a bounded queue while LAME encodes — HBM->host transfer and
        encoding overlap (the double-buffered pipeline SURVEY.md §5.8 calls
        for at the export boundary)."""
        import threading

        from nodey_tpu.host.streamio import BoundedBlockQueue

        if not getattr(self, "_nested_export", False):
            self._stop_event.clear()
        result = self.render(mode="export", fetch=False, _nested=True)
        if result.device_master is None:
            raise ProcessorRuntimeError(
                "Export produced no audio",
                "The graph has no audio_output node receiving a stream.",
                "master output missing",
            )
        from nodey_tpu.core.streaming import start_block_egress

        t0 = time.perf_counter()
        n = result.master_length
        channels = result.device_master.shape[0]
        block = max(1, int(block_seconds * result.rate))

        queue = BoundedBlockQueue()
        stop = threading.Event()
        producer_error: list = []
        thread = start_block_egress(
            result.device_master, n, block, queue, stop, producer_error
        )
        try:
            written = 0
            with host_encode.open_sink(
                path, result.rate, channels, kbps, result.fmt
            ) as enc:
                while True:
                    # Block-granular cancellation: the encode loop is the
                    # long pole of an offline export (reference analog: the
                    # stop token checked in do_export's hot loop,
                    # src/processor/audio-io.cpp:173, 640-844).
                    self._check_cancel("export encode loop")
                    host_block = queue.pop(stop=stop)
                    if host_block is None:
                        break
                    enc.write(host_block)
                    written += host_block.shape[1]
                    if progress is not None:
                        progress(written / result.rate)
            if producer_error:
                raise producer_error[0]
        except RunCancelled:
            stop.set()
            self.state = RunnerState.READY
            self._remove_partial(path)
            raise
        except BaseException as exc:
            stop.set()
            self.state = RunnerState.ERROR
            self.error = exc
            raise
        finally:
            stop.set()
            thread.join(timeout=10.0)
        result.metrics.encode_seconds = time.perf_counter() - t0
        result.metrics.wall_seconds += result.metrics.encode_seconds
        return result.metrics

    def preview(self) -> RunResult:
        """Offline preview render: clamped 48 kHz stereo master."""
        return self.render(mode="preview")

    def export_streamed(
        self,
        path: str,
        kbps: int = 320,
        progress: Optional[Callable[[float], None]] = None,
        chunk_seconds: float = 16.0,  # export is latency-insensitive; fewer
                                      # chunks amortize the per-dispatch d2h
                                      # round trip (~30 ms on relay rigs) AND
                                      # the relay proxy client's per-RPC
                                      # native-memory bookkeeping (~1.1 MB/
                                      # dispatch, ROUND4.md §7). Measured
                                      # sweep (2026-08-19, warm, 300 s wav):
                                      # 8 s → 35.7x, 16 s → 38.9x, 24 s →
                                      # 16.4x (the 4-step batched dispatch
                                      # puts 24 s chunks at ~18 MB per d2h
                                      # fetch, past the relay's happy size);
                                      # 16 s is the plateau.
    ) -> RunMetrics:
        """Fully pipelined export: decode ∥ device chunk-step ∥ d2h ∥ LAME.

        The incremental counterpart of :meth:`export` — computes WHILE
        decoding with bounded host/device memory (the reference's streaming
        export pipeline, audio-io.cpp:86-226 + 640-844), via the chunk-flow
        compiler (core/chunkflow.py) and streaming executor
        (core/stream_executor.py)."""
        from nodey_tpu.core.stream_executor import StreamExecutor

        self._stop_event.clear()
        self.state = RunnerState.RUNNING
        self.error = None
        # Batch 4 chunk steps per device dispatch (lax.scan over the same
        # traced step, byte-identical output): one h2d/execute/d2h per
        # 48 s of audio instead of per 12 s — ~12% faster export wall on
        # the relay rig (RSS-neutral; measured ROUND4.md §21).
        # NODEY_STREAM_BATCH overrides (1 disables).
        import os as _os

        batch = max(1, int(_os.environ.get("NODEY_STREAM_BATCH", "4")))
        executor = StreamExecutor(
            self.graph, mode="export", chunk_seconds=chunk_seconds,
            master_wire="s16", collect_frames=False, batch_steps=batch,
        )
        # Exposed for cooperative cancellation (Runner.stop_streaming).
        self._active_executor = executor
        enc_holder: Dict[str, Any] = {}

        def sink(block: np.ndarray) -> None:
            if "enc" not in enc_holder:
                # Lazy open once the first block fixes rate/channels/format
                # (like the reference's first-frame LAME init,
                # audio-io.cpp:656-658); the executor publishes master_meta
                # after compile, before any sink call.
                meta = executor.master_meta
                enc_holder["enc"] = host_encode.open_sink(
                    path, meta["rate"], meta["channels"], kbps, meta["fmt"]
                )
            enc_holder["enc"].write(block)

        try:
            sm = executor.run(sink, progress=progress)
            # A stop() mid-run makes the executor drain and return early
            # with a truncated output — report the cancellation, don't
            # pass the partial file off as a finished export.
            self._check_cancel("streamed export")
            if "enc" in enc_holder:
                enc_holder["enc"].close()
        except UnstreamableGraphError:
            # Graphs whose mixer branches run at different tempos cannot
            # stream in lockstep (chunkflow.plan_aligned_merge rejects
            # them before any output is produced); fall back to the
            # offline whole-clip export, which handles them exactly.
            # (_nested_export keeps a stop() issued before the fallback
            # visible to the offline path's cancel checks.)
            self.last_stream_metrics = None
            self._nested_export = True
            try:
                return self.export(path, kbps=kbps, progress=progress)
            finally:
                self._nested_export = False
        except RunCancelled:
            self.state = RunnerState.READY
            if "enc" in enc_holder:
                try:
                    enc_holder["enc"].close()
                except Exception:
                    pass
            self._remove_partial(path)
            raise
        except BaseException as exc:
            self.state = RunnerState.ERROR
            self.error = exc
            if "enc" in enc_holder:
                try:
                    enc_holder["enc"].close()
                except Exception:
                    pass
            raise
        self.state = RunnerState.FINISHED
        # Full per-stage StreamMetrics kept for diagnostics/bench.
        self.last_stream_metrics = sm
        metrics = RunMetrics(
            audio_seconds=sm.audio_seconds,
            wall_seconds=sm.wall_seconds,
            compile_seconds=sm.compile_seconds,
            mode="streamed",
            rss_peak_bytes=sm.rss_peak_bytes,
        )
        return metrics
