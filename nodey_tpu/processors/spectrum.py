"""STFT spectrum tap node (target-spec extension).

The reference declares FFTW for a "spectrum display" it never ships
(reference: README.md:28, xmake.lua:15 — zero call sites). BASELINE config 5
requires the node. It is a TAP: audio passes through unchanged on the
``output`` pin while the magnitude spectrogram is emitted as a side output of
the fused program (``jnp.fft`` on device — the TPU answer to FFTW).
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType


class AudioSpectrum(Processor):
    def __init__(self) -> None:
        self.n_fft: int = 1024
        self.hop: int = 512

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_spectrum",
            display_name="Spectrum",
            singleton=False,
            generate=AudioSpectrum,
            description=(
                "STFT Spectrum Tap\n\n## Functionality\n"
                "- Passes audio through unchanged\n"
                "- Emits a Hann-windowed magnitude spectrogram side output\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return [
            PinAttribute("output", "Output", AudioStreamType, is_input=False),
            PinAttribute("input", "Input", AudioStreamType, is_input=True),
        ]

    def param_spec(self) -> List[Dict[str, Any]]:
        # Extension node (the FFTW display the reference declared but never
        # shipped): power-of-two frame sizes keep the DFT GEMM MXU-tiled.
        sizes = [256, 512, 1024, 2048, 4096]
        if self.n_fft not in sizes:
            sizes = sorted(sizes + [self.n_fft])
        return [
            {"key": "n_fft", "label": "FFT Size", "kind": "enum",
             "choices": sizes, "value": self.n_fft},
            {"key": "hop", "label": "Hop (samples)", "kind": "int",
             "min": 1, "max": 8192, "value": self.hop},
        ]

    def serialize(self) -> Any:
        return {"n_fft": self.n_fft, "hop": self.hop}

    def deserialize(self, value: Any) -> None:
        # Tolerant load clamps out-of-range values (a hand-edited project
        # file with hop=0 would otherwise reach math.lcm/division as a raw
        # ZeroDivisionError instead of the structured error surface).
        if isinstance(value, dict):
            n_fft = value.get("n_fft")
            hop = value.get("hop")
            if isinstance(n_fft, int) and not isinstance(n_fft, bool):
                self.n_fft = max(2, n_fft)
            if isinstance(hop, int) and not isinstance(hop, bool):
                self.hop = max(1, hop)

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = inputs.get("input")
        if stream is None:
            raise ProcessorRuntimeError(
                "Spectrum processor has no input",
                "Spectrum requires an audio stream input to function properly.",
                "Input item 'input' not found",
            )
        from nodey_tpu.ops import stft as stft_ops

        spectrum = stft_ops.magnitude_spectrogram(
            stream, n_fft=self.n_fft, hop=self.hop
        )
        ctx.emit(
            f"spectrum_{ctx.node_id}",
            spectrum,
            # Framing metadata lets sharded/chunked executors trim and
            # concatenate per-shard frames exactly (frame axis = 1).
            meta={"hop": self.hop, "n_fft": self.n_fft, "rate": stream.rate},
        )
        return {"output": stream}

    # -- chunk-streaming: hop-aligned frame FIFO; audio passes through,
    #    complete frames emit as a (frames, count, done) side output ----------

    def plan_stream(self, ctx, in_specs):
        spec = in_specs.get("input")
        if spec is None:
            self.lower(ctx, {})  # raises the structured no-input error
        from nodey_tpu.ops import chunkops

        plan = chunkops.stft_plan(self.n_fft, self.hop, spec.width)
        self._stream_plan = plan
        ctx.emit_spec(
            f"spectrum_{ctx.node_id}",
            {
                "kind": "frames",
                "hop": self.hop,
                "n_fft": self.n_fft,
                "rate": spec.rate,
                "frames_cap": plan.frames_cap,
            },
        )
        return {"output": spec}, chunkops.stft_stream_init(
            plan, spec.channels
        )

    def lower_stream(self, ctx, inputs, state):
        from nodey_tpu.ops import chunkops

        chunk = inputs["input"]
        state, spec_frames, f_n, f_done = chunkops.stft_stream_step(
            self._stream_plan, state, chunk.data, chunk.n, chunk.done
        )
        ctx.emit(f"spectrum_{ctx.node_id}", (spec_frames, f_n, f_done))
        return {"output": chunk}, state
