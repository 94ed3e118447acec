"""Audio output node — the graph's sink (preview playback or MP3 export).

Reference: ``processor::Audio_output`` (src/processor/audio-io.cpp:429-868).
Mode selection via an injected context mirrors the reference's
``Process_context`` {do_export, export_path, kbps, progress} routing
(include/processor/audio-io.hpp:62-69, src/frontend/app.cpp:2013-2024,
2061-2076):

* preview: resample to 48 kHz f32 stereo, clamp to +/-1, hand blocks to the
  host playback sink (reference: do_preview, audio-io.cpp:504-637)
* export:  emit the master stream; the host runtime feeds LAME CBR at the
  stream's native rate with 48 kHz output, exactly like the reference
  (do_export, audio-io.cpp:640-844 — LAME performs the final resample)
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp

from nodey_tpu import config
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import FMT_FLT, AudioStreamType

_DESCRIPTION = """Audio Output Processor

## Functionality
- Terminal sink of the graph: real-time preview or MP3 export
- Preview renders 48kHz 32-bit float stereo
- Export encodes MP3 CBR via LAME at the configured bitrate

## Usage
- Connect the processed stream to the 'Input' pin
"""


class AudioOutput(Processor):
    """Singleton sink node (reference: src/processor/audio-io.cpp:429-446)."""

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_output",
            display_name="Audio Output",
            singleton=True,
            generate=AudioOutput,
            description=_DESCRIPTION,
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return [
            PinAttribute(
                identifier="input",
                display_name="Input",
                type=AudioStreamType,
                is_input=True,
            )
        ]

    # serialize/deserialize: no parameters, like the reference
    # (include/processor/audio-io.hpp:106-107) — base-class {} default.

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = inputs.get("input")
        if stream is None:
            # Reference: missing input is a user-facing runtime error
            # (audio-io.cpp:854-862).
            raise ProcessorRuntimeError(
                "Audio output processor has no input",
                "Audio output requires an audio stream input to function "
                "properly.",
                "Input item 'input' not found",
            )

        if ctx.mode == "export":
            # Native-rate master; host-side LAME resamples to 48 kHz out,
            # matching the reference's lame_set_out_samplerate
            # (audio-io.cpp:809-831).
            ctx.emit("master", stream)
        else:
            # Preview path: 48 kHz f32 stereo, clamped
            # (reference: audio-io.cpp:532-618).
            from nodey_tpu.ops import resample as resample_ops

            out = resample_ops.to_rate_and_stereo(
                stream, config.SAMPLE_RATE
            )
            clamped = jnp.clip(out.data, -1.0, 1.0)
            ctx.emit("preview", out.with_data(clamped, fmt=FMT_FLT))
        return {}

    # -- chunk-streaming sink ---------------------------------------------------

    def _require_spec(self, in_specs):
        spec = in_specs.get("input")
        if spec is None:
            raise ProcessorRuntimeError(
                "Audio output processor has no input",
                "Audio output requires an audio stream input to function "
                "properly.",
                "Input item 'input' not found",
            )
        return spec

    def plan_stream(self, ctx, in_specs):
        from nodey_tpu.core import chunkflow

        spec = self._require_spec(in_specs)
        if ctx.mode == "export":
            ctx.emit_spec(
                "master",
                {"kind": "stream", "rate": spec.rate,
                 "channels": spec.channels, "fmt": spec.fmt},
            )
            return {}, None
        stereo = spec.replace(channels=2, fmt="flt")
        out_spec, state, self._rs_plan = chunkflow.plan_resample_stage(
            stereo, config.SAMPLE_RATE
        )
        ctx.emit_spec(
            "preview",
            {"kind": "stream", "rate": config.SAMPLE_RATE,
             "channels": 2, "fmt": "flt"},
        )
        return {}, state

    def lower_stream(self, ctx, inputs, state):
        from nodey_tpu.core import chunkflow

        chunk = inputs.get("input")
        if chunk is None:
            raise ProcessorRuntimeError(
                "Audio output processor has no input",
                "Audio output requires an audio stream input to function "
                "properly.",
                "Input item 'input' not found",
            )
        if ctx.mode == "export":
            ctx.emit("master", chunk)
            return {}, state
        stereo = chunkflow.to_stereo_chunk(chunk)
        state, out = chunkflow.run_resample_stage(
            self._rs_plan, state, stereo, config.SAMPLE_RATE
        )
        out = out.with_data(jnp.clip(out.data, -1.0, 1.0), fmt=FMT_FLT)
        ctx.emit("preview", out)
        return {}, state
