"""Channel split node (target-spec extension).

No reference counterpart ships — BASELINE config 2 ("Channel split ->
per-channel gain -> merge") requires one; the natural inverse of the bimix
merge nodes. Splits a stereo stream into two mono streams (a mono input is
duplicated to both outputs, mirroring libswresample's unity-gain mono
upmix used throughout the reference's mixers).
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType


class AudioSplit(Processor):
    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_split",
            display_name="Channel Split",
            singleton=False,
            generate=AudioSplit,
            description=(
                "Stereo Channel Splitter\n\n## Functionality\n"
                "- Splits a stereo stream into left/right mono streams\n"
                "- Mono input is duplicated to both outputs\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return [
            PinAttribute("output_l", "Left", AudioStreamType, is_input=False),
            PinAttribute("output_r", "Right", AudioStreamType, is_input=False),
            PinAttribute("input", "Input", AudioStreamType, is_input=True),
        ]

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = inputs.get("input")
        if stream is None:
            raise ProcessorRuntimeError(
                "Channel split processor has no input",
                "Channel split requires an audio stream input to function "
                "properly.",
                "Input item 'input' not found",
            )
        from nodey_tpu.ops import mix as mix_ops

        left, right = mix_ops.split_channels(stream)
        return {"output_l": left, "output_r": right}

    # -- chunk-streaming: stateless channel slicing ----------------------------

    def plan_stream(self, ctx, in_specs):
        spec = in_specs.get("input")
        if spec is None:
            self.lower(ctx, {})  # raises the structured no-input error
        mono = spec.replace(channels=1) if spec.channels == 2 else spec
        return {"output_l": mono, "output_r": mono}, None

    def lower_stream(self, ctx, inputs, state):
        chunk = inputs["input"]
        if chunk.spec.channels == 1:
            return {"output_l": chunk, "output_r": chunk}, state
        return {
            "output_l": chunk.with_data(chunk.data[0:1]),
            "output_r": chunk.with_data(chunk.data[1:2]),
        }, state
