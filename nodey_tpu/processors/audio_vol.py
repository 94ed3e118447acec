"""Volume adjustment node.

Reference: ``processor::Audio_vol`` (src/processor/audio-vol.cpp).
Per-sample gain in the ORIGIN sample format's arithmetic: float streams are
scaled without clamping; integer-origin streams reproduce the reference's
``apply_volume<T>`` clamp-then-truncate semantics (audio-vol.cpp:14-29) so
output is bit-identical to the C++ path.
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu import config
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType

_DESCRIPTION = """Audio Volume Adjuster

## Functionality
- Adjusts the volume of audio streams by a specified factor
- Supports mono and stereo audio formats

## Usage
- Connect audio input streams to the 'Input' pin
- Set the desired volume adjustment factor
"""


class AudioVol(Processor):
    def __init__(self) -> None:
        # Default matches the reference (include/processor/audio-vol.hpp:34).
        self.volume: float = 1.0

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_volume_adjust",
            display_name="Adjust Volume",
            singleton=False,
            generate=AudioVol,
            description=_DESCRIPTION,
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return [
            PinAttribute("output", "Output", AudioStreamType, is_input=False),
            PinAttribute("input", "Input", AudioStreamType, is_input=True),
        ]

    def set_volume(self, volume: float) -> None:
        """Clamped setter (reference slider bounds: audio-vol.cpp:262-270,
        include/config.hpp:58)."""
        self.volume = min(max(float(volume), 0.0), config.AUDIO_VOLUME_MAX)

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widgets: DragFloat "Volume" 0..max_volume, 0.01 step,
        # "%.2f" (audio-vol.cpp:260-276). volume is NOT in serialize()
        # (project-file quirk), so the live value rides the spec.
        return [{
            "key": "volume", "label": "Volume", "kind": "float",
            "min": 0.0, "max": config.AUDIO_VOLUME_MAX, "step": 0.01,
            "value": self.volume,
        }]

    # serialize: the reference deliberately persists NOTHING for this node
    # (include/processor/audio-vol.hpp:57-58) — a project-file quirk we keep
    # for byte-semantics compatibility. Base-class {} / no-op defaults apply.
    # Undo snapshots are NOT project files, so volume IS captured there.

    def snapshot_params(self) -> Dict[str, Any]:
        return {"volume": self.volume}

    def restore_params(self, blob: Any) -> None:
        if isinstance(blob, dict) and "volume" in blob:
            self.set_volume(blob["volume"])

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = inputs.get("input")
        if stream is None:
            raise ProcessorRuntimeError(
                "Volume adjust processor has no input",
                "Volume adjust processor requires an audio stream input to "
                "function properly.",
                "Input item 'input' not found",
            )
        from nodey_tpu.ops import gain as gain_ops

        return {"output": gain_ops.apply_gain(stream, self.volume)}

    # -- chunk-streaming: gain is stateless element-wise work -----------------

    def plan_stream(self, ctx, in_specs):
        self._require(in_specs)
        return {"output": in_specs["input"]}, None

    def lower_stream(self, ctx, inputs, state):
        chunk = self._require(inputs)
        from nodey_tpu.ops.gain import _gain_array
        import jax.numpy as jnp

        data = _gain_array(chunk.data, self.volume, chunk.spec.fmt, jnp)
        return {"output": chunk.with_data(data)}, state

    def _require(self, inputs):
        value = inputs.get("input")
        if value is None:
            raise ProcessorRuntimeError(
                "Volume adjust processor has no input",
                "Volume adjust processor requires an audio stream input to "
                "function properly.",
                "Input item 'input' not found",
            )
        return value
