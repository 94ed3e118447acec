"""Two-input channel combiner nodes (bimix v1 + v2).

Reference: ``processor::Audio_bimix`` / ``Audio_bimix_v2``
(src/processor/audio-bimix.cpp).

v1 (audio-bimix.cpp:90-330): per side, resample to 48 kHz stereo; average each
side's stereo to mono; write the left side's mono into the output L channel
scaled by (1 - bias) and the right side's into R scaled by (1 + bias)
(audio-bimix.cpp:310-316). Frames are paired naively from the start of each
stream; a side that ends early contributes silence.

v2 (audio-bimix.cpp:455-875): same per-side mono downmix, but samples are
placed on a shared 48 kHz time grid at each side's own start timestamp —
disjoint regions zero-fill the other channel (the alignment engine at
audio-bimix.cpp:776-872). No bias parameter (serialize is {},
audio-bimix.cpp:444-449). NOTE a known reference quirk not replicated: v2
stamps each resampled frame with its END time (time_* incremented before the
stamp, audio-bimix.cpp:619/711), shifting both sides by one decoder-frame
duration; with equal frame cadence on both sides the shift cancels in
alignment, and the batched design has no frame boundaries to reproduce it.
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType


def _bimix_pins() -> List[PinAttribute]:
    # Reference: audio-bimix.cpp:51-80 / 411-442.
    return [
        PinAttribute("output", "Output", AudioStreamType, is_input=False),
        PinAttribute("input_l", "Left", AudioStreamType, is_input=True),
        PinAttribute("input_r", "Right", AudioStreamType, is_input=True),
    ]


def _require_inputs(inputs: Dict[str, Any]):
    left = inputs.get("input_l")
    right = inputs.get("input_r")
    if left is None or right is None:
        # Reference: audio-bimix.cpp:105-113 / 484-490.
        raise ProcessorRuntimeError(
            "Audio Channel mix processor has no input",
            "Audio channel mix processor requires an audio stream input to "
            "function properly.",
            "Input item 'input' not found",
        )
    return left, right


class _BimixStreamBase(Processor):
    """Shared chunk-streaming machinery for both bimix variants: per side a
    streaming resampler to the 48 kHz grid + mono downmix, then aligned
    merge FIFOs (prefilled with placement-offset silence for v2)."""

    def _prefills(self, specs) -> list:
        self._t0_out = 0.0
        return [0, 0]

    def _combine(self, win_l, win_r):
        raise NotImplementedError

    def plan_stream(self, ctx, in_specs):
        from nodey_tpu import config
        from nodey_tpu.core import chunkflow

        if "input_l" not in in_specs or "input_r" not in in_specs:
            _require_inputs({})
        self._rs_plans = []
        rs_states = []
        normed = []
        for name in ("input_l", "input_r"):
            spec = in_specs[name].replace(channels=2, fmt="flt")
            out_spec, st, plan = chunkflow.plan_resample_stage(
                spec, config.BIMIX_STD_SAMPLE_RATE
            )
            self._rs_plans.append(plan)
            rs_states.append(st)
            normed.append(out_spec.replace(channels=1))
        self._merge_plan, merge_fifos = chunkflow.plan_aligned_merge(
            normed, self._prefills(in_specs)
        )
        out_spec = chunkflow.ChunkSpec(
            rate=config.BIMIX_STD_SAMPLE_RATE, channels=2, fmt="flt",
            width=self._merge_plan["take_cap"], t0_us=self._t0_out,
            cadence=normed[0].cadence,
        )
        return {"output": out_spec}, {"rs": rs_states, "merge": merge_fifos}

    def lower_stream(self, ctx, inputs, state):
        from nodey_tpu import config
        from nodey_tpu.core import chunkflow

        left, right = _require_inputs(inputs)
        rs_states = []
        monos = []
        for chunk, plan, st in zip(
            (left, right), self._rs_plans, state["rs"]
        ):
            stereo = chunkflow.to_stereo_chunk(chunk)
            st, out = chunkflow.run_resample_stage(
                plan, st, stereo, config.BIMIX_STD_SAMPLE_RATE
            )
            rs_states.append(st)
            monos.append(chunkflow.side_mono_chunk(out))
        merge, windows, take, done = chunkflow.run_aligned_merge(
            self._merge_plan, state["merge"], monos
        )
        data = self._combine(windows[0], windows[1])
        out = chunkflow.ChunkStream(
            data=data, n=take, done=done,
            spec=chunkflow.ChunkSpec(
                rate=config.BIMIX_STD_SAMPLE_RATE, channels=2, fmt="flt",
                width=data.shape[1], t0_us=self._t0_out,
            ),
        )
        return {"output": out}, {"rs": rs_states, "merge": merge}


class AudioBimix(_BimixStreamBase):
    def __init__(self) -> None:
        # Default: include/processor/audio-bimix.hpp:36.
        self.bias: float = 0.0

    def _combine(self, win_l, win_r):
        import jax.numpy as jnp

        return jnp.concatenate(
            [
                win_l * jnp.float32(1.0 - self.bias),
                win_r * jnp.float32(1.0 + self.bias),
            ],
            axis=0,
        )

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_bimix",
            display_name="Audio Bimix",
            singleton=False,
            generate=AudioBimix,
            description=(
                "Stereo Channel Mixer\n\n## Functionality\n"
                "- Combine two streams into one stereo stream with bias\n"
                "- Output: 48kHz 32-bit float stereo\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return _bimix_pins()

    def set_bias(self, bias: float) -> None:
        """Clamped setter (reference: audio-bimix.cpp:348-349)."""
        self.bias = min(max(float(bias), -1.0), 1.0)

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widget: DragFloat "Bias" step 0.005, -1..1, "%.3f"
        # (audio-bimix.cpp:348).
        return [{"key": "bias", "label": "Bias", "kind": "float",
                 "min": -1.0, "max": 1.0, "step": 0.005,
                 "value": self.bias}]

    # -- serde (reference: audio-bimix.cpp:358-383) --------------------------

    def serialize(self) -> Any:
        return {"bias": self.bias}

    def deserialize(self, value: Any) -> None:
        if not isinstance(value, dict) or "bias" not in value:
            raise ProcessorRuntimeError(
                "Failed to deserialize JSON file",
                "Audio_bimix failed to serialize the JSON input because of "
                "missing or invalid fields.",
                "Wrong field: bias",
            )
        bias = value["bias"]
        if isinstance(bias, bool) or not isinstance(bias, (int, float)):
            raise ProcessorRuntimeError(
                "Failed to deserialize JSON file",
                "Audio_bimix failed to serialize the JSON input because of "
                "missing or invalid fields.",
                "Wrong field: bias",
            )
        self.bias = min(max(float(bias), -1.0), 1.0)

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        left, right = _require_inputs(inputs)
        from nodey_tpu.ops import mix as mix_ops

        return {"output": mix_ops.bimix(left, right, self.bias)}


class AudioBimixV2(_BimixStreamBase):
    """Time-aligned variant; no parameters
    (reference: audio-bimix.cpp:444-449)."""

    def _prefills(self, specs) -> list:
        # Placement offsets as FIFO silence prefill: each side starts at its
        # own pts on the shared grid (reference alignment engine,
        # audio-bimix.cpp:776-872; rounding per :817-824).
        from nodey_tpu import config

        rate = config.BIMIX_STD_SAMPLE_RATE
        t0_l = specs["input_l"].t0_us
        t0_r = specs["input_r"].t0_us
        self._t0_out = min(t0_l, t0_r)
        return [
            round((t0_l - self._t0_out) * 1e-6 * rate),
            round((t0_r - self._t0_out) * 1e-6 * rate),
        ]

    def _combine(self, win_l, win_r):
        import jax.numpy as jnp

        return jnp.concatenate([win_l, win_r], axis=0)

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_bimix_v2",
            display_name="Audio Bimix V2",
            singleton=False,
            generate=AudioBimixV2,
            description=(
                "Advanced Stereo Channel Mixer (V2)\n\n## Functionality\n"
                "- Time-aligned combination of asynchronous L/R inputs\n"
                "- Output: 48kHz 32-bit float stereo\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return _bimix_pins()

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        left, right = _require_inputs(inputs)
        from nodey_tpu.ops import mix as mix_ops

        return {"output": mix_ops.bimix_v2(left, right)}
