"""N-input weighted mixer node.

Reference: ``processor::Audio_amix`` (src/processor/audio-amix.cpp).
Each input is normalized to 48 kHz stereo float (the reference allocates one
SwrContext per input, audio-amix.cpp:206-243), then the output is the
per-sample weighted sum ``sum_i in_i * volumes[i]`` on both channels
(audio-amix.cpp:296-307). Inputs that end early contribute silence until all
are exhausted (audio-amix.cpp:279-291, 320) — in the batched world that is
zero padding up to the longest resampled input.
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType

_DESCRIPTION = """Multi-Channel Audio Mixer

## Functionality
- Mix multiple audio input streams into a single stereo output
- Support 1-16 configurable input channels
- Volume lock mechanism for normalization

## Output Format
- Sample Rate: 48kHz, 32-bit Float, Stereo
"""


class AudioAmix(Processor):
    def __init__(self) -> None:
        # Defaults: include/processor/audio-amix.hpp:36-38. The reference's
        # UI initializes missing volumes to 1.0 (audio-amix.cpp:346-347).
        self.input_num: int = 2
        self.volumes: List[float] = []
        self.locks: List[bool] = []

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_amix",
            display_name="Audio Amix",
            singleton=False,
            generate=AudioAmix,
            description=_DESCRIPTION,
        )

    def pin_attributes(self) -> List[PinAttribute]:
        # Output first, then input_1..input_N (reference:
        # src/processor/audio-amix.cpp:51-84; note 1-based input names).
        pins = [
            PinAttribute("output", "Output", AudioStreamType, is_input=False)
        ]
        pins.extend(
            PinAttribute(
                f"input_{i + 1}", f"Input {i + 1}", AudioStreamType,
                is_input=True,
            )
            for i in range(self.input_num)
        )
        return pins

    def set_input_num(self, n: int) -> None:
        """Clamped arity setter (reference: audio-amix.cpp:340-347).
        Call graph.update_node_pin afterwards to re-derive pins."""
        self.input_num = min(max(int(n), 1), 16)
        self._pad_params()

    def _pad_params(self) -> None:
        while len(self.volumes) < self.input_num:
            self.volumes.append(1.0)
        while len(self.locks) < self.input_num:
            self.locks.append(False)

    def set_volume(self, index: int, volume: float) -> None:
        """Set one channel volume and renormalize the unlocked channels so
        the total stays ~1 (reference: audio-amix.cpp:349-393)."""
        self._pad_params()
        self.volumes[index] = min(max(float(volume), 0.001), 0.999)
        lock_sum = sum(
            v for v, l in zip(self.volumes[: self.input_num], self.locks) if l
        )
        unlock_sum = sum(
            v
            for v, l in zip(self.volumes[: self.input_num], self.locks)
            if not l
        )
        if unlock_sum > 0.001:
            scale = (1.0 - lock_sum) / unlock_sum
            for i in range(self.input_num):
                if not self.locks[i]:
                    self.volumes[i] *= scale

    def set_volume_at(self, value) -> None:
        """One-argument adapter for :meth:`set_volume` so the editor's
        parameter panel can route a per-slot slider through
        app.session.apply_params (``value`` = [index, volume]); the
        reference's renormalization of unlocked channels
        (audio-amix.cpp:349-393) then runs server-side exactly once."""
        index, volume = value
        self.set_volume(int(index), float(volume))

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widgets: InputInt "Input Channels" clamped 1-16
        # (audio-amix.cpp:340-347), per-input SliderFloat 0.001-0.999
        # "%.3f" with unlocked-volume renormalization + "Locked"
        # checkboxes (audio-amix.cpp:349-393).
        self._pad_params()
        spec: List[Dict[str, Any]] = [{
            "key": "input_num", "label": "Input Channels", "kind": "int",
            "min": 1, "max": 16, "value": self.input_num,
        }]
        for i in range(self.input_num):
            spec.append({
                "key": "volume_at", "label": f"Input {i + 1} Volume",
                "kind": "float", "min": 0.001, "max": 0.999, "step": 0.002,
                "index": i, "value": self.volumes[i],
            })
            spec.append({
                "key": f"locks{i}", "label": f"Locked {i + 1}",
                "kind": "bool", "value": self.locks[i],
            })
        return spec

    # -- serde (reference: audio-amix.cpp:395-423; flat volumes{i}/locks{i}
    #    keys) ---------------------------------------------------------------

    def serialize(self) -> Any:
        self._pad_params()
        value: Dict[str, Any] = {"input_num": self.input_num}
        for i in range(self.input_num):
            value[f"volumes{i}"] = self.volumes[i]
            value[f"locks{i}"] = self.locks[i]
        return value

    def deserialize(self, value: Any) -> None:
        if not isinstance(value, dict) or "input_num" not in value:
            raise ProcessorRuntimeError(
                "Failed to deserialize JSON file",
                "Audio_bimix failed to serialize the JSON input because of "
                "missing or invalid fields.",
                "Wrong field: input_num",
            )
        # Tolerant load: input_num clamps to the UI-reachable [1,16]
        # (audio-amix.cpp:340-347 — a hand-edited file must not create
        # thousands of pins). Volumes clamp only against absurd
        # hand-edits (|v| <= 16): the ENGINE can legitimately write
        # values outside the slider range — set_volume's renormalization
        # goes negative when locked volumes sum past 1 (same math as the
        # reference, audio-amix.cpp:358-371) — and save/reload must be
        # an identity for engine-produced files.
        self.input_num = min(max(int(value["input_num"]), 1), 16)
        self.volumes = []
        self.locks = []
        for i in range(self.input_num):
            vol = value.get(f"volumes{i}", 0.0)
            lock = value.get(f"locks{i}", False)
            vol = float(vol) if isinstance(vol, (int, float)) else 0.0
            self.volumes.append(min(max(vol, -16.0), 16.0))
            self.locks.append(bool(lock))

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        self._pad_params()
        streams = []
        for i in range(self.input_num):
            stream = inputs.get(f"input_{i + 1}")
            if stream is None:
                # Reference: audio-amix.cpp:119-126.
                raise ProcessorRuntimeError(
                    "Audio Mixer processor has no input",
                    "Audio Mixer processor requires an audio stream input to "
                    "function properly.",
                    f"Input item 'input_{i + 1}' not found",
                )
            streams.append(stream)
        from nodey_tpu.ops import mix as mix_ops

        out = mix_ops.amix(streams, self.volumes[: self.input_num])
        return {"output": out}

    # -- chunk-streaming: per-input streaming resampler to the 48 kHz grid +
    #    sample-aligned merge FIFOs (the incremental form of the reference's
    #    per-input SwrContext + gather loop, audio-amix.cpp:149-320) ----------

    def _stream_in_specs(self, in_specs):
        self._pad_params()
        specs = []
        for i in range(self.input_num):
            spec = in_specs.get(f"input_{i + 1}")
            if spec is None:
                raise ProcessorRuntimeError(
                    "Audio Mixer processor has no input",
                    "Audio Mixer processor requires an audio stream input to "
                    "function properly.",
                    f"Input item 'input_{i + 1}' not found",
                )
            specs.append(spec)
        return specs

    def plan_stream(self, ctx, in_specs):
        from nodey_tpu import config
        from nodey_tpu.core import chunkflow

        specs = self._stream_in_specs(in_specs)
        self._rs_plans = []
        rs_states = []
        normed = []
        for spec in specs:
            stereo = spec.replace(channels=2, fmt="flt")
            out_spec, st, plan = chunkflow.plan_resample_stage(
                stereo, config.AMIX_STD_SAMPLE_RATE
            )
            self._rs_plans.append(plan)
            rs_states.append(st)
            normed.append(out_spec)
        self._merge_plan, merge_fifos = chunkflow.plan_aligned_merge(
            normed, [0] * len(normed)
        )
        out_spec = normed[0].replace(
            rate=config.AMIX_STD_SAMPLE_RATE, channels=2,
            width=self._merge_plan["take_cap"], fmt="flt", t0_us=0.0,
        )
        return {"output": out_spec}, {"rs": rs_states, "merge": merge_fifos}

    def lower_stream(self, ctx, inputs, state):
        import jax.numpy as jnp

        from nodey_tpu import config
        from nodey_tpu.core import chunkflow

        chunks = [inputs[f"input_{i + 1}"] for i in range(self.input_num)]
        rs_states = []
        normed = []
        for chunk, plan, st in zip(chunks, self._rs_plans, state["rs"]):
            stereo = chunkflow.to_stereo_chunk(chunk)
            st, out = chunkflow.run_resample_stage(
                plan, st, stereo, config.AMIX_STD_SAMPLE_RATE
            )
            rs_states.append(st)
            normed.append(out)
        merge, windows, take, done = chunkflow.run_aligned_merge(
            self._merge_plan, state["merge"], normed
        )
        acc = jnp.zeros_like(windows[0])
        for w, vol in zip(windows, self.volumes[: self.input_num]):
            acc = acc + w * jnp.float32(vol)
        out = chunkflow.ChunkStream(
            data=acc, n=take, done=done,
            spec=chunkflow.ChunkSpec(
                rate=config.AMIX_STD_SAMPLE_RATE, channels=2, fmt="flt",
                width=acc.shape[1], t0_us=0.0,
            ),
        )
        return {"output": out}, {"rs": rs_states, "merge": merge}
