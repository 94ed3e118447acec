"""Tempo (velocity) and pitch modifier nodes.

Reference: ``processor::Velocity_modifier`` / ``Pitch_modifier``
(src/processor/audio-velocity.cpp). The reference drives SoundTouch with
``setRate(r)`` + ``setPitch(p)``; SoundTouch internally factors that into an
effective resampling rate ``r * p`` and an effective WSOLA tempo ``1 / p``:

* Velocity, keep_pitch=False: rate=v, pitch=1  -> pure resample by v
* Velocity, keep_pitch=True:  rate=v, pitch=1/v -> pure WSOLA tempo v
  (audio-velocity.cpp:446-460)
* Pitch: rate=1, pitch=2^(semitones/12) -> resample by p + WSOLA tempo 1/p,
  preserving duration (audio-velocity.cpp:463-477)

Our ops implement both stages TPU-side (nodey_tpu.ops.stretch): WSOLA as a
scan of MXU correlation searches, the rate stage as the polyphase resampler.
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType


def _audio_pins() -> List[PinAttribute]:
    return [
        PinAttribute("output", "Output", AudioStreamType, is_input=False),
        PinAttribute("input", "Input", AudioStreamType, is_input=True),
    ]


def _require_input(inputs: Dict[str, Any], processor_name: str):
    stream = inputs.get("input")
    if stream is None:
        # Reference: audio-velocity.cpp:278-283.
        raise ProcessorRuntimeError(
            f"{processor_name} has no input",
            f"{processor_name} requires an audio stream input to function "
            "properly.",
            "Input item 'input' not found",
        )
    if stream.rate < 8_000 or stream.rate > 48_000:
        # Reference sample-rate guard: audio-velocity.cpp:371-379.
        raise ProcessorRuntimeError(
            "Unsupported sample rate",
            f"{processor_name} requires a sample rate between 8000 and "
            "48000 Hz.",
            f"Sample rate: {stream.rate}",
        )
    return stream


class _SoundTouchStreamBase(Processor):
    """Shared chunk-streaming machinery for Velocity/Pitch: the SoundTouch
    (rate, pitch) pair as a streaming WSOLA stage chained into a streaming
    transposition resampler (same decomposition as ops/stretch.
    soundtouch_like; state carried in device FIFOs, ops/chunkops.py)."""

    def _factors(self):
        raise NotImplementedError  # -> (rate, pitch)

    def plan_stream(self, ctx, in_specs):
        from nodey_tpu.core import chunkflow
        from nodey_tpu.ops import chunkops, stretch as stretch_ops

        spec = _require_input(in_specs, type(self).__name__)
        rate_f, pitch_f = self._factors()
        eff_rate = rate_f * pitch_f
        eff_tempo = 1.0 / pitch_f

        states = {}
        width = spec.width
        self._wsola_plan = None
        self._pv_plan = None
        if abs(eff_tempo - 1.0) > 1e-9:
            if getattr(self, "algorithm", "wsola") == "pv":
                # Chunked phase vocoder: a chunk is a batch of frames
                # (ops/pv.pv_stream_step) — no serial splice chain, and
                # the only carries are the FIFO, one synthesis phasor,
                # the previous analysis phase, and the OLA tail.
                from nodey_tpu.ops import pv as pv_ops

                plan = pv_ops.pv_stream_plan(
                    eff_tempo, spec.rate, width,
                    transient=getattr(self, "pv_transient", False),
                    formant_ratio=(
                        eff_rate
                        if getattr(self, "preserve_formants", False)
                        else 1.0
                    ),
                )
                self._pv_plan = plan
                states["w"] = pv_ops.pv_stream_init(plan, spec.channels)
                width = plan.out_cap
            else:
                plan = chunkops.wsola_plan(eff_tempo, spec.rate, width)
                self._wsola_plan = plan
                states["w"] = chunkops.wsola_stream_init(plan, spec.channels)
                width = plan.out_cap

        self._rs_plan = None
        if abs(eff_rate - 1.0) > 1e-9:
            num, den = stretch_ops._rational_factor(eff_rate)
            # transpose_rate consumes `num` input samples per `den` outputs.
            mid = chunkflow.ChunkSpec(
                rate=num, channels=spec.channels, fmt="flt", width=width
            )
            _out, st, plan = chunkflow.plan_resample_stage(mid, den)
            self._rs_plan = plan
            states["r"] = st
            width = plan.out_cap

        # Output duration scales by 1/rate_f overall (tempo x transpose),
        # so the nominal per-step arrival does too — merges downstream
        # must see the true cadence to reject un-streamable mixes.
        cadence = spec.cadence / rate_f if spec.cadence > 0 else -1.0
        out_spec = spec.replace(width=width, fmt="flt", cadence=cadence)
        return {"output": out_spec}, states

    def lower_stream(self, ctx, inputs, state):
        from nodey_tpu.ops import chunkops

        chunk = _require_input(inputs, type(self).__name__)
        data, n, done = chunk.data, chunk.n, chunk.done
        new_state = dict(state)
        if self._wsola_plan is not None:
            new_state["w"], data, n, done = chunkops.wsola_stream_step(
                self._wsola_plan, state["w"], data, n, done
            )
        elif getattr(self, "_pv_plan", None) is not None:
            from nodey_tpu.ops import pv as pv_ops

            new_state["w"], data, n, done = pv_ops.pv_stream_step(
                self._pv_plan, state["w"], data, n, done
            )
        if self._rs_plan is not None:
            new_state["r"], data, n, done = chunkops.resample_stream_step(
                self._rs_plan, state["r"], data, n, done
            )
        out = chunk.with_data(data, fmt="flt")
        out.n, out.done = n, done
        return {"output": out}, new_state


class VelocityModifier(_SoundTouchStreamBase):
    def __init__(self) -> None:
        # Defaults: include/processor/audio-velocity.hpp:11-12.
        self.velocity: float = 1.0
        self.keep_pitch: bool = False
        # Tempo-stage algorithm: "wsola" (reference parity) | "pv"
        # (phase vocoder, ops/pv.py — a different artifact profile;
        # slower on chip, see that module). Extension: the reference has
        # no such switch, so serde only writes it when non-default
        # (project files stay byte-compatible).
        self.algorithm: str = "wsola"
        # PV-only: phase reset at detected onsets (ops/pv.py transient
        # preservation). Extension; serde-omitted when default.
        self.pv_transient: bool = False
        # PV-only: formant-preserving transposition (cepstral envelope
        # pre-warp, ops/pv._formant_correction). Extension.
        self.preserve_formants: bool = False

    def _factors(self):
        # reference: audio-velocity.cpp:446-460.
        return self.velocity, (1.0 / self.velocity) if self.keep_pitch else 1.0

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="velocity_modifier",
            display_name="Velocity Modifier",
            singleton=False,
            generate=VelocityModifier,
            description=(
                "Audio Velocity Modifier\n\n## Functionality\n"
                "- Adjusts the velocity of audio streams\n"
                "- Supports pitch preservation with velocity adjustment\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return _audio_pins()

    def set_velocity(self, velocity: float) -> None:
        """Clamped setter (reference slider 0.5-3.0x, audio-velocity.cpp:115-124)."""
        self.velocity = min(max(float(velocity), 0.5), 3.0)

    def set_algorithm(self, algorithm: str) -> None:
        """Setter for the tempo-stage family (extension; not in the serde
        when default, so the panel applies it through set_*)."""
        if algorithm not in ("wsola", "pv"):
            raise ProcessorRuntimeError(
                "Unknown tempo algorithm",
                "Velocity/pitch nodes support 'wsola' or 'pv'.",
                f"Got: {algorithm!r}",
            )
        self.algorithm = algorithm

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widgets: DragFloat "Velocity" 0.5-3.0, 0.01 step,
        # "%.2fx", logarithmic+clamped; Checkbox "Keep Pitch"
        # (audio-velocity.cpp:116-126). "Algorithm" is this framework's
        # extension (ops/pv.py).
        return [
            {"key": "velocity", "label": "Velocity", "kind": "float",
             "min": 0.5, "max": 3.0, "step": 0.01, "log": True,
             "value": self.velocity},
            {"key": "keep_pitch", "label": "Keep Pitch", "kind": "bool",
             "value": self.keep_pitch},
            {"key": "algorithm", "label": "Algorithm", "kind": "enum",
             "choices": ["wsola", "pv"], "value": self.algorithm},
            {"key": "pv_transient", "label": "PV Transients",
             "kind": "bool", "value": self.pv_transient,
             "show_if": {"key": "algorithm", "value": "pv"}},
            {"key": "preserve_formants", "label": "Keep Formants",
             "kind": "bool", "value": self.preserve_formants,
             "show_if": {"key": "algorithm", "value": "pv"}},
        ]

    # -- serde (reference: audio-velocity.cpp:479-493) -----------------------

    def serialize(self) -> Any:
        out = {"velocity": self.velocity, "keep_pitch": self.keep_pitch}
        if self.algorithm != "wsola":
            out["algorithm"] = self.algorithm
        if self.pv_transient:
            out["pv_transient"] = True
        if self.preserve_formants:
            out["preserve_formants"] = True
        return out

    def deserialize(self, value: Any) -> None:
        # Tolerant field-by-field restore, like the reference.
        if isinstance(value, dict):
            v = value.get("velocity")
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                # Clamp like the setter: the reference UI can only produce
                # 0.5-3.0x, but a hand-edited project file may carry
                # anything — tolerant load must not yield absurd tempos.
                self.set_velocity(float(v))
            kp = value.get("keep_pitch")
            if isinstance(kp, bool):
                self.keep_pitch = kp
            algo = value.get("algorithm")
            if algo in ("wsola", "pv"):
                self.algorithm = algo
            tr = value.get("pv_transient")
            if isinstance(tr, bool):
                self.pv_transient = tr
            pf = value.get("preserve_formants")
            if isinstance(pf, bool):
                self.preserve_formants = pf

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = _require_input(inputs, "Velocity Modifier")
        from nodey_tpu.ops import stretch as stretch_ops

        pitch = (1.0 / self.velocity) if self.keep_pitch else 1.0
        out = stretch_ops.soundtouch_like(
            ctx, stream, rate=self.velocity, pitch=pitch,
            algorithm=self.algorithm, pv_transient=self.pv_transient,
            preserve_formants=self.preserve_formants,
        )
        return {"output": out}


class PitchModifier(_SoundTouchStreamBase):
    def __init__(self) -> None:
        # Default: include/processor/audio-velocity.hpp:44.
        self.pitch: float = 0.0
        self.algorithm: str = "wsola"   # see VelocityModifier.algorithm
        self.pv_transient: bool = False
        self.preserve_formants: bool = False

    def _factors(self):
        # reference: audio-velocity.cpp:463-477.
        return 1.0, 2.0 ** (self.pitch / 12.0)

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="pitch_modifier",
            display_name="Pitch Modifier",
            singleton=False,
            generate=PitchModifier,
            description=(
                "Audio Pitch Modifier\n\n## Functionality\n"
                "- Adjusts the pitch of audio streams by a note value\n"
            ),
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return _audio_pins()

    set_algorithm = VelocityModifier.set_algorithm

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widget: InputFloat "Pitch (Note)" step 0.5, "%+.1f",
        # unclamped (audio-velocity.cpp:142).
        return [
            {"key": "pitch", "label": "Pitch (Note)", "kind": "float",
             "step": 0.5, "value": self.pitch},
            {"key": "algorithm", "label": "Algorithm", "kind": "enum",
             "choices": ["wsola", "pv"], "value": self.algorithm},
            {"key": "pv_transient", "label": "PV Transients",
             "kind": "bool", "value": self.pv_transient,
             "show_if": {"key": "algorithm", "value": "pv"}},
            {"key": "preserve_formants", "label": "Keep Formants",
             "kind": "bool", "value": self.preserve_formants,
             "show_if": {"key": "algorithm", "value": "pv"}},
        ]

    # -- serde (reference: audio-velocity.cpp:495-505) -----------------------

    def serialize(self) -> Any:
        out = {"pitch": self.pitch}
        if self.algorithm != "wsola":
            out["algorithm"] = self.algorithm
        if self.pv_transient:
            out["pv_transient"] = True
        if self.preserve_formants:
            out["preserve_formants"] = True
        return out

    def deserialize(self, value: Any) -> None:
        if isinstance(value, dict):
            p = value.get("pitch")
            if isinstance(p, (int, float)) and not isinstance(p, bool):
                self.pitch = float(p)
            algo = value.get("algorithm")
            if algo in ("wsola", "pv"):
                self.algorithm = algo
            tr = value.get("pv_transient")
            if isinstance(tr, bool):
                self.pv_transient = tr
            pf = value.get("preserve_formants")
            if isinstance(pf, bool):
                self.preserve_formants = pf

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        stream = _require_input(inputs, "Pitch Modifier")
        from nodey_tpu.ops import stretch as stretch_ops

        out = stretch_ops.soundtouch_like(
            ctx, stream, rate=1.0, pitch=2.0 ** (self.pitch / 12.0),
            algorithm=self.algorithm, pv_transient=self.pv_transient,
            preserve_formants=self.preserve_formants,
        )
        return {"output": out}
