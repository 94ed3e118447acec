"""Audio input node — decodes N files into N output streams.

Reference: ``processor::Audio_input`` (src/processor/audio-io.cpp:27-426).
The reference runs one FFmpeg decode fiber per file slot pushing frames into
per-link channels; here decode happens host-side before compilation
(nodey_tpu.host.decode) and each slot becomes an *external input* of the fused
graph program — the TPU analog of the reference's data-parallel per-file
fan-out (audio-io.cpp:242-279).
"""

from __future__ import annotations

from typing import Any, Dict, List

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.registry import PinAttribute, Processor, ProcessorInfo
from nodey_tpu.core.stream import AudioStreamType

_DESCRIPTION = """Audio Input Processor

## Functionality
- Reads audio files and outputs audio streams
- Supports multiple file inputs with configurable paths
- Decodes host-side, streams device-side

## Usage
- Add file paths to the input list
- Connect output pins to other audio processors or outputs
"""


class AudioInput(Processor):
    """Singleton source node with one dynamic output pin per file slot
    (reference: src/processor/audio-io.cpp:46-67)."""

    def __init__(self) -> None:
        # Defaults match the reference (include/processor/audio-io.hpp:21-23).
        self.file_paths: List[str] = [""]

    def info(self) -> ProcessorInfo:
        return ProcessorInfo(
            identifier="audio_input",
            display_name="Audio Input",
            singleton=True,
            generate=AudioInput,
            description=_DESCRIPTION,
        )

    def pin_attributes(self) -> List[PinAttribute]:
        return [
            PinAttribute(
                identifier=f"output_{i}",
                display_name=f"Output {i + 1}",
                type=AudioStreamType,
                is_input=False,
            )
            for i in range(len(self.file_paths))
        ]

    # -- serde (reference: src/processor/audio-io.cpp:302-338) --------------

    def param_spec(self) -> List[Dict[str, Any]]:
        # reference widgets: per-slot "File Path" text + Browse button +
        # remove, plus an add-slot control (audio-io.cpp:345-426 via the
        # pfd dialogs, dialog-utility.cpp:15-92 — redesigned onto the web
        # editor's /api/fs picker). Applied as the whole "file_path" list
        # through the serde merge.
        return [{"key": "file_path", "label": "Input Files",
                 "kind": "files", "value": list(self.file_paths)}]

    def serialize(self) -> Any:
        return {"file_path": list(self.file_paths)}

    def deserialize(self, value: Any) -> None:
        if (
            not isinstance(value, dict)
            or not isinstance(value.get("file_path"), list)
        ):
            raise ProcessorRuntimeError(
                "Failed to deserialize JSON file",
                "Audio_input failed to serialize the JSON input because of "
                "missing or invalid fields.",
                "Wrong field: file_path",
            )
        paths = []
        for path in value["file_path"]:
            if not isinstance(path, str):
                raise ProcessorRuntimeError(
                    "Failed to deserialize JSON file",
                    "Audio_input failed to serialize the JSON input because "
                    "of missing or invalid fields.",
                    "Wrong field: file_path.path",
                )
            paths.append(path)
        # Reference keeps at least one slot (audio-io.cpp:334-337).
        if not paths:
            paths = [""]
        self.file_paths = paths

    # -- slot editing (the engine-level equivalent of the reference's
    #    add/remove-slot UI, audio-io.cpp:345-426) ---------------------------

    def add_slot(self, path: str = "") -> None:
        self.file_paths.append(path)

    def remove_slot(self, index: int) -> None:
        if len(self.file_paths) <= 1:
            raise ProcessorRuntimeError(
                "Cannot remove the last input slot",
                "Audio input requires at least one file slot.",
                f"Slot index: {index}",
            )
        del self.file_paths[index]

    # -- lowering ------------------------------------------------------------

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        """Bind each file slot to an external program input.

        Path validation matches the reference's pre-start check
        (audio-io.cpp:234-240): empty/missing files fail with the three-part
        error shape before any compute runs (enforced host-side by the
        runner's decode step; here we only wire the streams).
        """
        return {
            f"output_{i}": ctx.external(ctx.node_id, f"output_{i}")
            for i in range(len(self.file_paths))
        }

    # -- chunk-streaming lowering: slots map to per-chunk external inputs,
    #    the incremental analog of the reference's per-file decode fibers
    #    (audio-io.cpp:86-226) ------------------------------------------------

    def plan_stream(self, ctx, in_specs):
        return {
            f"output_{i}": ctx.external_spec(ctx.node_id, f"output_{i}")
            for i in range(len(self.file_paths))
        }, None

    def lower_stream(self, ctx, inputs, state):
        return {
            f"output_{i}": ctx.external(ctx.node_id, f"output_{i}")
            for i in range(len(self.file_paths))
        }, state
