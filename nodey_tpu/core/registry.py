"""Processor base class and static registry.

Mirrors the reference's ``infra::Processor`` ABC + string-keyed metadata
registry (reference: include/infra/processor.hpp:26-130, src/register.cpp:14-24)
with one deliberate change: the imperative, channel-pumping
``process_payload`` is replaced by a pure ``lower()`` that emits JAX ops into
the fused graph program (see nodey_tpu.core.compiler). UI hooks
(draw_title/draw_content) are intentionally absent from the core — the engine
is headless; an editor layers on top (fixing the reference's ImGui coupling
noted at include/infra/graph.hpp:30).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Type

from nodey_tpu.core.errors import LogicError


@dataclasses.dataclass
class PinAttribute:
    """Pin metadata (reference: include/infra/processor.hpp:42-49).

    ``type`` is a product-type marker class (e.g.
    :class:`nodey_tpu.core.stream.AudioStreamType`); link validation compares
    markers by identity, exactly as the reference compares
    ``std::type_info`` addresses (include/infra/graph.hpp:167-170).
    """

    identifier: str
    display_name: str
    type: type
    is_input: bool


@dataclasses.dataclass
class ProcessorInfo:
    """Processor metadata (reference: include/infra/processor.hpp:51-59)."""

    identifier: str
    display_name: str
    singleton: bool
    generate: Callable[[], "Processor"]
    description: str = ""


class Processor:
    """Base class for all node processors.

    Subclasses implement:

    * ``info()``   — static metadata (reference: get_processor_info,
      e.g. src/processor/audio-vol.cpp:33-48)
    * ``pin_attributes()`` — current pin list; may depend on node state for
      dynamic arity (reference: Audio_input slots, src/processor/audio-io.cpp:46-67;
      Audio_amix 1-16 inputs, src/processor/audio-amix.cpp:51-84)
    * ``serialize()/deserialize()`` — per-node JSON info blob with the exact
      reference field names (project-file compatibility contract)
    * ``lower(ctx, inputs) -> outputs`` — emit JAX ops; replaces the
      reference's process_payload (include/infra/processor.hpp:108-113)
    """

    def info(self) -> ProcessorInfo:  # pragma: no cover - abstract
        raise NotImplementedError

    def pin_attributes(self) -> List[PinAttribute]:  # pragma: no cover
        raise NotImplementedError

    def serialize(self) -> Any:
        """Export node settings as a JSON-compatible value.

        Default: empty object — matching reference nodes whose serialize
        returns ``{}`` (e.g. Audio_vol, include/processor/audio-vol.hpp:57-58).
        """
        return {}

    def deserialize(self, value: Any) -> None:
        """Restore node settings from :meth:`serialize` output. Default: no-op."""

    def snapshot_params(self) -> Any:
        """Full editable-parameter snapshot for undo/redo.

        The reference's undo kept shallow Graph copies with SHARED
        processors (app.cpp:919-1041), so parameter tweaks were not
        undoable there; this framework snapshots params per node
        (SessionService.save_undo_state). Default: the serde blob, which
        covers every field except for nodes whose live params are
        deliberately excluded from the project serde — those override
        (Audio_vol's volume, audio-vol.hpp:57-58 quirk)."""
        return self.serialize()

    def restore_params(self, blob: Any) -> None:
        """Inverse of :meth:`snapshot_params`."""
        self.deserialize(blob)

    def param_spec(self) -> Optional[List[Dict[str, Any]]]:
        """Declarative widget schema for the editor's parameter panel.

        The reference draws per-node ImGui widgets in ``draw_content``
        (e.g. DragFloat/Checkbox, audio-velocity.cpp:116-126); this
        framework keeps the engine UI-free (SURVEY.md §2.3), so nodes
        describe their widgets as DATA and the web editor renders them.
        Each entry: ``{key, label, kind, value}`` plus kind-specific
        constraints — ``min``/``max``/``step`` (+ ``log`` for the
        reference's logarithmic drags) for float/int, ``choices`` for
        enum, ``index`` for per-slot composite setters (amix volumes).
        ``value`` is the LIVE value; it may be absent from
        ``serialize()`` (Audio_vol's volume, reference quirk). Edits are
        applied through ``app.session.apply_params`` (``set_<key>``
        setter first, serde merge otherwise), so clamping and coupled
        behaviors (amix renormalization) run server-side exactly once.

        Default ``None``: no editable parameters (the raw-JSON editor
        stays available for every node either way).
        """
        return None

    def lower(self, ctx, inputs: Dict[str, Any]) -> Dict[str, Any]:
        """Emit this node's DSP into the traced graph program.

        ``inputs`` maps input-pin identifier -> Stream (absent if unconnected,
        like the reference's optional get_input_item,
        include/infra/processor.hpp:134-155). Returns output-pin identifier ->
        Stream. Source nodes read external data via ``ctx.external``; sink
        nodes register program outputs via ``ctx.emit``.
        """
        raise NotImplementedError

    # -- chunk-streaming lowering (core/chunkflow.py) -------------------------

    def plan_stream(self, ctx, in_specs: Dict[str, Any]):
        """Static planning for chunk-streaming execution: given input-pin ->
        ChunkSpec, return (output-pin -> ChunkSpec, initial carry pytree).

        The carry is this node's device-resident state between chunk steps —
        the explicit form of the state the reference kept inside per-node
        SwrContext/SoundTouch/fiber objects (SURVEY.md §7.3)."""
        from nodey_tpu.core.errors import ProcessorRuntimeError

        raise ProcessorRuntimeError(
            "Node does not support streaming execution",
            f"{type(self).__name__} implements only whole-clip lowering.",
            "plan_stream",
        )

    def lower_stream(self, ctx, inputs: Dict[str, Any], state):
        """Per-chunk lowering: (input-pin -> ChunkStream, carry) ->
        (output-pin -> ChunkStream, new carry). Must match ``lower()``'s
        whole-clip output when chunk outputs are concatenated."""
        from nodey_tpu.core.errors import ProcessorRuntimeError

        raise ProcessorRuntimeError(
            "Node does not support streaming execution",
            f"{type(self).__name__} implements only whole-clip lowering.",
            "lower_stream",
        )


# The static registry (reference: include/infra/processor.hpp:80,
# src/infra/processor.cpp:5).
processor_map: Dict[str, ProcessorInfo] = {}


def register_processor(cls: Type[Processor]) -> Type[Processor]:
    """Register a processor class (reference: include/infra/processor.hpp:116-129).

    Usable as a decorator. Raises LogicError on duplicate identifiers, like
    the reference.
    """
    info = cls().info()
    if info.identifier in processor_map:
        raise LogicError(
            f"Processor with identifier '{info.identifier}' already registered"
        )
    processor_map[info.identifier] = info
    return cls


def get_processor_info(identifier: str) -> Optional[ProcessorInfo]:
    return processor_map.get(identifier)


_registered = False


def register_all_processors() -> None:
    """Populate the registry with every built-in node
    (reference: src/register.cpp:14-24). Idempotent."""
    global _registered
    if _registered:
        return
    _registered = True
    # Imported here to avoid circular imports at package load.
    from nodey_tpu.processors import register_builtin_processors

    register_builtin_processors()
