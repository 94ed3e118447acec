"""Static configuration constants.

Mirrors the reference's compile-time ``config::`` namespaces
(reference: include/config.hpp:13-77) plus TPU-specific execution knobs that
have no reference counterpart.
"""

from __future__ import annotations

import dataclasses


# --- audio (reference: include/config.hpp:16-29) ---------------------------
SAMPLE_RATE = 48_000          # canonical output sample rate
BUFFER_SIZE = 2_048           # playback packet size (samples per packet)
CHANNELS = 2                  # stereo output
MAX_BUFFER_ITEMS = 3          # max queued playback packets (~128 ms ceiling)
MAX_BUFFER_SIZE = BUFFER_SIZE * MAX_BUFFER_ITEMS * 4  # bytes of f32

# --- logic (reference: include/config.hpp:42-46) ---------------------------
AUDIO_INPUT_NODE_NAME = "audio_input"
AUDIO_OUTPUT_NODE_NAME = "audio_output"

# --- processor constants (reference: include/config.hpp:49-70) -------------
AUDIO_STREAM_BUFFER_SIZE = 16     # frames per edge channel (streaming mode)
AUDIO_VOLUME_MAX = 10.0           # gain slider ceiling
AMIX_STD_SAMPLE_RATE = 48_000     # mixer output rate
BIMIX_STD_SAMPLE_RATE = 48_000

# --- TPU execution knobs (no reference counterpart) ------------------------


@dataclasses.dataclass(frozen=True)
class ExecConfig:
    """Knobs for the graph compiler / runner.

    ``block_size`` is the per-step sample count in streaming mode — the moral
    equivalent of the reference's decoder-chosen ~1152-sample frames
    (reference: src/processor/audio-amix.cpp:195), sized for TPU instead:
    large enough to keep the VPU/MXU busy, small enough for interactive
    latency at 48 kHz.

    ``pad_quantum`` buckets offline clip lengths so recompiles are rare.
    """

    block_size: int = 1 << 15          # streaming-mode samples per jit step
    pad_quantum: int = 1 << 16         # offline length bucketing
    precision: str = "float32"         # DSP accumulation dtype
    interpret: bool = False            # force Pallas interpreter mode (tests)


DEFAULT_EXEC = ExecConfig()


def resolve_platforms(name: str | None, current: str | None) -> str | None:
    """Map a user-facing platform choice to a ``jax_platforms`` string.

    ``current`` is the existing ``jax_platforms`` value (this image's
    sitecustomize pins ``"axon,cpu"``; a stock install has ``None``).
    Returns the new value, or None for "leave as configured".

    Pure so the mapping is unit-testable without touching live jax config:
    - "auto"/None  -> None (no change)
    - "cpu"        -> "cpu" (the escape hatch when the TPU relay wedges —
      JAX_PLATFORMS=cpu alone does NOT override an explicit pin, which is
      why a 3 s export once took 876 s with no recourse)
    - "tpu"        -> the configured accelerator entries without the cpu
      fallback (so a failed claim is an explicit error, not a silent CPU
      run), or canonical "tpu" when nothing is pinned.
    """
    if name in (None, "", "auto"):
        return None
    if name == "cpu":
        return "cpu"
    accel = [p for p in (current or "").split(",") if p and p != "cpu"]
    return ",".join(accel) or "tpu"


def set_platform(name: str | None) -> None:
    """Apply a ``--platform {auto,tpu,cpu}`` choice to jax. Must run
    before the first device operation (jax backends initialize lazily;
    the CLI calls this right after argument parsing). The reference
    always runs locally (app.cpp:1911-1918 previews instantly); on a
    relayed TPU deployment this is the user's escape hatch when the
    relay is wedged or degraded."""
    import jax

    value = resolve_platforms(name, getattr(jax.config, "jax_platforms", None))
    if value is not None:
        jax.config.update("jax_platforms", value)


_cache_enabled = False


def enable_compile_cache() -> None:
    """Persistent XLA compile cache: graph programs recompile only when
    the graph/shapes change, across processes (first TPU compile of a new
    program costs seconds to minutes through the remote compiler; cached
    reloads are ~instant). Called lazily by the CLI, Runner, and
    StreamExecutor so library embedders get it too; opt out with
    NODEY_NO_COMPILE_CACHE=1. Idempotent and best-effort."""
    global _cache_enabled
    if _cache_enabled:
        return
    _cache_enabled = True
    import os
    import pathlib

    if os.environ.get("NODEY_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # Key stability for Pallas programs: jax embeds the full Python
        # call-stack (file:line per frame) in MLIR locations, and while
        # the cache key canonicalizes the module with strip-debuginfo,
        # locations already serialized INSIDE a Mosaic custom call's
        # payload are opaque bytes it cannot reach. With full tracebacks
        # on, the same kernel program launched from the CLI, the server,
        # or a user script therefore hashes to a different key per entry
        # point (measured: shifting an out-of-repo driver script by five
        # lines changed the key and forced a 17 s recompile — ROUND4.md
        # §9). One user frame is plenty for profiler attribution and
        # makes the key a function of the repo alone.
        if "JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS" not in os.environ:
            jax.config.update(
                "jax_include_full_tracebacks_in_locations", False
            )

        # Respect a cache the embedding application already configured —
        # this must never silently redirect someone else's cache dir.
        current = getattr(jax.config, "jax_compilation_cache_dir", None)
        if current:
            return
        cache = pathlib.Path.home() / ".cache" / "nodey_tpu" / "jax"
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    except Exception:  # cache flags vary across jax versions; best-effort
        pass
