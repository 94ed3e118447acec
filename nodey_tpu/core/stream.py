"""Traced stream values flowing between lowered nodes.

The reference moves audio between nodes as chains of small ``AVFrame`` packets
through bounded fiber channels (reference: include/processor/audio-stream.hpp:46-83).
In the TPU design an edge is simply an SSA value inside one fused XLA program:
a planar ``[channels, N]`` float32 buffer plus static format metadata and a
traced valid-length scalar (the batched-world equivalent of the reference's
per-channel EOF flag, audio-stream.hpp:76-79).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

# Sample-format tags. Audio decoded from integer formats keeps its origin tag
# so integer-domain ops (e.g. the gain node's int16 truncation semantics,
# reference: src/processor/audio-vol.cpp:14-29) can be emulated exactly, and
# so the MP3 encoder can round-trip bit-identical integer PCM.
FMT_FLT = "flt"
FMT_S16 = "s16"
FMT_S32 = "s32"

# Scale used when converting integer PCM to float. The reference divides
# interleaved S16 by 32768 and S32 by 2147483648
# (reference: src/processor/audio-velocity.cpp:182-210); libswresample uses the
# same power-of-two scale internally.
FMT_SCALE = {FMT_FLT: 1.0, FMT_S16: 32768.0, FMT_S32: 2147483648.0}


@dataclasses.dataclass
class Stream:
    """A traced audio stream value.

    data:     ``[channels, N]`` float32 planar samples in [-1, 1]; samples at
              index >= length are zero padding.
    length:   traced int32 scalar — number of valid samples per channel.
    rate:     static sample rate in Hz.
    channels: static channel count (1 or 2, reference constraint:
              src/processor/audio-vol.cpp:180-185).
    fmt:      origin sample-format tag (see module docstring).
    t0_us:    stream start timestamp in microseconds (static float). The
              reference tracks pts per frame with time_base 1/1e6
              (src/processor/audio-velocity.cpp:248-249); in the batched world
              a stream is a contiguous grid so one start offset suffices.
    """

    data: Any
    length: Any
    rate: int
    channels: int
    fmt: str = FMT_FLT
    t0_us: float = 0.0

    def __post_init__(self) -> None:
        if self.channels not in (1, 2):
            raise ValueError(f"channels must be 1 or 2, got {self.channels}")

    @property
    def capacity(self) -> int:
        """Static padded length of the underlying buffer."""
        return self.data.shape[-1]

    def with_data(self, data, **overrides) -> "Stream":
        kw = dict(
            length=self.length,
            rate=self.rate,
            channels=data.shape[0],
            fmt=self.fmt,
            t0_us=self.t0_us,
        )
        kw.update(overrides)
        return Stream(data=data, **kw)

    def valid_mask(self):
        """``[1, N]`` float32 mask of valid samples."""
        idx = jnp.arange(self.capacity)[None, :]
        return (idx < self.length).astype(jnp.float32)


class AudioStreamType:
    """Pin product-type marker for audio streams.

    Stands in for the reference's ``typeid(Audio_stream)`` pin tagging
    (reference: src/processor/audio-vol.cpp:54-71); link type checking compares
    these marker classes by identity (reference: include/infra/graph.hpp:167-170).
    """


class SpectrumStreamType:
    """Pin product-type marker for STFT spectrum streams (BASELINE config 5)."""
