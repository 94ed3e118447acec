"""Mixer ops: amix weighted sum, bimix v1/v2 channel combination, split.

All mixers first normalize inputs to 48 kHz stereo float exactly as the
reference does through per-input SwrContexts (audio-amix.cpp:206-243,
audio-bimix.cpp:196-243) — including libswresample's default -3 dB mono
upmix — then combine as pure element-wise arithmetic that XLA fuses into the
surrounding graph. Early-ending inputs contribute zero padding, matching the
reference's drained-resampler silence (audio-amix.cpp:279-291).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp

from nodey_tpu import config
from nodey_tpu.core.stream import FMT_FLT, Stream
from nodey_tpu.ops import resample as resample_ops


def _pad_to(data, capacity: int):
    if data.shape[-1] == capacity:
        return data
    return jnp.pad(data, ((0, 0), (0, capacity - data.shape[-1])))


def _common_grid(streams: Sequence[Stream]) -> Tuple[List[Stream], int]:
    """Normalize every stream to 48 kHz stereo and pad to a shared
    capacity. Kept PER-STREAM: the batched variant
    (resample.to_rate_and_stereo_many, bitwise-equal and test-pinned)
    measured SLOWER on chip under the kernel form — one C=4 launch ran
    the flagship headline at 9.4 ms vs 8.7 ms for two C=2 launches
    (2026-08-21; the larger per-step VMEM window footprint outweighs
    the halved grid overhead). Revisit if the kernel's scratch layout
    changes."""
    normed = [
        resample_ops.to_rate_and_stereo(s, config.AMIX_STD_SAMPLE_RATE)
        for s in streams
    ]
    capacity = max(s.capacity for s in normed)
    return normed, capacity


def amix(streams: Sequence[Stream], volumes: Sequence[float]) -> Stream:
    """N-input weighted mixer (reference: audio-amix.cpp:296-307):
    out[ch][j] = sum_i in_i[ch][j] * volumes[i], both channels share the
    per-input weight. Output runs until the longest input is exhausted."""
    normed, capacity = _common_grid(streams)
    acc = jnp.zeros((2, capacity), dtype=jnp.float32)
    for s, vol in zip(normed, volumes):
        acc = acc + _pad_to(s.data, capacity) * jnp.float32(vol)
    length = normed[0].length
    for s in normed[1:]:
        length = jnp.maximum(length, s.length)
    return Stream(
        data=acc,
        length=length,
        rate=config.AMIX_STD_SAMPLE_RATE,
        channels=2,
        fmt=FMT_FLT,
        t0_us=0.0,
    )


def _side_mono(stream: Stream) -> Stream:
    """Per-side prep shared by both bimix variants: 48 kHz stereo via the
    resampler, then average the two channels (reference divides each by 2 and
    sums, audio-bimix.cpp:310-316 / 620-629)."""
    s = resample_ops.to_rate_and_stereo(stream, config.BIMIX_STD_SAMPLE_RATE)
    mono = (s.data[0:1] + s.data[1:2]) * jnp.float32(0.5)
    return s.with_data(mono)


def bimix(left: Stream, right: Stream, bias: float) -> Stream:
    """v1: naive index-paired combine with bias weighting
    (reference: audio-bimix.cpp:302-317)."""
    mono_l = _side_mono(left)
    mono_r = _side_mono(right)
    capacity = max(mono_l.capacity, mono_r.capacity)
    out = jnp.concatenate(
        [
            _pad_to(mono_l.data, capacity) * jnp.float32(1.0 - bias),
            _pad_to(mono_r.data, capacity) * jnp.float32(1.0 + bias),
        ],
        axis=0,
    )
    return Stream(
        data=out,
        length=jnp.maximum(mono_l.length, mono_r.length),
        rate=config.BIMIX_STD_SAMPLE_RATE,
        channels=2,
        fmt=FMT_FLT,
        t0_us=0.0,
    )


def bimix_v2(left: Stream, right: Stream) -> Stream:
    """v2: time-aligned combine (reference: audio-bimix.cpp:776-872).

    Each side's mono downmix is placed on a shared 48 kHz grid at its own
    start timestamp; where only one side has samples the other channel is
    zero (the reference's unaligned/one-sided fills, audio-bimix.cpp:732-775,
    794-850). No bias parameter (v2 serde is {}, audio-bimix.cpp:444-449).
    """
    mono_l = _side_mono(left)
    mono_r = _side_mono(right)
    rate = config.BIMIX_STD_SAMPLE_RATE
    t0 = min(mono_l.t0_us, mono_r.t0_us)
    # Static sample offsets from the shared grid origin (timestamps are
    # static stream metadata; the reference rounds the same way,
    # audio-bimix.cpp:817-824).
    off_l = round((mono_l.t0_us - t0) * 1e-6 * rate)
    off_r = round((mono_r.t0_us - t0) * 1e-6 * rate)
    capacity = max(off_l + mono_l.capacity, off_r + mono_r.capacity)

    def place(mono: Stream, off: int):
        return jnp.pad(
            mono.data, ((0, 0), (off, capacity - off - mono.capacity))
        )

    out = jnp.concatenate([place(mono_l, off_l), place(mono_r, off_r)], axis=0)
    return Stream(
        data=out,
        length=jnp.maximum(off_l + mono_l.length, off_r + mono_r.length),
        rate=rate,
        channels=2,
        fmt=FMT_FLT,
        t0_us=t0,
    )


def split_channels(stream: Stream) -> Tuple[Stream, Stream]:
    """Stereo -> (left, right) mono streams; mono duplicates to both.
    Keeps the origin format tag so integer-exact paths survive the split."""
    if stream.channels == 1:
        return stream, stream
    left = stream.with_data(stream.data[0:1])
    right = stream.with_data(stream.data[1:2])
    return left, right
