"""Timeline editing kernels — trim (cut a time range and close the gap)
and reverse (target-spec extensions; the reference has no timeline
editing at all — its only time-domain tool is the velocity node's
tempo change, src/processor/audio-velocity.cpp:265-443).

Both are PURE INDEX SELECTION — no arithmetic touches the samples — so
every execution plan that runs them produces bitwise-identical output:
trim is bitwise offline==streamed (the streamed step left-aligns each
chunk's surviving segment with one traced dynamic slice), and reverse
is a whole-clip permutation (plan_stream refuses; the export falls back
to the offline render, the same path as audio_normalize).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from nodey_tpu.core.stream import Stream


def trim_spec(rate: int, start_s: float, end_s: float) -> Tuple[int, int]:
    """(n0, n1): first kept sample and one-past-last kept sample.
    ``end_s <= 0`` means "to the end" (n1 = INT32_MAX sentinel)."""
    n0 = max(0, round(float(start_s) * rate))
    n1 = round(float(end_s) * rate) if end_s > 0 else (2**31 - 1)
    return n0, max(n1, n0)


def trim_stream(stream: Stream, start_s: float, end_s: float) -> Stream:
    """Offline trim: keep [n0, n1), close the gap to t=0 of the kept
    region. Static start -> a static slice; only the length is traced."""
    n0, n1 = trim_spec(stream.rate, start_s, end_s)
    cap = stream.capacity
    n0c = min(n0, cap)
    keep = max(cap - n0c, 256)
    data = stream.data[:, n0c:n0c + keep]
    if data.shape[1] < keep:
        data = jnp.pad(data, ((0, 0), (0, keep - data.shape[1])))
    new_len = jnp.clip(
        jnp.minimum(stream.length, jnp.int32(min(n1, 2**31 - 1))) - n0,
        0, keep,
    )
    # Zero the tail past the kept length (the Stream padding contract).
    idx = jnp.arange(keep, dtype=jnp.int32)[None, :]
    data = jnp.where(idx < new_len, data, jnp.float32(0.0))
    return Stream(data=data, length=new_len.astype(jnp.int32),
                  rate=stream.rate, channels=stream.channels,
                  fmt=stream.fmt, t0_us=stream.t0_us)


# -- trim chunk streaming: one int32 input-position carry ---------------------------


def trim_stream_init():
    return {"pos": jnp.int32(0)}


def trim_stream_step(n0: int, n1: int, state, data, n, done):
    """One streamed chunk: drop everything before n0 / after n1 and
    left-align the surviving segment (traced dynamic slice — index
    selection only, so values are bitwise the offline slice)."""
    pos = state["pos"]
    width = data.shape[1]
    # Surviving segment of THIS chunk, in chunk-local coordinates.
    lo = jnp.clip(jnp.int32(n0) - pos, 0, n)
    hi = jnp.clip(jnp.int32(min(n1, 2**31 - 1)) - pos, 0, n)
    n_out = jnp.maximum(hi - lo, 0)
    shifted = lax.dynamic_slice_in_dim(
        jnp.pad(data, ((0, 0), (0, width))), lo, width, axis=1
    )
    idx = jnp.arange(width, dtype=jnp.int32)[None, :]
    out = jnp.where(idx < n_out, shifted, jnp.float32(0.0))
    new_pos = pos + n
    out_done = jnp.logical_or(done, new_pos >= jnp.int32(min(n1, 2**31 - 1)))
    return {"pos": new_pos}, out, n_out, out_done


# -- reverse -----------------------------------------------------------------------


def reverse_stream(stream: Stream) -> Stream:
    """Whole-clip reverse: out[i] = x[length-1-i] (a pure permutation —
    bitwise). Padding stays zero past the traced length."""
    cap = stream.capacity
    i = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.clip(stream.length - 1 - i, 0, cap - 1)
    out = jnp.take(stream.data, src, axis=1)
    out = jnp.where((i < stream.length)[None, :], out, jnp.float32(0.0))
    return stream.with_data(out)
