"""Per-sample gain with origin-format arithmetic emulation.

Reference: ``apply_volume<T>`` / ``change_volume<T>``
(src/processor/audio-vol.cpp:14-29, 75-100):

* float streams: plain multiply (the reference's clamp to FLT_MAX is a no-op)
* integer-origin streams: scale in float, clamp to the integer range, then
  truncate toward zero (``static_cast<T>``) — reproduced bit-exactly here in
  the normalized [-1, 1] domain so a later integer re-quantization round-trips
  losslessly.

This op is pure element-wise VPU work and fuses into adjacent ops under XLA;
a dedicated Pallas kernel would only add dispatch overhead.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import FMT_FLT, FMT_S16, FMT_S32, Stream

# Integer clamp bounds as float32, matching the C++ comparisons against
# ``static_cast<float>(max_val)`` (audio-vol.cpp:17-27). Note
# float(INT32_MAX) rounds UP to 2^31 in float32 — faithfully kept.
_CLAMP = {
    FMT_S16: (-32768.0, 32767.0),
    FMT_S32: (-2147483648.0, 2147483648.0),
}


def apply_gain(stream: Stream, volume: float) -> Stream:
    """Lowered (traced) gain."""
    return stream.with_data(_gain_array(stream.data, volume, stream.fmt, jnp))


def apply_gain_reference(data: np.ndarray, volume: float, fmt: str) -> np.ndarray:
    """NumPy reference for golden tests (same math, host-side)."""
    return _gain_array(data.astype(np.float32), volume, fmt, np)


def _gain_array(data, volume, fmt, xp):
    volume = xp.float32(volume)
    if fmt == FMT_FLT:
        return data * volume
    lo, hi = _CLAMP[fmt]
    scale = xp.float32(-lo)
    scaled = data * scale * volume
    clipped = xp.clip(scaled, xp.float32(lo), xp.float32(hi))
    return xp.trunc(clipped) / scale
