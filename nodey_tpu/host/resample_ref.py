"""libswresample oracle for golden tests (and host-side fallback).

Wraps nodey_tpu/host/native/swr_shim.cpp — a REAL SwrContext doing the same
conversion the reference's Audio_resampler performs
(reference: include/utility/sw-resample.hpp:14-71).
"""

from __future__ import annotations

import ctypes

import numpy as np

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.host import native_lib


def swr_convert(
    data: np.ndarray, in_rate: int, out_rate: int, out_channels: int = None
) -> np.ndarray:
    """Convert planar float32 [C, N] through libswresample (full drain)."""
    lib = native_lib.load()
    if lib is None:
        raise ProcessorRuntimeError(
            "libswresample oracle unavailable",
            "The native host runtime (libnodey_host) could not be loaded.",
            "na_swr_convert_full",
        )
    in_channels, n = data.shape
    if out_channels is None:
        out_channels = in_channels
    interleaved = np.ascontiguousarray(data.T, dtype=np.float32).reshape(-1)
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    errbuf = ctypes.create_string_buffer(256)
    count = lib.na_swr_convert_full(
        interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, in_rate, in_channels, out_rate, out_channels,
        ctypes.byref(out_ptr), errbuf, len(errbuf),
    )
    if count < 0:
        raise ProcessorRuntimeError(
            "Software resampler failed",
            "Cannot convert audio sample rate or format.",
            errbuf.value.decode(),
        )
    flat = np.ctypeslib.as_array(out_ptr, shape=(count * out_channels,)).copy()
    lib.na_free_buffer(out_ptr)
    return flat.reshape(count, out_channels).T
