"""Host-side MP3 encode (LAME via the native runtime).

Mirrors the reference export sink's encoder configuration and per-format
entry points (reference: src/processor/audio-io.cpp:640-844): CBR quality 2,
output forced to the canonical 48 kHz, integer-origin PCM re-quantized
losslessly and fed through LAME's integer API for a bit-identical path.
"""

from __future__ import annotations

import ctypes

import numpy as np

from nodey_tpu import config
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.stream import FMT_S16
from nodey_tpu.host import native_lib

_CHUNK = 1 << 18  # samples per lame call; keeps the scratch buffer bounded


def encode_mp3(
    path: str,
    data: np.ndarray,
    rate: int,
    kbps: int,
    fmt: str = "flt",
    out_rate: int = config.SAMPLE_RATE,
    progress=None,
) -> None:
    """Encode planar float32 [channels, n] to an MP3 file.

    ``progress``: optional callable(seconds_done) — the host-side stand-in
    for the reference's shared atomic<double> progress channel
    (include/processor/audio-io.hpp:67, app.cpp:2074).
    """
    lib = native_lib.load()
    if lib is None:
        raise ProcessorRuntimeError(
            "MP3 encoder unavailable",
            "The native host runtime (libnodey_host) could not be loaded.",
            "na_mp3_open",
        )
    channels, n = data.shape
    errbuf = ctypes.create_string_buffer(512)
    handle = lib.na_mp3_open(
        path.encode(), int(rate), int(channels), int(kbps), int(out_rate),
        errbuf, len(errbuf),
    )
    if not handle:
        raise ProcessorRuntimeError(
            errbuf.value.decode() or "Failed to open output file",
            "Cannot open the output file for writing. Check if the path is "
            "valid and writable.",
            f"Output path: {path}",
        )

    interleaved = np.ascontiguousarray(data.T, dtype=np.float32)
    ok = True
    try:
        for start in range(0, n, _CHUNK):
            chunk = interleaved[start : start + _CHUNK]
            if fmt == FMT_S16:
                # Integer-origin samples are exact multiples of 1/32768, so
                # this re-quantization is lossless — reproducing the
                # reference's S16 LAME path (audio-io.cpp:705-714).
                ints = np.clip(
                    np.trunc(chunk * 32768.0), -32768, 32767
                ).astype(np.int16)
                rc = lib.na_mp3_write_s16(
                    handle,
                    np.ascontiguousarray(ints).ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int16)
                    ),
                    chunk.shape[0],
                )
            else:
                rc = lib.na_mp3_write_flt(
                    handle,
                    chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    chunk.shape[0],
                )
            if rc != 0:
                ok = False
                break
            if progress is not None:
                progress((start + chunk.shape[0]) / rate)
    finally:
        rc_close = lib.na_mp3_close(handle)
    if not ok or rc_close != 0:
        raise ProcessorRuntimeError(
            "Failed to encode audio frame",
            "Cannot encode the audio frame. Internal error may have occurred.",
            f"Output path: {path}",
        )
