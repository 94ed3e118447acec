"""Host-side audio decode.

Primary path: the native FFmpeg pipeline (libnodey_host). Fallback: a pure
Python RIFF/WAV parser covering the formats the test fixtures use, so the
framework degrades gracefully without the native build.

Counterpart of the reference's Audio_input decode fibers
(reference: src/processor/audio-io.cpp:86-226) — including its pre-start path
validation (audio-io.cpp:234-240) and three-part error reporting.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import struct
from typing import Optional

import numpy as np

from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.stream import FMT_FLT, FMT_S16, FMT_S32
from nodey_tpu.host import native_lib

_FMT_FROM_TAG = {0: FMT_FLT, 1: FMT_S16, 2: FMT_S32}


@dataclasses.dataclass
class DecodedAudio:
    """Decoded clip: planar float32 [channels, n] normalized to [-1, 1]."""

    data: np.ndarray
    rate: int
    fmt: str
    pts0_us: int = 0

    @property
    def channels(self) -> int:
        return self.data.shape[0]

    @property
    def num_samples(self) -> int:
        return self.data.shape[1]


def decode_file(path: str) -> DecodedAudio:
    """Decode any supported audio file to normalized planar f32."""
    if not path:
        # Reference validates slots before starting (audio-io.cpp:234-240).
        raise ProcessorRuntimeError(
            "Failed to open input file",
            "The program fails to open the input file, check if the path is "
            "valid",
            "File path: (empty)",
        )
    if not os.path.exists(path):
        raise ProcessorRuntimeError(
            "Failed to open input file",
            "The program fails to open the input file, check if the path is "
            "valid",
            f"File path: {path}",
        )

    lib = native_lib.load()
    if lib is not None:
        return _decode_native(lib, path)
    if path.lower().endswith(".wav"):
        return _decode_wav_python(path)
    raise ProcessorRuntimeError(
        "Failed to open input file",
        "Native decode library unavailable and the file is not a WAV.",
        f"File path: {path}",
    )


def _decode_native(lib, path: str) -> DecodedAudio:
    out = native_lib.NaDecoded()
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.na_decode_file(
        path.encode(), ctypes.byref(out), errbuf, len(errbuf)
    )
    if rc != 0:
        raise ProcessorRuntimeError(
            errbuf.value.decode() or "Failed to decode input file",
            "The program cannot decode the audio file, check the audio file",
            f"File path: {path}",
        )
    try:
        n = out.num_samples * out.channels
        flat = np.ctypeslib.as_array(out.data, shape=(n,)).copy()
    finally:
        lib.na_free_decoded(ctypes.byref(out))
    data = flat.reshape(out.num_samples, out.channels).T.copy()
    return DecodedAudio(
        data=np.ascontiguousarray(data, dtype=np.float32),
        rate=int(out.sample_rate),
        fmt=_FMT_FROM_TAG.get(int(out.fmt), FMT_FLT),
        pts0_us=int(out.pts0_us),
    )


def _decode_wav_python(path: str) -> DecodedAudio:
    """Minimal RIFF/WAVE reader: PCM 16/32-bit and IEEE float."""
    with open(path, "rb") as f:
        blob = f.read()
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ProcessorRuntimeError(
            "Failed to find stream info",
            "The program cannot analyze the audio file structure, check the "
            "audio file",
            f"File path: {path}",
        )
    pos = 12
    fmt_chunk = None
    data_chunk = None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data_chunk = body
        pos += 8 + size + (size & 1)
    if fmt_chunk is None or data_chunk is None:
        raise ProcessorRuntimeError(
            "No audio stream found",
            "The file does not contain any audio streams, check the audio "
            "file",
            f"File path: {path}",
        )
    if len(fmt_chunk) < 16:
        raise ProcessorRuntimeError(
            "Failed to find stream info",
            "The program cannot analyze the audio file structure, check the "
            "audio file",
            f"File path: {path} (truncated fmt chunk)",
        )
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if channels < 1:
        raise ProcessorRuntimeError(
            "No audio stream found",
            "The file does not contain any audio streams, check the audio "
            "file",
            f"File path: {path} (channels={channels})",
        )
    if audio_fmt == 0xFFFE and len(fmt_chunk) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_fmt = struct.unpack_from("<H", fmt_chunk, 24)[0]

    if audio_fmt == 1 and bits == 16:
        raw = np.frombuffer(data_chunk, dtype="<i2")
        data = raw.astype(np.float32) / 32768.0
        fmt = FMT_S16
    elif audio_fmt == 1 and bits == 32:
        raw = np.frombuffer(data_chunk, dtype="<i4")
        data = (raw.astype(np.float64) / 2147483648.0).astype(np.float32)
        fmt = FMT_S32
    elif audio_fmt == 3 and bits == 32:
        data = np.frombuffer(data_chunk, dtype="<f4").astype(np.float32)
        fmt = FMT_FLT
    else:
        raise ProcessorRuntimeError(
            "Unsupported sample format",
            "The WAV fallback reader supports PCM16/PCM32/float32.",
            f"format={audio_fmt} bits={bits}",
        )
    n = len(data) // channels
    planar = data[: n * channels].reshape(n, channels).T
    return DecodedAudio(
        data=np.ascontiguousarray(planar, dtype=np.float32),
        rate=int(rate),
        fmt=fmt,
    )


class StreamDecoder:
    """Streaming pull decoder with bounded host memory (native API:
    na_decoder_* in nodey_tpu/host/native/decode.cpp). The analog of the
    reference's incremental decode fiber (audio-io.cpp:86-226) for clips too
    long to hold decoded in RAM."""

    def __init__(self, path: str):
        lib = native_lib.load()
        if lib is None:
            raise ProcessorRuntimeError(
                "Streaming decoder unavailable",
                "The native host runtime (libnodey_host) could not be "
                "loaded.",
                "na_decoder_open",
            )
        self._lib = lib
        info = native_lib.NaDecoded()
        errbuf = ctypes.create_string_buffer(512)
        self._handle = lib.na_decoder_open(
            path.encode(), ctypes.byref(info), errbuf, len(errbuf)
        )
        if not self._handle:
            raise ProcessorRuntimeError(
                errbuf.value.decode() or "Failed to open input file",
                "The program fails to open the input file, check if the "
                "path is valid",
                f"File path: {path}",
            )
        self.rate = int(info.sample_rate)
        self.channels = int(info.channels)
        self.fmt = _FMT_FROM_TAG.get(int(info.fmt), FMT_FLT)
        self.pts0_us = int(info.pts0_us)

    def read(self, max_samples: int) -> Optional[np.ndarray]:
        """Next planar [channels, n] block (n <= max_samples); None at EOF."""
        if self._handle is None:
            return None
        buf = np.empty(max_samples * self.channels, dtype=np.float32)
        n = self._lib.na_decoder_read(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_samples,
        )
        if n < 0:
            raise ProcessorRuntimeError(
                "Failed to decode input file",
                "The program cannot decode the audio file, check the audio "
                "file",
                "na_decoder_read",
            )
        if n == 0:
            return None
        block = buf[: n * self.channels].reshape(n, self.channels).T
        return np.ascontiguousarray(block, dtype=np.float32)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.na_decoder_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def blocks(self, block_samples: int):
        """Iterate planar blocks until EOF."""
        while True:
            block = self.read(block_samples)
            if block is None:
                return
            yield block


def write_wav(path: str, data: np.ndarray, rate: int) -> None:
    """Write planar float32 [channels, n] as an IEEE-float WAV (test fixture
    helper and the headless preview sink's file target)."""
    channels, n = data.shape
    interleaved = np.ascontiguousarray(data.T, dtype="<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(interleaved)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 3, channels, rate, rate * channels * 4, channels * 4, 32
    )
    hdr += b"data" + struct.pack("<I", len(interleaved))
    with open(path, "wb") as f:
        f.write(hdr + interleaved)


def write_wav_s16(path: str, data: np.ndarray, rate: int) -> None:
    """Write planar float32 [channels, n] as PCM16 WAV (x -> round(x*32768))."""
    channels, n = data.shape
    ints = np.clip(np.round(data.T * 32768.0), -32768, 32767).astype("<i2")
    payload = np.ascontiguousarray(ints).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(payload))
    with open(path, "wb") as f:
        f.write(hdr + payload)
