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


class Mp3Encoder:
    """Incremental MP3 encoder (planar float32 blocks in, file out).

    The streaming counterpart of the reference's do_export LAME sink
    (audio-io.cpp:640-844); used by the block-pipelined export path so
    HBM->host egress overlaps encoding.
    """

    def __init__(self, path: str, rate: int, channels: int, kbps: int,
                 fmt: str = "flt", out_rate: int = config.SAMPLE_RATE):
        lib = native_lib.load()
        if lib is None:
            raise ProcessorRuntimeError(
                "MP3 encoder unavailable",
                "The native host runtime (libnodey_host) could not be "
                "loaded.",
                "na_mp3_open",
            )
        self._lib = lib
        self._fmt = fmt
        self._path = path
        errbuf = ctypes.create_string_buffer(512)
        self._handle = lib.na_mp3_open(
            path.encode(), int(rate), int(channels), int(kbps),
            int(out_rate), errbuf, len(errbuf),
        )
        if not self._handle:
            raise ProcessorRuntimeError(
                errbuf.value.decode() or "Failed to open output file",
                "Cannot open the output file for writing. Check if the path "
                "is valid and writable.",
                f"Output path: {path}",
            )

    def write(self, block: np.ndarray) -> None:
        """Append a planar [channels, n] float32 block — or an int16 block
        already quantized upstream (the streaming executor's s16 master
        wire quantizes on device with these exact semantics)."""
        if self._handle is None:
            raise ProcessorRuntimeError(
                "Encoder already closed", "Mp3Encoder.write after close.",
                self._path,
            )
        if block.dtype == np.int16 and self._fmt == FMT_S16:
            ints = np.ascontiguousarray(block.T)
            rc = self._lib.na_mp3_write_s16(
                self._handle,
                ints.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                ints.shape[0],
            )
        elif self._fmt == FMT_S16:
            # Integer-origin samples are exact multiples of 1/32768, so this
            # re-quantization is lossless — reproducing the reference's S16
            # LAME path (audio-io.cpp:705-714).
            chunk = np.ascontiguousarray(block.T, dtype=np.float32)
            ints = np.clip(
                np.trunc(chunk * 32768.0), -32768, 32767
            ).astype(np.int16)
            rc = self._lib.na_mp3_write_s16(
                self._handle,
                np.ascontiguousarray(ints).ctypes.data_as(
                    ctypes.POINTER(ctypes.c_int16)
                ),
                chunk.shape[0],
            )
        else:
            chunk = np.ascontiguousarray(block.T, dtype=np.float32)
            rc = self._lib.na_mp3_write_flt(
                self._handle,
                chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                chunk.shape[0],
            )
        if rc != 0:
            self.close()
            raise ProcessorRuntimeError(
                "Failed to encode audio frame",
                "Cannot encode the audio frame. Internal error may have "
                "occurred.",
                f"Output path: {self._path}",
            )

    def close(self) -> None:
        if self._handle is not None:
            rc = self._lib.na_mp3_close(self._handle)
            self._handle = None
            if rc != 0:
                raise ProcessorRuntimeError(
                    "Failed to finalize MP3 file",
                    "Flushing/closing the encoder failed.",
                    f"Output path: {self._path}",
                )

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *rest):
        if exc_type is None:
            self.close()
        elif self._handle is not None:
            try:
                self._lib.na_mp3_close(self._handle)
            finally:
                self._handle = None


class WavWriter:
    """Incremental WAV writer with the Mp3Encoder block interface.

    An extension past the reference (whose export sink is MP3-only,
    audio-io.cpp:640-844): a lossless sink that also removes the export
    pipeline's LAME bottleneck (~16x realtime on a 1-CPU host — the WAV
    path is pure memcpy, so streamed export becomes device/transfer
    bound). Header format follows the master's origin fmt: integer-origin
    masters write PCM16 (bit-exact with the device's s16 wire
    quantization and the MP3 path's trunc semantics), float masters write
    IEEE-float32. RIFF/data sizes are patched on close."""

    def __init__(self, path: str, rate: int, channels: int,
                 fmt: str = "flt"):
        import struct

        self._struct = struct
        self._path = path
        self._pcm16 = fmt == FMT_S16
        self._channels = int(channels)
        self._frames = 0
        try:
            self._f = open(path, "wb")
        except OSError as exc:
            raise ProcessorRuntimeError(
                "Failed to open output file",
                "Cannot open the output file for writing. Check if the "
                "path is valid and writable.",
                f"Output path: {path} ({exc})",
            ) from exc
        bps = 2 if self._pcm16 else 4
        tag = 1 if self._pcm16 else 3
        hdr = b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        hdr += b"fmt " + struct.pack(
            "<IHHIIHH", 16, tag, self._channels, int(rate),
            int(rate) * self._channels * bps, self._channels * bps,
            bps * 8,
        )
        hdr += b"data" + struct.pack("<I", 0)
        self._f.write(hdr)

    def write(self, block: np.ndarray) -> None:
        """Append a planar [channels, n] float32 block — or an int16
        block already quantized upstream (the s16 master wire)."""
        if self._f is None:
            raise ProcessorRuntimeError(
                "Encoder already closed", "WavWriter.write after close.",
                self._path,
            )
        # RIFF sizes are u32: refuse before the data chunk crosses
        # 4 GiB - 36 so close() can always patch a valid header
        # (instead of struct.error leaving the sizes zeroed).
        bps = 2 if self._pcm16 else 4
        nbytes_after = (self._frames + block.shape[1]) \
            * self._channels * bps
        if nbytes_after + 36 > 0xFFFFFFFF:
            raise ProcessorRuntimeError(
                "WAV output exceeds the 4 GiB RIFF limit",
                "The WAV container's 32-bit sizes cap a file at 4 GiB "
                "(about 3.1 hours of float32 stereo at 48 kHz). Export "
                "to MP3, or split the project into shorter exports.",
                f"{self._path}: data would reach {nbytes_after} bytes",
            )
        if self._pcm16:
            if block.dtype == np.int16:
                ints = np.ascontiguousarray(block.T, dtype="<i2")
            else:
                # Integer-origin samples are exact multiples of 1/32768;
                # trunc re-quantization is lossless (same semantics as the
                # Mp3Encoder S16 path).
                ints = np.clip(
                    np.trunc(block.T.astype(np.float32) * 32768.0),
                    -32768, 32767,
                ).astype("<i2")
            payload = np.ascontiguousarray(ints).tobytes()
        else:
            if block.dtype == np.int16:
                block = block.astype(np.float32) * np.float32(1.0 / 32768.0)
            payload = np.ascontiguousarray(
                block.T, dtype="<f4"
            ).tobytes()
        self._f.write(payload)
        self._frames += block.shape[1]

    def close(self) -> None:
        if self._f is not None:
            f, self._f = self._f, None
            try:
                bps = 2 if self._pcm16 else 4
                nbytes = self._frames * self._channels * bps
                f.seek(4)
                f.write(self._struct.pack("<I", 36 + nbytes))
                f.seek(40)
                f.write(self._struct.pack("<I", nbytes))
            finally:
                f.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *rest):
        self.close()


def open_sink(path: str, rate: int, channels: int, kbps: int,
              fmt: str = "flt"):
    """Export sink factory: ``.wav`` paths get the lossless incremental
    WavWriter, everything else the reference-parity Mp3Encoder."""
    if path.lower().endswith((".wav", ".wave")):
        return WavWriter(path, rate, channels, fmt)
    return Mp3Encoder(path, rate, channels, kbps, fmt)


def encode_mp3(
    path: str,
    data: np.ndarray,
    rate: int,
    kbps: int,
    fmt: str = "flt",
    out_rate: int = config.SAMPLE_RATE,
    progress=None,
) -> None:
    """Encode planar float32 [channels, n] to an MP3 file in one call.

    ``progress``: optional callable(seconds_done) — the host-side stand-in
    for the reference's shared atomic<double> progress channel
    (include/processor/audio-io.hpp:67, app.cpp:2074).
    """
    channels, n = data.shape
    with Mp3Encoder(path, rate, channels, kbps, fmt, out_rate) as enc:
        for start in range(0, n, _CHUNK):
            block = data[:, start : start + _CHUNK]
            enc.write(block)
            if progress is not None:
                progress((start + block.shape[1]) / rate)
