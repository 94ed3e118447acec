"""ctypes binding to the native host runtime (libnodey_host.so).

Builds lazily on first use if the shared library is missing — the native
sources live in nodey_tpu/host/native and compile in seconds against the
system FFmpeg/LAME runtime.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_NATIVE_DIR = pathlib.Path(__file__).resolve().parent / "native"
_BUILD_DIR = _REPO_ROOT / "build" / "native"

_lib: Optional[ctypes.CDLL] = None
_load_failed: Optional[str] = None


class NaDecoded(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("fmt", ctypes.c_int32),
        ("num_samples", ctypes.c_int64),
        ("pts0_us", ctypes.c_int64),
        ("data", ctypes.POINTER(ctypes.c_float)),
    ]


def _candidate_paths():
    env = os.environ.get("NODEY_HOST_LIB")
    if env:
        yield pathlib.Path(env)
    yield _BUILD_DIR / "libnodey_host.so"


def _try_build() -> None:
    _BUILD_DIR.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["cmake", "-S", str(_NATIVE_DIR), "-B", str(_BUILD_DIR), "-G", "Ninja"],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["ninja", "-C", str(_BUILD_DIR)], check=True, capture_output=True
    )


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.na_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(NaDecoded),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.na_decode_file.restype = ctypes.c_int
    lib.na_free_decoded.argtypes = [ctypes.POINTER(NaDecoded)]
    lib.na_free_decoded.restype = None

    lib.na_decoder_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(NaDecoded),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.na_decoder_open.restype = ctypes.c_void_p
    lib.na_decoder_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.na_decoder_read.restype = ctypes.c_int64
    lib.na_decoder_close.argtypes = [ctypes.c_void_p]
    lib.na_decoder_close.restype = None

    lib.na_mp3_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.na_mp3_open.restype = ctypes.c_void_p
    lib.na_mp3_open_ex.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.na_mp3_open_ex.restype = ctypes.c_void_p
    lib.na_mp3_encoder_delay.argtypes = [ctypes.c_void_p]
    lib.na_mp3_encoder_delay.restype = ctypes.c_int
    lib.na_mp3_write_flt.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.na_mp3_write_flt.restype = ctypes.c_int
    lib.na_mp3_write_s16.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
    ]
    lib.na_mp3_write_s16.restype = ctypes.c_int
    lib.na_mp3_close.argtypes = [ctypes.c_void_p]
    lib.na_mp3_close.restype = ctypes.c_int

    lib.na_swr_convert_full.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.na_swr_convert_full.restype = ctypes.c_int64
    lib.na_free_buffer.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.na_free_buffer.restype = None
    return lib


def _stale(so_path: pathlib.Path) -> bool:
    """True when any native source is newer than the built library —
    keeps the lazy build honest across source edits (a stale .so would
    silently miss newly added entry points)."""
    try:
        built = so_path.stat().st_mtime
    except OSError:
        return True
    for src in _NATIVE_DIR.glob("*"):
        if src.is_file() and src.stat().st_mtime > built:
            return True
    return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed is not None:
        return None
    for path in _candidate_paths():
        if path.exists():
            if path == _BUILD_DIR / "libnodey_host.so" and _stale(path):
                break  # fall through to the rebuild
            _lib = _bind(ctypes.CDLL(str(path)))
            return _lib
    try:
        _try_build()
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        _load_failed = str(exc)
        return None
    path = _BUILD_DIR / "libnodey_host.so"
    if path.exists():
        _lib = _bind(ctypes.CDLL(str(path)))
        return _lib
    _load_failed = "build produced no library"
    return None


def available() -> bool:
    return load() is not None
