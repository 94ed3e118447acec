"""ASan/UBSan over the native host runtime (SURVEY.md §5.2: the
reference ships no sanitizers; this repo keeps them on its C++ shims).

Builds the nodey_host_asan_check harness (every public entry point plus
the error paths, compiled with -fsanitize=address,undefined) and runs it
on a real fixture. Any leak, overflow, or UB fails the run.
"""

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from nodey_tpu.host import decode as host_decode

from conftest import make_tone

NATIVE = pathlib.Path(__file__).resolve().parent.parent / (
    "nodey_tpu/host/native"
)


@pytest.fixture(scope="module")
def asan_binary(tmp_path_factory):
    if shutil.which("cmake") is None or shutil.which("ninja") is None:
        pytest.skip("cmake/ninja not available")
    build = tmp_path_factory.mktemp("asan_build")
    cfg = subprocess.run(
        ["cmake", "-S", str(NATIVE), "-B", str(build), "-G", "Ninja"],
        capture_output=True, text=True, timeout=300,
    )
    if cfg.returncode != 0:
        pytest.skip(f"cmake configure failed: {cfg.stderr[-500:]}")
    bld = subprocess.run(
        ["ninja", "-C", str(build), "nodey_host_asan_check"],
        capture_output=True, text=True, timeout=600,
    )
    if bld.returncode != 0:
        pytest.skip(f"asan build failed: {bld.stderr[-500:]}")
    return build / "nodey_host_asan_check"


def test_native_runtime_clean_under_asan(asan_binary, tmp_path):
    tone = make_tone(rate=44_100, seconds=1.0, channels=2)
    wav = tmp_path / "t.wav"
    host_decode.write_wav_s16(str(wav), tone, 44_100)
    r = subprocess.run(
        [str(asan_binary), str(wav), str(tmp_path / "out.mp3")],
        capture_output=True, text=True, timeout=300,
        env={"ASAN_OPTIONS": "detect_leaks=1", "PATH": "/usr/bin:/bin"},
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    assert "asan_check OK" in r.stdout
    assert (tmp_path / "out.mp3").stat().st_size > 1000
