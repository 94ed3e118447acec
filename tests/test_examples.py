"""The examples/ scripts are executable documentation — run them end to
end (tiny inputs, CPU) so they cannot rot."""

import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(script, *args, cwd):
    # The JAX_PLATFORMS env var alone does NOT keep a subprocess off the
    # TPU on this rig (sitecustomize re-pins jax_platforms="axon,cpu" at
    # interpreter start, see conftest.py) — force CPU with an in-process
    # config update before the example runs.
    code = (
        "import sys, runpy, jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "script = sys.argv.pop(1); sys.argv[0] = script;"
        "runpy.run_path(script, run_name='__main__')"
    )
    return subprocess.run(
        [sys.executable, "-c", code, str(EXAMPLES / script), *args],
        cwd=cwd, capture_output=True, text=True, timeout=600,
    )


def test_build_and_export_example(tmp_path):
    out = tmp_path / "ex.mp3"
    r = _run("build_and_export.py", "-o", str(out), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
    assert "exported" in r.stdout


def test_batch_serving_example(tmp_path):
    r = _run(
        "batch_serving.py", "--batch", "2", "--seconds", "1", cwd=tmp_path
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "aggregate RTF" in r.stdout


def test_streaming_preview_example(tmp_path):
    r = _run("streaming_preview.py", "--no-realtime", cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "done:" in r.stdout


def test_pitch_shift_streamed_example(tmp_path):
    """Time-variant streamed export (default-on since round 2)."""
    out = tmp_path / "pitch.mp3"
    r = _run("pitch_shift_streamed.py", "-o", str(out), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
    assert "pitch +3" in r.stdout


def test_channel_strip_example(tmp_path):
    """Full extension-node chain (gate -> EQ -> compressor -> delay ->
    reverb -> limiter), chunk-streamed with growing tails."""
    out = tmp_path / "strip.mp3"
    r = _run("channel_strip.py", "-o", str(out), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
    assert "exported" in r.stdout


def test_pv_transients_example(tmp_path):
    """PV tempo stage with onset phase reset, plus the plain comparison
    render."""
    out = tmp_path / "pv.mp3"
    r = _run("pv_transients.py", "-o", str(out), cwd=tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 10_000
    assert (tmp_path / "pv_plain.mp3").exists()
    assert "transient reset ON" in r.stdout
