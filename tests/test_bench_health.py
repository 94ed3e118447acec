"""Bench health stamping (VERDICT r4 #2): a hung pre-run probe must not
stamp metrics degraded=true with -1 sentinels; the nearest SUCCESSFUL
probe becomes the health of record (mid-run backfill, else post-run),
and transport ceilings are never computed from the sentinel.

Drives bench.main() end to end on the CPU backend with env_health
monkeypatched — the same scenario the 2026-08-21 relay wedge validated
live (ROUND7.md §6d)."""

import json
import os
import subprocess
import sys
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _run_bench(tmp_path, fail_first_probes: int):
    """Run bench config-1 in a subprocess (bench.main mutates global jax
    config and writes BENCH_LOCAL.json; a child keeps the test process
    clean) with the first N env_health calls raising."""
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {str(REPO)!r})
import jax
jax.config.update("jax_platforms", "cpu")
import bench
calls = [0]
orig = bench.env_health
def flaky(c):
    calls[0] += 1
    if calls[0] <= {fail_first_probes}:
        raise RuntimeError("simulated wedge")
    return orig(c)
bench.env_health = flaky
# Redirect the full-fidelity artifact away from the repo checkout.
import pathlib as _p
bench.pathlib = _p
sys.argv = ["bench.py", "6", "2"]
sys.exit(bench.main())
"""
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        NODEY_BENCH_ALLOW_CPU="1",
        NODEY_BENCH_ONLY="1",
        NODEY_BENCH_BUDGET_S="360",
    )
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, env=env, cwd=str(tmp_path),
    )
    lines = [
        json.loads(ln) for ln in proc.stdout.splitlines()
        if ln.startswith('{"metric"')
    ]
    return proc, lines


@pytest.fixture(autouse=True)
def _restore_artifact():
    """bench.main rewrites BENCH_LOCAL.json in the repo; restore the
    committed capture afterwards."""
    yield
    subprocess.run(
        ["git", "checkout", "--", "BENCH_LOCAL.json"],
        cwd=str(REPO), capture_output=True,
    )


def test_healthy_run_stamps_degraded_false(tmp_path):
    proc, lines = _run_bench(tmp_path, fail_first_probes=0)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert lines, proc.stdout[-2000:]
    final = lines[-1]
    h = final["health"]
    assert h["probe_rtt_ms"] > 0 and h["d2h_MBps"] > 0
    assert "probe_skipped" not in h or h["probe_skipped"] is False


def test_wedged_preprobe_backfills_from_successful_probe(tmp_path):
    """Pre-run probe dies -> metrics first carry probe_skipped (degraded
    null, sentinels), then the mid-run/post-run backfill restamps them
    with MEASURED values and a probe_source tag."""
    proc, lines = _run_bench(tmp_path, fail_first_probes=1)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert lines, proc.stdout[-2000:]
    first = lines[0]["health"]
    assert first.get("probe_skipped") is True
    assert first["degraded"] is None          # unknown, never a blanket true
    assert first["d2h_MBps"] == -1.0
    final = lines[-1]["health"]
    assert final.get("probe_skipped") is False
    assert final.get("probe_source") in ("mid-run", "post-run")
    assert final["d2h_MBps"] > 0 and final["canary_rtf"] > 0
    # No ceiling field anywhere was computed from the -1 sentinel.
    for rec in lines:
        tc = rec.get("transport_ceiling_rtf")
        assert tc is None or tc > 0


def test_all_probes_dead_stamps_degraded_true(tmp_path):
    """If NO probe ever succeeds the run must end stamped degraded=true
    (an unknown environment is reported as degraded, never as healthy)."""
    proc, lines = _run_bench(tmp_path, fail_first_probes=99)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert lines, proc.stdout[-2000:]
    assert lines[-1]["health"]["degraded"] is True
