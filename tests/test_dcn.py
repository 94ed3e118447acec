"""Cross-host (DCN) execution harness (parallel/dcn.py, VERDICT r2 #6).

Two coordinator-connected processes (2 local CPU devices each) form one
global 4-device mesh; the flagship graph runs with its sample axis sharded
across the process boundary, so the polyphase halo ppermute crosses
processes — the DCN analog. The child itself asserts bitwise agreement of
its addressable output shards with the single-device program; here we
check the launcher surfaces success and failure correctly.
"""

import json
import os

import pytest

from nodey_tpu.parallel import dcn


def test_dcn_two_process_dryrun():
    dcn.launch_dcn_dryrun(num_processes=2, local_devices=2, timeout=240.0)


def test_launcher_surfaces_child_failure(monkeypatch, tmp_path):
    """A failing child must fail the launch with its output attached —
    a silent straggler loss would hide real DCN breakage."""
    import subprocess
    import sys

    real_popen = subprocess.Popen

    def fake_popen(cmd, **kw):
        # Replace the child program with an immediate failure.
        return real_popen(
            [sys.executable, "-c", "import sys; print('boom'); sys.exit(3)"],
            **{k: v for k, v in kw.items() if k != "cwd"},
        )

    monkeypatch.setattr(subprocess, "Popen", fake_popen)
    with pytest.raises(RuntimeError) as ei:
        dcn.launch_dcn_dryrun(num_processes=2, local_devices=1, timeout=60.0)
    assert "rc=3" in str(ei.value) and "boom" in str(ei.value)


def test_child_spec_roundtrip(monkeypatch):
    """The launcher passes the child its identity via the env spec."""
    captured = {}
    import subprocess

    class FakeProc:
        returncode = 0

        def __init__(self, env):
            captured[json.loads(env[dcn._ENV_SPEC])["process_id"]] = env

        def communicate(self, timeout=None):
            return b"", b""

    monkeypatch.setattr(
        subprocess, "Popen",
        lambda cmd, cwd=None, env=None, **kw: FakeProc(env),
    )
    dcn.launch_dcn_dryrun(num_processes=3, local_devices=2, timeout=5.0)
    assert set(captured) == {0, 1, 2}
    for pid, env in captured.items():
        spec = json.loads(env[dcn._ENV_SPEC])
        assert spec["num_processes"] == 3
        assert spec["local_devices"] == 2
        assert spec["coordinator"].startswith("127.0.0.1:")
        assert env["JAX_PLATFORMS"] == "cpu"
        assert "--xla_force_host_platform_device_count=2" in env["XLA_FLAGS"]
        assert env["NODEY_DCN_CHILD"] == "1"
