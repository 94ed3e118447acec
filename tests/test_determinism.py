"""Determinism + diagnostics tests (SURVEY.md §5.2: two runs must produce
identical output; §5.1/§5.5: the diagnostics report)."""

import hashlib
import json

import numpy as np
import pytest

from nodey_tpu.app import diagnostics
from nodey_tpu.app.cli import main as cli_main
from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner
from nodey_tpu.host import decode as host_decode
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.velocity import PitchModifier

from conftest import make_tone


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def build_graph(tmp_path):
    """A graph touching gain, amix resample, and WSOLA pitch."""
    a = make_tone(44_100, 0.6, 220, channels=2)
    b = make_tone(44_100, 0.5, 330, channels=2)
    pa, pb = tmp_path / "a.wav", tmp_path / "b.wav"
    host_decode.write_wav_s16(str(pa), a, 44_100)
    host_decode.write_wav_s16(str(pb), b, 44_100)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(pa), str(pb)]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.3)
    pitch = g.add_node(PitchModifier())
    g.nodes[pitch].processor.pitch = 2.0
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.5, 0.5]
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(amix, "input_1"))
    g.add_link(pin(src, "output_1"), pin(pitch, "input"))
    g.add_link(pin(pitch, "output"), pin(amix, "input_2"))
    g.add_link(pin(amix, "output"), pin(out, "input"))
    return g


def test_two_runs_identical_hash(tmp_path):
    h = []
    for _ in range(2):
        result = Runner(build_graph(tmp_path)).render(mode="export")
        h.append(hashlib.sha256(result.master.tobytes()).hexdigest())
    assert h[0] == h[1]


def test_diagnostics_report_shape(tmp_path):
    g = build_graph(tmp_path)
    runner = Runner(g)
    result = runner.render(mode="export")
    report = diagnostics.run_report(g, result.metrics)
    assert report["graph"]["nodes"] == 5
    assert report["audio_seconds"] > 0
    assert report["rtf"] > 0
    assert report["rss_bytes"] > 0
    assert set(report["stages"]) == {
        "decode_s", "compile_s", "device_s", "encode_s",
    }
    json.dumps(report)  # serializable


def test_cli_diagnostics_flag(tmp_path, capsys):
    g = build_graph(tmp_path)
    project = tmp_path / "p.json"
    project.write_text(json.dumps(g.serialize()))
    rc = cli_main(["run", str(project), "--preview",
                   str(tmp_path / "out.wav"), "--diagnostics"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "previewed" in out


def test_working_set_reader():
    assert diagnostics.get_working_set_bytes() > 10 * 1024 * 1024


def test_cli_doctor(capsys):
    """doctor reports host/native/cache/backend health; on the CPU test
    backend the claim resolves instantly, so the full report prints."""
    rc = cli_main(["doctor", "--timeout", "60"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "libnodey_host" in out
    assert "backend" in out and "cpu" in out
    assert "probe rtt" in out
