"""Shipped example project files (examples/projects/*.json).

Contract under test: every shipped project deserializes through the
reference-schema loader, validates (check_graph), round-trips
serialize(deserialize(x)) == x structurally, and — with its file slots
pointed at synthesized tones — renders offline end to end through the
production Runner.
"""

import json
import pathlib

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.host import decode as host_decode
from nodey_tpu.processors.audio_input import AudioInput

PROJECTS = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples"
     / "projects").glob("*.json")
)


def _load(path):
    registry.register_all_processors()
    with open(path) as f:
        blob = json.load(f)
    return Graph.deserialize(blob), blob


@pytest.mark.parametrize("path", PROJECTS, ids=lambda p: p.stem)
def test_loads_validates_roundtrips(path):
    g, blob = _load(path)
    g.check_graph()
    again = g.serialize()
    assert again == blob


@pytest.mark.parametrize("path", PROJECTS, ids=lambda p: p.stem)
def test_renders_offline(path, tmp_path):
    from nodey_tpu.core.runner import Runner

    g, _ = _load(path)
    # Point every input slot at a synthesized tone.
    rate, seconds = 44_100, 1.0
    t = np.arange(int(rate * seconds)) / rate
    for node in g.nodes.values():
        proc = node.processor
        if isinstance(proc, AudioInput):
            paths = []
            for i in range(len(proc.file_paths)):
                wav = tmp_path / f"tone_{i}.wav"
                x = np.stack([
                    0.3 * np.sin(2 * np.pi * (220.0 + 110.0 * i) * t),
                    0.3 * np.sin(2 * np.pi * (275.0 + 110.0 * i) * t),
                ]).astype(np.float32)
                host_decode.write_wav_s16(str(wav), x, rate)
                paths.append(str(wav))
            proc.file_paths = paths
    runner = Runner(g)
    result = runner.render(mode="export")
    arr = result.master
    assert arr is not None and arr.shape[1] > 0
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 1e-4          # audible output, not silence


def test_projects_exist():
    assert len(PROJECTS) >= 3
