"""Web viewer (app/server.py): graph JSON, page, live preview state."""

import json
import tempfile
import time
import urllib.request

import numpy as np
import pytest

from nodey_tpu.app import server as web_server
from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.host import decode as host_decode
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.spectrum import AudioSpectrum

from conftest import make_tone


@pytest.fixture
def running_server(tmp_path):
    registry.register_all_processors()
    tone = make_tone(rate=44_100, seconds=1.0, channels=2)
    wav = str(tmp_path / "t.wav")
    host_decode.write_wav_s16(wav, tone, 44_100)
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [wav]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    spec = g.add_node(AudioSpectrum())
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(spec, "input"))
    g.add_link(pin(spec, "output"), pin(out, "input"))

    srv = web_server.serve(g, "test-project", port=0)  # ephemeral port
    import threading

    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, srv.server_address[1]
    srv.viewer.stop_preview()
    srv.shutdown()


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.read()


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_page_and_graph_api(running_server):
    srv, port = running_server
    status, body = _get(port, "/")
    assert status == 200 and b"<svg" in body

    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    assert status == 200
    assert len(g["nodes"]) == 4 and len(g["links"]) == 3
    idents = {n["identifier"] for n in g["nodes"]}
    assert idents == {
        "audio_input", "audio_volume_adjust", "audio_spectrum",
        "audio_output",
    }
    # Pins resolve to link endpoints.
    pin_ids = {p["id"] for n in g["nodes"] for p in n["pins"]}
    for link in g["links"]:
        assert link["from"] in pin_ids and link["to"] in pin_ids


def test_preview_runs_and_reports_state(running_server):
    srv, port = running_server
    status, body = _post(port, "/api/preview")
    assert status == 200 and body["ok"]
    deadline = time.time() + 60
    state = None
    while time.time() < deadline:
        _s, raw = _get(port, "/api/state")
        state = json.loads(raw)
        if state["state"] in ("finished", "error"):
            break
        time.sleep(0.3)
    assert state["state"] == "finished", state.get("error")
    assert state["blocks"] > 0
    assert state["seconds"] == pytest.approx(1.0, abs=0.1)
    assert state["spectrum"] and len(state["spectrum"][0]) == 128
