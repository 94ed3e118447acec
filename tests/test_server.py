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

    global TOKEN
    TOKEN = srv.viewer.auth_token
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv, srv.server_address[1]
    srv.viewer.stop_preview()
    srv.shutdown()


# Per-session auth token (set by the running_server fixture); every
# helper attaches it, mirroring the served page's fetch wrapper.
TOKEN = ""


def _auth(headers=None):
    return {"X-Nodey-Token": TOKEN, **(headers or {})}


def _get(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", headers=_auth()
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST", headers=_auth()
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, json.loads(r.read())


def test_page_and_graph_api(running_server):
    srv, port = running_server
    status, body = _get(port, "/")
    assert status == 200 and b"<svg" in body
    # Editor chrome: context menu, help overlay, settings dialog, audio
    # element (the audible-preview sink), stage gauges.
    for needle in (b"ctxmenu", b"helpwin", b"setwin", b"preview.wav",
                   b"stages"):
        assert needle in body, needle

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

def test_help_endpoint(running_server):
    """The help/about surface (reference: help.cpp:5-132): about box +
    per-node markdown manual from the registry."""
    srv, port = running_server
    status, body = _get(port, "/api/help")
    assert status == 200
    h = json.loads(body)
    assert h["about"]["name"] == "nodey_tpu"
    idents = {n["identifier"] for n in h["nodes"]}
    assert {"audio_input", "audio_output", "audio_amix"} <= idents
    inp = next(n for n in h["nodes"] if n["identifier"] == "audio_input")
    assert inp["singleton"] is True and inp["description"]


def test_preview_wav_live_stream(running_server):
    """/api/preview.wav?start=1 starts a preview and streams it as live
    WAV — the browser-audible counterpart of the reference's SDL playback
    queue (audio-io.cpp:620-636)."""
    import struct

    srv, port = running_server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/api/preview.wav?start=1&token={TOKEN}",
        timeout=90
    ) as r:
        assert r.status == 200
        assert r.headers["Content-Type"] == "audio/wav"
        header = r.read(44)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
        # fmt chunk: PCM (1), stereo, 48 kHz, 16-bit.
        assert header[12:16] == b"fmt "
        chunk_size, audio_fmt, channels, rate = struct.unpack(
            "<IHHI", header[16:28]
        )
        assert (chunk_size, audio_fmt, channels, rate) == (16, 1, 2, 48_000)
        assert header[36:40] == b"data"
        # 0.2 s of PCM from the live stream; the 1 s test tone is loud
        # enough that the stream cannot be all-zero.
        pcm = r.read(48_000 * 2 * 2 // 5)
        samples = np.frombuffer(pcm, dtype=np.int16)
        assert samples.size > 0 and np.abs(samples).max() > 1000
    # The preview keeps running/finishes cleanly after the client leaves.
    deadline = time.time() + 60
    while time.time() < deadline:
        _s, raw = _get(port, "/api/state")
        if json.loads(raw)["state"] in ("finished", "error"):
            break
        time.sleep(0.3)
    assert json.loads(raw)["state"] == "finished"


def test_preview_wav_multiple_listeners(running_server):
    """The audio fan-out serves several concurrent clients (each gets the
    full live stream)."""
    import threading

    srv, port = running_server
    results = {}

    def listen(name, url):
        with urllib.request.urlopen(url, timeout=90) as r:
            results[name] = r.read()

    t1 = threading.Thread(
        target=listen, args=("a", f"http://127.0.0.1:{port}/api/preview.wav?token={TOKEN}"),
        daemon=True,
    )
    t1.start()
    time.sleep(0.3)  # listener a attaches before the preview starts
    t2 = threading.Thread(
        target=listen,
        args=("b",
              f"http://127.0.0.1:{port}/api/preview.wav?start=1&token={TOKEN}"),
        daemon=True,
    )
    t2.start()
    t1.join(timeout=90)
    t2.join(timeout=90)
    assert "a" in results and "b" in results
    for raw in results.values():
        pcm = np.frombuffer(raw[44:], dtype=np.int16)
        assert pcm.size >= 2 * 48_000 * 0.9  # ~the full 1 s clip
        assert np.abs(pcm).max() > 1000


def test_preview_wav_idle_stream_closes(running_server, monkeypatch):
    """An audio stream that never receives audio (no preview started)
    closes after the grace period instead of hanging."""
    srv, port = running_server
    monkeypatch.setattr(web_server, "AUDIO_STREAM_IDLE_GRACE_S", 1.0)
    t0 = time.time()
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/api/preview.wav?token={TOKEN}", timeout=30
    ) as r:
        raw = r.read()
    assert time.time() - t0 < 10.0
    assert len(raw) == 44  # header only, no PCM


def _post_json(port, path, obj):
    data = json.dumps(obj).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method="POST",
        headers=_auth({"Content-Type": "application/json"}),
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_editor_mutations_roundtrip(running_server, tmp_path):
    """add-node / set / move / link(validate+rollback) / unlink /
    remove-node / undo / redo / save — the reference app's edit surface
    (app.cpp:919-1041, 1700-1839) over HTTP."""
    srv, port = running_server
    srv.viewer.session.project_path = str(tmp_path / "edited.json")

    # Registry lists all types; instantiated singletons are disabled.
    status, body = _get(port, "/api/registry")
    reg = {r["identifier"]: r for r in json.loads(body)}
    assert status == 200
    assert reg["audio_input"]["disabled"]          # singleton, present
    assert not reg["audio_volume_adjust"]["disabled"]

    # Add a gain node with params and a position.
    status, r = _post_json(port, "/api/edit/add-node", {
        "identifier": "audio_volume_adjust",
        "params": {"volume": 2.0}, "x": 300, "y": 200,
    })
    assert status == 200 and r["ok"]
    nid = r["node_id"]
    g = srv.viewer.graph
    assert g.nodes[nid].position == (300.0, 200.0)
    assert g.nodes[nid].processor.volume == 2.0

    # Parameter edit via set (setter path applies clamping semantics).
    status, r = _post_json(port, "/api/edit/set", {
        "node_id": nid, "params": {"volume": 99.0},
    })
    assert status == 200 and r["ok"]
    assert g.nodes[nid].processor.volume == 10.0   # clamped to max

    # Move.
    status, r = _post_json(port, "/api/edit/move",
                           {"node_id": nid, "x": 10, "y": 20})
    assert status == 200 and g.nodes[nid].position == (10.0, 20.0)

    # A link into an occupied input pin must validate-and-roll-back.
    status, body = _get(port, "/api/graph")
    gj = json.loads(body)
    # NB: two audio_volume_adjust nodes exist now — keep the ORIGINAL
    # (not the just-added nid) when indexing by identifier.
    by_ident = {
        n["identifier"]: n for n in gj["nodes"] if n["id"] != nid
    }
    out_pin = next(p["id"] for n in gj["nodes"] if n["id"] == nid
                   for p in n["pins"] if not p["is_input"])
    occupied_in = next(p["id"]
                       for p in by_ident["audio_spectrum"]["pins"]
                       if p["is_input"])
    n_links = len(gj["links"])
    status, r = _post_json(port, "/api/edit/link",
                           {"from_pin": out_pin, "to_pin": occupied_in})
    assert status == 400 and not r["ok"]
    assert len(srv.viewer.graph.links) == n_links  # rolled back

    # A valid link: new gain feeds nothing yet; wire source output_0's
    # consumer chain is full, so instead link new gain INTO the graph by
    # unlinking vol->spectrum and inserting the new node between.
    vol_out = next(p["id"]
                   for p in by_ident["audio_volume_adjust"]["pins"]
                   if not p["is_input"])
    status, r = _post_json(port, "/api/edit/unlink",
                           {"from_pin": vol_out, "to_pin": occupied_in})
    assert status == 200 and r["ok"]
    new_in = next(p["id"] for n in gj["nodes"] if n["id"] == nid
                  for p in n["pins"] if p["is_input"])
    assert _post_json(port, "/api/edit/link",
                      {"from_pin": vol_out, "to_pin": new_in})[1]["ok"]
    assert _post_json(port, "/api/edit/link",
                      {"from_pin": out_pin, "to_pin": occupied_in})[1]["ok"]
    srv.viewer.graph.check_graph()

    # Undo twice removes both links; redo restores them.
    links_now = len(srv.viewer.graph.links)
    assert _post_json(port, "/api/undo", {})[1]["ok"]
    assert _post_json(port, "/api/undo", {})[1]["ok"]
    assert len(srv.viewer.graph.links) == links_now - 2
    assert _post_json(port, "/api/redo", {})[1]["ok"]
    assert _post_json(port, "/api/redo", {})[1]["ok"]
    assert len(srv.viewer.graph.links) == links_now

    # Save writes a loadable project file.
    status, r = _post_json(port, "/api/save", {})
    assert status == 200 and r["ok"]
    with open(r["path"]) as f:
        reloaded = Graph.deserialize(json.load(f))
    reloaded.check_graph()
    assert len(reloaded.nodes) == len(srv.viewer.graph.nodes)

    # Remove the inserted node (links to it drop with it).
    status, r = _post_json(port, "/api/edit/remove-node", {"node_id": nid})
    assert status == 200 and r["ok"]
    assert nid not in srv.viewer.graph.nodes


def test_editor_copy_paste(running_server):
    """Clipboard-as-subgraph-JSON over HTTP (reference app.cpp:1047-1383):
    copy a non-singleton node, paste re-instantiates with a fresh ID."""
    srv, port = running_server
    gj = json.loads(_get(port, "/api/graph")[1])
    vol = next(n for n in gj["nodes"]
               if n["identifier"] == "audio_volume_adjust")
    n_before = len(srv.viewer.graph.nodes)
    status, r = _post_json(port, "/api/copy", {"node_ids": [vol["id"]]})
    assert status == 200 and r["count"] == 1
    status, r = _post_json(port, "/api/paste", {"x": 400, "y": 400})
    assert status == 200 and r["ok"] and len(r["node_ids"]) == 1
    assert len(srv.viewer.graph.nodes) == n_before + 1
    new_id = r["node_ids"][0]
    info = srv.viewer.graph.nodes[new_id].processor.info()
    assert info.identifier == "audio_volume_adjust"

    # Copying the singleton input then pasting must SKIP it (singleton
    # rule, app.cpp:1204-1383) — no new node appears.
    src = next(n for n in gj["nodes"] if n["identifier"] == "audio_input")
    assert _post_json(port, "/api/copy",
                      {"node_ids": [src["id"]]})[1]["count"] == 1
    n_now = len(srv.viewer.graph.nodes)
    status, r = _post_json(port, "/api/paste", {})
    assert status == 200 and r["node_ids"] == []
    assert len(srv.viewer.graph.nodes) == n_now


def test_batch_remove_single_undo(running_server):
    """remove-nodes deletes an N-node selection atomically with ONE undo
    snapshot (one gesture, one Ctrl+Z)."""
    srv, port = running_server
    # Add two extra volume nodes to delete together.
    ids = []
    for _ in range(2):
        status, r = _post_json(
            port, "/api/edit/add-node",
            {"identifier": "audio_volume_adjust", "x": 10, "y": 10},
        )
        assert status == 200
        ids.append(r["node_id"])
    n_before = len(srv.viewer.graph.nodes)
    undo_before = len(srv.viewer.session.undo_stack)
    status, r = _post_json(
        port, "/api/edit/remove-nodes", {"node_ids": ids}
    )
    assert status == 200 and r["removed"] == 2
    assert len(srv.viewer.graph.nodes) == n_before - 2
    assert len(srv.viewer.session.undo_stack) == undo_before + 1
    status, r = _post_json(port, "/api/undo", {})
    assert status == 200 and len(srv.viewer.graph.nodes) == n_before
    # Unknown id → all-or-nothing rejection.
    status, r = _post_json(
        port, "/api/edit/remove-nodes", {"node_ids": [99999]}
    )
    assert status == 400
    assert len(srv.viewer.graph.nodes) == n_before


def test_duplicate_preserves_clipboard(running_server):
    """The context-menu duplicate must not clobber the copy/paste
    clipboard."""
    srv, port = running_server
    gj = json.loads(_get(port, "/api/graph")[1])
    vol = next(n for n in gj["nodes"]
               if n["identifier"] == "audio_volume_adjust")
    spec = next(n for n in gj["nodes"]
                if n["identifier"] == "audio_spectrum")
    # Clipboard holds the SPECTRUM node...
    _post_json(port, "/api/copy", {"node_ids": [spec["id"]]})
    clip_before = srv.viewer.session.clipboard_json
    # ...then duplicate the VOLUME node.
    status, r = _post_json(
        port, "/api/duplicate",
        {"node_ids": [vol["id"]], "x": 500, "y": 500},
    )
    assert status == 200 and len(r["node_ids"]) == 1
    dup = srv.viewer.graph.nodes[r["node_ids"][0]]
    assert dup.processor.info().identifier == "audio_volume_adjust"
    assert srv.viewer.session.clipboard_json == clip_before
    # Paste still yields the spectrum node from the earlier copy.
    status, r = _post_json(port, "/api/paste", {})
    assert status == 200 and len(r["node_ids"]) == 1
    pasted = srv.viewer.graph.nodes[r["node_ids"][0]]
    assert pasted.processor.info().identifier == "audio_spectrum"


def test_settings_endpoints(running_server):
    srv, port = running_server
    status, body = _get(port, "/api/settings")
    s = json.loads(body)
    assert status == 200 and set(s) >= {"ui", "editor", "render"}
    status, r = _post_json(port, "/api/settings",
                           {"editor": {"auto_save": True}})
    assert status == 200 and r["settings"]["editor"]["auto_save"] is True


def test_export_endpoint(running_server, tmp_path):
    """The export-window flow (app.cpp:590-682): POST path+kbps, watch
    progress via /api/state, completion via a notification."""
    srv, port = running_server
    out = str(tmp_path / "web_export.mp3")
    status, r = _post_json(port, "/api/export", {"path": out, "kbps": 192})
    assert status == 200 and r["ok"]
    deadline = time.time() + 120
    state = None
    while time.time() < deadline:
        state = json.loads(_get(port, "/api/state")[1])
        if state["state"] in ("finished", "error"):
            break
        time.sleep(0.3)
    assert state["state"] == "finished", state.get("error")
    import os
    assert os.path.getsize(out) > 1000
    notes = json.loads(_get(port, "/api/notifications")[1])
    assert any("Exported" in n["message"] for n in notes)

    # Bad bitrate is a structured 400, not a crash.
    status, r = _post_json(port, "/api/export", {"path": out, "kbps": 123})
    assert status == 400 and not r["ok"]


def test_edits_blocked_while_job_thread_alive(running_server):
    """A stop request flips the state immediately, but edits must stay
    blocked until the worker thread actually exits (it still reads the
    graph while winding down)."""
    import threading as _threading

    srv, port = running_server
    release = _threading.Event()

    def fake_job():
        release.wait(timeout=30)

    srv.viewer._job_thread = _threading.Thread(target=fake_job, daemon=True)
    srv.viewer._job_thread.start()
    srv.viewer.state = "stopped"  # as if /api/stop already ran
    try:
        status, r = _post_json(port, "/api/edit/add-node",
                               {"identifier": "audio_volume_adjust"})
        assert status == 400 and "Stop the running" in r["error"]
    finally:
        release.set()
        srv.viewer._job_thread.join(timeout=5)
    status, r = _post_json(port, "/api/edit/add-node",
                           {"identifier": "audio_volume_adjust"})
    assert status == 200 and r["ok"]


def test_new_and_open_project(running_server, tmp_path):
    srv, port = running_server
    srv.viewer.session.project_path = str(tmp_path / "p.json")
    # Save the current 4-node graph, clear it, then reopen it.
    assert _post_json(port, "/api/save", {})[1]["ok"]
    status, r = _post_json(port, "/api/new", {})
    assert status == 200 and len(srv.viewer.graph.nodes) == 0
    # A new project starts with clean history (like the reference).
    assert _post_json(port, "/api/undo", {})[1]["ok"] is False
    status, r = _post_json(port, "/api/open",
                           {"path": str(tmp_path / "p.json")})
    assert status == 200 and r["nodes"] == 4
    srv.viewer.graph.check_graph()
    # Missing file is a structured 400, not a hung handler.
    status, r = _post_json(port, "/api/open", {"path": "/nope/x.json"})
    assert status == 400 and not r["ok"]


def test_concurrent_edit_hammering(running_server):
    """Four threads hammer mutations/undo/poll concurrently: every
    response must be a structured 200/400 (never a 500/crash) and the
    graph must end valid — the editor's thread-safety net."""
    import threading
    import urllib.error

    srv, port = running_server
    errors = []
    barrier = threading.Barrier(4)

    def worker(seed):
        rng = np.random.default_rng(seed)
        barrier.wait()
        for i in range(40):
            op = rng.integers(0, 5)
            try:
                if op == 0:
                    _post_json(port, "/api/edit/add-node", {
                        "identifier": "audio_volume_adjust",
                        "x": int(rng.integers(0, 900)),
                        "y": int(rng.integers(0, 600))})
                elif op == 1:
                    gj = json.loads(_get(port, "/api/graph")[1])
                    if gj["nodes"]:
                        n = gj["nodes"][int(rng.integers(0, len(gj["nodes"])))]
                        _post_json(port, "/api/edit/move", {
                            "node_id": n["id"],
                            "x": float(rng.integers(0, 900)),
                            "y": float(rng.integers(0, 600))})
                elif op == 2:
                    _post_json(port, "/api/undo", {})
                elif op == 3:
                    _post_json(port, "/api/redo", {})
                else:
                    _get(port, "/api/state")
                    _get(port, "/api/registry")
            except urllib.error.HTTPError as exc:
                if exc.code >= 500:
                    errors.append(f"HTTP {exc.code} on op {op}")
            except Exception as exc:  # connection-level failure
                errors.append(f"{type(exc).__name__}: {exc}")

    threads = [
        threading.Thread(target=worker, args=(s,), daemon=True)
        for s in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors[:5]
    # The surviving graph stays structurally consistent after the
    # interleaved undo/redo/add/move storm.
    gj = json.loads(_get(port, "/api/graph")[1])
    pin_ids = {p["id"] for n in gj["nodes"] for p in n["pins"]}
    for link in gj["links"]:
        assert link["from"] in pin_ids and link["to"] in pin_ids


def test_save_as_flow(running_server, tmp_path):
    """Save accepts an explicit path (save-as — the only way to persist a
    session started on an empty canvas); a session with no path fails
    with a structured error instead of a bare 400."""
    srv, port = running_server
    srv.viewer.session.project_path = None
    status, r = _post_json(port, "/api/save", {})
    assert status == 400 and "No project path" in r["error"]
    target = str(tmp_path / "saved_as.json")
    status, r = _post_json(port, "/api/save", {"path": target})
    assert status == 200 and r["path"] == target
    import os
    assert os.path.exists(target)
    # The path sticks: subsequent bare saves succeed.
    status, r = _post_json(port, "/api/save", {})
    assert status == 200 and r["path"] == target


def test_remove_nodes_duplicate_ids(running_server):
    """Duplicate ids in a batch remove must not cause a partial mutation
    reported as failure."""
    srv, port = running_server
    status, r = _post_json(
        port, "/api/edit/add-node",
        {"identifier": "audio_volume_adjust", "x": 5, "y": 5},
    )
    nid = r["node_id"]
    n_before = len(srv.viewer.graph.nodes)
    status, r = _post_json(
        port, "/api/edit/remove-nodes", {"node_ids": [nid, nid, nid]}
    )
    assert status == 200 and r["removed"] == 1
    assert len(srv.viewer.graph.nodes) == n_before - 1


def test_cross_origin_post_rejected(running_server, tmp_path):
    """CSRF guard (ADVICE round 1): a POST stamped with a foreign Origin —
    what a malicious web page's fetch() to 127.0.0.1 looks like — must be
    refused before any path-bearing endpoint (open/save) runs; same-origin
    and header-less (curl/tests) POSTs keep working."""
    srv, port = running_server

    def post(path, obj, headers):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(obj).encode(),
            headers=_auth({"Content-Type": "application/json",
                           **headers}),
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as exc:
            return exc.code, json.loads(exc.read())

    target = str(tmp_path / "evil.json")
    # Cross-site: attacker page origin.
    status, r = post("/api/save", {"path": target},
                     {"Origin": "http://evil.example"})
    assert status == 403 and not r["ok"]
    assert not (tmp_path / "evil.json").exists()
    # Sandboxed-iframe / data:-URL POSTs carry the literal Origin "null" —
    # rejected, not exempted.
    status, r = post("/api/save", {"path": target}, {"Origin": "null"})
    assert status == 403 and not r["ok"]
    # DNS rebinding: Host doesn't match the bound address.
    status, r = post("/api/save", {"path": target},
                     {"Host": "evil.example:80"})
    assert status == 403 and not r["ok"]
    # Rebinding also blocks READS (fs listings, graph state) on GETs.
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/graph",
        headers=_auth({"Host": "evil.example:80"}),
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            status = resp.status
    except urllib.error.HTTPError as exc:
        status = exc.code
    assert status == 403
    # Same-origin fetch from the served page.
    status, r = post("/api/save", {"path": target},
                     {"Origin": f"http://127.0.0.1:{port}"})
    assert status == 200 and r["ok"]
    # localhost alias of the loopback bind is same-origin too.
    status, r = post("/api/save", {"path": target},
                     {"Origin": f"http://localhost:{port}",
                      "Host": f"localhost:{port}"})
    assert status == 200 and r["ok"]


def test_fs_browser_endpoints(running_server, tmp_path):
    """File browser (round-1 VERDICT item 6; reference:
    dialog-utility.cpp:15-92): /api/fs lists directories for the picker,
    and the picked paths drive open-project and add-input-file flows
    without typed paths."""
    srv, port = running_server
    sub = tmp_path / "media"
    sub.mkdir()
    wav = sub / "clip.wav"
    wav.write_bytes(b"RIFF")
    proj = tmp_path / "p.json"

    # Browse tmp_path: directory first, then the file inside it.
    status, body = _get(port, f"/api/fs?path={tmp_path}")
    d = json.loads(body)
    assert status == 200 and d["path"] == str(tmp_path)
    names = {e["name"]: e for e in d["entries"]}
    assert names["media"]["dir"] is True
    status, body = _get(port, f"/api/fs?path={sub}")
    d = json.loads(body)
    assert {e["name"] for e in d["entries"]} == {"clip.wav"}
    assert d["parent"] == str(tmp_path)

    # Non-directory -> clean 400, not a 500.
    try:
        status, body = _get(port, f"/api/fs?path={wav}")
    except urllib.error.HTTPError as exc:
        status, body = exc.code, exc.read()
    assert status == 400

    # Picker-driven flows: save-as to a browsed path, reopen it, and add
    # the browsed input file to an audio_input node.
    status, r = _post_json(port, "/api/save", {"path": str(proj)})
    assert status == 200 and r["ok"]
    status, r = _post_json(port, "/api/open", {"path": str(proj)})
    assert status == 200 and r["ok"]
    # Browsed file lands in the EXISTING audio_input singleton through the
    # files widget's apply path (serde key "file_path" — an earlier version
    # of this block posted "file_paths" to a node that add-node could never
    # create, so it silently asserted nothing).
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    src = next(n for n in g["nodes"] if n["identifier"] == "audio_input")
    old = src["params"]["file_path"]
    status, r = _post_json(
        port, "/api/edit/set",
        {"node_id": src["id"], "params": {"file_path": old + [str(wav)]}},
    )
    assert status == 200 and r["ok"]
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == src["id"])
    assert node["params"]["file_path"] == old + [str(wav)]
    # ... and the new slot derived a new output pin.
    pins = [p["identifier"] for p in node["pins"] if p["is_input"] is False]
    assert f"output_{len(old)}" in pins
    # The served page carries the picker dialog.
    status, body = _get(port, "/")
    assert b"fswin" in body and b"fslist" in body


def test_param_spec_rides_graph_payload(running_server):
    """param_spec — the reference's per-node ImGui widgets as data
    (audio-velocity.cpp:116-126, audio-vol.cpp:260-276) — is served with
    every node; live values included even when absent from the serde
    (Audio_vol's volume, the project-file quirk)."""
    srv, port = running_server
    status, body = _get(port, "/api/graph")
    g = json.loads(body)

    vol = next(n for n in g["nodes"]
               if n["identifier"] == "audio_volume_adjust")
    (vs,) = vol["spec"]
    assert vs["key"] == "volume" and vs["kind"] == "float"
    assert vs["min"] == 0.0 and vs["max"] == 10.0
    assert vs["value"] == 1.0
    assert vol["params"] == {}  # quirk intact: spec carries what serde omits

    src = next(n for n in g["nodes"] if n["identifier"] == "audio_input")
    (fs,) = src["spec"]
    assert fs["kind"] == "files" and fs["value"] == src["params"]["file_path"]

    out = next(n for n in g["nodes"] if n["identifier"] == "audio_output")
    assert out["spec"] is None  # no params: raw-JSON editor only

    # The served page carries the widget panel + collapsed raw editor.
    status, body = _get(port, "/")
    assert b"widgets" in body and b"rawparams" in body


def test_param_widget_edit_clamps_and_undoes(running_server):
    """A widget edit routes through /api/edit/set: the set_volume clamp
    (reference: audio-vol.cpp:262-276) runs server-side, and the edit is
    undoable (param snapshots ride every undo state)."""
    srv, port = running_server
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    vol = next(n for n in g["nodes"]
               if n["identifier"] == "audio_volume_adjust")

    status, r = _post_json(port, "/api/edit/set",
                           {"node_id": vol["id"], "params": {"volume": 99.0}})
    assert status == 200 and r["ok"]
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == vol["id"])
    assert node["spec"][0]["value"] == 10.0  # clamped to AUDIO_VOLUME_MAX

    status, r = _post_json(port, "/api/undo", {})
    assert status == 200 and r["ok"]
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == vol["id"])
    assert node["spec"][0]["value"] == 1.0


def test_amix_volume_at_renormalizes(running_server):
    """The amix per-slot slider applies through set_volume_at — the
    reference's unlocked-volume renormalization (audio-amix.cpp:349-393)
    runs server-side exactly once, and the panel re-reads server truth."""
    srv, port = running_server
    status, r = _post_json(port, "/api/edit/add-node",
                           {"identifier": "audio_amix", "x": 5, "y": 5})
    assert status == 200
    nid = r["node_id"]

    status, r = _post_json(port, "/api/edit/set",
                           {"node_id": nid, "params": {"volume_at": [0, 0.9]}})
    assert status == 200 and r["ok"]
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == nid)
    vols = [f["value"] for f in node["spec"] if f["key"] == "volume_at"]
    assert len(vols) == 2
    assert abs(sum(vols) - 1.0) < 1e-6
    # both unlocked: [0.9, 1.0] scaled by 1/1.9
    assert abs(vols[0] - 0.9 / 1.9) < 1e-6

    # Lock slot 0, push slot 1: only the unlocked slot renormalizes.
    status, r = _post_json(port, "/api/edit/set",
                           {"node_id": nid, "params": {"locks0": True}})
    assert status == 200
    status, r = _post_json(port, "/api/edit/set",
                           {"node_id": nid, "params": {"volume_at": [1, 0.7]}})
    assert status == 200
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == nid)
    spec = {(f["key"], f.get("index")): f["value"] for f in node["spec"]}
    locked0 = spec[("volume_at", 0)]
    assert abs(spec[("volume_at", 1)] - (1.0 - locked0)) < 1e-6

    # input_num through the widget re-derives pins (arity change).
    status, r = _post_json(port, "/api/edit/set",
                           {"node_id": nid, "params": {"input_num": 4}})
    assert status == 200
    status, body = _get(port, "/api/graph")
    g = json.loads(body)
    node = next(n for n in g["nodes"] if n["id"] == nid)
    ins = [p for p in node["pins"] if p["is_input"]]
    assert len(ins) == 4
    assert len([f for f in node["spec"] if f["key"] == "volume_at"]) == 4


def test_param_spec_conditional_visibility():
    """pv_transient renders only when the node's algorithm is 'pv': the
    spec entry carries a show_if rule and the page's renderWidgets skips
    fields whose referenced value doesn't match."""
    from nodey_tpu.processors.velocity import PitchModifier, VelocityModifier

    for proc in (VelocityModifier(), PitchModifier()):
        spec = proc.param_spec()
        tr = next(f for f in spec if f["key"] == "pv_transient")
        assert tr["show_if"] == {"key": "algorithm", "value": "pv"}
    assert "show_if" in web_server._PAGE


def test_auth_token_required(running_server, tmp_path):
    """Per-session auth (VERDICT r2 #9, Jupyter-style): without the token
    the page, every API GET (fs listings above all), and every POST are
    403 — so a DNS-rebound origin can neither read state nor scrape the
    token out of the page. Query-param and header transport both work."""
    srv, port = running_server

    def raw_get(path, headers=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", headers=headers or {}
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as exc:
            return exc.code, exc.read()

    # No token: page refused with instructions, APIs 403.
    status, body = raw_get("/")
    assert status == 403 and b"token" in body.lower()
    for path in ("/api/graph", "/api/fs", "/api/state"):
        status, _ = raw_get(path)
        assert status == 403, path
    # Wrong token: still refused.
    status, _ = raw_get("/api/fs", {"X-Nodey-Token": "nope"})
    assert status == 403
    # POST without token: refused even same-origin.
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/save",
        data=json.dumps({"path": str(tmp_path / "x.json")}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as exc:
        status = exc.code
    assert status == 403
    assert not (tmp_path / "x.json").exists()
    # Query-param transport (the tokenized URL the CLI prints).
    status, body = raw_get(f"/?token={TOKEN}")
    assert status == 200 and b"<svg" in body
    # The served page embeds the token for its own fetches.
    assert TOKEN.encode() in body
    status, _ = raw_get(f"/api/graph?token={TOKEN}")
    assert status == 200


def test_fs_root_confinement(tmp_path):
    """--fs-root confines /api/fs to a subtree: listings outside (and
    symlink escapes) are refused, and 'up' stops at the root."""
    import os
    import threading

    registry.register_all_processors()
    root = tmp_path / "media"
    root.mkdir()
    (root / "clip.txt").write_text("x")
    outside = tmp_path / "secret"
    outside.mkdir()
    link = root / "escape"
    os.symlink(outside, link)

    srv = web_server.serve(Graph(), "t", port=0, fs_root=str(root))
    token = srv.viewer.auth_token
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        port = srv.server_address[1]

        def fs(path):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/fs?path=" +
                urllib.parse.quote(path),
                headers={"X-Nodey-Token": token},
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as exc:
                return exc.code, json.loads(exc.read())

        # Default listing starts at the root; no parent escape offered.
        status, d = fs("")
        assert status == 200 and d["path"] == str(root)
        assert d["parent"] is None
        names = {e["name"] for e in d["entries"]}
        assert "clip.txt" in names
        # Outside the root: refused.
        status, d = fs(str(outside))
        assert status == 400 and "outside" in d["error"]
        status, d = fs(str(tmp_path))
        assert status == 400
        # Symlink escape resolves outside the root: refused.
        status, d = fs(str(link))
        assert status == 400
    finally:
        srv.shutdown()
