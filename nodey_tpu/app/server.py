"""Read-only web viewer: the engine-honest slice of the reference editor.

``python -m nodey_tpu.app.cli serve project.json`` serves one HTML page that
renders the node graph (nodes/pins/links at their saved editor positions —
the imnodes canvas, reference: src/frontend/app.cpp:1606-1697), live run
state and queue occupancy (the diagnostics overlay, app.cpp:1493-1600, with
the per-link fill gauge of app.cpp:1574-1595 mapped to the egress queue),
and the spectrum tap as a rendered spectrogram. A "preview" button drives a
real StreamingSession through the chunk-flow executor.

Stdlib-only (http.server + embedded HTML/JS); the engine API stays
UI-independent — this is a client of the public surface, not a layer the
core depends on (fixing the reference's ImGui-in-Graph coupling,
include/infra/graph.hpp:30).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from nodey_tpu.core.errors import NodeyError
from nodey_tpu.core.graph import Graph

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>nodey_tpu — %TITLE%</title>
<style>
 body { background:#181a1f; color:#d6d8de; font:13px system-ui, sans-serif;
        margin:0; display:flex; height:100vh; }
 #canvas { flex:1; overflow:auto; }
 #side { width:340px; border-left:1px solid #2c2f36; padding:12px;
         overflow-y:auto; }
 .node { fill:#23262d; stroke:#3a3f4a; rx:8; }
 .title { fill:#9ecbff; font-weight:600; }
 .pin-in { fill:#7fd962; } .pin-out { fill:#e8a04c; }
 .link { stroke:#5a8fd9; stroke-width:2; fill:none; opacity:.85; }
 .label { fill:#aab; font-size:11px; }
 button { background:#2d6cdf; border:0; color:#fff; padding:6px 14px;
          border-radius:6px; cursor:pointer; }
 button:disabled { background:#444; }
 .gauge { height:10px; background:#2c2f36; border-radius:5px; margin:4px 0; }
 .gauge>i { display:block; height:100%%; border-radius:5px;
            background:#7fd962; }
 #spec { width:100%%; image-rendering:pixelated; background:#000;
         border-radius:6px; }
 h3 { margin:14px 0 4px; font-size:12px; text-transform:uppercase;
      color:#8a8f99; }
 pre { white-space:pre-wrap; font-size:11px; color:#9aa0ab; }
</style></head><body>
<div id="canvas"><svg id="svg" width="2400" height="1600"></svg></div>
<div id="side">
 <h3>Project</h3><div id="proj"></div>
 <h3>Preview</h3>
 <button id="run">▶ preview</button> <button id="stop">■ stop</button>
 <div>state: <b id="state">idle</b></div>
 <div>egress queue <div class="gauge"><i id="fill" style="width:0"></i></div></div>
 <div id="metrics"></div>
 <h3>Spectrum tap</h3>
 <canvas id="spec" width="512" height="128"></canvas>
 <h3>Node info</h3><pre id="info">click a node…</pre>
</div>
<script>
const svg = document.getElementById('svg');
function el(n, attrs, text) {
  const e = document.createElementNS('http://www.w3.org/2000/svg', n);
  for (const k in attrs) e.setAttribute(k, attrs[k]);
  if (text) e.textContent = text;
  return e;
}
let graph = null;
async function loadGraph() {
  graph = await (await fetch('/api/graph')).json();
  document.getElementById('proj').textContent =
    graph.title + ' — ' + graph.nodes.length + ' nodes, ' +
    graph.links.length + ' links';
  const pinPos = {};
  for (const n of graph.nodes) {
    const h = 34 + 18 * n.pins.length;
    const g = el('g', {transform:`translate(${n.x},${n.y})`});
    const r = el('rect', {class:'node', width:190, height:h, rx:8});
    r.addEventListener('click', () => {
      document.getElementById('info').textContent =
        n.identifier + ' (#' + n.id + ')\\n' +
        JSON.stringify(n.params, null, 1) + '\\n\\n' + n.description;
    });
    g.appendChild(r);
    g.appendChild(el('text', {class:'title', x:10, y:20}, n.display_name));
    n.pins.forEach((p, i) => {
      const y = 40 + 18 * i, x = p.is_input ? 0 : 190;
      g.appendChild(el('circle',
        {class: p.is_input ? 'pin-in' : 'pin-out', cx:x, cy:y, r:5}));
      g.appendChild(el('text',
        {class:'label', x: p.is_input ? 10 : 130, y: y + 4},
        p.display_name));
      pinPos[p.id] = [n.x + x, n.y + y];
    });
    svg.appendChild(g);
  }
  for (const l of graph.links) {
    const a = pinPos[l.from], b = pinPos[l.to];
    if (!a || !b) continue;
    const mx = (a[0] + b[0]) / 2;
    svg.insertBefore(el('path', {class:'link',
      d:`M${a[0]},${a[1]} C${mx},${a[1]} ${mx},${b[1]} ${b[0]},${b[1]}`}),
      svg.firstChild);
  }
}
async function poll() {
  try {
    const s = await (await fetch('/api/state')).json();
    document.getElementById('state').textContent = s.state;
    document.getElementById('fill').style.width =
      Math.round(100 * s.fill_ratio) + '%%';
    document.getElementById('metrics').textContent =
      s.blocks + ' blocks, ' + s.seconds.toFixed(1) + ' s' +
      (s.rtf_compute ? ', compute RTF ' + s.rtf_compute.toFixed(0) + 'x' : '');
    if (s.spectrum) drawSpec(s.spectrum);
  } catch (e) {}
  setTimeout(poll, 500);
}
function drawSpec(rows) {
  const c = document.getElementById('spec'), ctx = c.getContext('2d');
  const W = rows.length, H = rows[0].length;
  const img = ctx.createImageData(W, H);
  for (let x = 0; x < W; x++) for (let y = 0; y < H; y++) {
    const v = Math.min(1, rows[x][H - 1 - y]);
    const i = 4 * (y * W + x);
    img.data[i] = 20 + 235 * v; img.data[i+1] = 40 + 120 * v;
    img.data[i+2] = 80 + 60 * v; img.data[i+3] = 255;
  }
  c.width = W; c.height = H;
  ctx.putImageData(img, 0, 0);
}
document.getElementById('run').onclick = () => fetch('/api/preview',
  {method:'POST'});
document.getElementById('stop').onclick = () => fetch('/api/stop',
  {method:'POST'});
loadGraph(); poll();
</script></body></html>
"""


class ViewerState:
    """Holds the live preview session + derived overlay data."""

    def __init__(self, graph: Graph, title: str):
        from nodey_tpu.app.notifications import NotificationCenter

        self.graph = graph
        self.title = title
        self.lock = threading.Lock()
        self.session = None
        self.state = "idle"
        self.blocks = 0
        self.seconds = 0.0
        self.fill_ratio = 0.0
        self.rtf_compute = 0.0
        self.spectrum: Optional[list] = None
        self.error: Optional[str] = None
        # Structured event queue (the popup-manager analog) — exposed at
        # /api/notifications for editor clients.
        self.notifications = NotificationCenter()

    def graph_json(self) -> Dict[str, Any]:
        nodes = []
        for nid, node in self.graph.nodes.items():
            info = node.processor.info()
            pins = [
                {
                    "id": pid,
                    "display_name": self.graph.pins[pid].attribute.display_name,
                    "is_input": self.graph.pins[pid].attribute.is_input,
                }
                for pid in node.pins
            ]
            nodes.append(
                {
                    "id": nid,
                    "identifier": info.identifier,
                    "display_name": info.display_name,
                    "description": info.description,
                    "params": node.processor.serialize(),
                    "x": node.position[0],
                    "y": node.position[1],
                    "pins": pins,
                }
            )
        links = [
            {"from": link.from_pin, "to": link.to_pin}
            for link in self.graph.links.values()
        ]
        return {"title": self.title, "nodes": nodes, "links": links}

    def start_preview(self) -> None:
        from nodey_tpu.core.streaming import StreamingSession

        with self.lock:
            if self.state == "running":
                return
            self.state = "running"
            self.blocks = 0
            self.seconds = 0.0
            self.error = None
        session = StreamingSession(self.graph)
        self.session = session

        def consume() -> None:
            try:
                session.start(streamed=True)
                for block in session.blocks(realtime=True):
                    with self.lock:
                        self.blocks += 1
                        self.seconds += block.shape[1] / 48_000.0
                        self.fill_ratio = session.queue.stats.fill_ratio
                    self._update_spectrum(block)
                with self.lock:
                    self.rtf_compute = session.stats.rtf_compute
                    self.state = "finished"
            except BaseException as exc:  # surfaced in the overlay
                self.notifications.push_error(exc)
                with self.lock:
                    self.state = "error"
                    self.error = str(exc)

        threading.Thread(target=consume, daemon=True).start()

    def _update_spectrum(self, block: np.ndarray) -> None:
        """Rolling STFT of the preview output for the spectrum panel."""
        n_fft = 512
        if block.shape[1] < n_fft:
            return
        mono = block.mean(axis=0)
        frames = min(8, block.shape[1] // n_fft)
        cols = []
        for f in range(frames):
            seg = mono[f * n_fft : (f + 1) * n_fft] * np.hanning(n_fft)
            mag = np.abs(np.fft.rfft(seg))[:128]
            cols.append(
                np.clip(np.log10(mag + 1e-4) / 3.0 + 1.0, 0, 1).tolist()
            )
        with self.lock:
            spec = (self.spectrum or []) + cols
            self.spectrum = spec[-256:]

    def stop_preview(self) -> None:
        if self.session is not None:
            self.session.stop()
        with self.lock:
            if self.state == "running":
                self.state = "stopped"

    def state_json(self) -> Dict[str, Any]:
        with self.lock:
            return {
                "state": self.state,
                "blocks": self.blocks,
                "seconds": self.seconds,
                "fill_ratio": self.fill_ratio,
                "rtf_compute": self.rtf_compute,
                "spectrum": self.spectrum,
                "error": self.error,
            }


def make_handler(viewer: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet server
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj: Any, code: int = 200) -> None:
            self._send(
                code, json.dumps(obj).encode(), "application/json"
            )

        def do_GET(self) -> None:
            if self.path == "/":
                page = _PAGE.replace("%TITLE%", viewer.title)
                self._send(200, page.encode(), "text/html; charset=utf-8")
            elif self.path == "/api/graph":
                self._json(viewer.graph_json())
            elif self.path == "/api/state":
                self._json(viewer.state_json())
            elif self.path.startswith("/api/notifications"):
                # Drain-style consumption: ?since=<seq> peeks newer items.
                since = 0
                if "since=" in self.path:
                    try:
                        since = int(self.path.split("since=")[1])
                    except ValueError:
                        since = 0
                self._json(
                    [n.as_dict() for n in viewer.notifications.peek(since)]
                )
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self) -> None:
            if self.path == "/api/preview":
                try:
                    viewer.start_preview()
                    self._json({"ok": True})
                except NodeyError as exc:
                    self._json({"ok": False, "error": str(exc)}, 400)
            elif self.path == "/api/stop":
                viewer.stop_preview()
                self._json({"ok": True})
            else:
                self._json({"error": "not found"}, 404)

    return Handler


def serve(graph: Graph, title: str, host: str = "127.0.0.1",
          port: int = 8787) -> ThreadingHTTPServer:
    """Start the viewer server (returns it; call serve_forever/shutdown)."""
    viewer = ViewerState(graph, title)
    server = ThreadingHTTPServer((host, port), make_handler(viewer))
    server.viewer = viewer  # for tests
    return server
