"""Project JSON serde tests — round-trips for every node type, the
reference's format quirks, and the error taxonomy of Graph::deserialize
(reference: src/infra/graph.cpp:284-479)."""

import json

import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import InvalidFileError, ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.bimix import AudioBimix, AudioBimixV2
from nodey_tpu.processors.resample_node import AudioResample
from nodey_tpu.processors.spectrum import AudioSpectrum
from nodey_tpu.processors.split import AudioSplit
from nodey_tpu.processors.velocity import PitchModifier, VelocityModifier


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def roundtrip(graph: Graph) -> Graph:
    blob = json.dumps(graph.serialize())
    return Graph.deserialize(json.loads(blob))


def test_full_graph_roundtrip_all_node_types():
    g = Graph()
    nid_in = g.add_node(AudioInput())
    g.nodes[nid_in].processor.file_paths = ["/tmp/a.wav", "/tmp/b.wav"]
    g.update_node_pin(nid_in)
    g.nodes[nid_in].position = (10.5, -3.25)

    nid_vol = g.add_node(AudioVol())
    nid_vel = g.add_node(VelocityModifier())
    nid_pitch = g.add_node(PitchModifier())
    nid_amix = g.add_node(AudioAmix())
    nid_bimix = g.add_node(AudioBimix())
    nid_bimix2 = g.add_node(AudioBimixV2())
    nid_split = g.add_node(AudioSplit())
    nid_rs = g.add_node(AudioResample())
    nid_spec = g.add_node(AudioSpectrum())
    nid_out = g.add_node(AudioOutput())

    g.nodes[nid_vel].processor.set_velocity(1.5)
    g.nodes[nid_vel].processor.keep_pitch = True
    g.nodes[nid_pitch].processor.pitch = -4.0
    g.nodes[nid_bimix].processor.set_bias(0.25)
    g.nodes[nid_amix].processor.set_input_num(3)
    g.update_node_pin(nid_amix)
    g.nodes[nid_rs].processor.set_target_rate(48_000)

    def pin(nid, name):
        return g.nodes[nid].pin_name_map[name]

    g.add_link(pin(nid_in, "output_0"), pin(nid_vol, "input"))
    g.add_link(pin(nid_in, "output_1"), pin(nid_vel, "input"))
    g.add_link(pin(nid_vol, "output"), pin(nid_split, "input"))
    g.add_link(pin(nid_split, "output_l"), pin(nid_bimix, "input_l"))
    g.add_link(pin(nid_split, "output_r"), pin(nid_bimix, "input_r"))
    g.add_link(pin(nid_vel, "output"), pin(nid_pitch, "input"))
    g.add_link(pin(nid_bimix, "output"), pin(nid_amix, "input_1"))
    g.add_link(pin(nid_pitch, "output"), pin(nid_amix, "input_2"))
    g.add_link(pin(nid_amix, "output"), pin(nid_rs, "input"))
    g.add_link(pin(nid_rs, "output"), pin(nid_spec, "input"))
    g.add_link(pin(nid_spec, "output"), pin(nid_out, "input"))
    g.check_graph()

    g2 = roundtrip(g)
    g2.check_graph()

    assert set(g2.nodes) == set(g.nodes)
    assert g2.nodes[nid_in].position == (10.5, -3.25)
    assert g2.nodes[nid_in].processor.file_paths == ["/tmp/a.wav", "/tmp/b.wav"]
    assert g2.nodes[nid_vel].processor.velocity == 1.5
    assert g2.nodes[nid_vel].processor.keep_pitch is True
    assert g2.nodes[nid_pitch].processor.pitch == -4.0
    assert g2.nodes[nid_bimix].processor.bias == 0.25
    assert g2.nodes[nid_amix].processor.input_num == 3
    assert len(g2.links) == len(g.links)
    # link endpoints resolve to the same (node, pin-name) pairs
    def link_names(graph):
        return sorted(
            (
                graph.pins[l.from_pin].parent,
                graph.pins[l.from_pin].attribute.identifier,
                graph.pins[l.to_pin].parent,
                graph.pins[l.to_pin].attribute.identifier,
            )
            for l in graph.links.values()
        )

    assert link_names(g) == link_names(g2)


def test_schema_shape_matches_reference():
    """Exact top-level schema of graph.cpp:284-372."""
    g = Graph()
    nid = g.add_node(AudioVol())
    g.nodes[nid].position = (1.0, 2.0)
    out = g.serialize()
    assert set(out) == {"nodes", "links"}
    assert set(out["nodes"]) == {str(nid)}
    node = out["nodes"][str(nid)]
    assert set(node) == {"identifier", "info", "position"}
    assert node["identifier"] == "audio_volume_adjust"
    assert node["position"] == {"x": 1.0, "y": 2.0}
    # Audio_vol quirk: empty info blob (include/processor/audio-vol.hpp:57-58)
    assert node["info"] == {}
    assert out["links"] == []


def test_audio_vol_empty_serde_quirk_tolerated_on_load():
    vol = AudioVol()
    vol.set_volume(3.0)
    blob = vol.serialize()
    assert blob == {}
    vol2 = AudioVol()
    vol2.deserialize(blob)
    assert vol2.volume == 1.0  # not persisted, by reference semantics


def test_reference_format_file_loads():
    """A hand-written file in the exact reference schema must load."""
    blob = {
        "nodes": {
            "0": {
                "identifier": "audio_input",
                "info": {"file_path": ["x.wav"]},
                "position": {"x": 0, "y": 0},
            },
            "2": {
                "identifier": "audio_output",
                "info": {},
                "position": {"x": 100, "y": 0},
            },
        },
        "links": [
            {
                "from": {"node": 0, "pin": "output_0"},
                "to": {"node": 2, "pin": "input"},
            }
        ],
    }
    g = Graph.deserialize(blob)
    g.check_graph()
    assert set(g.nodes) == {0, 2}
    assert len(g.links) == 1


def test_deserialize_error_taxonomy():
    with pytest.raises(InvalidFileError):
        Graph.deserialize([])  # not an object
    with pytest.raises(InvalidFileError):
        Graph.deserialize({"nodes": [], "links": []})  # nodes not object
    with pytest.raises(InvalidFileError):
        Graph.deserialize({"nodes": {}, "links": {}})  # links not array
    with pytest.raises(InvalidFileError):
        Graph.deserialize({"nodes": {"x1": {}}, "links": []})  # bad ID
    with pytest.raises(InvalidFileError):
        Graph.deserialize(
            {"nodes": {"0": {"identifier": "nope", "info": {}}}, "links": []}
        )  # unknown identifier
    # duplicate singleton
    node = {"identifier": "audio_output", "info": {}, "position": {}}
    with pytest.raises(InvalidFileError):
        Graph.deserialize(
            {"nodes": {"0": dict(node), "1": dict(node)}, "links": []}
        )
    # link to unknown node
    with pytest.raises(InvalidFileError):
        Graph.deserialize(
            {
                "nodes": {"0": dict(node)},
                "links": [
                    {
                        "from": {"node": 5, "pin": "x"},
                        "to": {"node": 0, "pin": "input"},
                    }
                ],
            }
        )
    # link to unknown pin
    with pytest.raises(InvalidFileError):
        Graph.deserialize(
            {
                "nodes": {"0": dict(node)},
                "links": [
                    {
                        "from": {"node": 0, "pin": "nope"},
                        "to": {"node": 0, "pin": "input"},
                    }
                ],
            }
        )


def test_amix_serde_flat_keys():
    """reference: audio-amix.cpp:395-423 — volumes{i}/locks{i} flat keys."""
    amix = AudioAmix()
    amix.set_input_num(3)
    amix.volumes = [0.5, 0.3, 0.2]
    amix.locks = [True, False, False]
    blob = amix.serialize()
    assert blob == {
        "input_num": 3,
        "volumes0": 0.5, "locks0": True,
        "volumes1": 0.3, "locks1": False,
        "volumes2": 0.2, "locks2": False,
    }
    amix2 = AudioAmix()
    amix2.deserialize(blob)
    assert amix2.input_num == 3
    assert amix2.volumes == [0.5, 0.3, 0.2]
    assert amix2.locks == [True, False, False]


def test_amix_missing_input_num_raises():
    with pytest.raises(ProcessorRuntimeError):
        AudioAmix().deserialize({})


def test_bimix_serde_validation():
    bimix = AudioBimix()
    with pytest.raises(ProcessorRuntimeError):
        bimix.deserialize({})
    with pytest.raises(ProcessorRuntimeError):
        bimix.deserialize({"bias": "x"})
    bimix.deserialize({"bias": 5.0})
    assert bimix.bias == 1.0  # clamped, reference: audio-bimix.cpp:381-382


def test_audio_input_serde_validation():
    with pytest.raises(ProcessorRuntimeError):
        AudioInput().deserialize({})
    with pytest.raises(ProcessorRuntimeError):
        AudioInput().deserialize({"file_path": [3]})
    src = AudioInput()
    src.deserialize({"file_path": []})
    assert src.file_paths == [""]  # at least one slot (audio-io.cpp:334-337)


def test_velocity_tolerant_deserialize():
    v = VelocityModifier()
    v.deserialize({"velocity": 2.0})
    assert v.velocity == 2.0 and v.keep_pitch is False
    v.deserialize({"keep_pitch": True})
    assert v.velocity == 2.0 and v.keep_pitch is True
    v.deserialize({})  # silently ignores missing fields like the reference


def test_amix_tolerant_deserialize_clamps():
    """A hand-edited project must not create out-of-range arity/weights
    (the reference UI can only write input_num in [1,16] and slider
    volumes in [0.001, 0.999], audio-amix.cpp:340-347, 352-357)."""
    from nodey_tpu.processors.amix import AudioAmix

    mix = AudioAmix()
    mix.deserialize({"input_num": 10_000, "volumes0": 1e30, "locks0": True})
    assert mix.input_num == 16
    assert mix.volumes[0] == 16.0
    mix.deserialize({"input_num": -3})
    assert mix.input_num == 1
    # Engine-produced values outside the slider range survive a round
    # trip (renormalization can go negative when locked volumes sum past
    # 1 — same math as the reference, audio-amix.cpp:358-371).
    mix2 = AudioAmix()
    mix2.set_input_num(3)
    mix2.volumes = [0.999, 0.999, 0.5]
    mix2.locks = [True, True, False]
    mix2.set_volume(2, 0.5)  # scale = (1 - 1.998) / 0.5 < 0
    assert mix2.volumes[2] < 0.0
    blob = mix2.serialize()
    mix3 = AudioAmix()
    mix3.deserialize(blob)
    assert mix3.volumes == mix2.volumes[: mix2.input_num]


def test_resample_tolerant_deserialize_clamps():
    """target_rate=0 in a hand-edited file must not reach the rational
    reduction (ZeroDivisionError) or explode the phase bank."""
    from nodey_tpu.processors.resample_node import AudioResample

    rs = AudioResample()
    rs.deserialize({"target_rate": 0})
    assert rs.target_rate == 4_000
    rs.deserialize({"target_rate": 10_000_000})
    assert rs.target_rate == 192_000
