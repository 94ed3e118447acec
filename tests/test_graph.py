"""Graph structure tests — the check_graph truth table from SURVEY.md §4.2,
mirroring reference behavior at src/infra/graph.cpp:180-282."""

import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import (
    LogicError,
    LoopDetectedError,
    MismatchedPinError,
    MultipleInputError,
)
from nodey_tpu.core.graph import Graph
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.bimix import AudioBimix
from nodey_tpu.processors.spectrum import AudioSpectrum
from nodey_tpu.processors.split import AudioSplit


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def build_chain():
    """audio_input -> gain -> audio_output."""
    g = Graph()
    nid_in = g.add_node(AudioInput())
    nid_vol = g.add_node(AudioVol())
    nid_out = g.add_node(AudioOutput())
    g.add_link(
        g.nodes[nid_in].pin_name_map["output_0"],
        g.nodes[nid_vol].pin_name_map["input"],
    )
    g.add_link(
        g.nodes[nid_vol].pin_name_map["output"],
        g.nodes[nid_out].pin_name_map["input"],
    )
    return g, nid_in, nid_vol, nid_out


def test_empty_graph_ok():
    Graph().check_graph()


def test_chain_ok():
    g, *_ = build_chain()
    g.check_graph()


def test_smallest_free_id_allocation():
    """reference: include/infra/graph.hpp:64-82."""
    g = Graph()
    a = g.add_node(AudioVol())
    b = g.add_node(AudioVol())
    c = g.add_node(AudioVol())
    assert (a, b, c) == (0, 1, 2)
    g.remove_node(b)
    assert g.add_node(AudioVol()) == 1  # freed slot reused first
    assert g.add_node(AudioVol()) == 3


def test_two_node_cycle_rejected():
    """All nodes in a cycle -> empty zero-degree set -> loop
    (graph.cpp:210-211)."""
    g = Graph()
    a = g.add_node(AudioVol())
    b = g.add_node(AudioVol())
    g.add_link(
        g.nodes[a].pin_name_map["output"], g.nodes[b].pin_name_map["input"]
    )
    g.add_link(
        g.nodes[b].pin_name_map["output"], g.nodes[a].pin_name_map["input"]
    )
    with pytest.raises(LoopDetectedError):
        g.check_graph()


def test_reachable_cycle_rejected():
    """Cycle reachable from a root -> on-stack revisit (graph.cpp:246)."""
    g = Graph()
    src = g.add_node(AudioInput())
    mix = g.add_node(AudioBimix())
    vol = g.add_node(AudioVol())
    g.add_link(
        g.nodes[src].pin_name_map["output_0"],
        g.nodes[mix].pin_name_map["input_l"],
    )
    g.add_link(
        g.nodes[mix].pin_name_map["output"], g.nodes[vol].pin_name_map["input"]
    )
    g.add_link(
        g.nodes[vol].pin_name_map["output"],
        g.nodes[mix].pin_name_map["input_r"],
    )
    with pytest.raises(LoopDetectedError):
        g.check_graph()


def test_disconnected_cycle_residue_rejected():
    """A clean chain plus an unreachable 2-cycle -> loop
    (graph.cpp:279-281)."""
    g, *_ = build_chain()
    a = g.add_node(AudioVol())
    b = g.add_node(AudioVol())
    g.add_link(
        g.nodes[a].pin_name_map["output"], g.nodes[b].pin_name_map["input"]
    )
    g.add_link(
        g.nodes[b].pin_name_map["output"], g.nodes[a].pin_name_map["input"]
    )
    with pytest.raises(LoopDetectedError):
        g.check_graph()


def test_diamond_fanin_ok():
    """Diamond shapes are legal (revisit of a completed node is not a cycle)."""
    g = Graph()
    src = g.add_node(AudioInput())
    split = g.add_node(AudioSplit())
    mix = g.add_node(AudioBimix())
    out = g.add_node(AudioOutput())
    g.add_link(
        g.nodes[src].pin_name_map["output_0"],
        g.nodes[split].pin_name_map["input"],
    )
    g.add_link(
        g.nodes[split].pin_name_map["output_l"],
        g.nodes[mix].pin_name_map["input_l"],
    )
    g.add_link(
        g.nodes[split].pin_name_map["output_r"],
        g.nodes[mix].pin_name_map["input_r"],
    )
    g.add_link(
        g.nodes[mix].pin_name_map["output"], g.nodes[out].pin_name_map["input"]
    )
    g.check_graph()


def test_multiple_input_detection():
    """Reference quirk kept: add_link's guard counts only EXISTING links
    (graph.hpp:173-183), so the second link into a pin is accepted and the
    violation surfaces in check_graph — which the app layer uses to roll the
    link back (app.cpp:1834-1837). A third link is rejected at add time."""
    g = Graph()
    a = g.add_node(AudioVol())
    b = g.add_node(AudioVol())
    c = g.add_node(AudioVol())
    d = g.add_node(AudioVol())
    g.add_link(
        g.nodes[a].pin_name_map["output"], g.nodes[c].pin_name_map["input"]
    )
    lid = g.add_link(
        g.nodes[b].pin_name_map["output"], g.nodes[c].pin_name_map["input"]
    )
    with pytest.raises(MultipleInputError):
        g.check_graph()
    with pytest.raises(MultipleInputError):
        g.add_link(
            g.nodes[d].pin_name_map["output"], g.nodes[c].pin_name_map["input"]
        )
    g.remove_link(lid)  # rollback, like the app layer
    g.add_link(
        g.nodes[c].pin_name_map["output"], g.nodes[d].pin_name_map["input"]
    )
    g.add_link(
        g.nodes[b].pin_name_map["output"], g.nodes[d].pin_name_map["input"]
    )
    with pytest.raises(MultipleInputError):
        g.check_graph()


def test_mismatched_pin_type_rejected():
    """Audio pin cannot link to a non-audio-typed pin. All built-in pins are
    audio-typed (the reference instantiates one product type,
    SURVEY.md §2.2), so craft a foreign-typed pin."""
    from nodey_tpu.core.graph import Pin
    from nodey_tpu.core.registry import PinAttribute

    g = Graph()
    a = g.add_node(AudioVol())

    class OtherType:
        pass

    foreign_pin = 99
    g.pins[foreign_pin] = Pin(
        parent=a,
        attribute=PinAttribute("x", "X", OtherType, is_input=True),
    )
    with pytest.raises(MismatchedPinError):
        g.add_link(g.nodes[a].pin_name_map["output"], foreign_pin)


def test_fanout_allowed():
    """One output pin may feed many links (reference: runner.cpp:35-50)."""
    g = Graph()
    src = g.add_node(AudioInput())
    a = g.add_node(AudioVol())
    b = g.add_node(AudioVol())
    out_pin = g.nodes[src].pin_name_map["output_0"]
    g.add_link(out_pin, g.nodes[a].pin_name_map["input"])
    g.add_link(out_pin, g.nodes[b].pin_name_map["input"])
    g.check_graph()


def test_singleton_bookkeeping():
    """reference: graph.cpp:17, 29-38."""
    g = Graph()
    nid = g.add_node(AudioInput())
    assert g.singleton_node_map == {"audio_input": nid}
    with pytest.raises(LogicError):
        g.add_node(AudioInput())
    g.remove_node(nid)
    assert g.singleton_node_map == {}
    g.add_node(AudioInput())  # re-adding after removal is fine


def test_remove_node_cleans_pins_and_links():
    g, nid_in, nid_vol, nid_out = build_chain()
    vol_pins = set(g.nodes[nid_vol].pins)
    g.remove_node(nid_vol)
    assert not vol_pins & set(g.pins)
    assert all(
        link.from_pin not in vol_pins and link.to_pin not in vol_pins
        for link in g.links.values()
    )
    assert len(g.links) == 0  # both links touched the removed node


def test_update_node_pin_preserves_compatible_links():
    """Arity change keeps still-valid links by pin identifier
    (graph.cpp:53-114)."""
    g = Graph()
    src = g.add_node(AudioInput())
    mix = g.add_node(AudioAmix())
    out = g.add_node(AudioOutput())
    amix = g.nodes[mix].processor
    g.add_link(
        g.nodes[src].pin_name_map["output_0"],
        g.nodes[mix].pin_name_map["input_1"],
    )
    g.add_link(
        g.nodes[mix].pin_name_map["output"], g.nodes[out].pin_name_map["input"]
    )
    amix.set_input_num(5)
    g.update_node_pin(mix)
    assert len(g.links) == 2  # both links survived the re-derivation
    assert set(g.nodes[mix].pin_name_map) == {
        "output", "input_1", "input_2", "input_3", "input_4", "input_5",
    }
    # shrink below the linked pin count: input_1 link survives
    amix.set_input_num(1)
    g.update_node_pin(mix)
    assert len(g.links) == 2
    g.check_graph()


def test_update_node_pin_drops_vanished_pins():
    g = Graph()
    src = g.add_node(AudioInput())
    mix = g.add_node(AudioAmix())
    amix = g.nodes[mix].processor
    amix.set_input_num(3)
    g.update_node_pin(mix)
    g.add_link(
        g.nodes[src].pin_name_map["output_0"],
        g.nodes[mix].pin_name_map["input_3"],
    )
    amix.set_input_num(1)
    g.update_node_pin(mix)
    assert len(g.links) == 0  # input_3 vanished, link dropped


def test_spectrum_tap_in_graph():
    g, nid_in, nid_vol, nid_out = build_chain()
    tap = g.add_node(AudioSpectrum())
    # splice the tap between vol and out
    for lid, link in list(g.links.items()):
        if link.to_pin == g.nodes[nid_out].pin_name_map["input"]:
            g.remove_link(lid)
    g.add_link(
        g.nodes[nid_vol].pin_name_map["output"],
        g.nodes[tap].pin_name_map["input"],
    )
    g.add_link(
        g.nodes[tap].pin_name_map["output"],
        g.nodes[nid_out].pin_name_map["input"],
    )
    g.check_graph()


def test_self_link_survives_update_node_pin():
    """A self-link (legal until check_graph) must not crash pin
    re-derivation; the dangling link is dropped (hardening vs the
    reference, which dereferences a dead pin here)."""
    g = Graph()
    a = g.add_node(AudioVol())
    g.add_link(
        g.nodes[a].pin_name_map["output"], g.nodes[a].pin_name_map["input"]
    )
    g.update_node_pin(a)  # must not raise
    assert len(g.links) == 0
    with pytest.raises(LoopDetectedError):
        g.add_link(
            g.nodes[a].pin_name_map["output"],
            g.nodes[a].pin_name_map["input"],
        ) or g.check_graph()
