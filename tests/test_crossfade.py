"""Crossfade node (ops/crossfade.py + processors/crossfade.py).

Contract under test: the blend gain is a pure function of the int32
global sample index — BITWISE input A before the window and BITWISE
input B after it (index selection, not gain multiplication), float64
mirror agreement inside, output running to the LONGER input, and
streamed == offline BITWISE (one int32 position carry over the shared
aligned-merge FIFOs; in-window blends sit at the across-program
last-ulp bar, since the two-term multiply-add is subject to XLA's
per-program fma contraction). Mismatched rates/channels/t0 and windows
past the 2^30-sample anchor ceiling raise structured errors.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import crossfade as cf
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.crossfade import AudioCrossfade

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x, t0_us=0.0):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0], t0_us=t0_us)


def _xfade(**params):
    p = AudioCrossfade()
    for k, v in params.items():
        if k == "law":
            p.set_law(v)
        else:
            p.set_param(k, v)
    return p


def _node_graph(proc):
    """One input node with two file slots feeding both crossfade pins."""
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav", "b.wav"]
    g.update_node_pin(src)
    nid = g.add_node(proc)
    out = g.add_node(AudioOutput())
    pin = lambda a, p: g.nodes[a].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(nid, "input_a"))
    g.add_link(pin(src, "output_1"), pin(nid, "input_b"))
    g.add_link(pin(nid, "output"), pin(out, "input"))
    return g, src


def test_matches_float64_both_laws():
    a = noise(16_000, seed=1)
    b = noise(16_000, seed=2)
    for law in ("equal_power", "linear"):
        out = np.asarray(cf.crossfade_streams(
            _stream(a), _stream(b), 1.0, 500.0, law
        ).data)
        ref = cf.crossfade_reference(a, b, RATE, 1.0, 500.0, law)
        assert snr_db(ref, out) > 120.0


def test_bitwise_outside_window():
    a = noise(16_000, seed=1)
    b = noise(16_000, seed=2)
    n0, n_dur = cf.crossfade_spec(RATE, 1.0, 500.0)
    out = np.asarray(cf.crossfade_streams(
        _stream(a), _stream(b), 1.0, 500.0, "equal_power"
    ).data)
    np.testing.assert_array_equal(out[:, :n0], a[:, :n0])
    np.testing.assert_array_equal(out[:, n0 + n_dur:],
                                  b[:, n0 + n_dur:])


def test_output_runs_to_longer_input():
    a = noise(6_000, seed=3)
    b = noise(14_000, seed=4)
    s = cf.crossfade_streams(_stream(a), _stream(b), 0.5, 300.0,
                             "equal_power")
    assert int(s.length) == 14_000
    n0, n_dur = cf.crossfade_spec(RATE, 0.5, 300.0)
    out = np.asarray(s.data)
    # Past A's end but before the window: A region is zeros (A drained).
    np.testing.assert_array_equal(out[:, n0 + n_dur:14_000],
                                  b[:, n0 + n_dur:14_000])
    # Reversed lengths: after the window the output is the (shorter)
    # incoming side — zeros past its end at 6000, but only from the
    # window end (the outgoing side still feeds the blend inside it).
    s2 = cf.crossfade_streams(_stream(b), _stream(a), 0.5, 300.0,
                              "linear")
    assert int(s2.length) == 14_000
    out2 = np.asarray(s2.data)
    assert n0 + n_dur == 6_400
    np.testing.assert_array_equal(
        out2[:, 6_400:14_000], np.zeros((2, 7_600), np.float32)
    )


def test_equal_power_midpoint_and_monotone():
    """At the window midpoint both gains are cos(pi/4) ~ 0.7071;
    linear law sums to 1 everywhere in the window."""
    ga, gb, before, after = cf.crossfade_gains(
        jnp.int32(0), 4_000, 1_000, 2_000, "equal_power"
    )
    ga, gb = np.asarray(ga), np.asarray(gb)
    assert np.isclose(ga[2_000], np.cos(np.pi / 4), atol=1e-6)
    assert np.isclose(gb[2_000], np.sin(np.pi / 4), atol=1e-6)
    assert np.all(np.diff(ga[1_000:3_001]) <= 1e-7)
    assert np.all(np.diff(gb[1_000:3_001]) >= -1e-7)
    la, lb, _, _ = cf.crossfade_gains(
        jnp.int32(0), 4_000, 1_000, 2_000, "linear"
    )
    np.testing.assert_allclose(
        np.asarray(la)[1_000:3_000] + np.asarray(lb)[1_000:3_000],
        1.0, atol=1e-6
    )


def test_graph_offline_and_streamed_bitwise():
    from test_chunkflow import run_offline, run_streamed

    a = noise(12_000, seed=9)
    b = noise(12_000, seed=10)
    g, src = _node_graph(_xfade(at_s=0.6, dur_ms=400.0))
    src_arrays = {(src, "output_0"): (a, RATE, "flt"),
                  (src, "output_1"): (b, RATE, "flt")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    assert int(off_n) == 12_000
    streamed, _ = run_streamed(g, src_arrays, chunk=2_048)
    got = streamed["master"]
    # Outside the window the output is `where`-selected input data —
    # BITWISE across programs; inside, the two-term blend is subject to
    # XLA's per-program fma contraction (the across-program last-ulp
    # bar, same as the chorus in test_modfx).
    n0, n_dur = cf.crossfade_spec(RATE, 0.6, 400.0)
    np.testing.assert_array_equal(got[:, :n0], off[:, :n0])
    np.testing.assert_array_equal(got[:, n0 + n_dur:],
                                  off[:, n0 + n_dur:])
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_graph_streamed_unequal_lengths():
    from test_chunkflow import run_offline, run_streamed

    a = noise(7_000, seed=11)
    b = noise(12_000, seed=12)
    g, src = _node_graph(_xfade(at_s=0.5, dur_ms=300.0, law="linear"))
    src_arrays = {(src, "output_0"): (a, RATE, "flt"),
                  (src, "output_1"): (b, RATE, "flt")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    # Offline capacity covers max input; valid length is the longer one.
    assert int(off_n) == 12_000
    off = np.asarray(off_arr)[:, :int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=2_048)
    got = streamed["master"]
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_validation_errors():
    a = noise(4_000)
    p = _xfade()
    with pytest.raises(ProcessorRuntimeError):
        p.lower(None, {"input_a": _stream(a)})          # missing input
    b_rate = Stream(data=jnp.asarray(a), length=jnp.int32(4_000),
                    rate=44_100, channels=2)
    with pytest.raises(ProcessorRuntimeError):
        p.lower(None, {"input_a": _stream(a), "input_b": b_rate})
    mono = noise(4_000, channels=1)
    with pytest.raises(ProcessorRuntimeError):
        p.lower(None, {"input_a": _stream(a), "input_b": _stream(mono)})
    with pytest.raises(ProcessorRuntimeError):
        p.lower(None, {"input_a": _stream(a),
                       "input_b": _stream(a, t0_us=5e5)})


def test_anchor_ceiling_is_structured_error():
    with pytest.raises(ProcessorRuntimeError):
        cf.crossfade_spec(192_000, 86_400.0, 2_000.0)
    # Comfortably inside the ceiling at 48 kHz: fine.
    n0, n_dur = cf.crossfade_spec(48_000, 3_600.0, 2_000.0)
    assert n0 == 3_600 * 48_000 and n_dur == 96_000


def test_serde_clamps_and_param_spec():
    p = _xfade(at_s=-5.0, dur_ms=10**9, law="linear")
    assert p.at_s == 0.0 and p.dur_ms == 60_000.0 and p.law == "linear"
    p.set_law("nonsense")
    assert p.law == "linear"
    p.set_param("at_s", 12.5)
    p.set_param("dur_ms", 800.0)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioCrossfade()
    q.deserialize(blob)
    assert (q.at_s, q.dur_ms, q.law) == (12.5, 800.0, "linear")
    assert {s["key"] for s in q.param_spec()} == {"at_s", "dur_ms", "law"}
    q.deserialize({"at_s": "junk", "law": 7})
    q.deserialize(None)
    assert (q.at_s, q.law) == (12.5, "linear")
