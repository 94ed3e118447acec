"""Stereo width node (ops/fadepan.width_array, processors/pan.AudioWidth).

Contract under test: mid/side width is a constant memoryless channel
matrix — it matches its float64 mirror, width 1.0 and mono inputs are
BITWISE passthroughs, width 0 collapses to mono (both channels equal),
streamed == offline, and the node rides BOTH sharded paths (the LTI
overlap-discard graph sharder bitwise, and the tv chain as a
zero-communication stage).
"""

import json

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import fadepan as fp
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.pan import AudioWidth

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


def _width(w):
    p = AudioWidth()
    p.set_param("width", w)
    return p


def _node_graph(proc):
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    nid = g.add_node(proc)
    out = g.add_node(AudioOutput())
    pin = lambda a, p: g.nodes[a].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(nid, "input"))
    g.add_link(pin(nid, "output"), pin(out, "input"))
    return g, src


def test_width_matches_float64():
    x = noise(9_000)
    for w in (0.0, 0.4, 1.3, 2.0):
        ref = fp.width_reference(x, w)
        out = np.asarray(fp.width_stream(_stream(x), w).data)
        assert snr_db(ref, out) > 130.0


def test_width_one_and_mono_bitwise():
    x = noise(4_000)
    np.testing.assert_array_equal(
        np.asarray(fp.width_stream(_stream(x), 1.0).data), x
    )
    m = noise(4_000, channels=1, seed=1)
    np.testing.assert_array_equal(
        np.asarray(fp.width_stream(_stream(m), 1.7).data), m
    )


def test_width_zero_collapses_to_mono():
    x = noise(4_000, seed=2)
    out = np.asarray(fp.width_stream(_stream(x), 0.0).data)
    np.testing.assert_array_equal(out[0], out[1])
    ref = 0.5 * (x.astype(np.float64)[0] + x.astype(np.float64)[1])
    assert snr_db(ref.astype(np.float32)[None], out[:1]) > 130.0


def test_width_preserves_mid_energy():
    """The mid signal is width-invariant: (out_L + out_R) == (L + R)
    up to f32 rounding at every width."""
    x = noise(6_000, seed=3)
    for w in (0.0, 0.5, 2.0):
        out = np.asarray(fp.width_stream(_stream(x), w).data)
        np.testing.assert_allclose(
            out[0] + out[1], x[0] + x[1], rtol=0.0, atol=1e-6
        )


def test_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = noise(12_000, seed=9)
    g, src = _node_graph(_width(1.6))
    src_arrays = {(src, "output_0"): (x, RATE, "flt")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    assert int(off_n) == x.shape[1]
    streamed, _ = run_streamed(g, src_arrays, chunk=2048)
    got = streamed["master"]
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_width_rides_lti_sharded_path():
    """Memoryless LTI: audio_width shards via overlap-discard, bitwise
    vs single-device."""
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"sp": 8})
    x = noise(16_000, seed=11)
    g, src = _node_graph(_width(0.3))
    cap = sharded.plan_capacity_for(g, RATE, x.shape[1], mesh)
    xp = np.pad(x, ((0, 0), (0, cap - x.shape[1])))
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=cap,
    )}
    key = compiler.external_key(src, "output_0")
    single = compiler.compile_graph(g, sources, mode="export")
    ref, ref_len = single.run({key: xp}, {key: x.shape[1]})["master"]

    sg = sharded.compile_graph_sharded(g, sources, mesh, mode="export")
    out, out_len = sg.run({key: xp}, {key: x.shape[1]})["master"]
    assert int(out_len) == int(ref_len) == x.shape[1]
    np.testing.assert_array_equal(
        np.asarray(out)[:, :x.shape[1]],
        np.asarray(ref)[:, :x.shape[1]],
    )


def test_sp_chain_width_composes():
    """tv chain: widener beside gain + tremolo stages, zero
    communication for the width matrix itself."""
    from test_tv_sharded import _chain, _run_both, _vol
    from test_modfx import _tremolo

    x = noise(44_100 // 2, seed=6)
    g, src = _chain(_vol(1.2), _width(1.8),
                    _tremolo(rate_hz=4.0, depth=0.5))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 110.0


def test_serde_clamps_and_param_spec():
    p = _width(99.0)
    assert p.width == 2.0
    p.set_param("width", -5.0)
    assert p.width == 0.0
    p.set_param("width", 0.8)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioWidth()
    q.deserialize(blob)
    assert q.width == 0.8
    assert {s["key"] for s in q.param_spec()} == {"width"}
    q.deserialize({"width": "nan"})
    q.deserialize("junk")
    assert q.width == 0.8
