"""Pan/balance + fade nodes (ops/fadepan.py, processors/pan.py,
processors/fade.py).

Contract under test: pan is memoryless per-channel gain — stereo center
is a BITWISE passthrough, mono placement is constant-power, and the
node rides the LTI overlap-discard sharder; fade gains are pure
functions of the int32 global sample position (exact — bit-equal at
equal positions in every render path), regions outside the ramps are
BITWISE passthroughs, streamed == offline bitwise (pure elementwise
math, no reductions), and the sp chain derives the envelope from shard
offsets with zero communication.
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
from nodey_tpu.processors.fade import AudioFade
from nodey_tpu.processors.pan import AudioPan

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


# -- pan op ------------------------------------------------------------------


def test_pan_matches_float64():
    for channels, seed in ((2, 0), (1, 1)):
        x = noise(9000, channels=channels, seed=seed)
        for p in (-1.0, -0.35, 0.0, 0.5, 1.0):
            ref = fp.pan_reference(x, p)
            out = np.asarray(fp.pan_stream(_stream(x), p).data)
            assert out.shape[0] == 2
            assert snr_db(ref, out) > 130.0


def test_pan_center_stereo_bitwise():
    x = noise(4000)
    s = fp.pan_stream(_stream(x), 0.0)
    np.testing.assert_array_equal(np.asarray(s.data), x)


def test_pan_balance_law_edges():
    """Hard left mutes the right channel and passes the left bitwise."""
    x = noise(4000)
    out = np.asarray(fp.pan_stream(_stream(x), -1.0).data)
    np.testing.assert_array_equal(out[0], x[0])
    np.testing.assert_array_equal(out[1], np.zeros_like(x[1]))


def test_pan_mono_constant_power():
    for p in (-1.0, -0.5, 0.0, 0.25, 1.0):
        gl, gr = fp.pan_gains(p, 1)
        assert abs(gl * gl + gr * gr - 1.0) < 1e-12


# -- fade op -----------------------------------------------------------------


def test_fade_matches_float64():
    x = noise(30000, seed=3)
    for args in ((50.0, 0.0, 0.0), (0.0, 2.0, 800.0),
                 (120.0, 3.0, 400.0), (0.0, 1.5, 0.0)):
        ref = fp.fade_reference(x, RATE, *args)
        spec = fp.fade_spec(RATE, *args)
        out = np.asarray(fp.fade_stream(_stream(x), spec).data)
        assert snr_db(ref, out) > 130.0, args


def test_fade_noop_bitwise():
    x = noise(4000)
    spec = fp.fade_spec(RATE, 0.0, 0.0, 0.0)
    assert spec.is_noop
    s = fp.fade_stream(_stream(x), spec)
    np.testing.assert_array_equal(np.asarray(s.data), x)


def test_fade_outside_ramps_bitwise():
    """Between the fade-in end and the fade-out start the gain is the
    CONSTANT 1.0 — bitwise passthrough; after out_end, exact zeros."""
    x = noise(20000, seed=4)
    spec = fp.fade_spec(RATE, 100.0, 2.0, 125.0)
    out = np.asarray(fp.fade_stream(_stream(x), spec).data)
    np.testing.assert_array_equal(
        out[:, spec.n_in:spec.out_start], x[:, spec.n_in:spec.out_start]
    )
    np.testing.assert_array_equal(
        out[:, spec.out_end:], np.zeros_like(x[:, spec.out_end:])
    )


def test_fade_hard_cut():
    """out_ms 0 with a nonzero start is a hard cut to silence."""
    x = noise(20000, seed=5)
    spec = fp.fade_spec(RATE, 0.0, 1.0, 0.0)
    assert spec.n_out == 0 and spec.out_start == RATE
    out = np.asarray(fp.fade_stream(_stream(x), spec).data)
    np.testing.assert_array_equal(out[:, :RATE], x[:, :RATE])
    np.testing.assert_array_equal(
        out[:, RATE:], np.zeros_like(x[:, RATE:])
    )


def test_fade_gain_exact_at_large_positions():
    """Gains at global positions past f32's 2^24 integer ceiling are
    computed from int32-exact differences: device == the same f32
    formula evaluated from int64 positions on host, bitwise."""
    spec = fp.fade_spec(RATE, 0.0, 2100.0, 1000.0)  # out_start 16.8e6
    assert spec.out_start > (1 << 24)
    w = 4096
    for pos0 in (spec.out_start - 100, spec.out_start + spec.n_out - 100):
        got = np.asarray(fp.fade_gain(spec, jnp.int32(pos0), w))
        p = pos0 + np.arange(w, dtype=np.int64)
        diff = np.clip(spec.out_end - p, 0, spec.n_out).astype(np.float32)
        want = np.where(
            p < spec.out_start, np.float32(1.0),
            np.where(p >= spec.out_end, np.float32(0.0),
                     diff * np.float32(1.0 / spec.n_out)),
        )
        np.testing.assert_array_equal(got, want)


def test_fade_streamed_equals_offline_bitwise():
    """Pure elementwise math with position carries: streamed chunks
    reproduce the offline render BITWISE at every chunk size."""
    x = noise(20000, seed=6)
    spec = fp.fade_spec(RATE, 80.0, 1.2, 300.0)
    off = np.asarray(fp.fade_stream(_stream(x), spec).data)
    for w in (1536, 4096):
        state = fp.fade_stream_init()
        outs = []
        for i in range(0, x.shape[1], w):
            chunk = np.zeros((2, w), np.float32)
            k = min(w, x.shape[1] - i)
            chunk[:, :k] = x[:, i:i + k]
            state, o = fp.fade_stream_step(
                spec, state, jnp.asarray(chunk), jnp.int32(k)
            )
            outs.append(np.asarray(o)[:, :k])
        got = np.concatenate(outs, axis=1)
        np.testing.assert_array_equal(got, off)


def test_fade_anchor_end_matches_float64():
    x = noise(30000, seed=7)
    ref = fp.fade_reference(x, RATE, 60.0, 0.0, 500.0, anchor_end=True)
    spec = fp.fade_spec(RATE, 60.0, 0.0, 500.0, anchor_end=True)
    out = np.asarray(fp.fade_stream(_stream(x), spec).data)
    assert snr_db(ref, out) > 130.0
    # the ramp actually ends at the clip end: last sample ~0, and the
    # region before the ramp is a bitwise passthrough
    n, n_out = x.shape[1], spec.n_out
    assert abs(out[0, -1]) <= abs(x[0, -1]) / n_out * 2
    # passthrough is bitwise only BETWEEN the ramps: the fade-in covers
    # [0, n_in) and the end-anchored fade-out covers [n - n_out, n)
    np.testing.assert_array_equal(
        out[:, spec.n_in:n - n_out], x[:, spec.n_in:n - n_out]
    )


# -- graph-level -------------------------------------------------------------


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


def _pan(p):
    node = AudioPan()
    node.set_param("pan", p)
    return node


def _fade(**params):
    node = AudioFade()
    for k, v in params.items():
        if k == "anchor_end":
            node.anchor_end = bool(v)
        else:
            node.set_param(k, v)
    return node


def test_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x2 = noise(12000, seed=9)
    x1 = noise(12000, channels=1, seed=10)
    for proc, x in ((_pan(0.4), x2), (_pan(-0.7), x1),
                    (_fade(in_ms=60.0, out_start_s=1.0, out_ms=250.0), x2)):
        g, src = _node_graph(proc)
        src_arrays = {(src, "output_0"): (x, RATE, "flt")}
        outs, _ = run_offline(g, src_arrays)
        off_arr, off_n = outs["master"]
        off = np.asarray(off_arr)[:, :int(off_n)]
        assert int(off_n) == x.shape[1]
        streamed, _ = run_streamed(g, src_arrays, chunk=2048)
        got = streamed["master"]
        np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_pan_rides_lti_sharded_path():
    """Memoryless LTI: audio_pan shards via overlap-discard, bitwise
    vs single-device (incl. the mono -> stereo widening)."""
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"sp": 8})
    for channels, p in ((2, 0.6), (1, -0.3)):
        x = noise(16000, channels=channels, seed=11)
        g, src = _node_graph(_pan(p))
        cap = sharded.plan_capacity_for(g, RATE, x.shape[1], mesh)
        xp = np.pad(x, ((0, 0), (0, cap - x.shape[1])))
        sources = {(src, "output_0"): compiler.SourceSpec(
            rate=RATE, channels=channels, fmt="flt", capacity=cap,
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


def test_sp_chain_pan_and_fade_match_single_device():
    """Zero-communication tv chain stages: pan (constant gain, mono
    widening) and fade (envelope from the shard offset)."""
    from test_tv_sharded import _chain, _run_both

    for procs, x in (
        ((_pan(0.5),), noise(44_100 // 2, seed=12)),
        ((_pan(0.2),), noise(44_100 // 2, channels=1, seed=13)),
        ((_fade(in_ms=40.0, out_start_s=0.3, out_ms=150.0),),
         noise(44_100 // 2, seed=14)),
    ):
        g, src = _chain(*procs)
        ref, ref_len, out, out_len = _run_both(g, src, x)
        assert out_len == ref_len
        n = min(ref_len, ref.shape[1], out.shape[1])
        assert snr_db(ref[:, :n], out[:, :n]) > 120.0


def test_sp_chain_fade_anchor_end_matches_single_device():
    """anchor_end on the mesh: the global traced length reaches every
    shard, so the end-anchored envelope is evaluated identically."""
    from test_tv_sharded import _chain, _run_both

    x = noise(44_100 // 2, seed=16)
    g, src = _chain(_fade(in_ms=20.0, out_ms=200.0, anchor_end=True))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 120.0


def test_fade_anchor_end_streaming_rejected_with_fallback():
    """The streaming planner rejects anchor_end (causal streams cannot
    see their own end) with UnstreamableGraphError — the subclass
    Runner.export_streamed dispatches its offline fallback on."""
    import pytest

    from nodey_tpu.core import chunkflow
    from nodey_tpu.core.errors import UnstreamableGraphError

    g, src = _node_graph(_fade(out_ms=200.0, anchor_end=True))
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=2048,
    )}
    with pytest.raises(UnstreamableGraphError):
        chunkflow.compile_stream_graph(g, sources, mode="export")


def test_sp_chain_fadepan_composes_with_masterbus():
    """pan + fade slot into a chain alongside dynamics stages."""
    from test_tv_sharded import _chain, _run_both, _vol

    from nodey_tpu.processors.limiter import AudioLimiter

    lim = AudioLimiter()
    lim.set_threshold_db(-3.0)
    x = noise(44_100 // 2, seed=15)
    g, src = _chain(
        _vol(1.4), _pan(-0.4),
        _fade(in_ms=30.0, out_start_s=0.4, out_ms=100.0), lim,
    )
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 95.0


def test_serde_clamps_and_param_spec():
    p = _pan(0.3)
    q = AudioPan()
    q.deserialize(json.loads(json.dumps(p.serialize())))
    assert q.pan == 0.3
    q.deserialize({"pan": 5.0})
    assert q.pan == 1.0
    assert {s["key"] for s in q.param_spec()} == {"pan"}

    f = _fade(in_ms=100.0, out_start_s=2.0, out_ms=300.0)
    g = AudioFade()
    g.deserialize(json.loads(json.dumps(f.serialize())))
    assert (g.in_ms, g.out_start_s, g.out_ms) == (100.0, 2.0, 300.0)
    g.deserialize({"in_ms": -5.0, "out_ms": 1e9})
    assert g.in_ms == 0.0 and g.out_ms == 60_000.0
    assert {s["key"] for s in g.param_spec()} == {
        "in_ms", "out_start_s", "out_ms", "anchor_end"
    }
    (ae_spec,) = [s for s in g.param_spec() if s["key"] == "anchor_end"]
    assert ae_spec["kind"] == "bool"
    # anchor_end round-trips through serialize/deserialize
    g.anchor_end = True
    h = AudioFade()
    h.deserialize(json.loads(json.dumps(g.serialize())))
    assert h.anchor_end is True


def test_fade_anchor_end_editable_via_param_paths():
    """The editor's param merge (apply_params) and set_param must both
    toggle anchor_end in BOTH directions — serialize() therefore always
    carries the key (regression: it was omitted when False, so
    apply_params rejected it as unknown and the editor could never
    enable the option)."""
    from nodey_tpu.app.session import apply_params

    f = AudioFade()
    assert apply_params(f, {"anchor_end": True}) == {"anchor_end": True}
    assert f.anchor_end is True
    apply_params(f, {"anchor_end": False})
    assert f.anchor_end is False
    f.set_param("anchor_end", True)
    assert f.anchor_end is True


def test_fade_anchor_end_without_out_ramp_streams():
    """anchor_end with out_ms=0 degenerates to a plain fade-in, which is
    fully causal — the streaming planner must accept it (ADVICE r2)."""
    from nodey_tpu.core import chunkflow

    g, src = _node_graph(_fade(in_ms=50.0, out_ms=0.0, anchor_end=True))
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=2048,
    )}
    chunkflow.compile_stream_graph(g, sources, mode="export")

    # and the streamed output equals the offline render
    from test_chunkflow import run_offline, run_streamed

    x = noise(12000, seed=21)
    g, src = _node_graph(_fade(in_ms=50.0, out_ms=0.0, anchor_end=True))
    src_arrays = {(src, "output_0"): (x, RATE, "flt")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=2048)
    np.testing.assert_allclose(streamed["master"], off, rtol=0.0,
                               atol=3e-7)


def test_fade_out_start_past_int32_ceiling_is_structured_error():
    """out_start_s beyond 2^30 samples raises the 3-part error instead of
    silently relocating the cut (ADVICE r2, ops/fadepan.py:120)."""
    import pytest

    from nodey_tpu.core.errors import ProcessorRuntimeError

    f = AudioFade()
    f.set_param("out_start_s", 80_000.0)  # > 2^30 samples at 48 kHz
    f.set_param("out_ms", 100.0)
    with pytest.raises(ProcessorRuntimeError) as ei:
        f._spec(48_000)
    assert "position limit" in ei.value.explanation
    # at a lower rate the same anchor is representable — no error
    f._spec(8_000)
