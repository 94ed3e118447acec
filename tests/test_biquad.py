"""Biquad IIR scans (ops/biquad.py + processors/equalizer.py).

Contract under test: the first-order associative-scan formulations
(modal complex scan for conjugate pole pairs; FIR + two real AR(1)
scans for real/repeated poles) compute the exact TDF-II recurrence — a
sequential float64 mirror running the SAME f32-rounded coefficients is
the yardstick — at >=110 dB even for a 60 Hz Q=10 bell where the naive
companion-matrix scan measured 37 dB; RBJ designs hit their specified
frequency responses; a flat EQ is a BITWISE passthrough; streamed
execution continues every section's state across chunk boundaries
(re-association only); both nodes ride the production offline and
chunk-flow compilers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import biquad as bq
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.equalizer import AudioEq, AudioFilter

from conftest import snr_db

RATE = 48_000


def noise(n=RATE // 2, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal((channels, n))).astype(np.float32)


def _tone_gain_db(sections, freq, n=RATE):
    t = np.arange(n) / RATE
    tone = np.sin(2 * np.pi * freq * t).astype(np.float32)[None, :]
    y, _ = bq.cascade_apply(jnp.asarray(tone), sections)
    return 20 * np.log10(np.abs(np.asarray(y))[0, n // 2:].max())


def test_rbj_responses():
    """Design sanity at the response level: center-frequency gain of a
    bell, -3 dB-ish Butterworth cutoff behavior, notch kill, shelf
    plateau gains."""
    assert _tone_gain_db(
        bq.prepare_all([bq.peaking(1000, -6.0, 2.0, RATE)]), 1000
    ) == pytest.approx(-6.0, abs=0.05)
    assert _tone_gain_db(
        bq.prepare_all([bq.peaking(250, 9.0, 1.0, RATE)]), 250
    ) == pytest.approx(9.0, abs=0.05)
    # 2nd-order lowpass at 2x cutoff: |H| = 1/sqrt(1+16) = -12.3 dB.
    assert _tone_gain_db(
        bq.prepare_all([bq.lowpass(500, 1 / np.sqrt(2), RATE)]), 1000
    ) == pytest.approx(-12.3, abs=0.3)
    assert _tone_gain_db(
        bq.prepare_all([bq.notch(1000, 4.0, RATE)]), 1000
    ) < -40.0
    assert _tone_gain_db(
        bq.prepare_all([bq.low_shelf(400, 6.0, RATE)]), 50
    ) == pytest.approx(6.0, abs=0.2)
    assert _tone_gain_db(
        bq.prepare_all([bq.high_shelf(2000, -9.0, RATE)]), 12000
    ) == pytest.approx(-9.0, abs=0.2)


def _cascade():
    return bq.prepare_all([
        bq.low_shelf(100, 4.0, RATE),
        bq.peaking(1000, -6.0, 2.0, RATE),
        bq.peaking(4000, 3.0, 1.0, RATE),
        bq.high_shelf(8000, -3.0, RATE),
    ])


def test_scan_matches_sequential_mirror():
    x = noise()
    secs = _cascade()
    ref = bq.cascade_reference(x, secs)
    y, _ = bq.cascade_apply(jnp.asarray(x), secs)
    assert snr_db(ref, np.asarray(y)) > 120.0


def test_high_q_near_unit_circle():
    """60 Hz Q=10 +12 dB: pole radius ~0.99961. The companion-matrix
    affine scan measures 37 dB here; the modal formulation must hold
    >=110 (measured 117)."""
    x = noise()
    secs = bq.prepare_all([bq.peaking(60, 12.0, 10.0, RATE)])
    assert secs[0].conj
    ref = bq.cascade_reference(x, secs)
    y, _ = bq.cascade_apply(jnp.asarray(x), secs)
    assert snr_db(ref, np.asarray(y)) > 110.0


@pytest.mark.parametrize("q", [0.3, 0.4, 0.5])
def test_real_and_repeated_poles(q):
    """Q <= 0.5 designs have real poles (Q = 0.5 exactly repeated) where
    partial fractions degenerate; the FIR + AR(1)-cascade branch must be
    unconditionally stable and accurate."""
    x = noise()
    secs = bq.prepare_all([bq.lowpass(500, q, RATE)])
    assert not secs[0].conj
    ref = bq.cascade_reference(x, secs)
    y, _ = bq.cascade_apply(jnp.asarray(x), secs)
    assert snr_db(ref, np.asarray(y)) > 120.0


def test_streamed_equals_offline():
    """Mixed cascade (conjugate + real-pole sections) streamed in 4096-
    sample chunks vs the offline scan: carry re-association only
    (measured ~94 dB; the carries re-bracket every section's scan at
    each boundary)."""
    x = noise(n=RATE)
    secs = _cascade() + bq.prepare_all([bq.highpass(80, 0.45, RATE)])
    full, _ = bq.cascade_apply(jnp.asarray(x), secs)
    full = np.asarray(full)
    st = bq.cascade_stream_init(2, secs)
    outs = []
    W = 4096
    for i in range(0, x.shape[1], W):
        chunk = np.zeros((2, W), np.float32)
        m = min(W, x.shape[1] - i)
        chunk[:, :m] = x[:, i:i + m]
        st, o = bq.cascade_stream_step(
            secs, st, jnp.asarray(chunk), jnp.int32(m)
        )
        outs.append(np.asarray(o)[:, :m])
    got = np.concatenate(outs, axis=1)
    assert snr_db(full, got) > 88.0


def _node_graph(proc):
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    nid = g.add_node(proc)
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(nid, "input"))
    g.add_link(pin(nid, "output"), pin(out, "input"))
    return g, src


def test_flat_eq_bitwise_passthrough():
    """All bands at 0 dB: plan-time section skip makes the node a true
    no-op in the fused offline program."""
    from test_chunkflow import run_offline

    x = noise(n=RATE // 4)
    g, src = _node_graph(AudioEq())
    outs, _ = run_offline(g, {(src, "output_0"): (x, RATE, "f32")})
    off, off_n = outs["master"]
    np.testing.assert_array_equal(np.asarray(off)[:, :int(off_n)], x)


def test_eq_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = noise(n=RATE)
    eq = AudioEq()
    eq.set_param("p2_gain_db", -6.0)
    eq.set_param("ls_gain_db", 3.0)
    eq.set_param("hs_gain_db", -2.0)
    g, src = _node_graph(eq)
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, : int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=RATE // 4)
    got = streamed["master"]
    assert got.shape[1] == off.shape[1]
    assert snr_db(off, got) > 88.0
    # The EQ actually did something.
    assert snr_db(x, off) < 40.0


def test_filter_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = noise(n=RATE)
    f = AudioFilter()
    f.set_filter_type("highpass")
    f.set_freq(300.0)
    g, src = _node_graph(f)
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, : int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=RATE // 4)
    got = streamed["master"]
    assert snr_db(off, got) > 88.0


def test_zero_padding_invariant_survives():
    """The Stream invariant (zeros at index >= length) is load-bearing
    for the sharded psum length algebra and amix's drained-input
    silence; an IIR's decay tail must not leak into the padding — on
    the offline op, the stream step, or the sharded chain path."""
    from nodey_tpu.core.stream import Stream

    x = noise(n=2048)
    secs = _cascade()
    # Offline: valid length shorter than capacity, loud content at the
    # boundary so the tail would audibly ring.
    x[:, :2048] = 0.5
    stream = Stream(
        data=jnp.asarray(np.pad(x, ((0, 0), (0, 1024)))),
        length=jnp.int32(2048), rate=RATE, channels=2,
    )
    out = bq.cascade_stream(stream, secs)
    assert np.all(np.asarray(out.data)[:, 2048:] == 0.0)
    # Stream step: partial final chunk.
    st = bq.cascade_stream_init(2, secs)
    _, o = bq.cascade_stream_step(
        secs, st, jnp.asarray(np.pad(x, ((0, 0), (0, 1024)))),
        jnp.int32(2048),
    )
    assert np.all(np.asarray(o)[:, 2048:] == 0.0)


def test_serde_roundtrip_and_clamps():
    import json

    eq = AudioEq()
    eq.set_param("p1_freq", 300.0)
    eq.set_param("p1_gain_db", -4.5)
    eq.set_param("p1_q", 2.5)
    blob = json.loads(json.dumps(eq.serialize()))
    eq2 = AudioEq()
    eq2.deserialize(blob)
    assert (eq2.p1_freq, eq2.p1_gain_db, eq2.p1_q) == (300.0, -4.5, 2.5)
    eq2.deserialize({"p2_gain_db": 999.0, "ls_freq": 1.0})
    assert eq2.p2_gain_db == 24.0 and eq2.ls_freq == 20.0

    f = AudioFilter()
    f.set_filter_type("notch")
    f.set_freq(440.0)
    f.set_q(8.0)
    f2 = AudioFilter()
    f2.deserialize(json.loads(json.dumps(f.serialize())))
    assert (f2.filter_type, f2.freq, f2.q) == ("notch", 440.0, 8.0)
    f2.deserialize({"filter_type": "nonsense", "q": -1.0})
    assert f2.filter_type == "notch" and f2.q == 0.1
    keys = {s["key"] for s in f2.param_spec()}
    assert keys == {"filter_type", "freq", "q"}


def test_no_complex_dtypes_in_device_program():
    """Complex dtypes are UNIMPLEMENTED on the axon TPU backend (any c64
    program raises at the first device_get) — the modal scan must lower
    as split re/im f32 pairs. CPU supports c64, so without this guard
    the whole suite would pass while every EQ graph dies on the chip."""
    import jax
    import jax.numpy as jnp2

    secs = _cascade()
    st = bq.cascade_stream_init(2, secs)
    x = jnp2.zeros((2, 4096), jnp2.float32)

    def scan_jaxpr(jaxpr):
        for eqn in jaxpr.eqns:
            for v in list(eqn.invars) + list(eqn.outvars):
                aval = getattr(v, "aval", None)
                if aval is not None and jnp2.issubdtype(
                    aval.dtype, jnp2.complexfloating
                ):
                    raise AssertionError(f"complex intermediate: {eqn}")

    scan_jaxpr(jax.make_jaxpr(
        lambda s, d: bq.cascade_stream_step(secs, s, d, jnp2.int32(4096))
    )(st, x).jaxpr)
    scan_jaxpr(jax.make_jaxpr(
        lambda d: bq.cascade_apply(d, secs)
    )(x).jaxpr)


def test_eq_rejected_by_sp_planner():
    """IIR = infinite receptive field: the overlap-discard sp planner
    must reject it (the exact route is the tv chain's state prefix)."""
    from nodey_tpu.core import compiler
    from nodey_tpu.core.errors import ProcessorRuntimeError
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    eq = AudioEq()
    eq.set_param("p2_gain_db", -3.0)
    g, src = _node_graph(eq)
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=RATE
    )}
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="Non-LTI"):
        sharded.plan_sharded(g, sources, mesh)
