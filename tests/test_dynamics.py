"""Dynamics family (ops/dynamics.py + processors/limiter.py,
processors/compressor.py).

Contract under test: the log-depth scans compute the exact sequential
recurrences (float64 mirrors are the yardstick — max-plus release for
both nodes, plus the compressor's one-pole attack smoother as an affine
scan); below threshold/knee each node is a BITWISE passthrough (at zero
makeup for the compressor); streamed execution continues the detector
state across chunk boundaries exactly (last-ulp re-association only);
both nodes ride the production offline and chunk-flow compilers.
"""

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import dynamics as dyn
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.limiter import AudioLimiter

from conftest import snr_db

RATE = 48_000


def burst_signal(n=RATE // 2, seed=0):
    rng = np.random.default_rng(seed)
    x = (0.2 * rng.standard_normal((2, n))).astype(np.float32)
    x[:, 6000:6200] *= 8.0
    x[:, 15000:15050] *= 6.0
    return x


def test_scan_matches_sequential_recurrence():
    x = burst_signal()
    ref = dyn.limiter_reference(x, -6.0, 50.0, RATE)
    T, c = dyn.limiter_params(-6.0, 50.0, RATE)
    out, _env, _carry = dyn.limit_block(jnp.asarray(x), T, c)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=0, atol=3e-7)


def test_peaks_capped_at_threshold():
    x = burst_signal()
    T, c = dyn.limiter_params(-6.0, 50.0, RATE)
    out, _env, _carry = dyn.limit_block(jnp.asarray(x), T, c)
    assert float(np.abs(np.asarray(out)).max()) <= T * (1 + 1e-5)


def test_below_threshold_bitwise_passthrough():
    rng = np.random.default_rng(3)
    x = (0.1 * rng.standard_normal((2, RATE // 4))).astype(np.float32)
    T, c = dyn.limiter_params(-6.0, 50.0, RATE)
    out, _env, _carry = dyn.limit_block(jnp.asarray(x), T, c)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_release_recovers():
    """After a burst the gain recovers toward unity with the release
    time constant: ~5 time constants later a below-threshold signal
    passes (nearly) unscaled."""
    n = RATE
    x = np.full((1, n), 0.1, dtype=np.float32)
    x[:, 1000:1100] = 0.9
    T, c = dyn.limiter_params(-6.0, 20.0, RATE)  # 20 ms release
    out, _env, _carry = dyn.limit_block(jnp.asarray(x), T, c)
    out = np.asarray(out)
    after = 1100 + int(5 * 20e-3 * RATE)
    assert abs(out[0, after] / x[0, after] - 1.0) < 0.01
    # Right after the burst the gain is still depressed.
    assert out[0, 1150] / x[0, 1150] < 0.75


def test_streamed_equals_offline():
    x = burst_signal(n=RATE)
    T, c = dyn.limiter_params(-3.0, 80.0, RATE)
    full, _env, _carry = dyn.limit_block(jnp.asarray(x), T, c)
    st = dyn.limiter_stream_init(2)
    outs = []
    W = 4096
    for i in range(0, x.shape[1], W):
        chunk = np.zeros((2, W), np.float32)
        m = min(W, x.shape[1] - i)
        chunk[:, :m] = x[:, i:i + m]
        st, o = dyn.limiter_stream_step(
            T, c, st, jnp.asarray(chunk), jnp.int32(m)
        )
        outs.append(np.asarray(o)[:, :m])
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=0, atol=3e-7)


def _limiter_graph(threshold_db=-6.0):
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    lim = g.add_node(AudioLimiter())
    g.nodes[lim].processor.set_threshold_db(threshold_db)
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(lim, "input"))
    g.add_link(pin(lim, "output"), pin(out, "input"))
    return g, src


def test_graph_offline_and_streamed():
    """The node rides both production compilers; streamed == offline."""
    from test_chunkflow import run_offline, run_streamed

    x = burst_signal(n=RATE)
    g, src = _limiter_graph()
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _meta = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, : int(off_n)]
    streamed, _smeta = run_streamed(g, src_arrays, chunk=RATE // 4)
    got = streamed["master"]
    assert got.shape[1] == off.shape[1]
    assert snr_db(off, got) > 120.0


def test_serde_roundtrip_and_param_spec():
    import json

    p = AudioLimiter()
    p.set_threshold_db(-12.0)
    p.set_release_ms(120.0)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioLimiter()
    q.deserialize(blob)
    assert q.threshold_db == -12.0 and q.release_ms == 120.0
    keys = {f["key"] for f in q.param_spec()}
    assert keys == {"threshold_db", "release_ms"}
    # Clamps (hand-edited project files).
    q.deserialize({"threshold_db": 7.0, "release_ms": 1e9})
    assert q.threshold_db == 0.0 and q.release_ms == 1000.0


# -- compressor ---------------------------------------------------------


def _comp_args(makeup_db=3.0):
    return dict(threshold_db=-18.0, ratio=4.0, knee_db=6.0,
                attack_ms=5.0, release_ms=100.0, makeup_db=makeup_db)


def test_compressor_scans_match_sequential_recurrence():
    """Both detector scans (max-plus release + affine attack) against
    the sequential float64 mirror. The one-pole's re-association and
    the dB-domain amplification put the bar at ~100 dB rather than the
    limiter's last-ulp (measured 104.5 dB on this signal)."""
    x = burst_signal()
    a = _comp_args()
    ref = dyn.compressor_reference(x, rate=RATE, **a)
    p = dyn.compressor_params(rate=RATE, **a)
    out, _env, _s = dyn.compress_block(jnp.asarray(x), p)
    assert snr_db(ref, np.asarray(out)) > 95.0


def test_compressor_below_knee_bitwise_passthrough():
    """Below the knee g_db is EXACTLY 0.0 (selected, not computed), so
    at zero makeup gain = 1.0 * exp(0.0) and x * 1.0 is exact."""
    rng = np.random.default_rng(5)
    x = (0.02 * rng.standard_normal((2, RATE // 4))).astype(np.float32)
    p = dyn.compressor_params(rate=RATE, **_comp_args(makeup_db=0.0))
    out, _env, _s = dyn.compress_block(jnp.asarray(x), p)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_compressor_ratio_engages():
    """A steady sine 12 dB over threshold is reduced by ~9 dB at 4:1
    (12 * (1 - 1/4)), measured after the attack settles."""
    n = RATE
    t = np.arange(n) / RATE
    # -6 dBFS peak = 12 dB over the -18 dB threshold.
    x = (0.501 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)[None, :]
    p = dyn.compressor_params(rate=RATE, **_comp_args(makeup_db=0.0))
    out, _env, _s = dyn.compress_block(jnp.asarray(x), p)
    tail = np.asarray(out)[0, n // 2:]
    red_db = 20 * np.log10(np.abs(tail).max() / 0.501)
    # Peak detector ripple between sine peaks keeps this approximate.
    assert -10.5 < red_db < -7.5


def test_compressor_streamed_equals_offline():
    x = burst_signal(n=RATE)
    a = _comp_args()
    p = dyn.compressor_params(rate=RATE, **a)
    full, _env, _s = dyn.compress_block(jnp.asarray(x), p)
    st = dyn.compressor_stream_init(2)
    outs = []
    W = 4096
    for i in range(0, x.shape[1], W):
        chunk = np.zeros((2, W), np.float32)
        m = min(W, x.shape[1] - i)
        chunk[:, :m] = x[:, i:i + m]
        st, o = dyn.compressor_stream_step(
            p, st, jnp.asarray(chunk), jnp.int32(m)
        )
        outs.append(np.asarray(o)[:, :m])
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=0, atol=3e-7)


def _compressor_graph(**kwargs):
    from nodey_tpu.processors.compressor import AudioCompressor

    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    comp = g.add_node(AudioCompressor())
    proc = g.nodes[comp].processor
    for k, v in kwargs.items():
        getattr(proc, f"set_{k}")(v)
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(comp, "input"))
    g.add_link(pin(comp, "output"), pin(out, "input"))
    return g, src


def test_compressor_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = burst_signal(n=RATE)
    g, src = _compressor_graph(threshold_db=-18.0, makeup_db=2.0)
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _meta = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, : int(off_n)]
    streamed, _smeta = run_streamed(g, src_arrays, chunk=RATE // 4)
    got = streamed["master"]
    assert got.shape[1] == off.shape[1]
    assert snr_db(off, got) > 120.0


def test_compressor_serde_roundtrip_param_spec_and_clamps():
    import json

    from nodey_tpu.processors.compressor import AudioCompressor

    p = AudioCompressor()
    p.set_threshold_db(-24.0)
    p.set_ratio(8.0)
    p.set_knee_db(3.0)
    p.set_attack_ms(1.5)
    p.set_release_ms(250.0)
    p.set_makeup_db(4.0)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioCompressor()
    q.deserialize(blob)
    assert (q.threshold_db, q.ratio, q.knee_db) == (-24.0, 8.0, 3.0)
    assert (q.attack_ms, q.release_ms, q.makeup_db) == (1.5, 250.0, 4.0)
    keys = {f["key"] for f in q.param_spec()}
    assert keys == {"threshold_db", "ratio", "knee_db", "attack_ms",
                    "release_ms", "makeup_db"}
    q.deserialize({"ratio": 1e9, "attack_ms": -5.0, "makeup_db": 100.0})
    assert q.ratio == 20.0 and q.attack_ms == 0.1 and q.makeup_db == 24.0


def test_limiter_rejected_by_sp_planner():
    """The limiter is nonlinear (its envelope is not LTI): the
    overlap-discard sample-axis planner must reject it — halo'd local
    programs would restart the envelope at shard edges and silently
    break the sp path's bitwise contract. dp and streaming remain the
    mesh/bounded-memory routes."""
    import pytest

    from nodey_tpu.core import compiler
    from nodey_tpu.core.errors import ProcessorRuntimeError
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    g, src = _limiter_graph()
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=RATE
    )}
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="Non-LTI"):
        sharded.plan_sharded(g, sources, mesh)
