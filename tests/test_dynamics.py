"""Peak limiter (ops/dynamics.py + processors/limiter.py).

Contract under test: the log-depth max-plus scan computes the exact
instant-attack / exponential-release recurrence (sequential float64
mirror is the yardstick); below the threshold the node is a BITWISE
passthrough; streamed execution continues the envelope across chunk
boundaries exactly (last-ulp re-association only); the node rides the
production offline and chunk-flow compilers.
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
