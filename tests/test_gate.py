"""Noise gate (ops/dynamics.py gate section + processors/gate.py).

Contract under test: the two log-depth detector scans + gate curve
compute the exact sequential recurrence (float64 mirror); at or above
threshold the node is a BITWISE passthrough; quiet passages attenuate
by up to range_db; streamed execution continues the detector state
across chunks; the sp chain path (compile_chain_sp_tv) matches the
single-device program to re-association tolerance.
"""

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import dynamics as dyn
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.gate import AudioGate

from conftest import snr_db

RATE = 48_000


def gated_signal(n=RATE // 2, seed=0):
    """Loud phrase - near-silence (hiss) - loud phrase."""
    rng = np.random.default_rng(seed)
    x = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    x[:, n // 4: 3 * n // 4] *= 0.003          # ~-50 dB floor segment
    return x


def test_scans_match_sequential_recurrence():
    x = gated_signal()
    ref = dyn.gate_reference(x, -40.0, 4.0, 60.0, 1.0, 150.0, RATE)
    p = dyn.gate_params(-40.0, 4.0, 60.0, 1.0, 150.0, RATE)
    out, _env, _s = dyn.gate_block(jnp.asarray(x), p)
    assert snr_db(ref, np.asarray(out)) > 110.0


def test_above_threshold_bitwise_passthrough():
    """A signal that never dips below threshold passes bit-exactly once
    the gate has opened (gain is EXACTLY 0 dB via jnp.where). The first
    ~200 samples ramp: the smoother starts at the floor — a gate is
    CLOSED at clip start by definition and opens at the attack rate."""
    rng = np.random.default_rng(3)
    x = (0.5 + 0.3 * rng.random((2, 24000))).astype(np.float32)
    x *= np.sign(rng.standard_normal((2, 24000))).astype(np.float32)
    p = dyn.gate_params(-30.0, 4.0, 60.0, 1.0, 100.0, RATE)
    out, _env, _s = dyn.gate_block(jnp.asarray(x), p)
    np.testing.assert_array_equal(np.asarray(out)[:, 2000:], x[:, 2000:])


def test_quiet_segment_attenuates():
    x = gated_signal()
    p = dyn.gate_params(-40.0, 8.0, 60.0, 1.0, 20.0, RATE)
    out, _env, _s = dyn.gate_block(jnp.asarray(x), p)
    out = np.asarray(out)
    n = x.shape[1]
    # Deep inside the quiet segment (past the release) the gate is shut.
    mid = slice(int(0.45 * n), int(0.55 * n))
    gain = np.abs(out[:, mid]).sum() / max(np.abs(x[:, mid]).sum(), 1e-20)
    assert gain < 10 ** (-30.0 / 20.0)
    # The loud head is untouched (gate open from the first sample's
    # instant attack within the smoother's time constant).
    head = slice(2000, n // 4 - 1000)
    assert snr_db(x[:, head], out[:, head]) > 60.0


def test_range_db_floors_attenuation():
    x = gated_signal()
    p = dyn.gate_params(-40.0, 20.0, 12.0, 1.0, 20.0, RATE)
    out, _env, _s = dyn.gate_block(jnp.asarray(x), p)
    out = np.asarray(out)
    n = x.shape[1]
    mid = slice(int(0.45 * n), int(0.55 * n))
    gain = np.abs(out[:, mid]).sum() / max(np.abs(x[:, mid]).sum(), 1e-20)
    assert gain > 10 ** (-13.0 / 20.0)          # floored at -12 dB
    assert gain < 10 ** (-11.0 / 20.0)


def test_streamed_equals_offline():
    x = gated_signal(seed=7)
    p = dyn.gate_params(-40.0, 4.0, 60.0, 2.0, 120.0, RATE)
    off, _e, _s = dyn.gate_block(jnp.asarray(x), p)
    off = np.asarray(off)

    state = dyn.gate_stream_init(2)
    w = 4096
    outs = []
    for i in range(0, x.shape[1], w):
        chunk = np.zeros((2, w), np.float32)
        n = min(w, x.shape[1] - i)
        chunk[:, :n] = x[:, i:i + n]
        state, out = dyn.gate_stream_step(
            p, state, jnp.asarray(chunk), jnp.int32(n)
        )
        outs.append(np.asarray(out)[:, :n])
    got = np.concatenate(outs, axis=1)
    assert snr_db(off, got) > 110.0


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


def _gate(**params):
    p = AudioGate()
    for k, v in params.items():
        setter = getattr(p, f"set_{k}")
        setter(v)
    return p


def test_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = gated_signal(seed=9)
    g, src = _node_graph(_gate(threshold_db=-40.0, ratio=6.0))
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    assert int(off_n) == x.shape[1]
    streamed, _ = run_streamed(g, src_arrays, chunk=4096)
    got = streamed["master"]
    assert snr_db(off, got) > 110.0


def test_sp_chain_matches_single_device():
    """audio_gate shards the sample axis via the compressor's
    spatialized two-prefix detector with the gate curve."""
    from test_tv_sharded import _chain, _run_both

    x = gated_signal(n=44_100 // 2, seed=4)
    g, src = _chain(_gate(threshold_db=-40.0, ratio=6.0,
                          release_ms=80.0))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 100.0


def test_rejected_by_lti_sp_planner():
    import pytest

    from nodey_tpu.core import compiler
    from nodey_tpu.core.errors import ProcessorRuntimeError
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    g, src = _node_graph(_gate())
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=RATE
    )}
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="Non-LTI"):
        sharded.plan_sharded(g, sources, mesh)


def test_serde_roundtrip_param_spec_and_clamps():
    import json

    p = _gate(threshold_db=-35.0, ratio=8.0, range_db=40.0,
              attack_ms=2.0, release_ms=300.0)
    q = AudioGate()
    q.deserialize(json.loads(json.dumps(p.serialize())))
    assert (q.threshold_db, q.ratio, q.range_db, q.attack_ms,
            q.release_ms) == (-35.0, 8.0, 40.0, 2.0, 300.0)
    q.deserialize({"threshold_db": -500.0, "ratio": 99.0,
                   "range_db": 1e9})
    assert q.threshold_db == -90.0 and q.ratio == 20.0
    assert q.range_db == 90.0
    keys = {s["key"] for s in q.param_spec()}
    assert keys == {"threshold_db", "ratio", "range_db", "attack_ms",
                    "release_ms"}
