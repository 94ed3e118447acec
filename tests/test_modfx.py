"""Modulation effects (ops/modfx.py + processors/modulation.py).

Contract under test: the LFO phase is an exact modular-integer residue
of the global sample position (no float drift — residues at equal
positions are bit-equal in every render path); tremolo/chorus match
their float64 mirrors; depth-0 tremolo and wet-0 chorus are BITWISE
passthroughs; streamed == offline (same residues, same elementwise
math — pinned at the across-program last-ulp bar); the sp chain path
derives phase from shard offsets and matches single-device.
"""

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import modfx as mx
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.modulation import AudioChorus, AudioTremolo

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


def test_phase_residues_exact():
    """Residues are exact modular ints: closed-form tables vs Python
    bignum arithmetic, at positions past f32's 2^24 integer ceiling."""
    num, m = mx.lfo_quantize(5.3, RATE)
    w = 4096
    for pos in (0, 12_345, 2**24 + 7, 10**9):
        r0 = jnp.int32((pos * num) % m)
        turns = np.asarray(mx.lfo_turns(r0, w, num, m))
        i = np.arange(w, dtype=object)
        want = (((pos + i) * num) % m).astype(np.float64) / m
        np.testing.assert_allclose(turns, want.astype(np.float32),
                                   rtol=0, atol=0)


def test_advance_residue_matches_bignum():
    num, m = mx.lfo_quantize(0.8, RATE)
    r = jnp.int32(0)
    pos = 0
    for n in (4096, 1, 777, 3000):
        r = mx.advance_residue(r, jnp.int32(n), num, m, 4096)
        pos += n
        assert int(r) == (pos * num) % m


def test_tremolo_matches_float64():
    x = noise(20000)
    ref = mx.tremolo_reference(x, RATE, 5.3, 0.7)
    out = np.asarray(mx.tremolo_stream(_stream(x), 5.3, 0.7).data)
    assert snr_db(ref, out) > 120.0


def test_tremolo_depth0_bitwise():
    x = noise(4000)
    out = np.asarray(mx.tremolo_stream(_stream(x), 5.3, 0.0).data)
    np.testing.assert_array_equal(out, x)


def test_chorus_matches_float64():
    x = noise(20000)
    ref = mx.chorus_reference(x, RATE, 0.8, 20.0, 6.0, 3, 0.5, 0.8)
    out = np.asarray(mx.chorus_stream(
        _stream(x), 0.8, 20.0, 6.0, 3, 0.5, 0.8
    ).data)
    n = x.shape[1]
    assert snr_db(ref[:, :n], out[:, :n]) > 95.0


def test_streamed_equals_offline_ops():
    """Raw op streaming: identical residues and gathers per global
    position; pinned at the across-program last-ulp bar."""
    x = noise(20000, seed=2)
    num, m = mx.lfo_quantize(0.8, RATE)
    base, depth, hist = mx.chorus_spec(RATE, 20.0, 6.0, 3)
    params = (num, m, base, depth, 3, 0.5, 0.8)
    off = np.asarray(mx.chorus_stream(
        _stream(x), 0.8, 20.0, 6.0, 3, 0.5, 0.8
    ).data)
    state = mx.chorus_stream_init(2, hist)
    outs = []
    w = 1536
    for i in range(0, x.shape[1], w):
        chunk = np.zeros((2, w), np.float32)
        k = min(w, x.shape[1] - i)
        chunk[:, :k] = x[:, i:i + k]
        state, o = mx.chorus_stream_step(
            params, state, jnp.asarray(chunk), jnp.int32(k)
        )
        outs.append(np.asarray(o)[:, :k])
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


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


def _tremolo(**params):
    p = AudioTremolo()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def _chorus(**params):
    p = AudioChorus()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def test_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed

    x = noise(12000, seed=9)
    for proc in (_tremolo(rate_hz=4.0, depth=0.6),
                 _chorus(rate_hz=1.2, base_ms=15.0, depth_ms=5.0)):
        g, src = _node_graph(proc)
        src_arrays = {(src, "output_0"): (x, RATE, "f32")}
        outs, _ = run_offline(g, src_arrays)
        off_arr, off_n = outs["master"]
        off = np.asarray(off_arr)[:, :int(off_n)]
        assert int(off_n) == x.shape[1]
        streamed, _ = run_streamed(g, src_arrays, chunk=2048)
        got = streamed["master"]
        np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_sp_chain_tremolo_matches_single_device():
    """Zero-communication sharding: each shard derives the LFO phase
    from its axis offset."""
    from test_tv_sharded import _chain, _run_both

    x = noise(44_100 // 2, seed=4)
    g, src = _chain(_tremolo(rate_hz=6.0, depth=0.8))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 110.0


def test_sp_chain_chorus_matches_single_device():
    """Halo-exchange receptive field + shard-offset phase."""
    from test_tv_sharded import _chain, _run_both

    x = noise(44_100 // 2, seed=5)
    g, src = _chain(_chorus(rate_hz=0.8, base_ms=20.0, depth_ms=6.0,
                            voices=2))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 100.0


def test_sp_chain_modfx_composes_with_masterbus():
    """tremolo + chorus slot into a chain alongside the dynamics/EQ
    stages (every stage's phase/state crosses shards exactly)."""
    from test_tv_sharded import _chain, _run_both, _vol

    from nodey_tpu.processors.limiter import AudioLimiter

    lim = AudioLimiter()
    lim.set_threshold_db(-3.0)
    x = noise(44_100 // 2, seed=6)
    g, src = _chain(_vol(1.5), _chorus(rate_hz=1.0), lim)
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 95.0


def test_serde_clamps_and_param_spec():
    import json

    p = _chorus(rate_hz=2.0, base_ms=10.0, depth_ms=3.0, voices=3,
                wet=0.4, dry=0.9)
    q = AudioChorus()
    q.deserialize(json.loads(json.dumps(p.serialize())))
    assert (q.rate_hz, q.base_ms, q.depth_ms, q.voices, q.wet, q.dry) \
        == (2.0, 10.0, 3.0, 3, 0.4, 0.9)
    q.deserialize({"voices": 99, "base_ms": -5.0})
    assert q.voices == 3 and q.base_ms == 1.0
    assert {s["key"] for s in q.param_spec()} == {
        "rate_hz", "base_ms", "depth_ms", "voices", "wet", "dry"
    }
    t = _tremolo(rate_hz=3.0, depth=0.2)
    u = AudioTremolo()
    u.deserialize(json.loads(json.dumps(t.serialize())))
    assert (u.rate_hz, u.depth) == (3.0, 0.2)
    u.deserialize({"rate_hz": 1e6, "depth": -1.0})
    assert u.rate_hz == 20.0 and u.depth == 0.0
