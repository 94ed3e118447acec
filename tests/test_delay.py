"""Feedback delay / echo (ops/delay.py + processors/delay.py).

Contract under test: the square-and-multiply comb equals the float64
truncated-comb mirror; the echo count K follows the -60 dB truncation
law; wet=0/dry=1 is a BITWISE passthrough; output length grows by
exactly K*D; streamed output is BITWISE-equal to the offline render
(the composition tree is a pure function of K — ops/delay.py
docstring), through the production chunk-flow compiler; the chunked
offline renderer and the sp mesh path produce the grown output, the
mesh bitwise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import delay as dl
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.delay import AudioDelay

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def test_truncation_law():
    """K = ceil(60 / (-20 log10 fb)), 1 at fb=0, capped at 66."""
    assert dl.delay_params(RATE, 100.0, 0.0) == (800, 1)
    d, k = dl.delay_params(RATE, 100.0, 0.5)
    assert (d, k) == (800, 10)            # 0.5^10 ~ -60.2 dB
    assert dl.delay_params(RATE, 100.0, 0.9)[1] == 66
    assert dl.delay_params(RATE, 0.01, 0.5)[0] == 1   # lag floor
    # Every truncated echo train really reaches -60 dB (the first cut
    # echo is at or below it; tolerance for 0.1**3 landing one ulp above
    # 1e-3 in float64).
    for fb in (0.1, 0.3, 0.45, 0.7, 0.89):
        k = dl.delay_params(RATE, 50.0, fb)[1]
        assert fb ** k <= 10 ** (-60.0 / 20.0) * (1 + 1e-9) or k == 66
        assert fb ** (k - 1) > 10 ** (-60.0 / 20.0)


@pytest.mark.parametrize("fb,ms", [(0.0, 50.0), (0.5, 37.5), (0.9, 125.0)])
def test_offline_matches_float64(fb, ms):
    from nodey_tpu.core.stream import Stream

    x = noise(4000)
    d, k = dl.delay_params(RATE, ms, fb)
    ref = dl.delay_reference(x, RATE, ms, fb, 0.4, 0.8)
    st = Stream(data=jnp.asarray(x), length=jnp.int32(4000), rate=RATE,
                channels=2)
    out = dl.delay_stream(st, ms, fb, 0.4, 0.8)
    got = np.asarray(out.data)
    n = int(out.length)
    assert n == 4000 + k * d
    assert snr_db(ref[:, :n], got[:, :n]) > 120.0
    assert np.all(got[:, n:] == 0.0)


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


def _delay(**params):
    p = AudioDelay()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def test_dry_bitwise_passthrough():
    from test_chunkflow import run_offline

    x = noise(4000)
    g, src = _node_graph(_delay(wet=0.0, dry=1.0))
    outs, _ = run_offline(g, {(src, "output_0"): (x, RATE, "f32")})
    off, off_n = outs["master"]
    np.testing.assert_array_equal(np.asarray(off)[:, :int(off_n)], x)


def test_streamed_equals_offline_to_last_ulp():
    """The comb's composition tree is a pure function of K, so chunked
    streaming reproduces the offline render up to the standing
    across-program caveat (exact within one program; last-ulp across
    program shapes — FMA fusion freedom): tolerance one ulp of the
    O(0.1)-magnitude partial sums, like the resampler's contract."""
    from test_chunkflow import run_offline, run_streamed

    x = noise(6000, seed=5)
    g, src = _node_graph(_delay(delay_ms=93.0, feedback=0.6, wet=0.5,
                                dry=0.7))
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=2048)
    got = streamed["master"]
    assert got.shape[1] == off.shape[1]
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)
    assert snr_db(off, got) > 120.0


def test_render_chunked_grows_tail():
    import tempfile

    from nodey_tpu.core import streaming
    from nodey_tpu.host import decode as host_decode
    from nodey_tpu.core.runner import Runner

    x = noise(12000, seed=8)
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/in.wav"
        host_decode.write_wav_s16(path, x, RATE)
        g, src = _node_graph(_delay(delay_ms=150.0, feedback=0.5,
                                    wet=0.4, dry=0.8))
        g.nodes[src].processor.file_paths = [path]
        res = Runner(g).render()
        master, out_rate, _f, _spectra = streaming.render_chunked(
            g, chunk_seconds=0.5
        )
    assert out_rate == res.rate
    assert master.shape[1] == res.master.shape[1]
    np.testing.assert_allclose(
        master, np.asarray(res.master), rtol=0.0, atol=3e-7
    )


def test_sharded_matches_single_device():
    """sp mesh: translation-invariant comb, halo covers K*D — kept
    samples equal the offline program to the across-program last-ulp
    bar (the windowed program fuses FMAs differently)."""
    from nodey_tpu.core import compiler
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    x = noise(40960, seed=11)
    proc = _delay(delay_ms=80.0, feedback=0.55, wet=0.4, dry=0.7)
    d, k = dl.delay_params(RATE, proc.delay_ms, proc.feedback)
    g, src = _node_graph(proc)
    mesh = make_mesh({"sp": 8})
    cap = sharded.plan_capacity_for(g, RATE, x.shape[1] + k * d, mesh)
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=cap
    )}
    sg = sharded.compile_graph_sharded(g, sources, mesh)
    buf = np.zeros((2, cap), np.float32)
    buf[:, :x.shape[1]] = x
    key = compiler.external_key(src, "output_0")
    out = sg.run({key: buf}, {key: x.shape[1]})
    data, glen = out["master"]

    inner = compiler.compile_graph(g, sources)
    ref = inner.run({key: buf}, {key: x.shape[1]})
    rdata, rlen = ref["master"]
    assert int(glen) == int(rlen) == x.shape[1] + k * d
    n = int(rlen)
    np.testing.assert_allclose(
        np.asarray(data)[:, :n], np.asarray(rdata)[:, :n],
        rtol=0.0, atol=3e-7,
    )
    assert snr_db(np.asarray(rdata)[:, :n], np.asarray(data)[:, :n]) > 120.0


def test_serde_clamps_and_param_spec():
    import json

    p = _delay(delay_ms=250.0, feedback=0.6, wet=0.3, dry=0.9)
    q = AudioDelay()
    q.deserialize(json.loads(json.dumps(p.serialize())))
    assert (q.delay_ms, q.feedback, q.wet, q.dry) == (250.0, 0.6, 0.3, 0.9)
    q.deserialize({"delay_ms": 1e9, "feedback": 2.0})
    assert q.delay_ms == 1000.0 and q.feedback == 0.9
    keys = {s["key"] for s in q.param_spec()}
    assert keys == {"delay_ms", "feedback", "wet", "dry"}
    # Receptive field covers the full comb span at any rate.
    for rate in (8_000, 44_100, 48_000):
        d, k = dl.delay_params(rate, q.delay_ms, q.feedback)
        assert q.receptive_seconds * rate >= k * d
