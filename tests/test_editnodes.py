"""Timeline editing nodes (ops/editops.py, processors/editnodes.py).

Contract under test: trim and reverse are pure index selection —
BITWISE against plain NumPy slicing/permutation; trim streams bitwise
with one int32 position carry across arbitrary chunk boundaries;
reverse refuses streaming and the streamed export falls back to the
offline render (byte-identical file); serde/clamps round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import editops
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.editnodes import AudioReverse, AudioTrim

registry.register_all_processors()

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


def _node_graph(proc):
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


def test_trim_offline_bitwise():
    x = noise(10_000)
    for start_s, end_s in ((0.25, 1.0), (0.0, 0.5), (0.1, 0.0), (0.0, 0.0)):
        out = editops.trim_stream(_stream(x), start_s, end_s)
        n0, n1 = editops.trim_spec(RATE, start_s, end_s)
        ref = x[:, n0:min(n1, x.shape[1])]
        got = np.asarray(out.data)
        n = int(out.length)
        assert n == ref.shape[1]
        np.testing.assert_array_equal(got[:, :n], ref)
        # Zero padding past the trimmed length.
        assert not got[:, n:].any()


def test_trim_empty_and_past_end():
    x = noise(4_000)
    out = editops.trim_stream(_stream(x), 2.0, 0.0)  # start past the clip
    assert int(out.length) == 0
    out = editops.trim_stream(_stream(x), 0.3, 0.2)  # end before start
    assert int(out.length) == 0


def test_trim_streamed_bitwise_all_chunkings():
    from test_chunkflow import run_offline, run_streamed

    x = noise(10_000, seed=3)
    trim = AudioTrim()
    trim.set_param("start_s", 0.33)
    trim.set_param("end_s", 1.07)
    g, src = _node_graph(trim)
    srcs = {(src, "output_0"): (x, RATE, "flt")}
    outs, _ = run_offline(g, srcs)
    off_arr, off_n = outs["master"]
    n0, n1 = editops.trim_spec(RATE, 0.33, 1.07)
    assert int(off_n) == n1 - n0
    off = np.asarray(off_arr)[:, :int(off_n)]
    np.testing.assert_array_equal(off, x[:, n0:n1])
    for chunk in (500, 1_000, 4_096):
        streamed, _ = run_streamed(g, srcs, chunk=chunk)
        np.testing.assert_array_equal(streamed["master"], off)


def test_reverse_offline_bitwise_and_involutive():
    x = noise(6_000, seed=5)
    s = _stream(x)
    rev = editops.reverse_stream(s)
    np.testing.assert_array_equal(np.asarray(rev.data), x[:, ::-1])
    back = editops.reverse_stream(rev)
    np.testing.assert_array_equal(np.asarray(back.data), x)


def test_reverse_respects_traced_length():
    # Valid length shorter than capacity: reverse the VALID region only.
    x = noise(4_000, seed=6)
    x[:, 3_000:] = 0.0
    s = Stream(data=jnp.asarray(x), length=jnp.int32(3_000),
               rate=RATE, channels=2)
    rev = editops.reverse_stream(s)
    got = np.asarray(rev.data)
    np.testing.assert_array_equal(got[:, :3_000], x[:, 2_999::-1])
    assert not got[:, 3_000:].any()


def test_reverse_refuses_stream():
    from nodey_tpu.core.chunkflow import compile_stream_graph
    from nodey_tpu.core.errors import UnstreamableGraphError
    from nodey_tpu.core import compiler

    g, src = _node_graph(AudioReverse())
    sources = {(src, "output_0"): compiler.SourceSpec(
        rate=RATE, channels=2, fmt="flt", capacity=1_000,
    )}
    with pytest.raises(UnstreamableGraphError):
        compile_stream_graph(g, sources)


def test_reverse_streamed_export_falls_back_offline(tmp_path):
    from nodey_tpu.core.runner import Runner
    from nodey_tpu.host import decode as host_decode
    from nodey_tpu.host import native_lib

    if native_lib.load() is None:
        pytest.skip("native host runtime unavailable")
    tone = np.sin(
        2 * np.pi * 440.0 * np.arange(24_000) / 48_000
    ).astype(np.float32) * 0.5
    wav = str(tmp_path / "in.wav")
    host_decode.write_wav_s16(wav, np.stack([tone, tone]), 48_000)

    def build():
        g, src = _node_graph(AudioReverse())
        g.nodes[src].processor.file_paths = [wav]
        return g

    streamed = str(tmp_path / "streamed.wav")
    offline = str(tmp_path / "offline.wav")
    Runner(build()).export_streamed(streamed)
    Runner(build()).export(offline)
    with open(streamed, "rb") as f1, open(offline, "rb") as f2:
        assert f1.read() == f2.read()


def test_serde_and_param_spec():
    t = AudioTrim()
    t.set_param("start_s", 1.5)
    t.set_param("end_s", 1e9)  # clamps to 86_400
    blob = t.serialize()
    back = AudioTrim()
    back.deserialize(blob)
    assert back.start_s == 1.5 and back.end_s == 86_400.0
    assert {p["key"] for p in t.param_spec()} == {"start_s", "end_s"}

    r = AudioReverse()
    assert r.serialize() == {}
    r.deserialize({"junk": 1})  # tolerated, like bimix_v2
    assert r.param_spec() == []
