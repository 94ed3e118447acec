"""Convolution reverb (ops/reverb.py + processors/reverb.py).

Contract under test: the uniform-partition overlap-save real-DFT GEMM
convolution equals float64 direct convolution; the IR synthesis is
deterministic and respects its parameters (energy, pre-delay, decay);
wet=0/dry=1 is a BITWISE passthrough; output length grows by exactly
L-1; streaming continues the tail across chunk boundaries and flushes
it after EOF through the production chunk-flow compiler; the chunked
offline renderer (render_chunked) and the sp mesh path produce the
grown output; no complex dtypes reach the device program.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import reverb as rv
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.reverb import AudioReverb

from conftest import snr_db

RATE = 8_000   # short IRs keep the float64 direct-conv oracle fast


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _partitions(ir):
    c, ln = ir.shape
    k = -(-ln // rv.PARTITION)
    padded = np.zeros((c, k, rv._F))
    flat = np.zeros((c, k * rv.PARTITION))
    flat[:, :ln] = ir
    padded[:, :, :rv.PARTITION] = flat.reshape(c, k, rv.PARTITION)
    spec = np.fft.rfft(padded, axis=-1)
    return spec.real.astype(np.float32), spec.imag.astype(np.float32)


def direct_conv(x, ir):
    return np.stack([
        np.convolve(x[c].astype(np.float64), ir[c].astype(np.float64))
        for c in range(x.shape[0])
    ])


def test_ir_design_properties():
    ir = rv.design_ir(RATE, 2, 0.3, 25.0, 0.5)
    ir2 = rv.design_ir(RATE, 2, 0.3, 25.0, 0.5)
    np.testing.assert_array_equal(ir, ir2)           # deterministic
    pre = int(round(25.0e-3 * RATE))
    assert np.all(ir[:, :pre] == 0.0)                # pre-delay silence
    body = ir[:, pre:]
    np.testing.assert_allclose(
        (body ** 2).sum(axis=1), 1.0, rtol=1e-6     # unit energy
    )
    # Decay: last 10% of the tail is far below the early peak.
    n = body.shape[1]
    early = np.abs(body[:, : n // 10]).max()
    late = np.abs(body[:, -n // 10:]).max()
    assert late < early * 10 ** (-40 / 20)
    # L/R decorrelated (distinct rooms per channel).
    corr = np.corrcoef(body[0], body[1])[0, 1]
    assert abs(corr) < 0.2
    assert rv.ir_length(RATE, 0.3, 25.0) == ir.shape[1]


@pytest.mark.parametrize("n", [1500, 6000])
def test_partitioned_conv_matches_float64(n):
    """Multi-partition (K > 1) overlap-save vs float64 direct conv."""
    x = noise(n)
    ir = rv.design_ir(RATE, 2, 0.4, 0.0, 0.3)
    assert ir.shape[1] > rv.PARTITION            # K >= 2
    hr, hi = _partitions(ir)
    out_len = n + ir.shape[1] - 1
    y = np.asarray(rv.partitioned_conv(jnp.asarray(x), hr, hi, out_len))
    ref = direct_conv(x, ir)[:, :out_len]
    assert snr_db(ref.astype(np.float32), y) > 110.0


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


def _reverb(**params):
    p = AudioReverb()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def test_dry_bitwise_passthrough():
    from test_chunkflow import run_offline

    x = noise(4000)
    g, src = _node_graph(_reverb(wet=0.0, dry=1.0))
    outs, _ = run_offline(g, {(src, "output_0"): (x, RATE, "f32")})
    off, off_n = outs["master"]
    np.testing.assert_array_equal(np.asarray(off)[:, :int(off_n)], x)


def test_offline_node_tail_and_mix():
    """Output length grows by exactly L-1; the wet/dry mix matches the
    float64 oracle; padding past the grown length is exact zeros."""
    from test_chunkflow import run_offline

    x = noise(4000)
    proc = _reverb(decay_s=0.3, pre_delay_ms=10.0, wet=0.4, dry=0.8)
    ir = rv.design_ir(RATE, 2, proc.decay_s, proc.pre_delay_ms,
                      proc.damping)
    L = ir.shape[1]
    g, src = _node_graph(proc)
    outs, _ = run_offline(g, {(src, "output_0"): (x, RATE, "f32")})
    off, off_n = outs["master"]
    off = np.asarray(off)
    assert int(off_n) == x.shape[1] + L - 1
    ref = 0.8 * np.pad(x, ((0, 0), (0, L - 1))) + 0.4 * direct_conv(x, ir)
    assert snr_db(ref.astype(np.float32)[:, :int(off_n)],
                  off[:, :int(off_n)]) > 100.0
    assert np.all(off[:, int(off_n):] == 0.0)


def test_streamed_equals_offline():
    """Chunk-flow streaming: tail carried across chunks, flushed after
    EOF, total length exact. The streamed hop grid re-anchors per chunk,
    so agreement is re-association-level, not bitwise."""
    from test_chunkflow import run_offline, run_streamed

    x = noise(6000, seed=5)
    g, src = _node_graph(_reverb(decay_s=0.25, pre_delay_ms=0.0,
                                 wet=0.5, dry=0.6))
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    streamed, _ = run_streamed(g, src_arrays, chunk=2048)
    got = streamed["master"]
    assert got.shape[1] == off.shape[1]
    assert snr_db(off, got) > 90.0


def test_render_chunked_grows_tail():
    """The chunked offline renderer covers the receptive field in its
    halo and renders the grown tail (streaming.render_chunked)."""
    import tempfile

    from nodey_tpu.core import streaming
    from nodey_tpu.host import decode as host_decode
    from nodey_tpu.core.runner import Runner

    x = noise(12000, seed=8)
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/in.wav"
        host_decode.write_wav_s16(path, x, RATE)
        proc = _reverb(decay_s=0.2, pre_delay_ms=0.0, wet=0.5, dry=0.5)
        g, src = _node_graph(proc)
        g.nodes[src].processor.file_paths = [path]
        res = Runner(g).render()
        master, out_rate, _f, _spectra = streaming.render_chunked(
            g, chunk_seconds=0.5
        )
    assert out_rate == res.rate
    assert master.shape[1] == res.master.shape[1]
    assert snr_db(np.asarray(res.master), master) > 110.0


def test_sharded_matches_single_device():
    """sp mesh: halo covers the declared receptive field; kept samples
    are BITWISE equal to the offline program (aligned hop grids)."""
    import jax

    from nodey_tpu.core import compiler
    from nodey_tpu.parallel import sharded
    from nodey_tpu.parallel.mesh import make_mesh

    x = noise(40960, seed=11)
    proc = _reverb(decay_s=0.15, pre_delay_ms=0.0, wet=0.4, dry=0.7)
    g, src = _node_graph(proc)
    mesh = make_mesh({"sp": 8})
    cap = sharded.plan_capacity_for(
        g, RATE, x.shape[1] + rv.ir_length(RATE, 0.15, 0.0), mesh
    )
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
    assert int(glen) == int(rlen)
    n = int(rlen)
    np.testing.assert_array_equal(
        np.asarray(data)[:, :n], np.asarray(rdata)[:, :n]
    )


def test_serde_clamps_and_no_complex():
    import json

    import jax

    p = _reverb(decay_s=2.5, pre_delay_ms=50.0, damping=0.3, wet=0.6,
                dry=0.2)
    q = AudioReverb()
    q.deserialize(json.loads(json.dumps(p.serialize())))
    assert (q.decay_s, q.pre_delay_ms, q.damping, q.wet, q.dry) == (
        2.5, 50.0, 0.3, 0.6, 0.2
    )
    q.deserialize({"decay_s": 99.0, "wet": -3.0})
    assert q.decay_s == 8.0 and q.wet == 0.0
    keys = {s["key"] for s in q.param_spec()}
    assert keys == {"decay_s", "pre_delay_ms", "damping", "wet", "dry"}

    # Complex-dtype guard (the axon backend has no c64 — the whole conv
    # must lower as split re/im GEMMs).
    ir = rv.design_ir(RATE, 2, 0.2, 0.0, 0.5)
    hr, hi = _partitions(ir)
    x = jnp.zeros((2, 4096), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda v: rv.partitioned_conv(v, hr, hi, 4096 + ir.shape[1])
    )(x).jaxpr
    for eqn in jaxpr.eqns:
        for v in list(eqn.invars) + list(eqn.outvars):
            aval = getattr(v, "aval", None)
            assert aval is None or not jnp.issubdtype(
                aval.dtype, jnp.complexfloating
            ), eqn
