"""Signal-generator node (ops/oscillator.py, processors/generator.py).

Contract under test: every waveform matches its float64 mirror at the
f32 floor; square is EXACTLY ±gain with an exact integer period;
streamed chunks are BITWISE the offline buffer (integer phase residues /
counter-hash noise — pure functions of the absolute sample index);
the node works as a graph SOURCE offline, streamed (incl. merged with a
decoded file in lockstep), and through the full StreamExecutor WAV
export; serde/clamps round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.ops import oscillator as osc
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.generator import AudioGenerator

from conftest import snr_db

registry.register_all_processors()


def _gen(**params):
    g = AudioGenerator()
    for k, v in params.items():
        g.set_param(k, v)
    return g


class _PlanCtx:
    node_id = 1
    hints = {}


def _offline(gen):
    out = jax.jit(lambda: gen.lower(_PlanCtx(), {})["output"].data)()
    return np.asarray(out)[:, :gen.total_samples]


def _streamed(gen, max_steps=64):
    specs, state = gen.plan_stream(_PlanCtx(), {})
    width = specs["output"].width
    pieces = []
    for _ in range(max_steps):
        outs, state = gen.lower_stream(None, {}, state)
        c = outs["output"]
        n = int(c.n)
        if n:
            pieces.append(np.asarray(c.data)[:, :n])
        if bool(c.done):
            break
    else:
        raise AssertionError("generator never signalled done")
    return np.concatenate(pieces, axis=1), width


def test_waveforms_match_float64():
    for kind in osc.WAVEFORMS:
        gen = _gen(waveform=kind, freq=440.7, duration_s=0.8, seed=3)
        ref = osc.generator_reference(
            kind, gen.freq, gen._gain(), gen.seed, gen.rate,
            gen.channels, gen.total_samples,
        )
        out = _offline(gen)
        assert snr_db(ref, out) > 125.0, kind


def test_square_exact_values_and_period():
    gen = _gen(waveform="square", freq=1_000.0, level_db=-6.0,
               duration_s=0.25)
    out = _offline(gen)
    g = np.float32(gen._gain())
    assert set(np.unique(out)) == {g, -g}
    # 1000 Hz at 48 kHz: exact 48-sample integer period.
    n = out.shape[1]
    np.testing.assert_array_equal(out[:, : n - 48], out[:, 48:])
    # Exact half duty cycle per period.
    assert out[0, :48].sum() == 0.0


def test_streamed_bitwise_offline_all_waveforms():
    for kind in osc.WAVEFORMS:
        gen = _gen(waveform=kind, freq=333.3, duration_s=1.3,
                   seed=11, channels=2)
        off = _offline(gen)
        st, width = _streamed(gen)
        assert st.shape == off.shape, kind
        np.testing.assert_array_equal(st, off, err_msg=kind)
        # Duration was chosen to make the final chunk partial.
        assert gen.total_samples % width != 0


def test_noise_channels_and_seeds_decorrelate():
    gen = _gen(waveform="noise", duration_s=0.5, seed=1, channels=2)
    out = _offline(gen)
    # Channels decorrelate (normalized cross-correlation ~ 0).
    c = np.corrcoef(out[0], out[1])[0, 1]
    assert abs(c) < 0.02
    out2 = _offline(_gen(waveform="noise", duration_s=0.5, seed=2,
                         channels=2))
    assert not np.array_equal(out[0], out2[0])
    # Uniform in [-gain, gain): bounded, near-zero mean, flat variance.
    g = gen._gain()
    assert np.abs(out).max() <= g
    assert abs(out.mean()) < 0.01 * g
    np.testing.assert_allclose(out.var(), g * g / 3.0, rtol=0.02)


def test_generator_only_graph_offline():
    g = Graph()
    nid = g.add_node(_gen(waveform="sine", freq=220.0, duration_s=0.4))
    out = g.add_node(AudioOutput())
    g.add_link(g.nodes[nid].pin_name_map["output"],
               g.nodes[out].pin_name_map["input"])
    compiled = compiler.compile_graph(g, {}, mode="export")
    res = compiled.run({}, {})
    data, n = res["master"]
    gen = g.nodes[nid].processor
    assert int(n) == gen.total_samples
    np.testing.assert_array_equal(
        np.asarray(data)[:, :int(n)], _offline(gen)
    )


def test_generator_merges_with_file_source_streamed():
    """Generator + decoded source mix in lockstep when the executor's
    rate-gcd hint widths are applied (here passed explicitly)."""
    from test_chunkflow import run_offline, run_streamed
    from nodey_tpu.processors.amix import AudioAmix

    rate = 48_000
    rng = np.random.default_rng(5)
    file_data = (0.3 * rng.standard_normal((2, 48_000))).astype(np.float32)

    def build():
        g = Graph()
        src = g.add_node(AudioInput())
        g.nodes[src].processor.file_paths = ["a.wav"]
        g.update_node_pin(src)
        gen = g.add_node(_gen(waveform="triangle", freq=97.0,
                              duration_s=0.7, level_db=-18.0))
        mix = g.add_node(AudioAmix())
        out = g.add_node(AudioOutput())
        pin = lambda a, p: g.nodes[a].pin_name_map[p]  # noqa: E731
        g.add_link(pin(src, "output_0"), pin(mix, "input_1"))
        g.add_link(pin(gen, "output"), pin(mix, "input_2"))
        g.add_link(pin(mix, "output"), pin(out, "input"))
        return g, src, gen

    g, src, gen_id = build()
    srcs = {(src, "output_0"): (file_data, rate, "flt")}
    outs, _ = run_offline(g, srcs)
    off_arr, off_n = outs["master"]
    assert int(off_n) == 48_000  # mixer drains to the longest input
    off = np.asarray(off_arr)[:, :int(off_n)]

    chunk = 4_800
    streamed, _ = run_streamed(
        g, srcs, chunk=chunk,
        plan_hints={gen_id: {"chunk_width": chunk}},
    )
    got = streamed["master"]
    assert got.shape == off.shape
    # The mix is a two-term weighted sum — across-program fma
    # contraction bar (same as crossfade/chorus).
    np.testing.assert_allclose(got, off, rtol=0.0, atol=3e-7)


def test_generator_streamed_wav_export(tmp_path):
    """Full pipeline: generator-only graph through StreamExecutor (the
    _open_feeds generator branch + hint widths) into the WAV sink,
    vs the offline export of the same graph."""
    from nodey_tpu.core.runner import Runner
    from nodey_tpu.host import decode as host_decode

    def build():
        g = Graph()
        nid = g.add_node(_gen(waveform="saw", freq=110.0, duration_s=0.9,
                              level_db=-12.0))
        out = g.add_node(AudioOutput())
        g.add_link(g.nodes[nid].pin_name_map["output"],
                   g.nodes[out].pin_name_map["input"])
        return g

    st = str(tmp_path / "streamed.wav")
    off = str(tmp_path / "offline.wav")
    Runner(build()).export_streamed(st, chunk_seconds=0.25)
    Runner(build()).export(off)
    a = host_decode.decode_file(st)
    b = host_decode.decode_file(off)
    assert a.num_samples == b.num_samples == round(0.9 * 48_000)
    np.testing.assert_array_equal(a.data, b.data)


def test_serde_clamps_and_param_spec():
    gen = _gen(waveform="noise", freq=99.5, level_db=-3.0,
               duration_s=2.5, rate=44_100, channels=1, seed=42)
    blob = gen.serialize()
    back = AudioGenerator()
    back.deserialize(blob)
    assert back.serialize() == blob

    # Clamps + invalid enum values are ignored/clamped, never raise.
    back.set_param("freq", 10**9)
    assert back.freq == 20_000.0
    back.set_param("level_db", 5.0)
    assert back.level_db == 0.0
    back.set_param("waveform", "sawtooth-from-mars")
    assert back.waveform == "noise"
    back.set_param("rate", 12_345)
    assert back.rate == 44_100
    back.set_param("channels", 7)
    assert back.channels == 1
    back.deserialize({"seed": True})  # bool is not a number here
    assert back.seed == 42

    keys = {p["key"] for p in gen.param_spec()}
    assert keys == {"waveform", "freq", "level_db", "duration_s",
                    "rate", "channels", "seed"}


def test_sharded_overlap_discard_refuses_generator():
    """The overlap-discard sp path has no external buffer to window for
    a device-synthesized source; it must refuse, not mis-render."""
    import pytest

    from nodey_tpu.core.errors import ProcessorRuntimeError
    from nodey_tpu.parallel.mesh import make_mesh
    from nodey_tpu.parallel.sharded import plan_sharded

    g = Graph()
    nid = g.add_node(_gen(duration_s=0.5))
    out = g.add_node(AudioOutput())
    g.add_link(g.nodes[nid].pin_name_map["output"],
               g.nodes[out].pin_name_map["input"])
    mesh = make_mesh({"sp": 4})
    with pytest.raises(ProcessorRuntimeError):
        plan_sharded(g, {}, mesh)
