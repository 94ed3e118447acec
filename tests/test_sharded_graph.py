"""Sharded execution of REAL compiled graphs (parallel/sharded.py).

The framework's multi-chip mode must execute the user's actual validated
DAG — not a lookalike step — and produce the single-device compiler's exact
output when the sample axis shards over sp and the clip batch over dp
(single-host multi-device simulation per SURVEY.md §4.4).
"""

import numpy as np
import pytest

import jax

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.parallel.mesh import make_mesh
from nodey_tpu.parallel import sharded
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.spectrum import AudioSpectrum
from nodey_tpu.processors.velocity import VelocityModifier

from conftest import make_tone


def _flagship(n_inputs=2, with_spectrum=True):
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [f"{i}.wav" for i in range(n_inputs)]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.5)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(n_inputs)
    g.nodes[amix].processor.volumes = [0.6, 0.4][:n_inputs]
    out = g.add_node(AudioOutput())

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(amix, "input_1"))
    for i in range(1, n_inputs):
        g.add_link(pin(src, f"output_{i}"), pin(amix, f"input_{i + 1}"))
    last_pin = pin(amix, "output")
    if with_spectrum:
        spec = g.add_node(AudioSpectrum())
        g.add_link(last_pin, pin(spec, "input"))
        last_pin = pin(spec, "output")
    g.add_link(last_pin, pin(out, "input"))
    return g, src


def _sources_and_args(g, src, mesh, rate=44_100, seconds=1.7, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    n = int(rate * seconds)
    cap = sharded.plan_capacity_for(g, rate, n, mesh)
    arrays, lengths, sources = {}, {}, {}
    for i in range(2):
        tone = make_tone(rate=rate, seconds=seconds, freq=220.0 * (i + 1),
                         channels=2)
        tone = tone + 0.01 * rng.standard_normal(tone.shape).astype(np.float32)
        padded = np.zeros((2, cap), dtype=np.float32)
        # Give the inputs different valid lengths to exercise the masking
        # algebra across shard boundaries.
        valid = n - 4321 * i
        padded[:, :valid] = tone[:, :valid]
        key = compiler.external_key(src, f"output_{i}")
        arrays[key] = padded
        lengths[key] = valid
        sources[(src, f"output_{i}")] = compiler.SourceSpec(
            rate=rate, channels=2, fmt="s16", capacity=cap
        )
    return arrays, lengths, sources


def test_sharded_graph_matches_single_device():
    """sp=8: the sharded compiled graph equals the single-device program."""
    mesh = make_mesh({"sp": 8})
    g, src = _flagship()
    arrays, lengths, sources = _sources_and_args(g, src, mesh)

    single = compiler.compile_graph(g, sources, mode="export")
    ref = single.run(arrays, lengths)
    ref_master, ref_len = ref["master"]

    sc = sharded.compile_graph_sharded(g, sources, mesh, mode="export")
    out = sc.run(arrays, lengths)
    master, glen = out["master"]

    assert int(glen) == int(ref_len)
    np.testing.assert_array_equal(master, ref_master)

    # Spectrum tap: sharded frames match the single-device frames over the
    # offline frame count (sharded computes a few extra zero-window tail
    # frames the offline framing never starts).
    spec_key = [k for k in out if k.startswith("spectrum_")]
    assert spec_key and not sc.dropped_outputs
    k = spec_key[0]
    f_ref = ref[k].shape[1]
    np.testing.assert_allclose(
        out[k][:, :f_ref, :], ref[k], rtol=0, atol=1e-4
    )


def test_sharded_graph_dp_sp_batched():
    """dp=2 x sp=4: batched clips shard over dp, time over sp; every batch
    element equals its single-device render."""
    mesh = make_mesh({"dp": 2, "sp": 4})
    g, src = _flagship(with_spectrum=False)
    arrays, lengths, sources = _sources_and_args(g, src, mesh)

    B = 4
    rng = np.random.default_rng(7)
    batched_arrays = {}
    batched_lengths = {}
    for key, arr in arrays.items():
        stack = np.stack([arr] + [
            arr * rng.uniform(0.5, 1.0) for _ in range(B - 1)
        ])
        batched_arrays[key] = stack.astype(np.float32)
        batched_lengths[key] = np.array(
            [lengths[key]] * B, dtype=np.int32
        )

    sc = sharded.compile_graph_sharded(
        g, sources, mesh, mode="export", dp_axis="dp"
    )
    out = sc.run(batched_arrays, batched_lengths)
    master, glen = out["master"]
    assert master.shape[0] == B

    single = compiler.compile_graph(g, sources, mode="export")
    for b in range(B):
        ref = single.run(
            {k: batched_arrays[k][b] for k in batched_arrays},
            {k: int(batched_lengths[k][b]) for k in batched_lengths},
        )
        ref_master, ref_len = ref["master"]
        assert int(glen[b]) == int(ref_len)
        np.testing.assert_array_equal(master[b], ref_master)


def test_sharded_rejects_time_variant_nodes():
    mesh = make_mesh({"sp": 8})
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vel, "input"))
    g.add_link(pin(vel, "output"), pin(out, "input"))
    sources = {
        (src, "output_0"): compiler.SourceSpec(
            rate=48_000, channels=2, fmt="flt", capacity=48_000 * 8
        )
    }
    with pytest.raises(ProcessorRuntimeError, match="not time-shardable"):
        sharded.compile_graph_sharded(g, sources, mesh)


def test_plan_capacity_alignment():
    mesh = make_mesh({"sp": 8})
    g, _src = _flagship()
    cap = sharded.plan_capacity_for(g, 44_100, 44_100, mesh)
    assert cap >= 44_100
    # divisible by quantum * sp
    from nodey_tpu.core.streaming import _chunk_quantum

    q = _chunk_quantum(g, 44_100)
    assert cap % (q * 8) == 0


def test_dp_timevariant_graph_bitwise():
    """A config-4-shaped graph (resample -> pitch -> velocity) — which the
    sp planner rejects (time-variant) — runs on the mesh via pure dp
    (sharded.compile_graph_dp): each device renders whole clips, bitwise
    equal to the single-device program (round-1 VERDICT item 4a)."""
    from nodey_tpu.processors.resample_node import AudioResample
    from nodey_tpu.processors.velocity import PitchModifier

    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["0.wav"]
    g.update_node_pin(src)
    rs = g.add_node(AudioResample())
    g.nodes[rs].processor.target_rate = 48_000
    pitch = g.add_node(PitchModifier())
    g.nodes[pitch].processor.pitch = 3.0
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(1.25)
    g.nodes[vel].processor.keep_pitch = True
    out = g.add_node(AudioOutput())

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    g.add_link(pin(src, "output_0"), pin(rs, "input"))
    g.add_link(pin(rs, "output"), pin(pitch, "input"))
    g.add_link(pin(pitch, "output"), pin(vel, "input"))
    g.add_link(pin(vel, "output"), pin(out, "input"))

    rate, cap = 44_100, 44_100  # 1 s clips
    B = 8
    mesh = make_mesh({"dp": 8})
    rng = np.random.default_rng(7)
    batch = (0.3 * rng.standard_normal((B, 2, cap))).astype(np.float32)
    lens = np.array([cap - 17 * i for i in range(B)], dtype=np.int32)
    for i, n in enumerate(lens):
        batch[i, :, n:] = 0.0

    key = compiler.external_key(src, "output_0")
    sources = {
        (src, "output_0"): compiler.SourceSpec(
            rate=rate, channels=2, fmt="flt", capacity=cap
        )
    }
    dp = sharded.compile_graph_dp(g, sources, mesh, mode="export")
    out_b = dp.run({key: batch}, {key: lens})
    data_b, len_b = out_b["master"]

    single = compiler.compile_graph(g, sources, mode="export")
    for i in range(B):
        ref = single.run({key: batch[i]}, {key: int(lens[i])})
        ref_data, ref_len = ref["master"]
        assert int(len_b[i]) == int(ref_len)
        np.testing.assert_array_equal(
            data_b[i], np.asarray(ref_data), err_msg=f"clip {i}"
        )


def test_dp_phase_vocoder_graph():
    """A velocity(pv) node — phase-vocoder tempo stage — runs on the dp
    mesh like any other time-variant graph: whole clips per device,
    matching the single-device program."""
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["0.wav"]
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(1.25)
    g.nodes[vel].processor.keep_pitch = True
    g.nodes[vel].processor.algorithm = "pv"
    out = g.add_node(AudioOutput())
    g.add_link(g.nodes[src].pin_name_map["output_0"],
               g.nodes[vel].pin_name_map["input"])
    g.add_link(g.nodes[vel].pin_name_map["output"],
               g.nodes[out].pin_name_map["input"])

    rate, cap, B = 48_000, 48_000, 8
    mesh = make_mesh({"dp": 8})
    rng = np.random.default_rng(11)
    batch = (0.3 * rng.standard_normal((B, 2, cap))).astype(np.float32)
    lens = np.array([cap - 31 * i for i in range(B)], dtype=np.int32)
    for i, n in enumerate(lens):
        batch[i, :, n:] = 0.0

    key = compiler.external_key(src, "output_0")
    sources = {
        (src, "output_0"): compiler.SourceSpec(
            rate=rate, channels=2, fmt="flt", capacity=cap
        )
    }
    dp = sharded.compile_graph_dp(g, sources, mesh, mode="export")
    out_b = dp.run({key: batch}, {key: lens})
    data_b, len_b = out_b["master"]

    single = compiler.compile_graph(g, sources, mode="export")
    for i in range(B):
        ref = single.run({key: batch[i]}, {key: int(lens[i])})
        ref_data, ref_len = ref["master"]
        assert int(len_b[i]) == int(ref_len)
        ref_np = np.asarray(ref_data)
        got = np.asarray(data_b[i])
        err = np.sum((got - ref_np) ** 2)
        sig = np.sum(ref_np**2)
        assert err == 0.0 or 10 * np.log10(sig / err) > 90.0, f"clip {i}"


def test_sharded_mixed_input_rates_bitwise():
    """Mixed source rates (44.1 kHz + 48 kHz into one mixer) shard over sp
    with per-source time-aligned chunks/halos (round-1 VERDICT item 4b):
    every source's shard boundary sits at the same instant, so trimmed
    outputs still concatenate to EXACTLY the single-device program."""
    mesh = make_mesh({"sp": 8})
    g, src = _flagship(with_spectrum=False)
    rates = [44_100, 48_000]
    seconds = 1.3
    caps = sharded.plan_capacities_for(
        g, {i: (r, int(r * seconds)) for i, r in enumerate(rates)}, mesh
    )
    rng = np.random.default_rng(3)
    arrays, lengths, sources = {}, {}, {}
    for i, r in enumerate(rates):
        n = int(r * seconds) - 997 * i
        tone = make_tone(rate=r, seconds=seconds, freq=180.0 * (i + 1),
                         channels=2)
        tone = tone + 0.01 * rng.standard_normal(tone.shape).astype(np.float32)
        padded = np.zeros((2, caps[i]), dtype=np.float32)
        padded[:, :n] = tone[:, :n]
        key = compiler.external_key(src, f"output_{i}")
        arrays[key] = padded
        lengths[key] = n
        sources[(src, f"output_{i}")] = compiler.SourceSpec(
            rate=r, channels=2, fmt="s16", capacity=caps[i]
        )

    single = compiler.compile_graph(g, sources, mode="export")
    ref = single.run(arrays, lengths)
    ref_master, ref_len = ref["master"]

    sc = sharded.compile_graph_sharded(g, sources, mesh, mode="export")
    out = sc.run(arrays, lengths)
    master, glen = out["master"]
    assert int(glen) == int(ref_len)
    np.testing.assert_array_equal(master, ref_master)


def test_sharded_nonzero_t0_bitwise():
    """bimix_v2's t0-placed alignment (pts start offsets) shards over sp:
    the placement is a static per-stream time shift — LTI — so with the
    halo widened past the t0 spread, trimmed shard outputs equal the
    single-device program exactly (round-1 VERDICT item 4c)."""
    from nodey_tpu.processors.bimix import AudioBimixV2

    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["0.wav", "1.wav"]
    g.update_node_pin(src)
    merge = g.add_node(AudioBimixV2())
    out = g.add_node(AudioOutput())

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    g.add_link(pin(src, "output_0"), pin(merge, "input_l"))
    g.add_link(pin(src, "output_1"), pin(merge, "input_r"))
    g.add_link(pin(merge, "output"), pin(out, "input"))

    mesh = make_mesh({"sp": 8})
    rate, seconds = 48_000, 2.1
    t0s = [0.0, 150_000.0]  # 150 ms pts offset on the right side
    # Offsets GROW the output past the input duration: capacity (shared
    # time span) must cover input + t0 spread, exactly as single-device
    # callers size output buffers.
    spread = int(rate * (max(t0s) - min(t0s)) * 1e-6)
    cap = sharded.plan_capacity_for(
        g, rate, int(rate * seconds) + spread, mesh
    )
    rng = np.random.default_rng(11)
    arrays, lengths, sources = {}, {}, {}
    for i in range(2):
        n = int(rate * seconds) - 1113 * i
        tone = make_tone(rate=rate, seconds=seconds, freq=200.0 + 70 * i,
                         channels=2)
        tone = tone + 0.01 * rng.standard_normal(tone.shape).astype(np.float32)
        padded = np.zeros((2, cap), dtype=np.float32)
        padded[:, :n] = tone[:, :n]
        key = compiler.external_key(src, f"output_{i}")
        arrays[key] = padded
        lengths[key] = n
        sources[(src, f"output_{i}")] = compiler.SourceSpec(
            rate=rate, channels=2, fmt="flt", capacity=cap, t0_us=t0s[i]
        )

    single = compiler.compile_graph(g, sources, mode="export")
    ref = single.run(arrays, lengths)
    ref_master, ref_len = ref["master"]

    sc = sharded.compile_graph_sharded(g, sources, mesh, mode="export")
    out_s = sc.run(arrays, lengths)
    master, glen = out_s["master"]
    assert int(glen) == int(ref_len)
    m = min(master.shape[-1], np.asarray(ref_master).shape[-1])
    np.testing.assert_array_equal(
        master[..., :int(glen)], np.asarray(ref_master)[..., :int(glen)]
    )


def _two_source_mix_graph():
    from nodey_tpu.processors.amix import AudioAmix

    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["0.wav", "1.wav"]
    g.update_node_pin(src)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.update_node_pin(amix)
    out = g.add_node(AudioOutput())

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    g.add_link(pin(src, "output_0"), pin(amix, "input_1"))
    g.add_link(pin(src, "output_1"), pin(amix, "input_2"))
    g.add_link(pin(amix, "output"), pin(out, "input"))
    return g, src


def _run_mixed(rates, seconds=1.0):
    g, src = _two_source_mix_graph()
    mesh = make_mesh({"sp": 8})
    caps = sharded.plan_capacities_for(
        g, {i: (r, int(r * seconds)) for i, r in enumerate(rates)}, mesh
    )
    rng = np.random.default_rng(0)
    arrays, lengths, sources = {}, {}, {}
    for i, r in enumerate(rates):
        key = compiler.external_key(src, f"output_{i}")
        x = np.zeros((2, caps[i]), np.float32)
        n = int(r * seconds) - 31 * i
        x[:, :n] = 0.2 * rng.standard_normal((2, n)).astype(np.float32)
        arrays[key], lengths[key] = x, n
        sources[(src, f"output_{i}")] = compiler.SourceSpec(
            rate=r, channels=2, fmt="flt", capacity=caps[i]
        )
    ref = compiler.compile_graph(g, sources, mode="export").run(
        arrays, lengths
    )
    out = sharded.compile_graph_sharded(g, sources, mesh, mode="export").run(
        arrays, lengths
    )
    return ref["master"], out["master"]


def test_sharded_multihop_halo_exact():
    """Small-quantum graphs make the receptive-field halo WIDER than one
    shard's chunk; the multi-hop ppermute exchange must assemble it from
    several neighbors (a one-hop exchange silently clamps the slice and
    corrupts every window — regression for a bug that predates round 2)."""
    (rm, rl), (m, l) = _run_mixed((8_000, 48_000))
    assert int(l) == int(rl)
    np.testing.assert_array_equal(m[..., : int(l)], np.asarray(rm)[..., : int(l)])


def test_sharded_mixed_rate_ulp():
    """A rate pair whose resampler geometry (L=320, M=147, R=2) tiles its
    GEMM reduction differently at window vs whole-clip shapes: sharded
    output agrees to the last ulp (the documented cross-program-shape
    caveat, ops/resample.apply_filter_bank)."""
    (rm, rl), (m, l) = _run_mixed((22_050, 48_000))
    assert int(l) == int(rl)
    np.testing.assert_allclose(
        m[..., : int(l)], np.asarray(rm)[..., : int(l)], rtol=0, atol=3e-7
    )
