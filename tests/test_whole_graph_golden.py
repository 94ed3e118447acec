"""Whole-graph masters vs independent NumPy + libswresample compositions.

Per-kernel goldens (test_resample/test_mix/test_stretch) verify each op;
these tests verify the COMPOSED graph program: the fused device master for
the BASELINE config-3 and config-5 graph shapes must sit within 90 dB of a
reference rendering built from host NumPy mirrors and, for the resampling
stages, the real libswresample oracle (host/native/swr_shim.cpp) — the same
library the reference uses at every mixer input (audio-amix.cpp:206-243).
"""

import numpy as np
import pytest

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.host import native_lib
from nodey_tpu.host.resample_ref import swr_convert
from nodey_tpu.ops.gain import apply_gain_reference
from nodey_tpu.ops.resample import SQRT1_2
from nodey_tpu.ops.stretch import (
    _rational_factor,
    wsola_stretch_reference,
)
from nodey_tpu.ops.resample import resample_data_reference
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.bimix import AudioBimix
from nodey_tpu.processors.split import AudioSplit
from nodey_tpu.processors.velocity import PitchModifier

from conftest import make_tone, snr_db

pytestmark = pytest.mark.skipif(
    native_lib.load() is None, reason="native swr oracle unavailable"
)


def _pin(g, n, p):
    return g.nodes[n].pin_name_map[p]


def _compile_and_run(g, src_data, mode="export"):
    arrays, lengths, sources = {}, {}, {}
    for (nid, pin), (data, rate) in src_data.items():
        key = compiler.external_key(nid, pin)
        arrays[key] = data
        lengths[key] = data.shape[1]
        sources[(nid, pin)] = compiler.SourceSpec(
            rate=rate, channels=data.shape[0], fmt="flt",
            capacity=data.shape[1],
        )
    compiled = compiler.compile_graph(g, sources, mode=mode)
    out = compiled.run(arrays, lengths)
    master, length = out["master" if mode == "export" else "preview"]
    return np.asarray(master)[:, : int(length)]


def _tone(seed, seconds, rate, channels=2, noise=0.0):
    """Band-limited multitone fixture. Resampler comparisons need in-band
    content: broadband noise carries energy into the transition band where
    two distinct anti-alias filter designs legitimately diverge (the same
    reason the per-kernel swr goldens use tones, tests/test_resample.py)."""
    n = int(rate * seconds)
    t = np.arange(n) / rate
    base = np.zeros((channels, n))
    for k, f0 in enumerate((200.0 + 60 * seed, 997.0 + 80 * seed,
                            4321.0 + 10 * seed)):
        for c in range(channels):
            base[c] += (0.2 / (k + 1)) * np.sin(
                2 * np.pi * f0 * (1.0 + 0.1 * c) * t + seed + c
            )
    out = base.astype(np.float32)
    if noise:
        rng = np.random.default_rng(seed)
        out = (out + noise * rng.standard_normal(out.shape)).astype(
            np.float32
        )
    return out


def test_config3_two_track_mix_vs_oracle_composition():
    """Config 3: 2x 44.1 kHz stereo -> gain -> amix -> master, vs NumPy
    gains + REAL swr 44.1->48 resample + weighted sum."""
    registry.register_all_processors()
    rate = 44_100
    a = _tone(1, 1.0, rate)
    b = _tone(2, 1.0, rate)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav", "b.wav"]
    g.update_node_pin(src)
    v0 = g.add_node(AudioVol())
    g.nodes[v0].processor.set_volume(1.5)
    v1 = g.add_node(AudioVol())
    g.nodes[v1].processor.set_volume(0.9)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.6, 0.4]
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, v0, "input"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, v1, "input"))
    g.add_link(_pin(g, v0, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, v1, "output"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    master = _compile_and_run(
        g, {(src, "output_0"): (a, rate), (src, "output_1"): (b, rate)}
    )

    # Independent composition: gains in NumPy, resampling through REAL
    # libswresample, weighted sum in float64.
    ga = apply_gain_reference(a, 1.5, "flt")
    gb = apply_gain_reference(b, 0.9, "flt")
    ra = swr_convert(ga, rate, 48_000)
    rb = swr_convert(gb, rate, 48_000)
    n = min(ra.shape[1], rb.shape[1], master.shape[1])
    want = 0.6 * ra[:, :n].astype(np.float64) + 0.4 * rb[:, :n]

    assert master.shape[1] == -(-a.shape[1] * 160 // 147)
    # Interior comparison, like the per-kernel goldens
    # (tests/test_resample.py): the ~200-sample startup/drain transients
    # reflect legitimate filter-design differences between the two
    # anti-alias kernels, not an error in either.
    sl = slice(200, n - 200)
    assert snr_db(want[:, sl], master[:, sl]) > 90.0


def test_config5_editor_graph_vs_composition():
    """Config-5 shape (without the 2 passthrough tracks): split ->
    per-channel gain -> merge, plus a pitch branch, mixed and previewed —
    vs a NumPy + swr-oracle + WSOLA-mirror composition."""
    registry.register_all_processors()
    rate = 48_000  # equal in/out rate isolates the graph algebra
    t0 = _tone(3, 1.0, rate, noise=0.02)
    t1 = _tone(4, 1.0, rate, noise=0.02)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav", "b.wav"]
    g.update_node_pin(src)
    split = g.add_node(AudioSplit())
    vl = g.add_node(AudioVol())
    g.nodes[vl].processor.set_volume(0.7)
    vr = g.add_node(AudioVol())
    g.nodes[vr].processor.set_volume(1.3)
    merge = g.add_node(AudioBimix())
    pitch = g.add_node(PitchModifier())
    g.nodes[pitch].processor.pitch = -3.0
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.5, 0.5]
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, split, "input"))
    g.add_link(_pin(g, split, "output_l"), _pin(g, vl, "input"))
    g.add_link(_pin(g, split, "output_r"), _pin(g, vr, "input"))
    g.add_link(_pin(g, vl, "output"), _pin(g, merge, "input_l"))
    g.add_link(_pin(g, vr, "output"), _pin(g, merge, "input_r"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, pitch, "input"))
    g.add_link(_pin(g, merge, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, pitch, "output"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    master = _compile_and_run(
        g, {(src, "output_0"): (t0, rate), (src, "output_1"): (t1, rate)}
    )

    # Composition: split/gain/bimix in NumPy (mono downmix at 0.5, sides
    # weighted (1 -/+ bias=0)), pitch branch via the WSOLA NumPy mirror +
    # our rational-resampler mirror, amix weighted sum in float64.
    left = apply_gain_reference(t0[0:1], 0.7, "flt")
    right = apply_gain_reference(t0[1:2], 1.3, "flt")
    mono_l = (left * SQRT1_2 * 2) * 0.5        # mono->stereo upmix then avg
    mono_r = (right * SQRT1_2 * 2) * 0.5
    branch_a = np.concatenate([mono_l, mono_r], axis=0)

    pitch_f = 2.0 ** (-3.0 / 12.0)
    stretched = wsola_stretch_reference(t1, 1.0 / pitch_f, rate)
    num, den = _rational_factor(pitch_f)
    transposed = resample_data_reference(stretched, num, den)
    n_b = (t1.shape[1] * 65536) // int(round((1.0 / pitch_f) * 65536))
    n_b = (n_b // num) * den + ((n_b % num) * den + num - 1) // num
    branch_b = transposed[:, :n_b]

    n = master.shape[1]
    want = np.zeros((2, n))
    la = min(n, branch_a.shape[1])
    want[:, :la] += 0.5 * branch_a[:, :la].astype(np.float64)
    lb = min(n, branch_b.shape[1])
    want[:, :lb] += 0.5 * branch_b[:, :lb]

    # Interior comparison: the composition's WSOLA mirror keeps unmasked
    # frame tails past the stretched length, so the last ~taps samples at
    # the pitch branch's cut boundary legitimately differ; everything
    # before is held to >= 90 dB.
    sl = slice(0, min(la, lb) - 200)
    assert snr_db(want[:, sl], master[:, sl]) > 90.0


def test_config2_split_gain_merge_vs_oracle_composition():
    """Config 2: 44.1 kHz stereo -> split -> per-channel gain -> bimix
    master, vs NumPy gains + REAL swr per-side resample + bias weighting
    (the reference's per-side SwrContext path, audio-bimix.cpp:196-317)."""
    registry.register_all_processors()
    rate = 44_100
    x = _tone(4, 1.0, rate)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["x.wav"]
    g.update_node_pin(src)
    split = g.add_node(AudioSplit())
    vl = g.add_node(AudioVol())
    g.nodes[vl].processor.set_volume(0.8)
    vr = g.add_node(AudioVol())
    g.nodes[vr].processor.set_volume(1.4)
    merge = g.add_node(AudioBimix())
    g.nodes[merge].processor.set_bias(0.25)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, split, "input"))
    g.add_link(_pin(g, split, "output_l"), _pin(g, vl, "input"))
    g.add_link(_pin(g, split, "output_r"), _pin(g, vr, "input"))
    g.add_link(_pin(g, vl, "output"), _pin(g, merge, "input_l"))
    g.add_link(_pin(g, vr, "output"), _pin(g, merge, "input_r"))
    g.add_link(_pin(g, merge, "output"), _pin(g, out, "input"))

    master = _compile_and_run(g, {(src, "output_0"): (x, rate)})

    # Independent composition: per-side gain in NumPy, the -3 dB mono
    # upmix, REAL libswresample to 48 kHz, then the (1 -/+ bias) weights.
    side_l = apply_gain_reference(x[0:1], 0.8, "flt") * SQRT1_2
    side_r = apply_gain_reference(x[1:2], 1.4, "flt") * SQRT1_2
    rl = swr_convert(side_l.astype(np.float32), rate, 48_000)
    rr = swr_convert(side_r.astype(np.float32), rate, 48_000)
    n = min(rl.shape[1], rr.shape[1], master.shape[1])
    want = np.concatenate(
        [rl[:, :n] * (1.0 - 0.25), rr[:, :n] * (1.0 + 0.25)], axis=0
    ).astype(np.float64)

    sl = slice(200, n - 200)
    assert snr_db(want[:, sl], master[:, sl]) > 90.0
