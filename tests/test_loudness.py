"""Normalize node (ops/loudness.py + processors/normalize.py).

Contract under test: the BS.1770-4 calibration anchor (a 0 dBFS 997 Hz
sine in one channel reads -3.01 LKFS), device == float64 mirror within
0.05 LU, the relative gate excludes quiet passages, peak/LUFS
normalization hits their targets, silence is left untouched, and the
streaming path refuses with UnstreamableGraphError so exports fall back
to the offline render (the documented anchor_end behavior).
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core.errors import (
    ProcessorRuntimeError,
    UnstreamableGraphError,
)
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import loudness as ld
from nodey_tpu.processors.normalize import AudioNormalize

RATE = 48_000


def _stream(x, rate=RATE):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=rate, channels=x.shape[0])


def sine(freq, seconds, rate=RATE, amp=1.0, channels=1):
    t = np.arange(int(seconds * rate)) / rate
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    out = np.zeros((2, len(t)), np.float32)
    for c in range(channels):
        out[c] = x
    return out


def test_bs1770_calibration_anchor():
    """BS.1770-4: a 0 dBFS 997 Hz sine applied to one channel reads
    -3.01 LKFS — on device AND in the float64 mirror."""
    x = sine(997.0, 2.0, amp=1.0, channels=1)
    got = float(ld.integrated_lufs(jnp.asarray(x),
                                   jnp.int32(x.shape[1]), RATE))
    assert abs(got - (-3.01)) < 0.05
    ref = ld.loudness_reference(x, RATE)
    assert abs(ref - (-3.01)) < 0.02
    assert abs(got - ref) < 0.05


def test_device_matches_mirror_on_noise_and_other_rate():
    rng = np.random.default_rng(0)
    for rate in (48_000, 44_100):
        n = int(1.5 * rate)
        x = (0.2 * rng.standard_normal((2, n))).astype(np.float32)
        got = float(ld.integrated_lufs(jnp.asarray(x), jnp.int32(n),
                                       rate))
        ref = ld.loudness_reference(x, rate)
        assert abs(got - ref) < 0.05, (rate, got, ref)


def test_relative_gate_excludes_quiet_tail():
    """Loud phrase + long near-silent tail: integrated loudness stays
    within ~1 LU of the loud phrase alone (the gate drops the tail),
    where the ungated mean would be several LU lower."""
    loud = sine(440.0, 1.2, amp=0.5, channels=2)
    quiet = (sine(440.0, 3.0, amp=0.004, channels=2))
    both = np.concatenate([loud, quiet], axis=1)
    l_loud = ld.loudness_reference(loud, RATE)
    l_both = ld.loudness_reference(both, RATE)
    assert abs(l_both - l_loud) < 1.0
    got = float(ld.integrated_lufs(jnp.asarray(both),
                                   jnp.int32(both.shape[1]), RATE))
    assert abs(got - l_both) < 0.05


def test_lufs_normalization_hits_target():
    rng = np.random.default_rng(1)
    x = (0.05 * rng.standard_normal((2, 2 * RATE))).astype(np.float32)
    p = AudioNormalize()
    p.set_mode("lufs")
    p.set_param("target_db", -14.0)
    out = p.lower(None, {"input": _stream(x)})["output"]
    measured = ld.loudness_reference(np.asarray(out.data), RATE)
    assert abs(measured - (-14.0)) < 0.1


def test_peak_normalization_hits_target():
    x = sine(440.0, 0.5, amp=0.25, channels=2)
    p = AudioNormalize()
    p.set_mode("peak")
    p.set_param("target_db", -1.0)
    out = np.asarray(p.lower(None, {"input": _stream(x)})["output"].data)
    peak_db = 20 * np.log10(np.abs(out).max())
    assert abs(peak_db - (-1.0)) < 0.01


def test_silence_and_short_clips_untouched():
    z = np.zeros((2, RATE), np.float32)
    p = AudioNormalize()
    for mode in ("lufs", "peak"):
        p.set_mode(mode)
        out = np.asarray(p.lower(None, {"input": _stream(z)})["output"]
                         .data)
        np.testing.assert_array_equal(out, z)
    # Shorter than one 400 ms gating block: silence floor, gain 1.
    short = sine(440.0, 0.2, amp=0.3, channels=2)
    p.set_mode("lufs")
    out = np.asarray(p.lower(None, {"input": _stream(short)})["output"]
                     .data)
    np.testing.assert_array_equal(out, short)


def test_streaming_refused_with_fallback_error():
    p = AudioNormalize()
    with pytest.raises(UnstreamableGraphError):
        p.plan_stream(None, {"input": object()})
    with pytest.raises(ProcessorRuntimeError):
        p.lower(None, {})


def test_graph_offline_export_falls_back():
    """A graph with audio_normalize exports via the offline fallback of
    the streamed path and hits the LUFS target."""
    from test_chunkflow import run_offline
    from nodey_tpu.core import registry
    from nodey_tpu.core.graph import Graph
    from nodey_tpu.core.streaming import stream_supported
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput

    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    nid = g.add_node(AudioNormalize())
    g.nodes[nid].processor.set_param("target_db", -18.0)
    out = g.add_node(AudioOutput())
    pin = lambda a, p: g.nodes[a].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(nid, "input"))
    g.add_link(pin(nid, "output"), pin(out, "input"))
    assert stream_supported(g)       # plan-time refusal, not a gap
    rng = np.random.default_rng(2)
    x = (0.03 * rng.standard_normal((2, RATE))).astype(np.float32)
    outs, _ = run_offline(g, {(src, "output_0"): (x, RATE, "flt")})
    arr, n = outs["master"]
    got = np.asarray(arr)[:, :int(n)]
    measured = ld.loudness_reference(got, RATE)
    assert abs(measured - (-18.0)) < 0.1


def test_serde_clamps_and_param_spec():
    p = AudioNormalize()
    p.set_param("target_db", 99.0)
    assert p.target_db == 0.0
    p.set_param("target_db", -999.0)
    assert p.target_db == -60.0
    p.set_mode("peak")
    p.set_param("target_db", -3.0)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioNormalize()
    q.deserialize(blob)
    assert (q.mode, q.target_db) == ("peak", -3.0)
    assert {s["key"] for s in q.param_spec()} == {"mode", "target_db"}
    q.deserialize({"mode": 3, "target_db": "x"})
    q.deserialize([])
    assert (q.mode, q.target_db) == ("peak", -3.0)
