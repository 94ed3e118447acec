"""Mixer op + graph tests: BASELINE configs 2 (split->gain->merge) and
3 (two-track amix), validated against libswresample-oracle compositions and
direct NumPy math."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner
from nodey_tpu.core.stream import FMT_FLT, FMT_S16, Stream
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import native_lib
from nodey_tpu.ops import mix as mix_ops
from nodey_tpu.ops.gain import apply_gain_reference
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.bimix import AudioBimixV2
from nodey_tpu.processors.split import AudioSplit

from conftest import make_tone, snr_db

needs_native = pytest.mark.skipif(
    not native_lib.available(), reason="native host runtime unavailable"
)

SQRT1_2 = 0.7071067811865476


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def stream_of(data, rate, fmt=FMT_FLT, t0_us=0.0):
    data = jnp.asarray(data)
    return Stream(
        data=data,
        length=jnp.int32(data.shape[-1]),
        rate=rate,
        channels=data.shape[0],
        fmt=fmt,
        t0_us=t0_us,
    )


# -- amix -------------------------------------------------------------------


def test_amix_same_rate_weighted_sum():
    a = make_tone(48_000, 0.2, 440, channels=2)
    b = make_tone(48_000, 0.2, 880, channels=2)
    out = mix_ops.amix(
        [stream_of(a, 48_000), stream_of(b, 48_000)], [0.6, 0.4]
    )
    expected = 0.6 * a + 0.4 * b
    np.testing.assert_allclose(np.asarray(out.data), expected, atol=1e-6)
    assert int(out.length) == a.shape[-1]
    assert out.rate == 48_000 and out.channels == 2


def test_amix_mono_input_upmixed_at_minus3db():
    """Mono inputs reach the stereo sum through swr's default -3 dB upmix
    (measured from libswresample; reference wires mono->stereo SwrContexts,
    audio-amix.cpp:206-243)."""
    a = make_tone(48_000, 0.1, 440, channels=1)
    out = mix_ops.amix([stream_of(a, 48_000)], [1.0])
    expected = np.repeat(a, 2, axis=0) * SQRT1_2
    np.testing.assert_allclose(np.asarray(out.data), expected, atol=1e-6)


def test_amix_shorter_input_contributes_silence():
    """reference: drained-resampler silence until all inputs EOF
    (audio-amix.cpp:279-291, 320)."""
    long = make_tone(48_000, 0.2, 440, channels=2)
    short = make_tone(48_000, 0.1, 880, channels=2)
    short_padded = np.zeros_like(long)
    short_padded[:, : short.shape[-1]] = short
    sa = stream_of(long, 48_000)
    sb = Stream(
        data=jnp.asarray(short_padded),
        length=jnp.int32(short.shape[-1]),
        rate=48_000,
        channels=2,
        fmt=FMT_FLT,
    )
    out = mix_ops.amix([sa, sb], [0.5, 0.5])
    assert int(out.length) == long.shape[-1]
    expected = 0.5 * long + 0.5 * short_padded
    np.testing.assert_allclose(np.asarray(out.data), expected, atol=1e-6)


@needs_native
def test_amix_mixed_rates_vs_oracle():
    """44.1k mono + 48k stereo mixed: compare against the swr-oracle
    composition. Error budget is the resampler difference (>= 90 dB)."""
    from nodey_tpu.host.resample_ref import swr_convert

    a = make_tone(44_100, 0.5, 440, channels=1)
    b = make_tone(48_000, 0.5, 660, channels=2)
    out = mix_ops.amix(
        [stream_of(a, 44_100), stream_of(b, 48_000)], [0.7, 0.3]
    )
    golden_a = swr_convert(a, 44_100, 48_000, out_channels=2)
    expected_len = max(golden_a.shape[-1], b.shape[-1])
    acc = np.zeros((2, expected_len), dtype=np.float64)
    acc[:, : golden_a.shape[-1]] += 0.7 * golden_a
    acc[:, : b.shape[-1]] += 0.3 * b
    got = np.asarray(out.data)[:, : int(out.length)]
    assert int(out.length) == expected_len
    sl = slice(200, expected_len - 200)
    assert snr_db(acc[:, sl], got[:, sl]) >= 90.0


# -- bimix ------------------------------------------------------------------


def test_bimix_bias_weighting():
    """reference: out_l = (ll/2 + lr/2)*(1-bias), out_r likewise *(1+bias)
    (audio-bimix.cpp:310-316)."""
    left = make_tone(48_000, 0.1, 440, channels=2)
    right = make_tone(48_000, 0.1, 880, channels=2)
    out = mix_ops.bimix(
        stream_of(left, 48_000), stream_of(right, 48_000), bias=0.25
    )
    expected_l = (left[0] + left[1]) * 0.5 * 0.75
    expected_r = (right[0] + right[1]) * 0.5 * 1.25
    got = np.asarray(out.data)
    np.testing.assert_allclose(got[0], expected_l, atol=1e-6)
    np.testing.assert_allclose(got[1], expected_r, atol=1e-6)


def test_bimix_mono_sides():
    """Mono side -> swr stereo upmix (-3 dB) -> average = mono * sqrt1_2."""
    left = make_tone(48_000, 0.1, 440, channels=1)
    right = make_tone(48_000, 0.1, 880, channels=1)
    out = mix_ops.bimix(
        stream_of(left, 48_000), stream_of(right, 48_000), bias=0.0
    )
    got = np.asarray(out.data)
    np.testing.assert_allclose(got[0], left[0] * SQRT1_2, atol=1e-6)
    np.testing.assert_allclose(got[1], right[0] * SQRT1_2, atol=1e-6)


def test_bimix_v2_time_alignment():
    """Sides with different start timestamps land at their own grid offsets;
    disjoint regions zero-fill the other channel
    (reference: audio-bimix.cpp:776-872)."""
    left = make_tone(48_000, 0.1, 440, channels=1)
    right = make_tone(48_000, 0.1, 880, channels=1)
    offset_s = 0.05
    out = mix_ops.bimix_v2(
        stream_of(left, 48_000, t0_us=0.0),
        stream_of(right, 48_000, t0_us=offset_s * 1e6),
    )
    got = np.asarray(out.data)
    off = int(round(offset_s * 48_000))
    n = left.shape[-1]
    assert int(out.length) == off + n
    np.testing.assert_allclose(got[0, :n], left[0] * SQRT1_2, atol=1e-6)
    np.testing.assert_allclose(got[1, :off], 0.0, atol=1e-7)  # head silence
    np.testing.assert_allclose(
        got[1, off : off + n], right[0] * SQRT1_2, atol=1e-6
    )


# -- split ------------------------------------------------------------------


def test_split_stereo_and_mono():
    stereo = make_tone(48_000, 0.05, 440, channels=2)
    s = stream_of(stereo, 48_000, fmt=FMT_S16)
    left, right = mix_ops.split_channels(s)
    np.testing.assert_array_equal(np.asarray(left.data), stereo[0:1])
    np.testing.assert_array_equal(np.asarray(right.data), stereo[1:2])
    assert left.fmt == FMT_S16  # origin format survives the split

    mono = stream_of(make_tone(48_000, 0.05, 440, channels=1), 48_000)
    l2, r2 = mix_ops.split_channels(mono)
    assert l2 is mono and r2 is mono


# -- graph-level: configs 2 and 3 -------------------------------------------


def _pin(g, nid, name):
    return g.nodes[nid].pin_name_map[name]


def test_config2_split_gain_merge(tmp_path):
    """BASELINE config 2: stereo input -> split -> per-channel gain ->
    bimix_v2 merge -> output."""
    data = make_tone(48_000, 0.5, 440, channels=2)
    path = tmp_path / "stereo.wav"
    host_decode.write_wav_s16(str(path), data, 48_000)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(path)]
    g.update_node_pin(src)
    split = g.add_node(AudioSplit())
    vol_l = g.add_node(AudioVol())
    vol_r = g.add_node(AudioVol())
    g.nodes[vol_l].processor.set_volume(2.0)
    g.nodes[vol_r].processor.set_volume(0.5)
    merge = g.add_node(AudioBimixV2())
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, split, "input"))
    g.add_link(_pin(g, split, "output_l"), _pin(g, vol_l, "input"))
    g.add_link(_pin(g, split, "output_r"), _pin(g, vol_r, "input"))
    g.add_link(_pin(g, vol_l, "output"), _pin(g, merge, "input_l"))
    g.add_link(_pin(g, vol_r, "output"), _pin(g, merge, "input_r"))
    g.add_link(_pin(g, merge, "output"), _pin(g, out, "input"))

    result = Runner(g).render(mode="export")
    decoded = host_decode.decode_file(str(path))
    gl = apply_gain_reference(decoded.data[0:1], 2.0, "s16")
    gr = apply_gain_reference(decoded.data[1:2], 0.5, "s16")
    expected = np.concatenate([gl, gr], axis=0) * SQRT1_2
    got = result.master
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_config3_two_track_amix(tmp_path):
    """BASELINE config 3: 2x stereo inputs -> amplify -> amix -> output."""
    a = make_tone(48_000, 0.5, 440, channels=2)
    b = make_tone(48_000, 0.5, 660, channels=2)
    pa, pb = tmp_path / "a.wav", tmp_path / "b.wav"
    host_decode.write_wav(str(pa), a, 48_000)
    host_decode.write_wav(str(pb), b, 48_000)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(pa), str(pb)]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.5)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.25, 0.75]
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vol, "input"))
    g.add_link(_pin(g, vol, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    result = Runner(g).render(mode="export")
    expected = 0.25 * (1.5 * a) + 0.75 * b
    got = result.master
    assert result.rate == 48_000
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-5)
