"""WSOLA / pitch / velocity property tests (BASELINE config 4 path).

SoundTouch is absent from the image, so parity is held by the properties the
reference guarantees: duration scaling, pitch tracking, spectral purity
through splices, determinism, and the SoundTouch (rate, pitch) composition
rules (src/processor/audio-velocity.cpp:446-477)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.ops import stretch as stretch_ops
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops.stretch import (
    soundtouch_like,
    transpose_rate,
    wsola_stretch_at_rate,
    wsola_stretch_reference,
)

RATE = 48_000


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def tone(freq=440.0, seconds=1.0, channels=1, rate=RATE):
    n = int(rate * seconds)
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    if channels == 2:
        x = np.stack([x, 0.5 * np.sin(2 * np.pi * freq * 1.5 * t)])
    else:
        x = x[None, :]
    return x.astype(np.float32)


def stream_of(data, rate=RATE):
    data = jnp.asarray(data)
    return Stream(
        data=data, length=jnp.int32(data.shape[-1]), rate=rate,
        channels=data.shape[0],
    )


def dominant_freq(x: np.ndarray, rate: int) -> float:
    n = len(x)
    spec = np.abs(np.fft.rfft(x * np.hanning(n)))
    return float(np.argmax(spec) * rate / n)


def spectral_purity(x: np.ndarray) -> float:
    """Fraction of energy within +/-2 bins of the peak."""
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    peak = int(np.argmax(spec))
    lo, hi = max(0, peak - 2), peak + 3
    return float(spec[lo:hi].sum() / spec.sum())


class TestWsola:
    @pytest.mark.parametrize("tempo", [0.5, 0.75, 1.25, 2.0, 3.0])
    def test_duration_scaling(self, tempo):
        x = tone(seconds=1.0)
        out, out_len = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), tempo, RATE
        )
        expected = x.shape[-1] / tempo
        assert abs(int(out_len) - expected) / expected < 0.01

    @pytest.mark.parametrize("tempo", [0.75, 1.5])
    def test_pitch_preserved(self, tempo):
        x = tone(freq=440.0, seconds=1.0)
        out, out_len = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), tempo, RATE
        )
        y = np.asarray(out)[0, 2000 : int(out_len) - 2000]
        freq = dominant_freq(y, RATE)
        assert abs(freq - 440.0) / 440.0 < 0.01

    def test_splices_stay_clean_on_periodic_signal(self):
        """The similarity search must splice period-aligned: a pure tone
        stays spectrally pure through stretching."""
        x = tone(freq=440.0, seconds=1.0)
        out, out_len = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), 1.5, RATE
        )
        y = np.asarray(out)[0, 2000 : int(out_len) - 2000]
        assert spectral_purity(y) > 0.95

    def test_device_matches_numpy_reference(self):
        x = tone(freq=523.25, seconds=0.4, channels=2)
        out, out_len = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), 1.3, RATE
        )
        ref = wsola_stretch_reference(x, 1.3, RATE)
        # Device output is zeroed beyond out_len; compare the valid span.
        n = min(int(out_len), ref.shape[-1])
        got = np.asarray(out)
        np.testing.assert_allclose(got[:, :n], ref[:, :n], atol=2e-5)

    def test_device_matches_reference_beyond_int32_frame_positions(self):
        """Regression: frame positions k*num overflow int32 past ~17 frames
        (num ~ 1.3e8 at tempo 1.25); the carry-decomposed frame_pos keeps
        the device scan exact on clips of arbitrary length. 3 s at tempo
        1.25 spans ~58 frames — well past the overflow point where the old
        arithmetic silently clamped windows to position 0."""
        rng = np.random.default_rng(11)
        x = tone(freq=220.0, seconds=3.0, channels=2)
        x = x + 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        out, out_len = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), 1.25, RATE
        )
        ref = wsola_stretch_reference(x, 1.25, RATE)
        n = min(int(out_len), ref.shape[-1])
        np.testing.assert_allclose(
            np.asarray(out)[:, :n], ref[:, :n], atol=2e-5
        )

    def test_deterministic(self):
        x = tone(seconds=0.3)
        a, _ = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), 1.7, RATE
        )
        b, _ = wsola_stretch_at_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), 1.7, RATE
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTranspose:
    @pytest.mark.parametrize("factor", [0.7937005259840998, 1.2599210498948732])
    def test_pitch_and_length(self, factor):
        """factor = 2^(+-4/12): config 4's +/-4 semitones."""
        x = tone(freq=440.0, seconds=1.0)
        out, out_len = transpose_rate(
            jnp.asarray(x), jnp.int32(x.shape[-1]), factor
        )
        expected_len = x.shape[-1] / factor
        assert abs(int(out_len) - expected_len) / expected_len < 0.001
        y = np.asarray(out)[0, 1000 : int(out_len) - 1000]
        freq = dominant_freq(y, RATE)
        assert abs(freq - 440.0 * factor) / (440.0 * factor) < 0.005


class TestSoundTouchComposition:
    """The reference's (rate, pitch) wiring
    (src/processor/audio-velocity.cpp:446-477)."""

    def test_velocity_keep_pitch(self):
        """rate=v, pitch=1/v -> WSOLA only: shorter, same pitch."""
        x = stream_of(tone(freq=440.0, seconds=1.0))
        v = 1.5
        out = soundtouch_like(None, x, rate=v, pitch=1.0 / v)
        n = int(out.length)
        assert abs(n - RATE / v) / (RATE / v) < 0.01
        y = np.asarray(out.data)[0, 2000 : n - 2000]
        assert abs(dominant_freq(y, RATE) - 440.0) / 440.0 < 0.01

    def test_velocity_no_keep_pitch(self):
        """rate=v, pitch=1 -> pure transposition: shorter AND higher."""
        x = stream_of(tone(freq=440.0, seconds=1.0))
        v = 1.25
        out = soundtouch_like(None, x, rate=v, pitch=1.0)
        n = int(out.length)
        assert abs(n - RATE / v) / (RATE / v) < 0.001
        y = np.asarray(out.data)[0, 1000 : n - 1000]
        assert abs(dominant_freq(y, RATE) - 440.0 * v) / (440.0 * v) < 0.005

    @pytest.mark.parametrize("semitones", [-4.0, 4.0])
    def test_pitch_modifier(self, semitones):
        """rate=1, pitch=2^(n/12) -> same duration, shifted pitch."""
        p = 2.0 ** (semitones / 12.0)
        x = stream_of(tone(freq=440.0, seconds=1.0))
        out = soundtouch_like(None, x, rate=1.0, pitch=p)
        n = int(out.length)
        assert abs(n - RATE) / RATE < 0.01  # duration preserved
        y = np.asarray(out.data)[0, 2000 : n - 2000]
        got = dominant_freq(y, RATE)
        assert abs(got - 440.0 * p) / (440.0 * p) < 0.01


def test_config4_graph(tmp_path):
    """BASELINE config 4: 44.1k input -> resample 48k -> pitch +4st ->
    velocity 1.25 keep-pitch -> output."""
    from nodey_tpu.core.graph import Graph
    from nodey_tpu.core.runner import Runner
    from nodey_tpu.host import decode as host_decode
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput
    from nodey_tpu.processors.resample_node import AudioResample
    from nodey_tpu.processors.velocity import PitchModifier, VelocityModifier

    data = tone(freq=440.0, seconds=1.0, rate=44_100)
    path = tmp_path / "in.wav"
    host_decode.write_wav(str(path), data, 44_100)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(path)]
    g.update_node_pin(src)
    rs = g.add_node(AudioResample())
    g.nodes[rs].processor.set_target_rate(48_000)
    pitch = g.add_node(PitchModifier())
    g.nodes[pitch].processor.pitch = 4.0
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(1.25)
    g.nodes[vel].processor.keep_pitch = True
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(rs, "input"))
    g.add_link(pin(rs, "output"), pin(pitch, "input"))
    g.add_link(pin(pitch, "output"), pin(vel, "input"))
    g.add_link(pin(vel, "output"), pin(out, "input"))

    result = Runner(g).render(mode="export")
    assert result.rate == 48_000
    n = result.master.shape[1]
    expected_n = 48_000 / 1.25  # 1 s resampled, then tempo 1.25
    assert abs(n - expected_n) / expected_n < 0.02
    y = result.master[0, 2000 : n - 2000]
    p = 2.0 ** (4.0 / 12.0)
    assert abs(dominant_freq(y, 48_000) - 440.0 * p) / (440.0 * p) < 0.01


class TestStreamingWsola:
    """Exact chunked execution via the carried-tail scan (the 'streaming
    with stateful kernels under jit' hard part, SURVEY.md §7)."""

    def test_stream_steps_match_whole_clip(self):
        import jax
        from nodey_tpu.ops.stretch import (
            _params,
            wsola_stream_plan,
            wsola_stream_step,
        )

        tempo = 1.4
        x = tone(freq=330.0, seconds=0.8, channels=2)
        data = jnp.asarray(x)
        whole, whole_len = wsola_stretch_at_rate(
            data, jnp.int32(x.shape[-1]), tempo, RATE
        )
        whole = np.asarray(whole)

        seq, seek, overlap = _params(RATE)
        plan = wsola_stream_plan(tempo, RATE, chunk_frames=4)
        stride_out = plan["stride_out"]

        # Pad enough that every window slice is fully in-bounds even for the
        # last frame (dynamic_slice clamps out-of-bounds starts, which would
        # silently shift the window).
        stride_est = plan["stride_out"]
        max_frames = (x.shape[-1] + stride_est) // stride_est + 8
        needed = (max_frames * plan["num"]) // plan["den"] + plan["window"] + 16
        xp = jnp.pad(data, ((0, 0), (0, max(0, needed - x.shape[-1]))))
        step = jax.jit(
            lambda w, t, k: wsola_stream_step(plan, w, t, k)
        )

        pieces = [np.asarray(data[:, :overlap])]  # initial prefix
        tail = data[:, :overlap]
        total_frames = 0
        target_frames = (int(whole_len) - overlap) // stride_out
        k0 = 0
        while total_frames < target_frames:
            win_start = (k0 * plan["num"] + plan["den"] // 2) // plan["den"]
            window = jax.lax.dynamic_slice(
                xp, (0, win_start), (2, plan["window"])
            )
            tail, chunk = step(window, tail, jnp.int32(k0))
            pieces.append(np.asarray(chunk))
            total_frames += plan["chunk_frames"]
            k0 += plan["chunk_frames"]

        streamed = np.concatenate(pieces, axis=1)
        n = min(int(whole_len), streamed.shape[1])
        # Same splice decisions; amplitudes agree to float rounding (the two
        # compiled programs may fuse the crossfade arithmetic differently,
        # so exact bit equality across programs is not guaranteed).
        np.testing.assert_allclose(
            streamed[:, :n], whole[:, :n], atol=2e-7
        )


def test_scale_length_exact_on_long_clips():
    """Integer out-length math stays exact where float32 drifts (review
    finding: >2^24-sample clips)."""
    from nodey_tpu.ops.stretch import _scale_length_exact

    for tempo in (0.5, 0.77, 1.0, 1.4, 3.0):
        num = int(round(tempo * 65536))
        for length in (86_400_000, 2**24 + 12345, 500_000_000):
            got = int(_scale_length_exact(jnp.int32(length), tempo))
            assert got == length * 65536 // num


def test_frozen_goldens():
    """Frozen decision-record goldens (round-1 VERDICT item 7): the
    committed tests/goldens/wsola.npz pins splice offsets, output head
    and exact length of the production CPU path on a seeded signal
    (generator: tests/make_wsola_goldens.py). A refactor that changes
    WSOLA splice decisions fails HERE instead of drifting silently.
    Reference behavior anchor: audio-velocity.cpp:369-427."""
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "wsola.npz")
    assert os.path.exists(path), "goldens missing - run make_wsola_goldens.py"
    blobs = np.load(path)

    from make_wsola_goldens import case_signal

    # A subset keeps suite time bounded; the full matrix regenerates via
    # the make script (bitwise-stable: seeded PCG64 + one code path).
    for rate, tempo in [(48_000, 1.25), (48_000, 1.1037), (44_100, 2.0)]:
        key = f"{rate}_{tempo}"
        data = case_signal(rate)
        N = data.shape[1]
        out, out_len = stretch_ops.wsola_stretch_at_rate(
            jnp.asarray(data), jnp.int32(N), tempo, rate
        )
        assert int(out_len) == int(blobs[f"{key}_len"]), key
        head = blobs[f"{key}_head"]
        np.testing.assert_allclose(
            np.asarray(out)[:, : head.shape[1]], head, rtol=0, atol=1.2e-7,
            err_msg=key,
        )

        seq, seek, overlap = stretch_ops._params(rate)
        K = stretch_ops._out_chunks(N, tempo, seq, overlap)
        num = int(round((seq - overlap) * tempo * 65536))
        den = 65536
        last_pos = ((K - 1) * num + den // 2) // den
        pad_to = last_pos + seek + seq + 2
        x = jnp.pad(jnp.asarray(data), ((0, 0), (0, max(0, pad_to - N))))
        bs, _body = stretch_ops.wsola_chain_blocked(
            x, x[:, :overlap], jnp.int32(0), K, num, den, seq, seek, overlap
        )
        np.testing.assert_array_equal(
            np.asarray(bs), blobs[f"{key}_bs"], err_msg=key
        )
