"""STFT spectrum tap tests (BASELINE config 5's spectrum node)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.stream import Stream
from nodey_tpu.ops.stft import magnitude_spectrogram, magnitude_spectrogram_reference

from conftest import make_tone


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def stream_of(data, rate=48_000):
    data = jnp.asarray(data)
    return Stream(
        data=data, length=jnp.int32(data.shape[-1]), rate=rate,
        channels=data.shape[0],
    )


def test_matches_reference_impl():
    x = make_tone(48_000, 0.3, 1000, channels=2)
    dev = np.asarray(magnitude_spectrogram(stream_of(x), n_fft=512, hop=256))
    ref = magnitude_spectrogram_reference(x, n_fft=512, hop=256)
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, atol=1e-2, rtol=1e-4)


def test_fast_path_matches_materialized_frames():
    """The hop-divides-n_fft fast path (k reshaped-segment GEMMs against a
    window-folded basis, zero frame materialization) must agree with the
    explicit frames x windowed-stacked-basis formulation to f32 ulp level
    — the two differ only in where the window multiply happens (folded in
    float64 vs applied in float32) and GEMM reduction order."""
    from nodey_tpu.ops.stft import _frame, _windowed_stacked_basis

    rng = np.random.default_rng(7)
    n_fft, hop = 256, 64  # k = 4 basis blocks
    x = (0.4 * rng.standard_normal((2, 2048))).astype(np.float32)
    fast = np.asarray(magnitude_spectrogram(stream_of(x), n_fft, hop))
    F = (2048 - n_fft) // hop + 1
    frames = np.asarray(_frame(jnp.asarray(x), F, n_fft, hop))
    y = frames.astype(np.float64) @ _windowed_stacked_basis(n_fft).astype(
        np.float64
    )
    bins = n_fft // 2 + 1
    direct = np.sqrt(y[..., :bins] ** 2 + y[..., bins:] ** 2)
    np.testing.assert_allclose(fast, direct, atol=5e-5, rtol=1e-5)


def test_irregular_hop_uses_stacked_basis():
    """hop that does not divide n_fft takes the gather + stacked-basis
    path; it must match the NumPy reference like the fast path does."""
    x = make_tone(48_000, 0.2, 700, channels=1)
    dev = np.asarray(magnitude_spectrogram(stream_of(x), n_fft=512, hop=192))
    ref = magnitude_spectrogram_reference(x, n_fft=512, hop=192)
    assert dev.shape == ref.shape
    np.testing.assert_allclose(dev, ref, atol=1e-2, rtol=1e-4)


def test_peak_bin_at_tone_frequency():
    freq, rate, n_fft = 3000.0, 48_000, 1024
    x = make_tone(rate, 0.2, freq)
    spec = np.asarray(magnitude_spectrogram(stream_of(x, rate), n_fft=n_fft))
    mid_frame = spec[0, spec.shape[1] // 2]
    peak_bin = int(np.argmax(mid_frame))
    expected_bin = round(freq * n_fft / rate)
    assert abs(peak_bin - expected_bin) <= 1


def test_spectrum_tap_passthrough_in_graph(tmp_path):
    """The spectrum node passes audio through unchanged and emits a side
    output named spectrum_<node_id>."""
    from nodey_tpu.core.graph import Graph
    from nodey_tpu.core.runner import Runner
    from nodey_tpu.host import decode as host_decode
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput
    from nodey_tpu.processors.spectrum import AudioSpectrum

    data = make_tone(48_000, 0.3, 2500, channels=2)
    path = tmp_path / "in.wav"
    host_decode.write_wav(str(path), data, 48_000)

    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(path)]
    g.update_node_pin(src)
    spec_node = g.add_node(AudioSpectrum())
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(spec_node, "input"))
    g.add_link(pin(spec_node, "output"), pin(out, "input"))

    result = Runner(g).render(mode="export")
    np.testing.assert_allclose(result.master, data, atol=1e-7)
    assert len(result.spectra) == 1
    (key, spectrum), = result.spectra.items()
    assert key == f"spectrum_{spec_node}"
    assert spectrum.shape[0] == 2 and spectrum.shape[2] == 513
