"""End-to-end tests: BASELINE config 1 (decode WAV -> gain -> MP3 export)
plus the gain kernel's integer-exactness contract."""

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner, RunnerState
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import native_lib
from nodey_tpu.ops.gain import apply_gain_reference
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol

from conftest import make_tone, snr_db

needs_native = pytest.mark.skipif(
    not native_lib.available(), reason="native host runtime unavailable"
)


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def build_config1_graph(wav_path: str, volume: float) -> Graph:
    """BASELINE config 1: audio_input -> gain -> audio_output."""
    g = Graph()
    nid_in = g.add_node(AudioInput())
    g.nodes[nid_in].processor.file_paths = [wav_path]
    g.update_node_pin(nid_in)
    nid_vol = g.add_node(AudioVol())
    g.nodes[nid_vol].processor.set_volume(volume)
    nid_out = g.add_node(AudioOutput())
    g.add_link(
        g.nodes[nid_in].pin_name_map["output_0"],
        g.nodes[nid_vol].pin_name_map["input"],
    )
    g.add_link(
        g.nodes[nid_vol].pin_name_map["output"],
        g.nodes[nid_out].pin_name_map["input"],
    )
    return g


@pytest.fixture
def tone_wav_s16(tmp_path):
    """30 s mono 44.1 kHz PCM16 WAV (config 1's input shape, shortened for
    CI speed to 3 s — the sample math is length-invariant)."""
    data = make_tone(rate=44_100, seconds=3.0, freq=440.0)
    path = tmp_path / "tone.wav"
    host_decode.write_wav_s16(str(path), data, 44_100)
    return str(path), data


def test_config1_gain_master_bit_exact(tone_wav_s16):
    """The rendered master must match the integer-domain gain reference
    EXACTLY (reference semantics: apply_volume<int16_t>,
    audio-vol.cpp:14-29)."""
    path, _ = tone_wav_s16
    decoded = host_decode.decode_file(path)
    assert decoded.fmt == "s16" and decoded.rate == 44_100

    g = build_config1_graph(path, volume=2.5)
    runner = Runner(g)
    result = runner.render(mode="export")
    assert runner.state is RunnerState.FINISHED
    assert result.rate == 44_100
    assert result.fmt == "s16"
    assert result.master.shape == decoded.data.shape

    expected = apply_gain_reference(decoded.data, 2.5, "s16")
    np.testing.assert_array_equal(result.master, expected)
    # every output value is still an exact int16 grid point
    scaled = result.master * 32768.0
    np.testing.assert_array_equal(scaled, np.round(scaled))


def test_gain_clamps_like_int16(tone_wav_s16):
    """Gain that drives samples past full scale clamps at the int16 rails,
    not at +/-1.0 float."""
    path, data = tone_wav_s16
    g = build_config1_graph(path, volume=10.0)
    result = Runner(g).render(mode="export")
    assert result.master.max() <= 32767.0 / 32768.0 + 1e-9
    assert result.master.min() >= -1.0 - 1e-9
    clipped = np.abs(result.master * 32768.0)
    assert (clipped >= 32766.99).sum() > 0  # clamping actually engaged


@needs_native
def test_config1_full_export_mp3(tone_wav_s16, tmp_path):
    """Full spine: decode -> device gain -> LAME MP3 -> re-decode, SNR sane."""
    path, _ = tone_wav_s16
    g = build_config1_graph(path, volume=0.5)
    out_path = tmp_path / "out.mp3"
    progress_values = []
    metrics = Runner(g).export(
        str(out_path), kbps=192, progress=progress_values.append
    )
    assert out_path.exists() and out_path.stat().st_size > 1000
    assert metrics.audio_seconds == pytest.approx(3.0, abs=0.1)
    assert progress_values and progress_values[-1] == pytest.approx(3.0, abs=0.1)

    # Re-decode the MP3 (native FFmpeg path) and compare against the master.
    decoded_mp3 = host_decode.decode_file(str(out_path))
    assert decoded_mp3.rate == 48_000  # LAME resampled out, like reference
    ref = host_decode.decode_file(path)
    expected = apply_gain_reference(ref.data, 0.5, "s16")
    # Compare in the 48k domain via the oracle; generous bound (MP3 is lossy
    # + codec delay), this guards gross pipeline breakage only.
    from nodey_tpu.host.resample_ref import swr_convert

    expected48 = swr_convert(expected, 44_100, 48_000)
    n = min(expected48.shape[-1], decoded_mp3.data.shape[-1])
    # align by cross-correlation over a window to absorb encoder delay
    a = expected48[0, : min(n, 48_000)]
    b = decoded_mp3.data[0, : min(n, 48_000)]
    lag = np.argmax(np.correlate(b, a[:2000], mode="valid"))
    b_aligned = decoded_mp3.data[0, lag : lag + len(a)]
    m = min(len(a), len(b_aligned))
    assert snr_db(a[:m], b_aligned[:m]) > 15.0


def test_missing_file_error_shape(tmp_path):
    """Pre-start validation fails with the reference's three-part error
    (audio-io.cpp:234-240)."""
    g = build_config1_graph(str(tmp_path / "nope.wav"), volume=1.0)
    runner = Runner(g)
    with pytest.raises(ProcessorRuntimeError) as exc_info:
        runner.render()
    assert runner.state is RunnerState.ERROR
    assert exc_info.value.message == "Failed to open input file"
    assert exc_info.value.explanation
    assert "nope.wav" in exc_info.value.detail


def test_unconnected_output_error():
    g = Graph()
    nid_in = g.add_node(AudioInput())
    g.nodes[nid_in].processor.file_paths = [""]
    g.add_node(AudioOutput())
    with pytest.raises(ProcessorRuntimeError):
        Runner(g).render()


def test_preview_mode_clamps_and_is_48k_stereo(tone_wav_s16):
    path, _ = tone_wav_s16
    g = build_config1_graph(path, volume=10.0)
    result = Runner(g).preview()
    assert result.rate == 48_000
    assert result.master.shape[0] == 2
    assert np.abs(result.master).max() <= 1.0


def test_compile_cache_reused(tone_wav_s16):
    path, _ = tone_wav_s16
    g = build_config1_graph(path, volume=2.0)
    runner = Runner(g)
    runner.render()
    m2 = runner.render().metrics
    assert m2.compile_seconds == 0.0  # cache hit

    # param change invalidates (volume is live state, not serde)
    for node in g.nodes.values():
        if isinstance(node.processor, AudioVol):
            node.processor.set_volume(3.0)
    r3 = runner.render()
    assert r3.metrics.compile_seconds > 0.0


@needs_native
def test_stream_decoder_matches_whole_file(tmp_path):
    """Bounded-memory streaming decode == whole-file decode, block by block
    (native na_decoder_* API)."""
    from nodey_tpu.host.decode import StreamDecoder

    data = make_tone(rate=48_000, seconds=1.0, channels=2)
    path = tmp_path / "sd.wav"
    host_decode.write_wav_s16(str(path), data, 48_000)
    whole = host_decode.decode_file(str(path))
    with StreamDecoder(str(path)) as dec:
        assert (dec.rate, dec.channels, dec.fmt) == (48_000, 2, "s16")
        blocks = list(dec.blocks(7_001))
    streamed = np.concatenate(blocks, axis=1)
    np.testing.assert_array_equal(streamed, whole.data)


@needs_native
def test_stream_decoder_missing_file():
    from nodey_tpu.host.decode import StreamDecoder

    with pytest.raises(ProcessorRuntimeError):
        StreamDecoder("/tmp/definitely-missing.wav")


def test_compile_cache_config_strips_caller_tracebacks(monkeypatch):
    """enable_compile_cache limits MLIR locations to one user frame.

    jax's cache key canonicalizes modules with strip-debuginfo, but
    locations already serialized inside a Mosaic custom call's payload
    are opaque to that pass — with full tracebacks on, the same Pallas
    program hashes to a different key per ENTRY POINT (measured:
    shifting an out-of-repo driver script by five lines forced a fresh
    17 s kernel compile; ROUND4.md §9). The framework must pin the
    single-frame mode so persistent-cache keys are a function of the
    repo alone. An explicit user env override wins."""
    import jax

    from nodey_tpu import config as cfg

    monkeypatch.delenv("NODEY_NO_COMPILE_CACHE", raising=False)
    monkeypatch.delenv(
        "JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS", raising=False
    )
    monkeypatch.setattr(cfg, "_cache_enabled", False)
    jax.config.update("jax_include_full_tracebacks_in_locations", True)
    try:
        cfg.enable_compile_cache()
        assert jax.config.jax_include_full_tracebacks_in_locations is False

        # User override is respected.
        monkeypatch.setattr(cfg, "_cache_enabled", False)
        monkeypatch.setenv("JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS", "1")
        jax.config.update("jax_include_full_tracebacks_in_locations", True)
        cfg.enable_compile_cache()
        assert jax.config.jax_include_full_tracebacks_in_locations is True
    finally:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
