"""WAV export sink (host/encode.py WavWriter + open_sink dispatch).

An extension past the reference (MP3-only export,
src/processor/audio-io.cpp:640-844): ``.wav`` paths take a lossless
incremental writer with the Mp3Encoder block interface, removing the
LAME bottleneck from streamed exports. Contract: integer-origin masters
round-trip BIT-EXACTLY through PCM16 (same trunc quantization as the
MP3 S16 path and the device s16 wire); float masters round-trip
bitwise through IEEE-float32; streamed export equals offline export.
"""

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.runner import Runner
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import encode as host_encode
from nodey_tpu.host import native_lib

from conftest import make_tone
from test_e2e import build_config1_graph

needs_native = pytest.mark.skipif(
    not native_lib.available(), reason="native host runtime unavailable"
)


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


@pytest.fixture
def tone_wav(tmp_path):
    data = make_tone(rate=44_100, seconds=2.0, freq=440.0, channels=2)
    path = tmp_path / "tone.wav"
    host_decode.write_wav_s16(str(path), data, 44_100)
    return str(path)


def test_open_sink_dispatch(tmp_path):
    sink = host_encode.open_sink(
        str(tmp_path / "x.wav"), 48_000, 2, 320, "flt"
    )
    assert isinstance(sink, host_encode.WavWriter)
    sink.close()


def test_wavwriter_float_roundtrip_bitwise(tmp_path):
    """IEEE-f32 WAV: incremental blocks round-trip bitwise through the
    native decoder (incl. an int16 wire block dequantized to f32)."""
    path = str(tmp_path / "f.wav")
    rng = np.random.default_rng(0)
    a = (0.4 * rng.standard_normal((2, 5000))).astype(np.float32)
    b = rng.integers(-32768, 32768, size=(2, 3000)).astype(np.int16)
    with host_encode.WavWriter(path, 48_000, 2, "flt") as w:
        w.write(a)
        w.write(b)
    dec = host_decode.decode_file(path)
    assert dec.rate == 48_000
    want = np.concatenate(
        [a, b.astype(np.float32) / np.float32(32768.0)], axis=1
    )
    np.testing.assert_array_equal(dec.data, want)


def test_wavwriter_pcm16_roundtrip_bitwise(tmp_path):
    """PCM16 WAV: int16 wire blocks are written verbatim; float blocks
    get the MP3 path's exact trunc quantization."""
    path = str(tmp_path / "i.wav")
    rng = np.random.default_rng(1)
    ints = rng.integers(-32768, 32768, size=(2, 4000)).astype(np.int16)
    flt = (ints.astype(np.float32) / np.float32(32768.0))[:, :1000]
    with host_encode.WavWriter(path, 44_100, 2, "s16") as w:
        w.write(ints)
        w.write(flt)
    dec = host_decode.decode_file(path)
    assert dec.rate == 44_100 and dec.fmt == "s16"
    got = np.round(dec.data * 32768.0).astype(np.int16)
    want = np.concatenate([ints, ints[:, :1000]], axis=1)
    np.testing.assert_array_equal(got, want)


@needs_native
def test_offline_wav_export_bit_exact(tone_wav, tmp_path):
    """Offline export to .wav: the decoded file IS the master, exactly
    (no codec, no resample — the rate stays the master's own)."""
    g = build_config1_graph(tone_wav, volume=2.5)
    runner = Runner(g)
    result = runner.render(mode="export")

    out = str(tmp_path / "out.wav")
    Runner(g).export(out, kbps=192)
    dec = host_decode.decode_file(out)
    assert dec.rate == result.rate == 44_100
    np.testing.assert_array_equal(
        dec.data, result.master[:, : dec.data.shape[1]]
    )
    assert dec.data.shape == result.master.shape


@needs_native
def test_streamed_wav_export_matches_offline(tone_wav, tmp_path):
    """Streamed .wav export (chunk pipeline, s16 wire) equals the
    offline export sample-for-sample."""
    g = build_config1_graph(tone_wav, volume=0.7)
    off = str(tmp_path / "off.wav")
    st = str(tmp_path / "st.wav")
    Runner(g).export(off, kbps=192)
    Runner(g).export_streamed(st, kbps=192, chunk_seconds=0.5)
    a = host_decode.decode_file(off)
    b = host_decode.decode_file(st)
    assert a.rate == b.rate
    np.testing.assert_array_equal(a.data, b.data)


def test_wav_writer_refuses_past_riff_limit(tmp_path):
    """A write that would push the data chunk past 4 GiB raises the
    structured error up front, leaving close() able to patch a valid
    header (ADVICE r2, host/encode.py WavWriter.close)."""
    from nodey_tpu.core.errors import ProcessorRuntimeError

    path = str(tmp_path / "big.wav")
    w = host_encode.WavWriter(path, 48_000, 2, "flt")
    # pretend ~4 GiB already written; the next block must be refused
    w._frames = (0xFFFFFFFF - 36) // (2 * 4)
    block = np.zeros((2, 64), np.float32)
    with pytest.raises(ProcessorRuntimeError) as ei:
        w.write(block)
    assert "4 GiB" in ei.value.message
    w.close()
    # header still valid (sizes patched with the pre-refusal count)
    import struct

    with open(path, "rb") as f:
        hdr = f.read(44)
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
    (riff_size,) = struct.unpack("<I", hdr[4:8])
    assert riff_size == 36 + w._frames * 2 * 4
