"""Segmented parallel MP3 encode (host/encode.py, VERDICT r2 #2).

The default export encoder stays the serial reference-parity LAME sink
(bit reservoir ON, audio-io.cpp:809-831). On multi-core hosts open_sink
switches to ParallelMp3Encoder, whose contract is exact: the spliced
stream is BIT-IDENTICAL frame-for-frame to a serial no-reservoir LAME
encode of the same PCM (see the bit-reservoir argument in
host/encode.py). These tests pin that contract on a 1-CPU host by forcing
workers=2 (thread-pool correctness is scheduling-independent).
"""

import numpy as np
import pytest

from nodey_tpu.host import decode as hd
from nodey_tpu.host import encode as he


RATE = 48_000


def _noise(seconds, seed=3):
    rng = np.random.default_rng(seed)
    n = int(RATE * seconds)
    return (0.3 * rng.standard_normal((2, n))).astype(np.float32)


def _feed(enc, x, blk=RATE * 3):
    for s in range(0, x.shape[1], blk):
        enc.write(x[:, s:s + blk])
    enc.close()


def _frames(path):
    data = open(path, "rb").read()
    return data, [data[o:o + s] for o, s in he._mp3_frames(data)]


def test_parallel_splice_bit_identical_to_serial_noreservoir(tmp_path):
    x = _noise(30.0)
    ser = str(tmp_path / "ser.mp3")
    par = str(tmp_path / "par.mp3")
    _feed(he.Mp3Encoder(ser, RATE, 2, 192, flags=2), x)
    _feed(he.ParallelMp3Encoder(par, RATE, 2, 192, workers=2,
                                seg_seconds=5.0), x)
    _, fa = _frames(ser)
    _, fb = _frames(par)
    assert len(fa) == len(fb)
    # Audio frames (past the Info tag) are bit-identical.
    assert fa[1:] == fb[1:]
    # Decodes agree exactly and to the true length (gapless tag honored).
    a = hd.decode_file(ser)
    b = hd.decode_file(par)
    assert a.num_samples == b.num_samples
    np.testing.assert_array_equal(a.data, b.data)


def test_parallel_tag_totals_patched(tmp_path):
    import struct

    x = _noise(12.0)
    par = str(tmp_path / "par.mp3")
    _feed(he.ParallelMp3Encoder(par, RATE, 2, 160, workers=2,
                                seg_seconds=4.0), x)
    data, frames = _frames(par)
    tag = frames[0]
    assert he._is_info_tag(tag)
    magic = tag.find(b"Info")
    if magic < 0:
        magic = tag.find(b"Xing")
    flags = struct.unpack_from(">I", tag, magic + 4)[0]
    assert flags & 3 == 3
    n_frames = struct.unpack_from(">I", tag, magic + 8)[0]
    n_bytes = struct.unpack_from(">I", tag, magic + 12)[0]
    assert n_frames == len(frames) - 1   # audio frames, tag excluded
    assert n_bytes == len(data)


def test_parallel_short_clip_single_segment(tmp_path):
    """A clip shorter than one segment runs as a single (last) segment
    and still round-trips."""
    x = _noise(1.2, seed=9)
    par = str(tmp_path / "short.mp3")
    _feed(he.ParallelMp3Encoder(par, RATE, 2, 192, workers=2,
                                seg_seconds=24.0), x, blk=4096)
    d = hd.decode_file(par)
    assert abs(d.num_samples - x.shape[1]) <= 1152 * 2
    assert np.isfinite(d.data).all()


def test_parallel_requires_matching_rate(tmp_path):
    from nodey_tpu.core.errors import ProcessorRuntimeError

    with pytest.raises(ProcessorRuntimeError) as ei:
        he.ParallelMp3Encoder(str(tmp_path / "x.mp3"), 44_100, 2, 192)
    assert "in_rate == out_rate" in ei.value.message


def test_open_sink_selection(tmp_path, monkeypatch):
    """open_sink picks the segmented encoder only when >1 worker is
    effective AND no LAME-side resample is needed."""
    monkeypatch.setenv("NODEY_MP3_WORKERS", "4")
    s = he.open_sink(str(tmp_path / "a.mp3"), RATE, 2, 192, "flt")
    assert isinstance(s, he.ParallelMp3Encoder)
    s.close()
    # Rate mismatch: serial (LAME resamples internally).
    s = he.open_sink(str(tmp_path / "b.mp3"), 44_100, 2, 192, "flt")
    assert type(s) is he.Mp3Encoder
    s.close()
    monkeypatch.setenv("NODEY_MP3_WORKERS", "1")
    s = he.open_sink(str(tmp_path / "c.mp3"), RATE, 2, 192, "flt")
    assert type(s) is he.Mp3Encoder
    s.close()
    # WAV stays WAV.
    s = he.open_sink(str(tmp_path / "d.wav"), RATE, 2, 192, "flt")
    assert isinstance(s, he.WavWriter)
    s.close()


def test_serial_mp3_has_finalized_tag(tmp_path):
    """Every serial export now carries a real (finalized) Xing/Info frame
    — duration + gapless delay/padding — instead of LAME's zeroed
    placeholder (native close calls lame_get_lametag_frame)."""
    x = _noise(2.0, seed=5)
    ser = str(tmp_path / "tagged.mp3")
    _feed(he.Mp3Encoder(ser, RATE, 2, 192), x, blk=8192)
    data, frames = _frames(ser)
    assert he._is_info_tag(frames[0])
    # Gapless metadata honored by the decode path: length is exact.
    d = hd.decode_file(ser)
    assert abs(d.num_samples - x.shape[1]) <= 1152 * 2


def test_s16_wire_blocks_roundtrip(tmp_path):
    """int16 blocks (the streamed export's s16 master wire) pass through
    the segmented path with the same splice contract."""
    x = _noise(8.0, seed=11)
    ints = np.clip(np.trunc(x * 32768.0), -32768, 32767).astype(np.int16)
    ser = str(tmp_path / "s.mp3")
    par = str(tmp_path / "p.mp3")
    e1 = he.Mp3Encoder(ser, RATE, 2, 192, fmt="s16", flags=2)
    e2 = he.ParallelMp3Encoder(par, RATE, 2, 192, fmt="s16", workers=2,
                               seg_seconds=2.0)
    for s in range(0, ints.shape[1], 10_000):
        e1.write(ints[:, s:s + 10_000])
        e2.write(ints[:, s:s + 10_000])
    e1.close()
    e2.close()
    _, fa = _frames(ser)
    _, fb = _frames(par)
    assert fa[1:] == fb[1:]


def test_streamed_export_parallel_sink_end_to_end(tmp_path, monkeypatch):
    """VERDICT r4 #4 end to end: the STREAMING export pipeline
    (decode ∥ device ∥ d2h ∥ sink) composed with the segmented parallel
    LAME sink. Pins (a) that export_streamed actually routes through
    ParallelMp3Encoder when workers > 1, and (b) that the streamed file
    is BYTE-IDENTICAL to feeding the same master PCM straight into the
    segmented encoder with different block sizes — segmentation depends
    only on content position, never on the executor's chunking."""
    from nodey_tpu.core import registry
    from nodey_tpu.core.graph import Graph
    from nodey_tpu.core.runner import Runner
    from nodey_tpu.processors.audio_input import AudioInput
    from nodey_tpu.processors.audio_output import AudioOutput

    registry.register_all_processors()
    x = _noise(10.0)
    wav = tmp_path / "in.wav"
    hd.write_wav_s16(str(wav), x, RATE)

    def build():
        g = Graph()
        src = g.add_node(AudioInput())
        g.nodes[src].processor.file_paths = [str(wav)]
        g.update_node_pin(src)
        out = g.add_node(AudioOutput())
        g.add_link(
            g.nodes[src].pin_name_map["output_0"],
            g.nodes[out].pin_name_map["input"],
        )
        return g

    used = []
    real_open = he.open_sink

    def spy_open(*a, **k):
        s = real_open(*a, **k)
        used.append(type(s).__name__)
        return s

    monkeypatch.setattr(he, "open_sink", spy_open)
    monkeypatch.setenv("NODEY_MP3_WORKERS", "2")
    out2 = tmp_path / "w2.mp3"
    m = Runner(build()).export_streamed(str(out2), kbps=192)
    assert m.audio_seconds > 9.0
    assert used == ["ParallelMp3Encoder"]

    # Master PCM the device shipped (s16 wire): the same graph through
    # the wav sink, read back as RAW int16 — the exact blocks the mp3
    # sink saw.
    import wave as wave_mod

    mwav = tmp_path / "master.wav"
    Runner(build()).export_streamed(str(mwav), kbps=192)
    with wave_mod.open(str(mwav), "rb") as wf:
        assert wf.getframerate() == RATE and wf.getnchannels() == 2
        raw = np.frombuffer(
            wf.readframes(wf.getnframes()), dtype=np.int16
        ).reshape(-1, 2).T.copy()

    # Same PCM -> segmented encoder DIRECTLY, different block size:
    # byte-identical output proves segmentation depends only on content
    # position, never on the executor's chunking.
    ref = tmp_path / "direct.mp3"
    enc = he.ParallelMp3Encoder(str(ref), RATE, 2, 192, "s16", workers=2)
    _feed(enc, raw, blk=RATE // 2 + 331)
    assert out2.read_bytes() == ref.read_bytes()

    # Structural sanity: finalized segment-0 Info tag on the streamed file.
    data2, frames2 = _frames(out2)
    assert he._is_info_tag(frames2[0])
