"""End-to-end streaming executor (core/stream_executor.py): decode-ahead
threads, overlapped device stepping and egress, LAME sink — with bounded
memory and outputs matching the offline whole-clip paths."""

import os

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner
from nodey_tpu.core.stream_executor import StreamExecutor
from nodey_tpu.core.streaming import StreamingSession
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host import native_lib
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.velocity import PitchModifier

from conftest import make_tone, snr_db


def _pin(g, n, p):
    return g.nodes[n].pin_name_map[p]


def _two_track_graph(paths):
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.4)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    g.nodes[amix].processor.volumes = [0.6, 0.4]
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vol, "input"))
    g.add_link(_pin(g, vol, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))
    return g


def _write_fixtures(tmp_path, seconds=3.0):
    paths = []
    for i, freq in enumerate((220.0, 330.0)):
        tone = make_tone(rate=44_100, seconds=seconds, freq=freq, channels=2)
        p = str(tmp_path / f"t{i}.wav")
        host_decode.write_wav_s16(p, tone, 44_100)
        paths.append(p)
    return paths


def test_streamed_export_matches_offline_master(tmp_path):
    """A clip spanning several chunk windows exports through the streaming
    executor with the same master samples as the offline fused render."""
    paths = _write_fixtures(tmp_path, seconds=3.0)
    g = _two_track_graph(paths)

    offline = Runner(g).render(mode="export")
    ref = offline.master

    blocks = []
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.7)
    metrics = ex.run(sink=lambda b: blocks.append(b.copy()))
    got = np.concatenate(blocks, axis=1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-7)
    assert metrics.steps >= 4  # genuinely chunked
    assert metrics.audio_seconds == pytest.approx(
        offline.metrics.audio_seconds, abs=1e-6
    )
    # Live-introspection hook (the per-link fill gauges of the reference
    # overlay, app.cpp:1574-1595): stage-queue stats stay readable from a
    # polling thread, including after the run drains.
    stats = ex.live_stats()
    assert stats["steps"] == metrics.steps
    for key in ("decode_fill", "egress_fill", "host_fill"):
        assert 0.0 <= stats[key] <= 1.0
    # Per-source run states: after the run drains, every source is done.
    assert len(stats["sources"]) == 2
    for key, src_stats in stats["sources"].items():
        assert key.startswith("n") and ":output_" in key
        assert src_stats["done"] is True


def test_streamed_export_mp3_roundtrip(tmp_path):
    if native_lib.load() is None:
        pytest.skip("native host runtime unavailable")
    paths = _write_fixtures(tmp_path, seconds=2.0)
    g = _two_track_graph(paths)
    out_path = str(tmp_path / "out.mp3")
    metrics = Runner(g).export_streamed(out_path, kbps=192)
    assert os.path.getsize(out_path) > 1000
    assert metrics.audio_seconds > 1.9
    assert metrics.rtf > 0


def test_streamed_export_matches_offline_mp3_bytes(tmp_path):
    """For an s16-fmt master (gain-only graph, no rate change) the s16
    wire format (int16 h2d + on-device clip(trunc(x*32768)) d2h) must
    leave the exported MP3 byte-identical to the offline path, whose
    Mp3Encoder quantizes the f32 master host-side with the same
    semantics. (flt-fmt masters — mixers/resamplers — only promise
    ulp-level PCM parity between chunked and whole-clip execution, not
    byte-equal MP3s.)"""
    if native_lib.load() is None:
        pytest.skip("native host runtime unavailable")
    registry.register_all_processors()
    rate = 48_000
    path = str(tmp_path / "in.wav")
    host_decode.write_wav_s16(
        path, make_tone(rate=rate, seconds=2.0, channels=2), rate
    )
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [path]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(1.4)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vol, "input"))
    g.add_link(_pin(g, vol, "output"), _pin(g, out, "input"))

    offline_path = str(tmp_path / "offline.mp3")
    streamed_path = str(tmp_path / "streamed.mp3")
    Runner(g).export(offline_path, kbps=192)
    Runner(g).export_streamed(streamed_path, kbps=192, chunk_seconds=0.5)
    with open(offline_path, "rb") as f:
        offline_bytes = f.read()
    with open(streamed_path, "rb") as f:
        streamed_bytes = f.read()
    assert offline_bytes == streamed_bytes


def test_streamed_export_time_variant_graph(tmp_path):
    """WSOLA graphs — rejected by overlap-discard chunking — stream end to
    end and match the offline render."""
    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=2.0)[:1]
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = paths
    g.update_node_pin(src)
    pit = g.add_node(PitchModifier())
    g.nodes[pit].processor.pitch = -2.0
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, pit, "input"))
    g.add_link(_pin(g, pit, "output"), _pin(g, out, "input"))

    offline = Runner(g).render(mode="export")
    ref = offline.master

    blocks = []
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.5)
    ex.run(sink=lambda b: blocks.append(b.copy()))
    got = np.concatenate(blocks, axis=1)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_streamed_export_chained_time_variant(tmp_path):
    """TWO chained WSOLA stages (velocity -> pitch, config-4 shape) plus
    a trailing resample stream end to end and match the offline render —
    the adversarial case for cascaded device-FIFO carries."""
    from nodey_tpu.processors.resample_node import AudioResample
    from nodey_tpu.processors.velocity import VelocityModifier

    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=2.0)[:1]
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = paths
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(0.8)
    g.nodes[vel].processor.keep_pitch = True
    pit = g.add_node(PitchModifier())
    g.nodes[pit].processor.pitch = 3.0
    rs = g.add_node(AudioResample())
    g.nodes[rs].processor.set_target_rate(48_000)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vel, "input"))
    g.add_link(_pin(g, vel, "output"), _pin(g, pit, "input"))
    g.add_link(_pin(g, pit, "output"), _pin(g, rs, "input"))
    g.add_link(_pin(g, rs, "output"), _pin(g, out, "input"))

    offline = Runner(g).render(mode="export")
    ref = offline.master

    blocks = []
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.4)
    metrics = ex.run(sink=lambda b: blocks.append(b.copy()))
    got = np.concatenate(blocks, axis=1)

    assert metrics.steps >= 4
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-6)


def test_streamed_preview_session_bounded(tmp_path):
    """StreamingSession default (streamed) mode: chunk-by-chunk preview
    equals the whole-clip preview master."""
    paths = _write_fixtures(tmp_path, seconds=2.0)
    g = _two_track_graph(paths)

    offline = Runner(g).render(mode="preview")
    ref = offline.master

    session = StreamingSession(g).start(streamed=True)
    blocks = list(session.blocks())
    got = np.concatenate(blocks, axis=1)
    assert got.shape == ref.shape
    assert snr_db(ref, got) > 120.0


def test_streamed_executor_stop_midway(tmp_path):
    paths = _write_fixtures(tmp_path, seconds=3.0)
    g = _two_track_graph(paths)
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.25)
    seen = []

    def sink(block):
        seen.append(block)
        if len(seen) == 2:
            ex.stop()

    ex.run(sink=sink)
    assert 2 <= len(seen) < 12  # stopped early, not the full clip


def test_streamed_mixer_rejects_mismatched_cadence(tmp_path):
    """A velocity-changed branch mixed with a raw branch cannot stream in
    lockstep (the fast branch's alignment FIFO would overflow silently);
    plan time must raise the structured error instead."""
    from nodey_tpu.core.errors import ProcessorRuntimeError
    from nodey_tpu.processors.velocity import VelocityModifier

    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=1.0)
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(2.0)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vel, "input"))
    g.add_link(_pin(g, vel, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    ex = StreamExecutor(g, mode="export", chunk_seconds=0.25)
    with pytest.raises(ProcessorRuntimeError, match="different rates"):
        ex.run(sink=lambda b: None)


def test_streamed_mixer_accepts_pitch_branch(tmp_path):
    """Pitch shift preserves duration (tempo x transpose cancel), so a
    pitch branch into a mixer still streams — and matches offline."""
    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=1.0)
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)
    pit = g.add_node(PitchModifier())
    g.nodes[pit].processor.pitch = 3.0
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, pit, "input"))
    g.add_link(_pin(g, pit, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    blocks = []
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.25)
    ex.run(sink=lambda b: blocks.append(b.copy()))
    got = np.concatenate(blocks, axis=1)

    offline = Runner(g).render(mode="export")
    ref = np.asarray(offline.master)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_export_streamed_falls_back_offline_for_mismatched_cadence(tmp_path):
    """`run --stream --export` of a velocity-mix graph must still produce a
    correct MP3: the streamed path rejects lockstep execution and
    export_streamed silently falls back to the offline pipeline."""
    from nodey_tpu.processors.velocity import VelocityModifier

    if native_lib.load() is None:
        pytest.skip("native host runtime unavailable")
    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=1.0)
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(2.0)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vel, "input"))
    g.add_link(_pin(g, vel, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    streamed_path = str(tmp_path / "fallback.mp3")
    offline_path = str(tmp_path / "offline.mp3")
    m = Runner(g).export_streamed(streamed_path, kbps=192)
    assert m.audio_seconds > 0.9
    Runner(g).export(offline_path, kbps=192)
    with open(streamed_path, "rb") as f1, open(offline_path, "rb") as f2:
        assert f1.read() == f2.read()


def test_streamed_preview_falls_back_for_mismatched_cadence(tmp_path):
    """The editor preview of a velocity-mix graph must still play: the
    streamed session detects UnstreamableGraphError before any block and
    reroutes through the whole-clip path."""
    from nodey_tpu.processors.velocity import VelocityModifier

    registry.register_all_processors()
    paths = _write_fixtures(tmp_path, seconds=1.0)
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = list(paths)
    g.update_node_pin(src)
    vel = g.add_node(VelocityModifier())
    g.nodes[vel].processor.set_velocity(2.0)
    amix = g.add_node(AudioAmix())
    g.nodes[amix].processor.set_input_num(2)
    out = g.add_node(AudioOutput())
    g.add_link(_pin(g, src, "output_0"), _pin(g, vel, "input"))
    g.add_link(_pin(g, vel, "output"), _pin(g, amix, "input_1"))
    g.add_link(_pin(g, src, "output_1"), _pin(g, amix, "input_2"))
    g.add_link(_pin(g, amix, "output"), _pin(g, out, "input"))

    session = StreamingSession(g).start(streamed=True)
    blocks = list(session.blocks())
    assert not session._producer_errors
    got = np.concatenate(blocks, axis=1)

    ref = Runner(g).render(mode="preview").master
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_batched_dispatch_bitwise_equals_unbatched(tmp_path, monkeypatch):
    """batch_steps scans k chunk steps into one device dispatch
    (chunkflow.compile_stream_graph batch_steps): the scan body is the
    same traced step, so the exported MP3 is BYTE-identical to the
    k=1 pipeline — including a mid-batch source EOF (tracks of unequal
    length) and a growing delay tail whose flush crosses batch
    boundaries."""
    import subprocess  # noqa: F401  (parity with other tests' imports)

    from nodey_tpu.processors.delay import AudioDelay

    paths = _write_fixtures(tmp_path, seconds=3.0)
    # Unequal lengths: track 1 ends mid-batch relative to track 0.
    short = make_tone(rate=44_100, seconds=1.3, freq=550.0, channels=2)
    host_decode.write_wav_s16(paths[1], short, 44_100)

    def build():
        g = _two_track_graph(paths)
        # Insert a delay before the output: grows the master by the echo
        # tail, so the post-EOF flush phase spans multiple batches.
        out_node = next(
            nid for nid, n in g.nodes.items()
            if n.processor.info().identifier == "audio_output"
        )
        amix = next(
            nid for nid, n in g.nodes.items()
            if n.processor.info().identifier == "audio_amix"
        )
        link = next(
            lid for lid, l in g.links.items()
            if g.pins[l.to_pin].parent == out_node
        )
        g.remove_link(link)
        dly = g.add_node(AudioDelay())
        g.nodes[dly].processor.set_param("delay_ms", 180.0)
        g.nodes[dly].processor.set_param("feedback", 0.5)
        g.add_link(_pin(g, amix, "output"), _pin(g, dly, "input"))
        g.add_link(_pin(g, dly, "output"), _pin(g, out_node, "input"))
        return g

    p1 = str(tmp_path / "k1.mp3")
    pk = str(tmp_path / "k3.mp3")
    monkeypatch.setenv("NODEY_STREAM_BATCH", "1")
    m1 = Runner(build()).export_streamed(p1, kbps=192, chunk_seconds=0.4)
    monkeypatch.setenv("NODEY_STREAM_BATCH", "3")
    mk = Runner(build()).export_streamed(pk, kbps=192, chunk_seconds=0.4)
    assert abs(m1.audio_seconds - mk.audio_seconds) < 1e-6
    with open(p1, "rb") as f1, open(pk, "rb") as f2:
        assert f1.read() == f2.read()


def test_batched_dispatch_collects_spectra(tmp_path, monkeypatch):
    """Frame-tap outputs (spectrum) stack per batch and unstack at the
    final bulk fetch; batched == unbatched spectra."""
    import numpy as np

    from nodey_tpu.core.stream_executor import StreamExecutor
    from nodey_tpu.processors.spectrum import AudioSpectrum

    paths = _write_fixtures(tmp_path, seconds=2.0)
    def build():
        g = _two_track_graph(paths)
        out_node = next(
            nid for nid, n in g.nodes.items()
            if n.processor.info().identifier == "audio_output"
        )
        amix = next(
            nid for nid, n in g.nodes.items()
            if n.processor.info().identifier == "audio_amix"
        )
        link = next(
            lid for lid, l in g.links.items()
            if g.pins[l.to_pin].parent == out_node
        )
        g.remove_link(link)
        spec = g.add_node(AudioSpectrum())
        g.add_link(_pin(g, amix, "output"), _pin(g, spec, "input"))
        g.add_link(_pin(g, spec, "output"), _pin(g, out_node, "input"))
        return g

    def run(batch):
        ex = StreamExecutor(
            build(), mode="export", chunk_seconds=0.5,
            master_wire="f32", collect_frames=True, batch_steps=batch,
        )
        blocks = []
        ex.run(lambda b: blocks.append(b.copy()))
        return np.concatenate(blocks, axis=1), dict(ex.spectra)

    m1, s1 = run(1)
    mk, sk = run(3)
    np.testing.assert_array_equal(m1, mk)
    assert set(s1) == set(sk) and s1
    for key in s1:
        np.testing.assert_array_equal(s1[key], sk[key])


def test_per_edge_fifo_gauges(tmp_path):
    """Per-edge chunk-flow FIFO fills surface through live_stats (VERDICT
    r2 #7 — the reference's per-link occupancy overlay,
    app.cpp:1574-1595): a 2-track amix graph carries merge FIFOs, so the
    compiled step emits a __gauges__ vector and live_stats resolves it
    as {\"<node>/<state path>\": fill}."""
    import numpy as np

    from nodey_tpu.core.stream_executor import StreamExecutor

    paths = _write_fixtures(tmp_path, seconds=2.0)
    g = _two_track_graph(paths)
    ex = StreamExecutor(g, mode="export", chunk_seconds=0.25)
    polled = {}

    def sink(block):
        # Poll mid-run, like the UI would.
        stats = ex.live_stats()
        if "edges" in stats:
            polled.update(stats["edges"])

    ex.run(sink)
    assert ex._gauge_keys, "amix graph should carry merge FIFOs"
    assert polled, "live_stats never surfaced edge gauges mid-run"
    for key, fill in polled.items():
        nid = int(key.split("/")[0])
        assert nid in g.nodes
        assert 0.0 <= fill <= 1.0


def test_rss_guard_records_peak_and_enforces_hard_ceiling(
    tmp_path, monkeypatch
):
    """Long-export memory guard (ROUND3.md §12 relay RSS creep): the pump
    thread samples host RSS, records the high-water mark in the metrics,
    and a crossed NODEY_RSS_HARD_MB ceiling fails the run with the
    structured 3-part error instead of growing until the OOM killer."""
    paths = _write_fixtures(tmp_path, seconds=2.0)
    g = _two_track_graph(paths)

    ex = StreamExecutor(g, mode="export", chunk_seconds=0.5)
    metrics = ex.run(sink=lambda b: None)
    # Any real process has tens of MB resident; the guard sampled it.
    assert metrics.rss_peak_bytes > 10 * 2**20
    assert ex.live_stats()["rss_peak_bytes"] == metrics.rss_peak_bytes

    # The Runner surfaces the peak on RunMetrics for both paths.
    rm = Runner(g).export_streamed(str(tmp_path / "guard.wav"))
    assert rm.rss_peak_bytes > 10 * 2**20
    off = Runner(g).render(mode="export")
    assert off.metrics.rss_peak_bytes > 10 * 2**20

    # Enforced ceiling: 1 MB is below any real RSS, so the guard trips
    # on its very first check, before any chunk is pumped.
    from nodey_tpu.core.errors import ProcessorRuntimeError

    monkeypatch.setenv("NODEY_RSS_HARD_MB", "1")
    ex2 = StreamExecutor(g, mode="export", chunk_seconds=0.5)
    with pytest.raises(ProcessorRuntimeError) as ei:
        ex2.run(sink=lambda b: None)
    assert "memory ceiling" in str(ei.value)
