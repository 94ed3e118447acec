"""Cancellation parity for offline runs (VERDICT r2 #5).

The reference tears down a running preview/export at ANY moment: per-node
stop tokens are checked in every hot loop and the Runner destructor joins
the fibers (reference: src/infra/runner.cpp:53-63, checked e.g.
src/processor/audio-io.cpp:173), after which the app returns to Editing
with no error popup (src/frontend/app.cpp:1949-1957).

Here the analog is ``Runner.stop()``: chunk-granular in every path —
between the offline stages (decode/compile/dispatch), per egress block in
``export()``, and inside the streaming executor's bounded-queue loops.
A cancelled run raises :class:`RunCancelled`, removes the partial output
file, and lands the runner back in READY (Ready-after-teardown), reusable
for the next run.
"""

import os

import numpy as np
import pytest

from nodey_tpu.core import registry
from nodey_tpu.core.errors import RunCancelled
from nodey_tpu.core.runner import Runner, RunnerState
from nodey_tpu.host import decode as host_decode

from conftest import make_tone
from test_e2e import build_config1_graph

registry.register_all_processors()


@pytest.fixture
def long_tone_wav(tmp_path):
    """A clip long enough that exports span many blocks/chunks."""
    data = make_tone(rate=44_100, seconds=8.0, freq=330.0, channels=2)
    path = tmp_path / "long.wav"
    host_decode.write_wav_s16(str(path), data, 44_100)
    return str(path)


def test_offline_export_cancels_mid_encode(long_tone_wav, tmp_path):
    g = build_config1_graph(long_tone_wav, 1.2)
    runner = Runner(g)
    out = str(tmp_path / "cancelled.mp3")
    seen = []

    def progress(seconds: float) -> None:
        seen.append(seconds)
        runner.stop()  # cancel after the first encoded block

    with pytest.raises(RunCancelled):
        runner.export(out, kbps=192, progress=progress, block_seconds=0.5)
    # Ready-after-teardown, no error, no partial artifact.
    assert runner.state is RunnerState.READY
    assert runner.error is None
    assert not os.path.exists(out)
    assert len(seen) >= 1  # it DID start encoding before the cancel


def test_streamed_export_cancels(long_tone_wav, tmp_path):
    g = build_config1_graph(long_tone_wav, 0.9)
    runner = Runner(g)
    out = str(tmp_path / "cancelled_streamed.wav")

    def progress(seconds: float) -> None:
        runner.stop()

    with pytest.raises(RunCancelled):
        runner.export_streamed(out, progress=progress, chunk_seconds=0.5)
    assert runner.state is RunnerState.READY
    assert not os.path.exists(out)


def test_stop_before_dispatch_cancels_render(long_tone_wav, tmp_path):
    """A stop landing between the decode and device stages is honored
    (stage-granular checks inside render)."""
    g = build_config1_graph(long_tone_wav, 1.0)
    runner = Runner(g)
    orig = runner._decode_inputs

    def stopping_decode():
        res = orig()
        runner.stop()
        return res

    runner._decode_inputs = stopping_decode
    with pytest.raises(RunCancelled):
        runner.render(mode="export", _nested=True)
    assert runner.state is RunnerState.READY


def test_runner_reusable_after_cancel(long_tone_wav, tmp_path):
    """The same Runner completes a full export after a cancelled one —
    the stop token is per-run, not sticky (reference: a fresh Runner per
    create_and_run; ours resets at each public entry)."""
    g = build_config1_graph(long_tone_wav, 1.1)
    runner = Runner(g)
    out1 = str(tmp_path / "a.wav")
    out2 = str(tmp_path / "b.wav")

    def cancel_once(seconds: float) -> None:
        runner.stop()

    with pytest.raises(RunCancelled):
        runner.export(out1, progress=cancel_once, block_seconds=0.5)
    assert runner.state is RunnerState.READY

    metrics = runner.export(out2, block_seconds=0.5)
    assert runner.state is RunnerState.FINISHED
    assert metrics.audio_seconds == pytest.approx(8.0, abs=0.1)
    decoded = host_decode.decode_file(out2)
    assert decoded.num_samples > 0
    assert np.isfinite(decoded.data).all()
