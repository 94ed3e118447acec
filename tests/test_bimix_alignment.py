"""bimix_v2 time-alignment goldens mirroring the reference's alignment
engine cases (reference: src/processor/audio-bimix.cpp:776-872).

The reference aligns per-frame at runtime: earlier/later stream
classification (:776-792), whole-frame emission when disjoint (:793-810),
zero-fill of the unaligned head plus paired fill of the overlap (:813-850),
drop_samples bookkeeping (:852-868), and a one-sided tail flush after either
EOF (:731-775). In this framework every decoded stream is a continuous
sample grid from its start timestamp (the native decoder zero-fills pts
discontinuities at ingest — host/native/decode.cpp — so mid-stream
re-alignment is unreachable by construction), which reduces the engine to
static placement: side s lands at round((t0_s - min_t0) * rate) with zeros
elsewhere. These tests pin that algebra to NumPy goldens for each reference
case, on both the offline compiler and the chunk-flow streaming path.

Rounding note (reference :817-824 uses std::round, half away from zero;
Python round() is half-to-even): with integer-microsecond timestamps at
48 kHz an exact .5-sample offset cannot occur (48*t ≡ 500 (mod 1000) has no
integer solution), so the two rounding modes agree on every reachable
input.
"""

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core import chunkflow, compiler, registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.bimix import AudioBimixV2

RATE = 48_000


def _graph():
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["l.wav", "r.wav"]
    g.update_node_pin(src)
    merge = g.add_node(AudioBimixV2())
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(merge, "input_l"))
    g.add_link(pin(src, "output_1"), pin(merge, "input_r"))
    g.add_link(pin(merge, "output"), pin(out, "input"))
    return g, src


def _run(g, src, left, right, t0_l_us, t0_r_us):
    arrays, lengths, sources = {}, {}, {}
    for pin, data, t0 in (
        ("output_0", left, t0_l_us), ("output_1", right, t0_r_us)
    ):
        key = compiler.external_key(src, pin)
        arrays[key] = data
        lengths[key] = data.shape[1]
        sources[(src, pin)] = compiler.SourceSpec(
            rate=RATE, channels=2, fmt="flt", capacity=data.shape[1],
            t0_us=t0,
        )
    compiled = compiler.compile_graph(g, sources, mode="export")
    out = compiled.run(arrays, lengths)
    master, length = out["master"]
    return np.asarray(master)[:, : int(length)]


def _golden(left, right, t0_l_us, t0_r_us):
    """The reference alignment semantics on continuous grids: place each
    side's mono downmix at its rounded start offset; zeros elsewhere."""
    t0 = min(t0_l_us, t0_r_us)
    off_l = round((t0_l_us - t0) * 1e-6 * RATE)
    off_r = round((t0_r_us - t0) * 1e-6 * RATE)
    mono_l = (left[0] + left[1]) * np.float32(0.5)
    mono_r = (right[0] + right[1]) * np.float32(0.5)
    n = max(off_l + mono_l.shape[0], off_r + mono_r.shape[0])
    out = np.zeros((2, n), dtype=np.float32)
    out[0, off_l : off_l + mono_l.shape[0]] = mono_l
    out[1, off_r : off_r + mono_r.shape[0]] = mono_r
    return out


def _sig(n, seed, amp=0.5):
    rng = np.random.default_rng(seed)
    return (amp * rng.standard_normal((2, n))).astype(np.float32)


def test_disjoint_frames():
    """Reference :793-810: the earlier stream's frames emit alone (other
    channel zero) while the ranges are disjoint — here: left [0, 0.2 s),
    right [0.5 s, 0.7 s), with a zero gap between."""
    g, src = _graph()
    left = _sig(RATE // 5, 1)
    right = _sig(RATE // 5, 2)
    got = _run(g, src, left, right, 0.0, 500_000.0)
    want = _golden(left, right, 0.0, 500_000.0)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    # The gap region [0.2 s, 0.5 s) is silent on both channels.
    gap = got[:, RATE // 5 : RATE // 2]
    np.testing.assert_array_equal(gap, 0.0)


def test_partial_overlap_head_fill():
    """Reference :813-850: the earlier stream's unaligned head fills with
    zeros on the later channel; the overlap pairs both."""
    g, src = _graph()
    left = _sig(RATE, 3)             # [0, 1.0 s)
    right = _sig(RATE, 4)            # [0.25 s, 1.25 s)
    got = _run(g, src, left, right, 0.0, 250_000.0)
    want = _golden(left, right, 0.0, 250_000.0)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    head = got[1, : RATE // 4]
    np.testing.assert_array_equal(head, 0.0)       # later channel head-fill
    assert np.abs(got[0, : RATE // 4]).max() > 0   # earlier plays alone


def test_fractional_sample_rounding():
    """Reference :817-824 rounds (later_begin - earlier_begin) * rate; an
    offset of 13021 us at 48 kHz is 625.008 samples -> 625."""
    g, src = _graph()
    left = _sig(2048, 5)
    right = _sig(2048, 6)
    got = _run(g, src, left, right, 0.0, 13_021.0)
    want = _golden(left, right, 0.0, 13_021.0)
    assert round(13_021e-6 * RATE) == 625
    assert got.shape[1] == 625 + 2048
    np.testing.assert_array_equal(got, want)


def test_one_sided_tail_flush():
    """Reference :731-775: after one side's EOF the other flushes alone
    (opposite channel zero)."""
    g, src = _graph()
    left = _sig(RATE, 7)             # 1.0 s
    right = _sig(RATE // 4, 8)       # 0.25 s, ends first
    got = _run(g, src, left, right, 0.0, 0.0)
    want = _golden(left, right, 0.0, 0.0)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    tail = got[:, RATE // 4 :]
    np.testing.assert_array_equal(tail[1], 0.0)    # right silent
    assert np.abs(tail[0]).max() > 0               # left flushes alone


def test_streamed_placement_matches_offline_golden():
    """The chunk-flow path realizes the same placement via FIFO silence
    prefills (processors/bimix.py), chunk cadence notwithstanding."""
    g, src = _graph()
    left = _sig(RATE, 9)
    right = _sig(RATE // 2, 10)
    t0_r = 250_000.0
    want = _golden(left, right, 0.0, t0_r)

    chunk = 4800
    sources = {
        (src, "output_0"): compiler.SourceSpec(
            rate=RATE, channels=2, fmt="flt", capacity=chunk, t0_us=0.0
        ),
        (src, "output_1"): compiler.SourceSpec(
            rate=RATE, channels=2, fmt="flt", capacity=chunk, t0_us=t0_r
        ),
    }
    sc = chunkflow.compile_stream_graph(g, sources, mode="export")
    states = sc.init_states
    full = {
        compiler.external_key(src, "output_0"): left,
        compiler.external_key(src, "output_1"): right,
    }
    pos = {k: 0 for k in sc.input_keys}
    pieces = []
    done = False
    guard = 0
    while not done and guard < 60:
        args = {}
        for key in sc.input_keys:
            data = full[key]
            p = pos[key]
            n = min(chunk, data.shape[1] - p)
            block = np.zeros((2, chunk), dtype=np.float32)
            if n > 0:
                block[:, :n] = data[:, p : p + n]
            pos[key] = p + max(n, 0)
            args[key] = (
                jnp.asarray(block), jnp.int32(max(n, 0)),
                jnp.bool_(pos[key] >= data.shape[1]),
            )
        states, outs = sc.step(states, args)
        data, n, odone = outs["master"]
        if int(n):
            pieces.append(np.asarray(data)[:, : int(n)])
        done = bool(odone)
        guard += 1
    got = np.concatenate(pieces, axis=1)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
