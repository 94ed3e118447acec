"""Streaming op steps (ops/chunkops.py) vs their offline counterparts.

Each stateful streaming kernel must reproduce the offline fused-program op
bitwise: identical windows through identical kernels (SURVEY.md §7 hard part
3 — carrying resampler/WSOLA state across blocks without approximation).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nodey_tpu.ops import chunkops, resample as resample_ops, stft as stft_ops
from nodey_tpu.ops import stretch as stretch_ops

from conftest import make_tone


def _stream_all(step_fn, init_state, data, chunk, flush_extra=8):
    """Drive a streaming step over `data` in `chunk`-sized pushes, then flush
    with empty pushes until done. Returns concatenated valid output."""
    C, N = data.shape
    state = init_state
    pieces = []
    done = False
    pos = 0
    steps = 0
    while not done:
        if pos < N:
            block = np.zeros((C, chunk), dtype=np.float32)
            n = min(chunk, N - pos)
            block[:, :n] = data[:, pos : pos + n]
            pos += n
            is_last = pos >= N
        else:
            block = np.zeros((C, chunk), dtype=np.float32)
            n = 0
            is_last = True
        state, out, out_n, out_done = step_fn(
            state, jnp.asarray(block), jnp.int32(n), jnp.bool_(is_last)
        )
        out_n = int(out_n)
        if out_n:
            pieces.append(np.asarray(out)[:, :out_n])
        done = bool(out_done)
        steps += 1
        assert steps < (N // chunk + 2) + flush_extra, "streaming stalled"
    return (
        np.concatenate(pieces, axis=1)
        if pieces
        else np.zeros((C, 0), dtype=np.float32)
    )


def test_fifo_roundtrip():
    state = chunkops.fifo_init(2, 64)
    a = np.arange(20, dtype=np.float32).reshape(2, 10)
    state = chunkops.fifo_push(state, jnp.asarray(a), 7)
    assert int(chunkops.fifo_level(state)) == 7
    win = np.asarray(chunkops.fifo_window(state, 10))
    np.testing.assert_array_equal(win[:, :7], a[:, :7])
    np.testing.assert_array_equal(win[:, 7:], 0)
    state = chunkops.fifo_advance(state, jnp.int32(3))
    assert int(chunkops.fifo_level(state)) == 4
    win = np.asarray(chunkops.fifo_window(state, 6))
    np.testing.assert_array_equal(win[:, :4], a[:, 3:7])
    np.testing.assert_array_equal(win[:, 4:], 0)


def test_streaming_resample_441_to_48_ulp_exact():
    rate_in, rate_out = 44_100, 48_000
    data = make_tone(rate=rate_in, seconds=0.8, channels=2)
    N = data.shape[1]
    ref = np.asarray(resample_ops.resample_data(data, rate_in, rate_out))
    n_out = -(-N * 160 // 147)

    chunk = 4096
    plan = chunkops.resample_plan(rate_in, rate_out, chunk)
    step = jax.jit(
        lambda s, d, n, done: chunkops.resample_stream_step(plan, s, d, n, done)
    )
    out = _stream_all(step, chunkops.resample_stream_init(plan, 2), data, chunk)
    assert out.shape[1] == n_out
    # GEMM reduction tiling is shape-dependent (streaming groups differ from
    # the offline patch matrix), so equality holds to the last ulp, not bit.
    np.testing.assert_allclose(out, ref[:, :n_out], rtol=0, atol=3e-7)


def test_streaming_resample_2205_to_48_grouped_r2():
    """22.05 kHz -> 48 kHz exercises the R=2 grouped superblock path
    (B = 64 uniform-shift slices) through the streaming FIFO."""
    rate_in, rate_out = 22_050, 48_000
    assert resample_ops.group_factor(320, 147) == 2
    data = make_tone(rate=rate_in, seconds=0.7, channels=2)
    N = data.shape[1]
    ref = np.asarray(resample_ops.resample_data(data, rate_in, rate_out))
    n_out = -(-N * 320 // 147)

    chunk = 2048
    plan = chunkops.resample_plan(rate_in, rate_out, chunk)
    step = jax.jit(
        lambda s, d, n, done: chunkops.resample_stream_step(plan, s, d, n, done)
    )
    out = _stream_all(step, chunkops.resample_stream_init(plan, 2), data, chunk)
    assert out.shape[1] == n_out
    np.testing.assert_allclose(out, ref[:, :n_out], rtol=0, atol=3e-7)


def test_streaming_resample_downsample_ulp_exact():
    rate_in, rate_out = 48_000, 32_000
    data = make_tone(rate=rate_in, seconds=0.5, channels=1)
    N = data.shape[1]
    ref = np.asarray(resample_ops.resample_data(data, rate_in, rate_out))
    n_out = -(-N * 2 // 3)

    chunk = 3000
    plan = chunkops.resample_plan(rate_in, rate_out, chunk)
    step = jax.jit(
        lambda s, d, n, done: chunkops.resample_stream_step(plan, s, d, n, done)
    )
    out = _stream_all(step, chunkops.resample_stream_init(plan, 1), data, chunk)
    assert out.shape[1] == n_out
    np.testing.assert_allclose(out, ref[:, :n_out], rtol=0, atol=3e-7)


def test_streaming_resample_partial_final_group():
    """Clip length not a multiple of M exercises the EOF flush rounding."""
    rate_in, rate_out = 44_100, 48_000
    data = make_tone(rate=rate_in, seconds=0.31, channels=2)
    data = data[:, : data.shape[1] - 37]
    N = data.shape[1]
    ref = np.asarray(resample_ops.resample_data(data, rate_in, rate_out))
    n_out = -(-N * 160 // 147)

    chunk = 2048
    plan = chunkops.resample_plan(rate_in, rate_out, chunk)
    step = jax.jit(
        lambda s, d, n, done: chunkops.resample_stream_step(plan, s, d, n, done)
    )
    out = _stream_all(step, chunkops.resample_stream_init(plan, 2), data, chunk)
    assert out.shape[1] == n_out
    np.testing.assert_allclose(out, ref[:, :n_out], rtol=0, atol=3e-7)


def test_streaming_stft_matches_offline_frames():
    rate = 48_000
    data = make_tone(rate=rate, seconds=0.7, channels=2)
    N = data.shape[1]
    n_fft, hop = 1024, 512
    ref = np.asarray(
        stft_ops.magnitude_spectrogram_reference(data, n_fft=n_fft, hop=hop)
    )
    frames_valid = (N - n_fft) // hop + 1

    chunk = 4000
    plan = chunkops.stft_plan(n_fft, hop, chunk)
    step = jax.jit(
        lambda s, d, n, done: chunkops.stft_stream_step(plan, s, d, n, done)
    )
    state = chunkops.stft_stream_init(plan, 2)
    frames = []
    pos = 0
    done = False
    while not done:
        block = np.zeros((2, chunk), dtype=np.float32)
        n = min(chunk, N - pos)
        if n > 0:
            block[:, :n] = data[:, pos : pos + n]
        pos += n
        is_last = pos >= N
        state, spec, f_n, out_done = step(
            state, jnp.asarray(block), jnp.int32(n), jnp.bool_(is_last)
        )
        f_n = int(f_n)
        if f_n:
            frames.append(np.asarray(spec)[:, :f_n, :])
        done = bool(out_done)
    got = np.concatenate(frames, axis=1)
    assert got.shape[1] == frames_valid
    np.testing.assert_allclose(got, ref[:, :frames_valid, :], atol=2e-3)


@pytest.mark.parametrize("path", ["scan", "pallas", "blocked"])
def test_streaming_wsola_vs_offline_ulp_exact(path, monkeypatch):
    """Streaming WSOLA equals the offline whole-clip stretch: same splice
    decisions, same exact output length, samples to 1 ulp (the overlap
    blend may or may not fuse into an FMA depending on compilation
    context). Runs ALL THREE chunk-step implementations: the conv scan
    (the CPU default), the Pallas chunk-chain kernel in interpret mode
    (the TPU streaming default — its executable persists in the compile
    cache across processes, re-measured in ROUND4.md §9), and the
    all-XLA blocked score-table chain (the fallback for geometries the
    Pallas kernel rejects)."""
    monkeypatch.setenv("NODEY_WSOLA_CHUNK_FORCE", path)
    rate = 48_000
    for tempo in (1.25, 0.8, 2.0):
        data = make_tone(rate=rate, seconds=1.1, channels=2)
        rng = np.random.default_rng(3)
        data = data + 0.05 * rng.standard_normal(data.shape).astype(np.float32)
        N = data.shape[1]

        ref_data, ref_len = stretch_ops.wsola_stretch_at_rate(
            jnp.asarray(data), jnp.int32(N), tempo, rate
        )
        ref_len = int(ref_len)
        ref = np.asarray(ref_data)[:, :ref_len]

        chunk = 6000
        plan = chunkops.wsola_plan(tempo, rate, chunk)
        step = jax.jit(
            lambda s, d, n, done, _p=plan: chunkops.wsola_stream_step(
                _p, s, d, n, done
            )
        )
        out = _stream_all(
            step, chunkops.wsola_stream_init(plan, 2), data, chunk,
            flush_extra=32,
        )
        assert out.shape[1] == ref_len, (tempo, out.shape, ref_len)
        np.testing.assert_allclose(out, ref, rtol=0, atol=1.2e-7)


def test_chunk_kernel_default_choice(monkeypatch):
    """TPU default is the Pallas serial chain (cross-process cache reuse
    re-verified on the production path, ROUND4.md §9); geometries the
    kernel rejects fall back to the blocked chain; CPU defaults to the
    conv scan. NODEY_WSOLA_CHUNK_FORCE overrides all of it."""
    monkeypatch.delenv("NODEY_WSOLA_CHUNK_FORCE", raising=False)
    plan = chunkops.wsola_plan(1.25, 48_000, 8192)
    assert plan.overlap % 8 == 0

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert chunkops._wsola_chunk_kernel(plan) == "pallas"
    # An off-lane overlap is outside the Pallas kernel's contract.
    bad = plan._replace(overlap=plan.overlap + 1)
    assert chunkops._wsola_chunk_kernel(bad) == "blocked"
    monkeypatch.setenv("NODEY_WSOLA_CHUNK_FORCE", "blocked")
    assert chunkops._wsola_chunk_kernel(plan) == "blocked"
    monkeypatch.delenv("NODEY_WSOLA_CHUNK_FORCE")

    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert chunkops._wsola_chunk_kernel(plan) == "scan"
