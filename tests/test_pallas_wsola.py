"""Pallas WSOLA scoring kernel (ops/pallas_wsola.py) vs the NumPy chain.

Interpreter-mode check on CPU (SURVEY §4.4-style single-host validation);
the TPU A/B runs in bench.py. Small-rate geometry keeps interpret fast."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodey_tpu.ops import pallas_wsola
from nodey_tpu.ops import stretch as stretch_ops


def _numpy_chain(x, K, num, den, seq, seek, overlap):
    """Greedy splice chain with exact integer positions (the
    wsola_stretch_reference decision logic, bests recorded)."""
    C, N = x.shape
    stride = seq - overlap
    tail = x[:, :overlap].copy()
    bests = []
    for k in range(K):
        pos = (k * num + den // 2) // den
        window = x[:, pos : pos + seek + seq]
        if window.shape[1] < seek + seq:
            window = np.pad(
                window, ((0, 0), (0, seek + seq - window.shape[1]))
            )
        scores = np.empty(seek + 1, dtype=np.float64)
        for o in range(seek + 1):
            cand = window[:, o : o + overlap]
            corr = float((tail * cand).sum())
            energy = float((cand * cand).sum())
            scores[o] = corr / math.sqrt(energy + 1e-9)
        best = int(np.argmax(scores))
        seg = window[:, best : best + seq]
        tail = seg[:, stride : stride + overlap].copy()
        bests.append(best)
    return np.array(bests, dtype=np.int32)


@pytest.mark.parametrize("tempo", [1.25, 0.8])
def test_splice_offsets_match_numpy_chain(tempo):
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    stride = seq - overlap
    num = int(round(stride * tempo * 65536))
    den = 65536
    K = 10
    n = (K * num) // den + seek + seq + 16

    rng = np.random.default_rng(0)
    x = (0.4 * rng.standard_normal((2, n))).astype(np.float32)

    want = _numpy_chain(x, K, num, den, seq, seek, overlap)
    got = np.asarray(
        pallas_wsola.splice_offsets(
            jnp.asarray(x), K, num, den, seq, seek, overlap,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_score_table_shapes_and_masking():
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    n_cand = seek + 1
    num = int(round((seq - overlap) * 1.1 * 65536))
    K = 4
    n = (K * num) // 65536 + seek + seq + 16
    rng = np.random.default_rng(1)
    x = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
    table = np.asarray(
        pallas_wsola.wsola_score_table(
            jnp.asarray(x), K, num, 65536, seq, seek, overlap,
            interpret=True,
        )
    )
    a_of_p, _ = pallas_wsola._perm_tables(seek)
    a_of_p = np.asarray(a_of_p)
    # Every stored argmax maps to a REAL candidate offset (< n_cand).
    assert (a_of_p[table] < n_cand).all()
    # Frame 0's row is constant (head-scored, independent of tail row).
    assert (table[0] == table[0][0]).all()


def test_assemble_from_offsets_matches_blocked():
    """The offsets-based assembly (the path fed by the Pallas kernel on
    TPU) reproduces the XLA blocked path's samples given the same splice
    decisions."""
    from nodey_tpu.ops.stretch import (
        _assemble_from_offsets,
        _out_chunks,
        _wsola_blocked,
        _params,
    )

    rate = 8_000
    seq, seek, overlap = _params(rate)
    stride = seq - overlap
    tempo = 1.3
    num = int(round(stride * tempo * 65536))
    den = 65536
    rng = np.random.default_rng(2)
    n = 8_000 * 4
    K = _out_chunks(n, tempo, seq, overlap)
    last_pos = ((K - 1) * num + den // 2) // den
    x = jnp.asarray(
        np.pad(
            (0.4 * rng.standard_normal((2, n))).astype(np.float32),
            ((0, 0), (0, max(0, last_pos + seek + seq + 2 - n))),
        )
    )

    want = np.asarray(_wsola_blocked(x, K, num, den, seq, seek, overlap))
    bs = jnp.asarray(_numpy_chain(np.asarray(x), K, num, den, seq, seek,
                                  overlap))
    got = np.asarray(
        _assemble_from_offsets(x, bs, K, num, den, seq, seek, overlap)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1.2e-7)


@pytest.mark.parametrize("tempo", [1.25, 0.8])
def test_chain_kernel_matches_numpy_chain(tempo):
    """The serial-chain kernel (production TPU path) reproduces the exact
    greedy chain: one f32 score row per frame, b_prev carried in SMEM."""
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    stride = seq - overlap
    num = int(round(stride * tempo * 65536))
    K = 10
    n = (K * num) // 65536 + seek + seq + 16
    rng = np.random.default_rng(0)
    x = (0.4 * rng.standard_normal((2, n))).astype(np.float32)

    want = _numpy_chain(x, K, num, 65536, seq, seek, overlap)
    got = np.asarray(
        pallas_wsola.wsola_chain_pallas(
            jnp.asarray(x), K, num, 65536, seq, seek, overlap,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_chain_kernel_vmaps_via_lax_map():
    """vmap over clips (CompiledGraph.run_batch) must produce per-clip
    chains identical to running each clip alone."""
    import jax

    rate = 8000
    seq, seek, overlap = 320, 120, 64
    num, den = 5 * (seq - overlap), 4
    n = 4000
    rng = np.random.default_rng(7)
    xs = jnp.asarray(
        (0.3 * rng.standard_normal((3, 2, n))).astype(np.float32)
    )
    K = (n - seq - seek) * den // num

    def one(x):
        return pallas_wsola.wsola_chain_pallas(
            x, K, num, den, seq, seek, overlap, interpret=True
        )

    batched = jax.vmap(one)(xs)
    for b in range(3):
        np.testing.assert_array_equal(batched[b], one(xs[b]))


@pytest.mark.parametrize("kernel", ["chain", "table"])
def test_last_frame_window_not_clipped(kernel):
    """Regression: the input padded only to last_pos + seek + seq (what
    stretch._wsola_impl provides) must still give the LAST frames the same
    splices as a generously padded input — the kernels' lane-aligned DMA
    windows extend past seek+seq and used to clip cand_start at the end,
    scoring a left-shifted window."""
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    stride = seq - overlap
    num = int(round(stride * 1.25 * 65536))
    den = 65536
    K = 12
    last_pos = ((K - 1) * num + den // 2) // den
    n_tight = last_pos + seek + seq + 2          # stretch.py's exact pad
    rng = np.random.default_rng(3)
    x = (0.4 * rng.standard_normal((2, n_tight))).astype(np.float32)

    want = _numpy_chain(x, K, num, den, seq, seek, overlap)
    if kernel == "chain":
        got = np.asarray(pallas_wsola.wsola_chain_pallas(
            jnp.asarray(x), K, num, den, seq, seek, overlap,
            interpret=True,
        ))
    else:
        got = np.asarray(pallas_wsola.splice_offsets(
            jnp.asarray(x), K, num, den, seq, seek, overlap,
            interpret=True,
        ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "tempo,rate,K",
    [
        (1.25, 8_000, 14),
        (0.8, 8_000, 14),
        # 44.1 kHz geometry: stride 1412 is NOT lane-aligned — the fused
        # emit must still match (masked stores / slice-only stride use);
        # this is the production pitch-node path for 44.1 kHz sources.
        (1.0 / 2.0 ** (-3 / 12), 44_100, 6),
        (0.8, 44_100, 6),
    ],
)
def test_fused_assembly_matches_xla_assembly(tempo, rate, K):
    """The kernel-emitted audio must equal the XLA gather/overlap-add
    assembly fed the same splice offsets (and those offsets must match
    the separate offsets-only kernel)."""
    seq, seek, overlap = stretch_ops._params(rate)
    assert pallas_wsola.can_fuse_assembly(seq, overlap)
    stride = seq - overlap
    if rate == 44_100:
        assert stride % pallas_wsola.LANE != 0  # the geometry under test
    num = int(round(stride * tempo * 65536))
    den = 65536
    last_pos = ((K - 1) * num + den // 2) // den
    n = last_pos + seek + seq + 2
    rng = np.random.default_rng(9)
    x = (0.4 * rng.standard_normal((2, n))).astype(np.float32)

    bs, body = pallas_wsola.wsola_chain_assemble_pallas(
        jnp.asarray(x), K, num, den, seq, seek, overlap, interpret=True
    )
    bs_ref = pallas_wsola.wsola_chain_pallas(
        jnp.asarray(x), K, num, den, seq, seek, overlap, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(bs_ref))

    want = stretch_ops._assemble_from_offsets(
        jnp.asarray(x), bs_ref, K, num, den, seq, seek, overlap
    )
    np.testing.assert_array_equal(np.asarray(body), np.asarray(want))


def test_fused_assembly_vmaps():
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    stride = seq - overlap
    num, den = 5 * stride, 4
    K = 6
    n = ((K - 1) * num + den // 2) // den + seek + seq + 2
    rng = np.random.default_rng(10)
    xs = jnp.asarray(
        (0.3 * rng.standard_normal((2, 2, n))).astype(np.float32)
    )

    def one(x):
        return pallas_wsola.wsola_chain_assemble_pallas(
            x, K, num, den, seq, seek, overlap, interpret=True
        )

    bs_b, body_b = jax.vmap(one)(xs)
    for b in range(2):
        bs1, body1 = one(xs[b])
        np.testing.assert_array_equal(bs_b[b], bs1)
        np.testing.assert_array_equal(body_b[b], body1)


@pytest.mark.parametrize("F", [2, 4])
def test_score_table_frames_per_step_bitwise(F):
    """Batching F independent frames per grid step (VERDICT r4 #6: the
    fixed ~0.95 us/step cost amortization) must leave the argmax table
    BITWISE identical — per-frame GEMM operands and reduction order are
    unchanged; K not divisible by F exercises the padded tail."""
    rate = 8_000
    seq, seek, overlap = stretch_ops._params(rate)
    num = int(round((seq - overlap) * 1.2 * 65536))
    for K in (5, 8):
        n = (K * num) // 65536 + seek + seq + 16
        rng = np.random.default_rng(K)
        x = (0.3 * rng.standard_normal((2, n))).astype(np.float32)
        base = np.asarray(
            pallas_wsola.wsola_score_table(
                jnp.asarray(x), K, num, 65536, seq, seek, overlap,
                interpret=True, frames_per_step=1,
            )
        )
        batched = np.asarray(
            pallas_wsola.wsola_score_table(
                jnp.asarray(x), K, num, 65536, seq, seek, overlap,
                interpret=True, frames_per_step=F,
            )
        )
        np.testing.assert_array_equal(base, batched)


def test_score_frames_per_step_env(monkeypatch):
    monkeypatch.setenv("NODEY_WSOLA_FPS", "4")
    assert pallas_wsola.score_frames_per_step() == 4
    monkeypatch.setenv("NODEY_WSOLA_FPS", "99")
    assert pallas_wsola.score_frames_per_step() == 8  # clamped
    monkeypatch.setenv("NODEY_WSOLA_FPS", "bogus")
    assert pallas_wsola.score_frames_per_step(3) == 3
    monkeypatch.delenv("NODEY_WSOLA_FPS")
    assert pallas_wsola.score_frames_per_step() == 1
