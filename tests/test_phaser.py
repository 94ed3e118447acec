"""Phaser (ops/phaser.py + processors/modulation.AudioPhaser).

Contract under test: the swept allpass coefficient is a pure function
of the global sample index via exact modular-integer LFO residues
(ops/modfx.py), and the per-stage recurrence — a first-order scan with
a TIME-VARYING pole — matches its float64 sequential mirror; wet-0 is a
bitwise passthrough; streamed == offline (per-stage scalar carries fold
in exactly through the scan's cumulative pole products); the sp chain
path reconstructs each stage's entering state via the cross-shard
affine prefix and matches single-device. Also pins ops/scans.tv_ar1_scan
against a sequential float64 recurrence directly.
"""

import json

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import phaser as ph
from nodey_tpu.ops.scans import tv_ar1_scan
from nodey_tpu.processors.modulation import AudioPhaser

from conftest import snr_db

RATE = 8_000


def noise(n, channels=2, seed=0):
    rng = np.random.default_rng(seed)
    return (0.4 * rng.standard_normal((channels, n))).astype(np.float32)


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


def _phaser(**params):
    p = AudioPhaser()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def test_tv_ar1_scan_matches_sequential_float64():
    """The time-varying-pole pair scan: y and the cumulative products
    both match a float64 sequential recurrence (poles drawn in the
    phaser's working range)."""
    rng = np.random.default_rng(1)
    n = 4_097                     # odd length exercises scan padding
    p = (0.90 + 0.099 * rng.random(n)).astype(np.float32)
    u = (0.5 * rng.standard_normal((2, n))).astype(np.float32)
    p_cum, y = tv_ar1_scan(jnp.asarray(u), jnp.asarray(p))
    yref = np.zeros((2, n))
    prev = np.zeros(2)
    for j in range(n):
        prev = p.astype(np.float64)[j] * prev + u.astype(np.float64)[:, j]
        yref[:, j] = prev
    assert snr_db(yref.astype(np.float32), np.asarray(y)) > 110.0
    # Cumulative products (log-domain compare: they decay fast).
    want = np.cumprod(p.astype(np.float64))
    got = np.asarray(p_cum)[0]
    keep = want > 1e-30
    np.testing.assert_allclose(
        got[keep], want[keep].astype(np.float32), rtol=5e-4
    )


def test_phaser_matches_float64():
    x = noise(16_000)
    ref = ph.phaser_reference(x, RATE, 0.7, 200.0, 3000.0, 4, 0.7, 1.0)
    out = np.asarray(ph.phaser_stream(
        _stream(x), 0.7, 200.0, 3000.0, 4, 0.7, 1.0
    ).data)
    assert snr_db(ref, out) > 105.0


def test_phaser_more_stages_and_band_clamp():
    """8 stages at a band that exceeds Nyquist for this rate: the spec
    clamps f_max to 0.45 * rate and the mirror still agrees."""
    x = noise(12_000, seed=3)
    ref = ph.phaser_reference(x, RATE, 2.0, 100.0, 9000.0, 8, 1.0, 0.7)
    out = np.asarray(ph.phaser_stream(
        _stream(x), 2.0, 100.0, 9000.0, 8, 1.0, 0.7
    ).data)
    assert snr_db(ref, out) > 100.0
    num, m, k0, k1 = ph.phaser_spec(RATE, 2.0, 100.0, 9000.0)
    assert np.isclose(np.exp(k0 + k1), 0.45 * RATE)


def test_phaser_wet0_bitwise():
    x = noise(4_000)
    out = np.asarray(ph.phaser_stream(
        _stream(x), 0.7, 200.0, 3000.0, 4, 0.0, 1.0
    ).data)
    np.testing.assert_array_equal(out, x)


def test_streamed_equals_offline_ops():
    """Raw op streaming at an uneven chunk width: the per-stage
    (x_prev, y_prev) carries + residue reproduce the offline scan to
    float32 re-association."""
    x = noise(20_000, seed=2)
    off = np.asarray(ph.phaser_stream(
        _stream(x), 0.8, 150.0, 2500.0, 6, 0.6, 0.9
    ).data)
    num, m, k0, k1 = ph.phaser_spec(RATE, 0.8, 150.0, 2500.0)
    params = (num, m, k0, k1, RATE, 6, 0.6, 0.9)
    state = ph.phaser_stream_init(2, 6)
    outs = []
    w = 1_536
    for i in range(0, x.shape[1], w):
        chunk = np.zeros((2, w), np.float32)
        k = min(w, x.shape[1] - i)
        chunk[:, :k] = x[:, i:i + k]
        state, o = ph.phaser_stream_step(
            params, state, jnp.asarray(chunk), jnp.int32(k)
        )
        outs.append(np.asarray(o)[:, :k])
    got = np.concatenate(outs, axis=1)
    assert snr_db(off, got) > 110.0
    # An all-padding chunk must leave the carry untouched.
    state2, _ = ph.phaser_stream_step(
        params, state, jnp.zeros((2, w), jnp.float32), jnp.int32(0)
    )
    np.testing.assert_array_equal(np.asarray(state2[0]),
                                  np.asarray(state[0]))
    np.testing.assert_array_equal(np.asarray(state2[1]),
                                  np.asarray(state[1]))
    assert int(state2[2]) == int(state[2])


def test_graph_offline_and_streamed():
    from test_chunkflow import run_offline, run_streamed
    from test_modfx import _node_graph

    x = noise(12_000, seed=9)
    g, src = _node_graph(_phaser(rate_hz=1.5, stages=4))
    src_arrays = {(src, "output_0"): (x, RATE, "f32")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    assert int(off_n) == x.shape[1]
    streamed, _ = run_streamed(g, src_arrays, chunk=2048)
    got = streamed["master"]
    assert snr_db(off, got) > 110.0


def test_sp_chain_matches_single_device():
    """Per-stage one-sample halos + the dynamic affine cross-shard
    prefix reconstruct each stage's entering state exactly (to f32
    re-association)."""
    from test_tv_sharded import _chain, _run_both

    x = noise(44_100 // 2, seed=4)
    g, src = _chain(_phaser(rate_hz=0.8, f_min_hz=200.0,
                            f_max_hz=3000.0, stages=4))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 110.0


def test_sp_chain_composes_with_masterbus():
    """The phaser slots into a chain beside gain + limiter stages."""
    from test_tv_sharded import _chain, _run_both, _vol

    from nodey_tpu.processors.limiter import AudioLimiter

    lim = AudioLimiter()
    lim.set_threshold_db(-3.0)
    x = noise(44_100 // 2, seed=6)
    g, src = _chain(_vol(1.5), _phaser(rate_hz=1.0, stages=2), lim)
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 95.0


def test_serde_clamps_and_param_spec():
    p = _phaser(rate_hz=999.0, f_min_hz=1.0, f_max_hz=99_999.0,
                stages=99, wet=7.0, dry=-3.0)
    assert p.rate_hz == 10.0 and p.f_min_hz == 20.0
    assert p.f_max_hz == 12_000.0 and p.stages == 8
    assert p.wet == 1.0 and p.dry == 0.0
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioPhaser()
    q.deserialize(blob)
    assert {s["key"] for s in q.param_spec()} == set(p._CLAMPS)
    for k in p._CLAMPS:
        assert getattr(q, k) == getattr(p, k)
    # Hostile blobs are ignored, never raise.
    q.deserialize({"stages": "nan", "wet": True, "junk": 1})
    q.deserialize("not a dict")
