"""De-esser node (ops/dynamics.py de-esser section +
processors/deesser.py).

Contract under test: the split-band design — compressor detector keyed
by an RBJ bandpass, applied as band subtraction — matches its float64
sequential mirror; below-threshold material passes through exactly;
loud sibilance ducks the band while the low spectrum is preserved;
streamed == offline to scan re-association; and the sp chain (exact
sharded band -> spatialized detector) matches single-device.
"""

import json

import numpy as np
import jax.numpy as jnp

from nodey_tpu.core.stream import Stream
from nodey_tpu.ops import dynamics as dyn
from nodey_tpu.processors.deesser import AudioDeesser

from conftest import snr_db

RATE = 44_100


def _stream(x):
    return Stream(data=jnp.asarray(x), length=jnp.int32(x.shape[1]),
                  rate=RATE, channels=x.shape[0])


def sibilant(n, seed=0, ess_level=0.5, body_level=0.1):
    """Broadband 'voice body' plus a loud 6.5 kHz 'ess' burst in the
    middle third."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    body = body_level * rng.standard_normal((2, n))
    ess = ess_level * np.sin(2 * np.pi * 6_500.0 * t)
    env = np.zeros(n)
    env[n // 3: 2 * n // 3] = 1.0
    return (body + ess * env[None, :]).astype(np.float32)


def _deesser(**params):
    p = AudioDeesser()
    for k, v in params.items():
        p.set_param(k, v)
    return p


def _band_rms(x, lo, hi):
    spec = np.fft.rfft(x.astype(np.float64), axis=1)
    freqs = np.fft.rfftfreq(x.shape[1], 1.0 / RATE)
    sel = (freqs >= lo) & (freqs < hi)
    return float(np.sqrt((np.abs(spec[:, sel]) ** 2).mean()))


def test_matches_float64_mirror():
    x = sibilant(30_000)
    out = np.asarray(dyn.deess_stream(
        _stream(x), -30.0, 4.0, 6_500.0, 1.0, 1.0, 60.0
    ).data)
    ref = dyn.deesser_reference(x, -30.0, 4.0, 6_500.0, 1.0, 1.0, 60.0,
                                RATE)
    assert snr_db(ref, out) > 90.0


def test_below_threshold_passthrough():
    rng = np.random.default_rng(1)
    x = (0.001 * rng.standard_normal((2, 8_000))).astype(np.float32)
    out = np.asarray(dyn.deess_stream(
        _stream(x), -20.0, 8.0, 6_500.0, 1.0, 1.0, 60.0
    ).data)
    np.testing.assert_array_equal(out, x)


def test_ducks_the_band_preserves_the_body():
    x = sibilant(45_000, ess_level=0.6, body_level=0.08)
    out = np.asarray(dyn.deess_stream(
        _stream(x), -30.0, 8.0, 6_500.0, 1.0, 0.5, 80.0
    ).data)
    mid = slice(45_000 // 3 + 2_000, 2 * 45_000 // 3 - 2_000)
    ess_in = _band_rms(x[:, mid], 5_500, 7_500)
    ess_out = _band_rms(out[:, mid], 5_500, 7_500)
    assert ess_out < 0.5 * ess_in          # >= ~6 dB of de-essing
    low_in = _band_rms(x[:, mid], 100, 2_000)
    low_out = _band_rms(out[:, mid], 100, 2_000)
    assert abs(20 * np.log10(low_out / low_in)) < 1.0


def test_streamed_equals_offline():
    from test_chunkflow import run_offline, run_streamed
    from test_modfx import _node_graph

    x = sibilant(24_000, seed=3)
    g, src = _node_graph(_deesser(threshold_db=-32.0, ratio=6.0))
    src_arrays = {(src, "output_0"): (x, RATE, "flt")}
    outs, _ = run_offline(g, src_arrays)
    off_arr, off_n = outs["master"]
    off = np.asarray(off_arr)[:, :int(off_n)]
    assert int(off_n) == x.shape[1]
    streamed, _ = run_streamed(g, src_arrays, chunk=2_048)
    got = streamed["master"]
    assert snr_db(off, got) > 90.0


def test_sp_chain_matches_single_device():
    from test_tv_sharded import _chain, _run_both

    x = sibilant(44_100 // 2, seed=4)
    g, src = _chain(_deesser(threshold_db=-32.0, ratio=6.0))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 90.0


def test_sp_chain_composes_with_strip():
    from test_tv_sharded import _chain, _run_both, _vol

    x = sibilant(44_100 // 2, seed=5)
    g, src = _chain(_vol(1.3), _deesser(threshold_db=-30.0))
    ref, ref_len, out, out_len = _run_both(g, src, x)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 90.0


def test_serde_clamps_and_param_spec():
    p = _deesser(threshold_db=5.0, ratio=99.0, freq=100.0, q=50.0,
                 attack_ms=0.0, release_ms=10**6)
    assert p.threshold_db == 0.0 and p.ratio == 20.0
    assert p.freq == 2_000.0 and p.q == 5.0
    assert p.attack_ms == 0.1 and p.release_ms == 200.0
    p.set_param("threshold_db", -25.0)
    blob = json.loads(json.dumps(p.serialize()))
    q = AudioDeesser()
    q.deserialize(blob)
    assert {s["key"] for s in q.param_spec()} == set(p._CLAMPS)
    for k in p._CLAMPS:
        assert getattr(q, k) == getattr(p, k)
    q.deserialize({"freq": True, "junk": "x"})
    q.deserialize(42)
