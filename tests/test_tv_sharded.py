"""Sequence-parallel time-variant CHAINS (parallel/tv_sharded.py).

Contract under test: a linear input -> (vol | resample | velocity/pitch
with algorithm='pv') -> output chain compiled by ``compile_chain_sp_tv``
over an sp mesh agrees with the single-device compiled graph
(core/compiler.compile_graph, export-mode master):

* lengths match EXACTLY — every stage mirrors the offline integer length
  law (Stream ceil law for resample nodes, transpose_rate's unreduced
  ceil law for transpositions, the 16.16 law for PV tempo);
* waveforms match >= 70 dB when ONE PV stage is present (f32
  re-association of the sharded phasor prefix — same bar as
  tests/test_pv_sharded.py) and >= 100 dB for LTI-only chains (last-ulp
  across program shapes, the standing grouped-GEMM caveat);
* chains with TWO PV stages get a 45 dB floor: the phase vocoder's
  instantaneous-frequency estimate (arctan2 of near-zero bins) is
  chaotic, so stage-2 amplifies stage-1's last-ulp divergence O(1000)x.
  Measured directly on the OFFLINE path alone (no sharding anywhere): a
  96.7 dB perturbation of stage-2's input yields 52.2 dB output
  agreement (49.0 dB with lock=False, so it is the phase estimate, not
  peak-pick flips). The sharded chain's 48-56 dB sits exactly at that
  intrinsic sensitivity;
* WSOLA-algorithm tempo stages are REJECTED with a pointer to
  compile_graph_dp — that serialization is an algorithm property
  (ROUND4.md config-4 proof), not a planner gap.

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import pytest

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.errors import ProcessorRuntimeError
from nodey_tpu.core.graph import Graph
from nodey_tpu.parallel import tv_sharded
from nodey_tpu.parallel.mesh import make_mesh
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol
from nodey_tpu.processors.resample_node import AudioResample
from nodey_tpu.processors.velocity import PitchModifier, VelocityModifier

from conftest import make_tone, snr_db

RATE = 44_100


def _chain(*procs):
    """input -> procs... -> output as a Graph; returns (graph, src_id)."""
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    prev, prev_pin = src, "output_0"
    for proc in procs:
        nid = g.add_node(proc)
        g.add_link(pin(prev, prev_pin), pin(nid, "input"))
        prev, prev_pin = nid, "output"
    out = g.add_node(AudioOutput())
    g.add_link(pin(prev, prev_pin), pin(out, "input"))
    return g, src


def _source(src, n, channels=2, rate=RATE):
    spec = compiler.SourceSpec(
        rate=rate, channels=channels, fmt="flt", capacity=n
    )
    return {(src, "output_0"): spec}, compiler.external_key(src, "output_0")


def _run_both(g, src, data, sp=8):
    n = data.shape[1]
    sources, key = _source(src, n, channels=data.shape[0])

    single = compiler.compile_graph(g, sources, mode="export")
    ref, ref_len = single.run({key: data}, {key: n})["master"]

    mesh = make_mesh({"sp": sp})
    chain = tv_sharded.compile_chain_sp_tv(g, sources, mesh)
    out, out_len = chain.run(data, n)
    return np.asarray(ref), int(ref_len), out, out_len


def _vol(v):
    p = AudioVol()
    p.set_volume(v)
    return p


def _resample(rate):
    p = AudioResample()
    p.set_target_rate(rate)
    return p


def _pitch(semis, algorithm="pv"):
    p = PitchModifier()
    p.pitch = float(semis)
    p.set_algorithm(algorithm)
    return p


def _velocity(v, keep_pitch=True, algorithm="pv"):
    p = VelocityModifier()
    p.velocity = float(v)
    p.keep_pitch = keep_pitch
    p.set_algorithm(algorithm)
    return p


def _limiter(threshold_db=-1.0, release_ms=50.0):
    from nodey_tpu.processors.limiter import AudioLimiter

    p = AudioLimiter()
    p.set_threshold_db(threshold_db)
    p.set_release_ms(release_ms)
    return p


def test_limiter_chain_matches_single_device():
    """audio_limiter shards the sample axis via the cross-shard max-plus
    prefix (ops/dynamics.limiter_sharded_local): vol(2.0) drives the tone
    well past the -1 dB ceiling, so the envelope (and its cross-shard
    carry) is live everywhere. The only re-associated term between the
    sharded and offline scans is c*L (one f32 multiply either way), so
    the bar is far above the PV stages' 70 dB."""
    data = make_tone(rate=RATE, seconds=0.7, channels=2)
    g, src = _chain(_vol(2.0), _limiter(-1.0, 50.0))
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 120.0


def test_limiter_release_spans_shards():
    """A single loud burst at the head of shard 0 whose release tail
    (500 ms at 44.1 kHz on a 0.7 s / 8-shard clip ~= 4 shard-chunks)
    decays THROUGH several downstream shards: the exclusive max-plus
    prefix must carry it, or downstream gain snaps back to 1.0 early."""
    n = int(0.7 * RATE)
    data = np.zeros((1, n), dtype=np.float32)
    data[0, 100:500] = 1.5
    data[0, 500:] = 0.05  # quiet floor riding the release tail
    g, src = _chain(_limiter(-6.0, 500.0))
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    m = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :m], out[:, :m]) > 120.0
    # Sanity: the reference itself attenuates the quiet floor mid-clip
    # (release still active far from the burst) — i.e. the test really
    # exercises a cross-shard envelope, not a per-shard one.
    assert np.abs(ref[0, n // 2]) < 0.05


def test_limiter_below_threshold_passthrough_on_mesh():
    """Below threshold the node is a bitwise passthrough (gain computes
    as min(1, T/env) == 1.0 and x * 1.0 is exact) — and the sharded
    program preserves that bit-level contract."""
    data = (0.1 * make_tone(rate=RATE, seconds=0.6)).astype(np.float32)
    g, src = _chain(_limiter(-1.0, 50.0))
    g_plain, src_plain = _chain()
    _, _, out, out_len = _run_both(g, src, data)
    _, _, plain, plain_len = _run_both(g_plain, src_plain, data)
    assert out_len == plain_len
    m = min(out.shape[1], plain.shape[1])
    assert np.array_equal(out[:, :m], plain[:, :m])


def _compressor(threshold_db=-18.0, ratio=4.0, makeup_db=0.0):
    from nodey_tpu.processors.compressor import AudioCompressor

    p = AudioCompressor()
    p.set_threshold_db(threshold_db)
    p.set_ratio(ratio)
    p.set_makeup_db(makeup_db)
    return p


def test_compressor_chain_matches_single_device():
    """audio_compressor shards via TWO cross-shard prefixes (max-plus
    release + affine attack smoother). The attack one-pole runs on the
    CORRECTED envelope, so the sharded smoother sees exactly the offline
    input sequence; the bar is re-association-tight."""
    data = make_tone(rate=RATE, seconds=0.7, channels=2)
    g, src = _chain(_vol(2.0), _compressor(-12.0, 6.0, 2.0))
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 110.0


def _eq(**gains):
    from nodey_tpu.processors.equalizer import AudioEq

    p = AudioEq()
    for k, v in gains.items():
        p.set_param(k, v)
    return p


def test_eq_chain_matches_single_device():
    """audio_eq shards via exact AR(1) state prefixes (ops/biquad.py):
    each section's first-order scans run locally, carries cross shards
    with static pole-power weights. Floor = carry re-association
    (~85 dB measured on a mixed conj/real cascade)."""
    data = make_tone(rate=RATE, seconds=0.7, channels=2)
    g, src = _chain(
        _eq(ls_gain_db=4.0, p2_gain_db=-6.0, hs_gain_db=-3.0)
    )
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 80.0


def test_full_masterbus_chain():
    """The complete master-bus shape: gain -> resample -> PV tempo ->
    EQ -> compressor -> limiter, time-sharded over 8 devices. Bar = the
    single-PV 70 dB floor (the EQ and dynamics stages add only
    state-prefix re-association)."""
    data = make_tone(rate=RATE, seconds=0.8, channels=2)
    g, src = _chain(
        _vol(2.0), _resample(48_000), _velocity(1.25),
        _eq(p2_gain_db=-3.0), _compressor(-18.0, 4.0, 3.0),
        _limiter(-1.0),
    )
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 70.0


def test_limiter_composes_with_pv_and_resample():
    """Master-bus shape: rate change -> PV tempo -> limiter. The limiter
    runs at the POST-resample rate on the PV stage's output chunks; the
    chain bar is the single-PV 70 dB floor (the limiter adds only
    max-plus re-association, orders of magnitude tighter)."""
    data = make_tone(rate=RATE, seconds=0.8, channels=2)
    g, src = _chain(
        _vol(2.0), _resample(48_000), _velocity(1.25), _limiter(-3.0)
    )
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 70.0


def test_config4_shaped_chain_matches_single_device():
    """The config-4 benchmark shape — gain, rate change, pitch shift,
    tempo change — time-sharded over 8 devices vs the offline program.

    Two PV stages in series: the 45 dB floor is the algorithm's own
    perturbation sensitivity (module docstring), not sharding error."""
    data = make_tone(rate=RATE, seconds=0.8, channels=2)
    g, src = _chain(
        _vol(1.3), _resample(48_000), _pitch(12), _velocity(1.3)
    )
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 45.0


def test_pv_only_chain():
    data = make_tone(rate=RATE, seconds=0.6)
    g, src = _chain(_velocity(0.8))
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 70.0


def test_lti_only_chain_near_exact():
    """No PV stage: the only cross-path divergence allowed is the last-ulp
    grouped-GEMM caveat across program shapes."""
    data = make_tone(rate=RATE, seconds=0.7, channels=2)
    g, src = _chain(_vol(0.8), _resample(48_000))
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    assert snr_db(ref[:, :n], out[:, :n]) > 100.0


def test_output_masked_past_length():
    data = make_tone(rate=RATE, seconds=0.6)
    g, src = _chain(_velocity(1.5))
    _, _, out, out_len = _run_both(g, src, data)
    assert np.all(out[:, out_len:] == 0.0)


def test_wsola_algorithm_rejected():
    data = make_tone(rate=RATE, seconds=0.5)
    g, src = _chain(_velocity(1.3, algorithm="wsola"))
    sources, _ = _source(src, data.shape[1])
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="serial"):
        tv_sharded.compile_chain_sp_tv(g, sources, mesh)


def test_nonlinear_graph_rejected():
    """Fan-out from one node breaks the linear-chain contract."""
    registry.register_all_processors()
    g = Graph()
    src = g.add_node(AudioInput())
    g.nodes[src].processor.file_paths = ["a.wav"]
    g.update_node_pin(src)
    v1, v2 = g.add_node(_vol(1.0)), g.add_node(_vol(0.5))
    out = g.add_node(AudioOutput())

    def pin(n, p):
        return g.nodes[n].pin_name_map[p]

    g.add_link(pin(src, "output_0"), pin(v1, "input"))
    g.add_link(pin(src, "output_0"), pin(v2, "input"))
    g.add_link(pin(v1, "output"), pin(out, "input"))
    sources, _ = _source(src, RATE // 2)
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="linear chain"):
        tv_sharded.compile_chain_sp_tv(g, sources, mesh)


def test_multi_source_rejected():
    data = make_tone(rate=RATE, seconds=0.5)
    g, src = _chain(_velocity(1.2))
    sources, _ = _source(src, data.shape[1])
    sources[(src, "output_1")] = next(iter(sources.values()))
    mesh = make_mesh({"sp": 8})
    with pytest.raises(ProcessorRuntimeError, match="one source"):
        tv_sharded.compile_chain_sp_tv(g, sources, mesh)


def test_pv_transient_chain_matches_single_device():
    """pv_transient threads through the chain compiler: the sharded
    segmented-scan program matches the single-device compiled graph on
    onset-bearing material (resets re-anchor the phasor chain, so the
    bar is HIGHER than the plain PV chain's 70 dB)."""
    # Quiet background + loud bursts: flux >> threshold at each onset,
    # so reset DECISIONS are identical across paths (a borderline signal
    # would let last-ulp magnitude differences flip a decision — that
    # sensitivity is the same one test_tv_sharded's two-PV-stage floor
    # documents, not a sharding defect).
    data = 0.02 * make_tone(rate=RATE, seconds=0.6)
    for k in (1, 2):
        i = int(k * 0.18 * RATE)
        data[:, i:i + 400] += (
            np.sin(2 * np.pi * 1000 * np.arange(400) / RATE)
            * np.hanning(400)
        ).astype(np.float32) * 0.9
    vel = _velocity(0.8)
    vel.pv_transient = True
    g, src = _chain(vel)
    ref, ref_len, out, out_len = _run_both(g, src, data)
    assert out_len == ref_len
    n = min(ref_len, ref.shape[1], out.shape[1])
    # Re-association still accumulates within each inter-onset segment
    # (~0.2 s here), so the bar sits between the plain chain's 70 dB
    # floor and the dense-onset 125 dB of test_pv_sharded (measured
    # 93.8 dB on this signal).
    assert snr_db(ref[:, :n], out[:, :n]) > 85.0


def test_extract_stages_reads_quality_flags():
    """The sp chain planner threads pv_transient and preserve_formants
    from the node into its _PvStage (formant ratio = the node's
    effective transposition)."""
    p = _pitch(7)
    p.pv_transient = True
    p.preserve_formants = True
    g, _src = _chain(p)
    stages, _rate = tv_sharded._extract_stages(g, RATE)
    pv_stages = [s for s in stages if isinstance(s, tv_sharded._PvStage)]
    assert len(pv_stages) == 1
    st = pv_stages[0]
    assert st.transient is True
    assert st.formant_ratio == pytest.approx(2 ** (7 / 12))
