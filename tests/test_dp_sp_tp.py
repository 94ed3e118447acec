"""dp x sp x tp composed in one jitted step (parallel/dp_sp_tp.py).

The flagship graph's clip batch shards over dp and its sample axis over
sp (ppermute halo exchange), and the appended convolution-reverb
master-bus tail shards its DFT bin / output-sample columns over tp —
all three axes of one 3-axis mesh, two shard_maps inside ONE jit, with
XLA inserting the sp all_gather between the stages. Agreement contract
vs the single-device composition (unsharded fused graph ->
ops.reverb.partitioned_conv): stage 1 is bitwise (test_sharded_graph),
stage 2 is exact modulo GEMM reduction-order (test_tp), so the composed
result must sit at the f32-ulp floor: >= 130 dB SNR, max-abs <= 1e-6 of
peak.

Runs on the 8-virtual-device CPU mesh (conftest) as dp=2 x sp=2 x tp=2
— the single-host multi-device simulation SURVEY.md §4.4 prescribes.
"""

import numpy as np

from nodey_tpu.core import compiler
from nodey_tpu.parallel import dp_sp_tp
from nodey_tpu.parallel.mesh import make_mesh

from test_sharded_graph import _flagship, _sources_and_args


def test_dp_sp_tp_composed_matches_single_device():
    mesh = make_mesh({"dp": 2, "sp": 2, "tp": 2})
    g, src = _flagship()
    arrays, lengths, sources = _sources_and_args(g, src, mesh)

    prog = dp_sp_tp.compile_flagship_reverb_dpsptp(g, sources, mesh)
    assert prog.cap_out > prog.cap_master
    batch = mesh.shape["dp"] * 2          # 2 clips per dp shard

    # Batch of clips: clip b scales the base fixtures so every dp shard
    # carries distinct audio; lengths vary per clip to exercise the
    # masking algebra through BOTH stages.
    barrays, blengths = {}, {}
    per_clip = []
    for b in range(batch):
        scale = 1.0 - 0.1 * b
        trim = 1000 * b
        clip_arrays, clip_lengths = {}, {}
        for key in arrays:
            a = (scale * arrays[key]).astype(np.float32)
            n = max(1, lengths[key] - trim)
            a[:, n:] = 0.0
            clip_arrays[key] = a
            clip_lengths[key] = n
        per_clip.append((clip_arrays, clip_lengths))
        for key in arrays:
            barrays.setdefault(key, []).append(clip_arrays[key])
            blengths.setdefault(key, []).append(clip_lengths[key])
    barrays = {k: np.stack(v) for k, v in barrays.items()}
    blengths = {k: np.asarray(v, dtype=np.int32) for k, v in blengths.items()}

    out, glen = prog.run(barrays, blengths)
    assert out.shape == (batch, 2, prog.cap_out)
    assert np.isfinite(out).all()

    for b in range(batch):
        clip_arrays, clip_lengths = per_clip[b]
        ref, ref_len = dp_sp_tp.reference_pipeline(
            g, sources, clip_arrays, clip_lengths,
            prog.cap_master, prog.cap_out, prog.out_rate,
        )
        assert int(glen[b]) == ref_len
        ref64 = ref.astype(np.float64)
        got64 = out[b].astype(np.float64)
        err = ref64 - got64
        denom = max(float((err ** 2).sum()), 1e-300)
        snr = 10 * np.log10(float((ref64 ** 2).sum()) / denom)
        assert snr >= 130.0, (b, snr)
        assert np.abs(err).max() <= 1e-6 * max(np.abs(ref64).max(), 1e-9), b
