"""Batched (data-parallel) serving tests: vmap over a clip batch, optionally
sharded over a dp mesh — the TPU-scale analog of the reference's per-file
decode fan-out (audio-io.cpp:242-279)."""

import numpy as np
import jax
import pytest

from nodey_tpu.core import compiler, registry
from nodey_tpu.core.graph import Graph
from nodey_tpu.parallel.mesh import make_mesh
from nodey_tpu.processors.audio_input import AudioInput
from nodey_tpu.processors.audio_output import AudioOutput
from nodey_tpu.processors.audio_vol import AudioVol

from conftest import make_tone


@pytest.fixture(autouse=True)
def _register():
    registry.register_all_processors()


def build_compiled(capacity=32_768):
    g = Graph()
    src = g.add_node(AudioInput())
    vol = g.add_node(AudioVol())
    g.nodes[vol].processor.set_volume(2.0)
    out = g.add_node(AudioOutput())
    pin = lambda n, p: g.nodes[n].pin_name_map[p]  # noqa: E731
    g.add_link(pin(src, "output_0"), pin(vol, "input"))
    g.add_link(pin(vol, "output"), pin(out, "input"))
    sources = {
        (src, "output_0"): compiler.SourceSpec(48_000, 2, "flt", capacity)
    }
    return compiler.compile_graph(g, sources, mode="export"), src


def _batch_inputs(key, batch, capacity):
    rng = np.random.default_rng(0)
    arrays = 0.25 * rng.standard_normal((batch, 2, capacity)).astype(np.float32)
    lengths = np.full((batch,), capacity, dtype=np.int32)
    return {key: arrays}, {key: lengths}


def test_run_batch_matches_per_item():
    compiled, src = build_compiled()
    key = compiler.external_key(src, "output_0")
    arrays, lengths = _batch_inputs(key, 4, 32_768)
    out = compiled.run_batch(arrays, lengths)
    data, length = out["master"]
    assert data.shape == (4, 2, 32_768)
    for b in range(4):
        single = compiled.run(
            {key: arrays[key][b]}, {key: int(lengths[key][b])}
        )
        np.testing.assert_array_equal(data[b], single["master"][0])


def test_run_batch_sharded_over_dp_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh({"dp": 8})
    compiled, src = build_compiled()
    key = compiler.external_key(src, "output_0")
    arrays, lengths = _batch_inputs(key, 8, 32_768)
    out = compiled.run_batch(arrays, lengths, mesh=mesh)
    data, _ = out["master"]
    reference = compiled.run_batch(arrays, lengths)  # unsharded
    np.testing.assert_array_equal(data, reference["master"][0])
