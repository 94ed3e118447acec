"""Multi-device tests on the 8-device CPU mesh (SURVEY.md §4.4: every
sharded path must run without real hardware)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nodey_tpu.ops.resample import resample_data
from nodey_tpu.parallel import ops as pops
from nodey_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_make_mesh_shapes(devices):
    mesh = make_mesh({"dp": 2, "sp": 4})
    assert mesh.shape == {"dp": 2, "sp": 4}
    mesh2 = make_mesh({"dp": 2, "sp": -1})
    assert mesh2.shape["sp"] == 4
    with pytest.raises(ValueError):
        make_mesh({"dp": 16})


@pytest.mark.parametrize("in_rate,out_rate", [(44_100, 48_000), (48_000, 32_000)])
def test_sharded_resample_exact(devices, in_rate, out_rate):
    """Time-sharded polyphase (halo via ppermute) == single-device output."""
    mesh = make_mesh({"sp": 8})
    q = pops.sharded_time_quantum(mesh, in_rate, out_rate)
    n = ((in_rate * 2) // q + 1) * q
    x = (
        0.3
        * np.random.default_rng(0).standard_normal((2, n)).astype(np.float32)
    )
    single = np.asarray(resample_data(jnp.asarray(x), in_rate, out_rate))
    sharded = np.asarray(
        pops.sharded_resample(mesh, jnp.asarray(x), in_rate, out_rate)
    )
    m = min(single.shape[-1], sharded.shape[-1])
    np.testing.assert_array_equal(sharded[:, :m], single[:, :m])


def test_sharded_resample_batched_dp(devices):
    """dp x sp: batch of tracks sharded over dp, time over sp."""
    mesh = make_mesh({"dp": 2, "sp": 4})
    in_rate, out_rate = 44_100, 48_000
    q = pops.sharded_time_quantum(mesh, in_rate, out_rate)
    n = q * 20
    x = (
        0.3
        * np.random.default_rng(1)
        .standard_normal((4, 2, n))
        .astype(np.float32)
    )
    batched = pops.shard_batch(mesh, jnp.asarray(x), dp_axis="dp")
    out = np.asarray(
        pops.sharded_resample(
            mesh, batched, in_rate, out_rate, batch_axes=("dp",)
        )
    )
    for b in range(x.shape[0]):
        single = np.asarray(
            resample_data(jnp.asarray(x[b]), in_rate, out_rate)
        )
        m = min(single.shape[-1], out.shape[-1])
        np.testing.assert_array_equal(out[b, :, :m], single[:, :m])


def test_dryrun_multichip_entrypoint(devices):
    """The driver contract: __graft_entry__.dryrun_multichip(n) compiles and
    executes the full sharded step on an n-device mesh."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_jittable(devices):
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, example_args = mod.entry()
    out = jax.jit(fn)(*example_args)
    jax.block_until_ready(out)
