"""Pallas kernel tests (interpreter mode on CPU; the TPU bench A/Bs the
compiled path on hardware)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nodey_tpu.ops.pallas_resample import resample_data_pallas
from nodey_tpu.ops.resample import resample_data


@pytest.mark.parametrize("in_rate,out_rate", [(44_100, 48_000), (48_000, 44_100)])
@pytest.mark.parametrize("channels", [1, 2])
def test_pallas_matches_xla_path(in_rate, out_rate, channels):
    x = (
        0.3
        * np.random.default_rng(0)
        .standard_normal((channels, in_rate // 2))
        .astype(np.float32)
    )
    xla = np.asarray(resample_data(jnp.asarray(x), in_rate, out_rate))
    pallas = np.asarray(
        resample_data_pallas(jnp.asarray(x), in_rate, out_rate, interpret=True)
    )
    assert pallas.shape == xla.shape
    np.testing.assert_allclose(pallas, xla, atol=1e-6)
