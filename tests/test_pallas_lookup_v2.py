"""Prefix-sum lookup kernel vs banded (interpreter mode; prefix-sum
cancellation allows ~1e-3)."""
import numpy as np
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cermvs_tpu.ops.corr import _lookup_banded, build_pyramid
from cermvs_tpu.ops.pallas.lookup_v2 import lookup_fused_v2


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("D", [64, 44])
def test_v2_matches_banded(rng, D):
    B, V, H, W = 1, 2, 6, 8
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    x0 = jnp.asarray(
        np.maximum(rng.rand(B, V, H, W).astype(np.float32) * (D + 16) - 4, 0))
    out = lookup_fused_v2(corr, x0, 5, 3)
    ref = _lookup_banded(build_pyramid(corr, 3), x0, 5)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
