"""Pallas fused lookup vs the XLA banded/gather implementations (interpreter
mode on CPU; compiled-mode parity is exercised on the chip by bench/profile)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cermvs_tpu.ops.corr import _lookup_banded, build_pyramid
from cermvs_tpu.ops.pallas.lookup import lookup_fused


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.slow
def test_fused_matches_banded(rng):
    B, V, H, W, D = 1, 2, 8, 8, 64
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    x0 = jnp.asarray(
        np.maximum(rng.rand(B, V, H, W).astype(np.float32) * (D + 16) - 4, 0))
    out = lookup_fused(corr, x0, 5, 3)
    ref = _lookup_banded(build_pyramid(corr, 3), x0, 5)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_d44(rng):
    """Stage-1 hypothesis count (non-power-of-two pooling boundary)."""
    B, V, H, W, D = 1, 1, 4, 4, 44
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    x0 = jnp.asarray(rng.rand(B, V, H, W).astype(np.float32) * D)
    out = lookup_fused(corr, x0, 5, 3)
    ref = _lookup_banded(build_pyramid(corr, 3), x0, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_grad_matches_banded(rng):
    B, V, H, W, D = 1, 1, 4, 6, 16
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    x0 = jnp.asarray(rng.rand(B, V, H, W).astype(np.float32) * D)

    def loss_fused(c):
        return jnp.sum(lookup_fused(c, x0, 2, 2) ** 2)

    def loss_banded(c):
        return jnp.sum(_lookup_banded(build_pyramid(c, 2), x0, 2) ** 2)

    g1 = jax.grad(loss_fused)(corr)
    g2 = jax.grad(loss_banded)(corr)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
