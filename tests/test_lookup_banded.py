"""The gather-free banded lookup must match the gather-based interp exactly."""

import numpy as np
import jax.numpy as jnp

from cermvs_tpu.ops.corr import CorrPyramid, _lookup_banded, build_pyramid, lookup
from cermvs_tpu.ops.sampling import interp1d


def _reference_lookup(levels, x0, radius):
    dx = jnp.arange(-radius, radius + 1, dtype=x0.dtype)
    outs = []
    for i, corr in enumerate(levels):
        taps = x0[..., None] / (2.0 ** i) + dx
        outs.append(interp1d(corr, taps))
    return jnp.concatenate(outs, axis=-1)


def test_banded_matches_gather(rng):
    B, V, H, W, D = 1, 3, 6, 8, 64
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    levels = build_pyramid(corr, 3)
    # positions spanning negative, in-range, boundary and beyond-D cases
    x0 = jnp.asarray(
        (rng.rand(B, V, H, W).astype(np.float32) * (D + 20)) - 6)
    x0 = jnp.maximum(x0, 0.0)  # lookup() clamps below zero before calling

    a = _lookup_banded(levels, x0, radius=5)
    b = _reference_lookup(levels, x0, radius=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_banded_integer_positions(rng):
    corr = jnp.asarray(rng.randn(1, 1, 2, 2, 16).astype(np.float32))
    levels = build_pyramid(corr, 2)
    x0 = jnp.full((1, 1, 2, 2), 8.0)
    out = _lookup_banded(levels, x0, radius=2)
    # level-0 center tap (k=0 -> index 2) is corr[..., 8]
    np.testing.assert_allclose(
        np.asarray(out[..., 2]), np.asarray(corr[..., 8]), rtol=1e-6)


def test_lookup_dispatches_banded(rng):
    """Full lookup() path through CorrPyramid with D=44 (stage-1 size)."""
    B, V, H, W, D = 1, 2, 4, 6, 44
    corr = jnp.asarray(rng.randn(B, V, H, W, D).astype(np.float32))
    origin = jnp.asarray(rng.rand(B, 1, H, W).astype(np.float32) * 0.01)
    pyr = CorrPyramid(levels=build_pyramid(corr, 2), origin=origin,
                      incre=0.0025 / 320, n_hyp=D, num_levels=2)
    zinv = origin + jnp.asarray(
        rng.randn(B, 1, H, W).astype(np.float32) * 0.002)
    zinv = jnp.broadcast_to(zinv, (B, V, H, W))
    out = lookup(pyr, zinv, radius=5)

    x0 = jnp.maximum((zinv - origin) / pyr.incre + D // 2, 0.0)
    ref = _reference_lookup(pyr.levels, x0, radius=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
