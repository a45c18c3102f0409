"""bf16 corner gathering must be EXACT when features are bf16-valued and
close (bf16-rounding-limited) otherwise."""

import numpy as np
import jax.numpy as jnp

from cermvs_tpu.ops.corr import build_corr_volume
from tests.test_corr import _random_scene


def _setup(rng):
    fmaps, poses, intr = _random_scene(rng)
    ii = np.array([0, 0])
    jj = np.array([1, 2])
    origin = np.full((1, 1, 8, 10), 4 * 0.01, np.float32)
    return fmaps, poses, intr, ii, jj, origin


def test_bf16_gather_exact_on_bf16_valued_features(rng):
    fmaps, poses, intr, ii, jj, origin = _setup(rng)
    # quantize features to bf16 values (as the bf16 encoder produces)
    fmaps = np.asarray(
        jnp.asarray(fmaps).astype(jnp.bfloat16).astype(jnp.float32))

    kw = dict(n_hyp=8, incre=0.01, hyp_chunk=4)
    a = build_corr_volume(jnp.asarray(fmaps), jnp.asarray(poses),
                          jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
                          jnp.asarray(origin), **kw)
    b = build_corr_volume(jnp.asarray(fmaps), jnp.asarray(poses),
                          jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
                          jnp.asarray(origin), gather_dtype=jnp.bfloat16, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_gather_close_on_fp32_features(rng):
    fmaps, poses, intr, ii, jj, origin = _setup(rng)
    kw = dict(n_hyp=8, incre=0.01, hyp_chunk=4)
    a = build_corr_volume(jnp.asarray(fmaps), jnp.asarray(poses),
                          jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
                          jnp.asarray(origin), **kw)
    b = build_corr_volume(jnp.asarray(fmaps), jnp.asarray(poses),
                          jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
                          jnp.asarray(origin), gather_dtype=jnp.bfloat16, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=3e-2, atol=1e-3)
