"""The view-mean cost-volume folding must be exactly equivalent to per-view
volumes + per-view lookups + mean aggregation (the reference formulation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection


def _scene(rng, B=1, N=4, H=24, W=32):
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.4 * n
    return jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr)


@pytest.mark.slow
def test_ops_level_identity(rng):
    """mean_v lookup(vol_v, x0) == lookup(mean_v vol_v, x0)."""
    B, N, h, w, C, D = 1, 4, 8, 10, 16, 16
    fmaps = jnp.asarray(rng.randn(B, N, h, w, C).astype(np.float32))
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (B, N, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.3 * n
    poses = jnp.asarray(poses)
    ii = jnp.zeros(N - 1, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    incre = 0.01
    disp0 = jnp.zeros((B, 1, h, w), jnp.float32)

    per_view = corr_ops.build_corr_pyramid(
        fmaps, poses, intr, ii, jj, disp0, D, incre, shift=True,
        hyp_chunk=4, mean_over_views=False)
    mean_vol = corr_ops.build_corr_pyramid(
        fmaps, poses, intr, ii, jj, disp0, D, incre, shift=True,
        hyp_chunk=4, mean_over_views=True)

    np.testing.assert_allclose(
        np.asarray(mean_vol.levels[0][:, 0]),
        np.asarray(per_view.levels[0].mean(axis=1)), rtol=1e-5, atol=1e-6)

    zinv1 = disp0 + 0.031
    zv = jnp.broadcast_to(zinv1, (B, N - 1, h, w))
    a = corr_ops.lookup(per_view, zv, radius=3).mean(axis=1)
    b = corr_ops.lookup(mean_vol, zinv1, radius=3)[:, 0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("test_mode", [False, True])
def test_model_level_identity(rng, test_mode):
    images, poses, intr = _scene(rng)
    cascade = ((8, 64, 2), (-1, 320, 2))
    kwargs = dict(cascade=cascade, hyp_chunk=4, dtype=jnp.float32,
                  test_mode=test_mode)
    m_mean = RAFT(**kwargs)
    m_ref = RAFT(force_per_view_volumes=True, **kwargs)
    assert m_mean.mean_volume and not m_ref.mean_volume

    args = (images, poses, intr) + ((jnp.ones(1),) if test_mode else ())
    params = m_mean.init(jax.random.PRNGKey(0), *args)
    a = m_mean.apply(params, *args)
    b = m_ref.apply(params, *args)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
