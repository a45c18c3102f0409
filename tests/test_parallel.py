"""Parallel tests on the 8-device CPU mesh: view-sharded inference must match
the single-device forward, including the padded (V not divisible) case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.parallel.infer import view_sharded_forward
from cermvs_tpu.parallel.mesh import make_mesh

TINY = ((8, 64, 2), (-1, 320, 2))


def _scene(rng, B=1, N=9, H=32, W=48):
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.3 * n
        poses[:, n, 1, 3] = 0.1 * ((-1) ** n)
    return jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr)


@pytest.mark.parametrize("n_frames", [9, 6])  # V=8 (even) and V=5 (padded)
def test_view_sharded_matches_single(rng, n_frames):
    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32, test_mode=True)
    images, poses, intr = _scene(rng, N=n_frames)
    scale = jnp.full((1,), 1.5)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)

    ref = model.apply(params, images, poses, intr, scale)

    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale, mesh)

    assert out.shape == ref.shape
    # view-mean is reduced in a different order (volume-level psum vs
    # per-view lookup mean); agreement to ~1e-4 over 4 iterations is
    # exact-modulo-fp32-rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_view_sharded_on_two_shards(rng):
    model = RAFT(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    images, poses, intr = _scene(rng, N=5, H=16, W=16)
    scale = jnp.ones((1,))
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    ref = model.apply(params, images, poses, intr, scale)
    mesh = make_mesh(n_data=4, n_view=2)
    out = view_sharded_forward(model, params, images, poses, intr, scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
