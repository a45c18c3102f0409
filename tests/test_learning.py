"""Learning smoke: overfitting a tiny synthetic plane dataset must drive the
depth error down substantially — functional evidence for the whole training
stack (volume -> lookups -> GRU -> loss -> AdamW) without real datasets."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses
from cermvs_tpu.ops.sampling import bilinear_sample
from cermvs_tpu.training.optim import fetch_optimizer
from cermvs_tpu.training.step import init_state, make_train_step


def make_plane_batch(rng, B=2, H=48, W=64, n_views=2, zmin=20.0, zmax=40.0,
                     baseline=(1.0, 2.5), focal=60.0):
    """Textured plane at random depth; neighbor images are exact warps.

    NOTE the scene scale must match the cascade's hypothesis range: the
    default cascade covers inverse depths up to ~0.0025 (the datasets scale
    scenes so min depth ~= 400, SURVEY.md C11); the tiny test cascade
    (16, 0.5, T) covers up to ~0.08 (depths >= ~12.5).
    """
    N = n_views + 1
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    images = np.zeros((B, N, H, W, 3), np.float32)
    depths = np.zeros((B, N, H, W), np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for b in range(B):
        Z = rng.uniform(zmin, zmax)
        tex = rng.rand(H, W, 3).astype(np.float32) * 255
        for _ in range(2):
            tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                   + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 5
        images[b, 0] = tex
        depths[b, :] = Z
        for v in range(1, N):
            poses[b, v, 0, 3] = rng.uniform(*baseline) * (1 if v % 2 else -1)
            back = np.asarray(pixel_coords_of_hypotheses(
                jnp.asarray(poses[b : b + 1]), jnp.asarray(np.tile(K, (1, N, 1, 1))),
                jnp.array([v]), jnp.array([0]),
                jnp.full((1, 1, 1, H, W), 1.0 / Z)))[0, 0, 0]
            images[b, v] = np.asarray(
                bilinear_sample(jnp.asarray(tex), jnp.asarray(back)))
    return {
        "images": jnp.asarray(images),
        "depths": jnp.asarray(depths),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(K, (B, N, 1, 1))),
    }


@pytest.mark.slow
def test_overfits_synthetic_planes(rng):
    # slab: incre = 0.0025/0.5 = 0.005; stage0 spans [0, 0.075] covering
    # inverse depths of Z in [20, 40] (0.025..0.05)
    model = RAFT(cascade=((16, 0.5, 3),), hyp_chunk=4, dtype=jnp.float32)
    tx, _ = fetch_optimizer(num_steps=60, lr=2e-3)
    batch = make_plane_batch(rng)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, donate=False)

    first = None
    for i in range(40):
        state, metrics = step(state, batch, 0.0)
        if i == 0:
            first = float(metrics["mean_depth_error"])
    last = float(metrics["mean_depth_error"])
    assert np.isfinite(last)
    # initial estimate (zeros) gives huge depth error; training must cut it
    assert last < 0.5 * first, f"depth error {first:.2f} -> {last:.2f}"
    assert last < 10.0, f"final mean depth error too high: {last:.2f}"
