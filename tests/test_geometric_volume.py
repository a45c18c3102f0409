"""Geometric end-to-end check of the full projective/sampling stack: build
the cost volume for a synthetic textured plane whose neighbor features are
exact warps of the reference; the argmax over hypotheses must sit at the true
inverse depth for interior pixels."""

import numpy as np
import jax.numpy as jnp
import pytest

from cermvs_tpu.ops.corr import build_corr_volume
from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses
from cermvs_tpu.ops.sampling import bilinear_sample


def test_volume_argmax_at_true_depth(rng):
    B, h, w, C = 1, 24, 32, 16
    Z = 25.0           # plane depth
    d_true = 1.0 / Z   # inverse depth
    n_hyp = 16
    incre = d_true / 6  # slab spans [0, 15/6 * d_true] from origin rule

    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 3, 1, 1))
    poses[:, 1, 0, 3] = 2.0   # x baseline
    poses[:, 2, 1, 3] = 1.5   # y baseline
    intr = np.tile(K, (B, 3, 1, 1))

    # smooth random reference texture (smoothness keeps bilinear warps exact
    # enough for a sharp correlation peak)
    f_ref = rng.randn(h * w, C).astype(np.float32)
    f_ref = f_ref.reshape(h, w, C)
    for _ in range(2):
        f_ref = (f_ref
                 + np.roll(f_ref, 1, 0) + np.roll(f_ref, -1, 0)
                 + np.roll(f_ref, 1, 1) + np.roll(f_ref, -1, 1)) / 5

    # neighbor features: sample the reference at the back-projected location
    # (inverse warp of the plane-induced homography)
    ii = jnp.array([0, 0])
    jj = jnp.array([1, 2])
    disps = jnp.full((B, 1, 1, h, w), d_true)
    fwd = np.asarray(pixel_coords_of_hypotheses(
        jnp.asarray(poses), jnp.asarray(intr), ii, jj, disps))[:, :, 0]
    # fwd[b, v, y, x] = position of ref pixel (x, y) in view v.
    # To make f_src(v) consistent we need the INVERSE map; use the pairs
    # (src<-ref): swap ii/jj.
    back = np.asarray(pixel_coords_of_hypotheses(
        jnp.asarray(poses), jnp.asarray(intr), jj, ii,
        jnp.full((B, 2, 1, h, w), d_true)))[:, :, 0]
    # back[b, v, y, x] = ref-view position seen from src pixel (x, y)...
    # (valid because the plane is fronto-parallel in every camera: depth is
    # constant so inverse depth in the src view is also d_true)
    f_srcs = []
    for v in range(2):
        f_srcs.append(np.asarray(bilinear_sample(
            jnp.asarray(f_ref), jnp.asarray(back[0, v]))))
    fmaps = jnp.asarray(
        np.stack([f_ref] + f_srcs, 0)[None])  # (1, 3, h, w, C)

    origin = jnp.full((B, 1, h, w), n_hyp // 2 * incre)
    vol = np.asarray(build_corr_volume(
        fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
        n_hyp, incre, hyp_chunk=4))  # (B, V, h, w, D)

    # slab positions: origin + (k - D//2)*incre = k*incre; true index:
    k_true = d_true / incre  # = 6
    interior = np.s_[0, :, 8:-8, 10:-10]
    am = vol.argmax(axis=-1)[interior]
    frac_correct = np.mean(np.abs(am - k_true) <= 1)
    assert frac_correct > 0.9, f"only {frac_correct:.2%} peaks at true depth"
