"""Geometry op tests: analytic inverses, projection round-trips, and parity
with the reference formulation (torch-free dense oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cermvs_tpu.ops.geometry import (
    coords_grid,
    embed_intrinsics,
    inv_intrinsics,
    inv_pose,
    projective_transform,
    relative_projection,
)


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t = rng.randn(3) * 0.1
    P = np.eye(4)
    P[:3, :3] = q
    P[:3, 3] = t
    return P


def test_coords_grid_values():
    d = jnp.arange(6.0).reshape(1, 2, 3)
    g = coords_grid(d)
    assert g.shape == (1, 2, 3, 4)
    np.testing.assert_allclose(g[0, 1, 2], [2.0, 1.0, 1.0, 5.0])


def test_inv_intrinsics_matches_numpy(rng):
    K = np.array([[700.0, 0.0, 320.0], [0.0, 650.0, 240.0], [0.0, 0.0, 1.0]])
    K4 = embed_intrinsics(jnp.asarray(K))
    K4inv = inv_intrinsics(jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(K4 @ K4inv), np.eye(4), atol=1e-6)


def test_inv_pose(rng):
    P = random_pose(rng)
    Pinv = inv_pose(jnp.asarray(P))
    np.testing.assert_allclose(np.asarray(Pinv @ P), np.eye(4), atol=1e-6)


def test_relative_projection_identity(rng):
    """Pii must be identity: projecting a view into itself."""
    K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    P = random_pose(rng)
    poses = jnp.asarray(np.stack([P, P])[None])
    intr = jnp.asarray(np.stack([K, K])[None])
    ii = jnp.array([0])
    jj = jnp.array([0])
    Pij = relative_projection(poses, intr, ii, jj)
    np.testing.assert_allclose(np.asarray(Pij[0, 0]), np.eye(4), atol=1e-5)


def test_projective_transform_identity_pair(rng):
    """With identical poses, pixels map to themselves for any disparity."""
    K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
    P = random_pose(rng)
    poses = jnp.asarray(np.stack([P, P])[None])
    intr = jnp.asarray(np.stack([K, K])[None])
    disps = jnp.full((1, 1, 4, 6), 0.02)
    x1 = projective_transform(poses, disps, intr, jnp.array([0]), jnp.array([1]))
    g = coords_grid(disps)
    np.testing.assert_allclose(np.asarray(x1[..., :2]), np.asarray(g[..., :2]), atol=1e-4)


def test_projective_transform_against_dense_reference(rng):
    """Cross-check against a literal (inverse-using) implementation of
    utils/projective_ops.py:16-27."""
    B, N, H, W = 1, 3, 5, 7
    K = np.array([[50.0, 0, 3.0], [0, 55.0, 2.5], [0, 0, 1]])
    poses = np.stack([random_pose(rng) for _ in range(N)])[None]
    intr = np.tile(K, (1, N, 1, 1))
    disps = 0.01 + 0.05 * rng.rand(B, 2, H, W)
    ii = np.array([0, 0])
    jj = np.array([1, 2])

    # dense reference math
    Ks = np.zeros((B, N, 4, 4))
    Ks[..., :3, :3] = intr
    Ks[..., 3, 3] = 1.0
    Pij = (
        Ks[:, jj]
        @ poses[:, jj]
        @ np.linalg.inv(poses[:, ii])
        @ np.linalg.inv(Ks[:, ii])
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x0 = np.stack(
        [np.broadcast_to(xs, disps.shape), np.broadcast_to(ys, disps.shape),
         np.ones_like(disps), disps], -1)
    x1_ref = np.einsum("bvkh,bvyxh->bvyxk", Pij, x0)
    x1_ref = x1_ref / x1_ref[..., 2:3]

    x1 = projective_transform(
        jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr),
        jnp.asarray(ii), jnp.asarray(jj))
    np.testing.assert_allclose(np.asarray(x1), x1_ref, rtol=1e-4, atol=1e-4)


def test_forward_backward_projection_roundtrip(rng):
    """Project ref->src then src->ref recovers the original pixel."""
    K = np.array([[80.0, 0, 10.0], [0, 80.0, 8.0], [0, 0, 1]])
    P0, P1 = random_pose(rng), random_pose(rng)
    poses = jnp.asarray(np.stack([P0, P1])[None])
    intr = jnp.asarray(np.tile(K, (1, 2, 1, 1)))
    disps = jnp.full((1, 1, 8, 10), 0.05)

    fwd = projective_transform(poses, disps, intr, jnp.array([0]), jnp.array([1]))
    # feed forward result (x, y, inverse depth in src frame) back
    src_disp = disps / fwd[..., 3] * 1.0  # d' = d / w after divide; recompute:
    # After perspective divide, component 3 is d_src / z_src i.e. the src-view
    # inverse depth of the same 3D point.
    src_disp = fwd[..., 3]
    # build grid at src coords — use transform back with the sampled coords
    Pji = relative_projection(poses, intr, jnp.array([1]), jnp.array([0]))
    pts = jnp.concatenate([fwd[..., 0:1], fwd[..., 1:2], jnp.ones_like(src_disp)[..., None], src_disp[..., None]], -1)
    back = jnp.einsum("bvkh,bvyxh->bvyxk", Pji, pts)
    back = back / back[..., 2:3]
    g = coords_grid(disps)
    np.testing.assert_allclose(np.asarray(back[..., :2]), np.asarray(g[..., :2]), atol=1e-3)
