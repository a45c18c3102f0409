"""Projective geometry ops (pure, jit-friendly).

Re-designs ``/root/reference/utils/projective_ops.py`` for XLA: analytic 4x4
intrinsic embedding/inverse and analytic rigid-pose inverse (no generic
``linalg.inv`` inside jit), einsum contraction that XLA maps onto the MXU.

Conventions (identical to the reference):
  * poses are world-to-camera 4x4 matrices,
  * ``disps`` are inverse depths ("disparities"),
  * a pixel of view i with inverse depth d is the homogeneous vector
    ``[x, y, 1, d]``; the relative projection is
    ``Pij = K_j @ P_j @ P_i^{-1} @ K_i^{-1}``
    (``utils/projective_ops.py:17-23``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(d: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous pixel grid ``[x, y, 1, d]``.

    ``d``: (..., H, W) inverse depths -> (..., H, W, 4).
    Mirrors ``utils/projective_ops.py:5-13``.
    """
    ht, wd = d.shape[-2], d.shape[-1]
    y = jax.lax.broadcasted_iota(d.dtype, (ht, wd), 0)
    x = jax.lax.broadcasted_iota(d.dtype, (ht, wd), 1)
    x = jnp.broadcast_to(x, d.shape)
    y = jnp.broadcast_to(y, d.shape)
    return jnp.stack([x, y, jnp.ones_like(d), d], axis=-1)


def embed_intrinsics(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """3x3 intrinsics -> 4x4 with K[3,3] = 1 (``utils/projective_ops.py:18-20``)."""
    shape = intrinsics.shape[:-2]
    K = jnp.zeros(shape + (4, 4), intrinsics.dtype)
    K = K.at[..., :3, :3].set(intrinsics)
    K = K.at[..., 3, 3].set(1.0)
    return K


def inv_intrinsics(intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of the embedded 4x4 intrinsics.

    Assumes a standard pinhole K = [[fx, s, cx], [0, fy, cy], [0, 0, 1]].
    """
    fx = intrinsics[..., 0, 0]
    fy = intrinsics[..., 1, 1]
    cx = intrinsics[..., 0, 2]
    cy = intrinsics[..., 1, 2]
    s = intrinsics[..., 0, 1]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    ifx = 1.0 / fx
    ify = 1.0 / fy
    row0 = jnp.stack([ifx, -s * ifx * ify, (s * cy - cx * fy) * ifx * ify, zeros], -1)
    row1 = jnp.stack([zeros, ify, -cy * ify, zeros], -1)
    row2 = jnp.stack([zeros, zeros, ones, zeros], -1)
    row3 = jnp.stack([zeros, zeros, zeros, ones], -1)
    return jnp.stack([row0, row1, row2, row3], -2)


def inv_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a rigid 4x4 [R|t; 0 1] transform."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], pose.dtype), pose.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def relative_projection(
    poses: jnp.ndarray, intrinsics: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray
) -> jnp.ndarray:
    """Pij = K_j P_j P_i^{-1} K_i^{-1} for each (i, j) pair.

    poses: (B, N, 4, 4); intrinsics: (B, N, 3, 3); ii/jj: (V,) index arrays.
    Returns (B, V, 4, 4).
    """
    K = embed_intrinsics(intrinsics)
    Kinv = inv_intrinsics(intrinsics)
    Pinv = inv_pose(poses)
    Ki = jnp.take(Kinv, ii, axis=1)
    Kj = jnp.take(K, jj, axis=1)
    Pi_inv = jnp.take(Pinv, ii, axis=1)
    Pj = jnp.take(poses, jj, axis=1)
    return Kj @ Pj @ Pi_inv @ Ki


def projective_transform(
    poses: jnp.ndarray,
    disps: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
) -> jnp.ndarray:
    """Map every (pixel, inverse-depth) of view i to pixel coords in view j.

    disps: (B, V, ..., H, W) inverse-depth hypotheses per pair (dim 1 indexed
    by the pair, matching ``disps[:, ii]`` pre-applied by the caller or a
    broadcastable size-1 axis).
    Returns homogeneous (B, V, ..., H, W, 4) already perspective-divided,
    mirroring ``utils/projective_ops.py:16-27``.
    """
    Pij = relative_projection(poses, intrinsics, ii, jj)
    x0 = coords_grid(disps)
    # (B,V,4,4) x (B,V,...,4) -> (B,V,...,4); einsum maps onto MXU-friendly
    # batched matmul after flattening the spatial dims.
    x1 = jnp.einsum("bvkh,bv...h->bv...k", Pij, x0)
    return x1 / x1[..., 2:3]


def apply_projection(Pij: jnp.ndarray, disps: jnp.ndarray,
                     clamp: float = 1e4) -> jnp.ndarray:
    """Apply precomputed relative projections to a hypothesis slab.

    Pij: (B, V, 4, 4); disps: (B, V or 1, ..., H, W) -> (B, V, ..., H, W, 2)
    sample coordinates, clamped to +-clamp (``core/corr.py:75``).  Separated
    from :func:`projective_transform` so view-sharded callers can shard the
    (tiny) Pij instead of whole pose/intrinsic stacks.
    """
    V = Pij.shape[1]
    if disps.shape[1] == 1 and V > 1:
        disps = jnp.broadcast_to(disps, (disps.shape[0], V) + disps.shape[2:])
    x0 = coords_grid(disps)
    x1 = jnp.einsum("bvkh,bv...h->bv...k", Pij, x0)
    xy = x1[..., :2] / x1[..., 2:3]
    return jnp.clip(xy, -clamp, clamp)


def pixel_coords_of_hypotheses(
    poses, intrinsics, ii, jj, disps, clamp: float = 1e4
) -> jnp.ndarray:
    """(x, y) sample coordinates in view j for each hypothesis.

    disps: (B, 1 or V, D, H, W) -> returns (B, V, D, H, W, 2), clamped to
    +-clamp like ``core/corr.py:75``.
    """
    Pij = relative_projection(poses, intrinsics, ii, jj)
    return apply_projection(Pij, disps, clamp)
