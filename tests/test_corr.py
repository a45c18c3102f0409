"""Cost-volume tests: the chunked gather/dot construction against a dense
per-sample oracle, pyramid pooling, shift rule, and lookup semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.ops.corr import (
    build_corr_pyramid,
    build_corr_volume,
    build_pyramid,
    lookup,
    slab_origin,
)
from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses


def _random_scene(rng, B=1, N=3, H=8, W=10, C=16):
    fmaps = rng.randn(B, N, H, W, C).astype(np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.3 * n  # translate along x: epipolar shift
    return fmaps, poses, intr


def _oracle_volume(fmaps, poses, intr, ii, jj, origin, n_hyp, incre):
    """Direct per-sample oracle: project every hypothesis, bilinear-sample the
    source map, dot with reference feature (alt_cuda_corr semantics with
    radius=0: zero contribution from out-of-bounds corners)."""
    B, N, H, W, C = fmaps.shape
    V = len(ii)
    f = fmaps / 8.0
    offs = (np.arange(n_hyp) - n_hyp // 2) * incre
    disps = origin[:, :, None] + offs[None, None, :, None, None]  # (B,1,D,H,W)
    coords = np.asarray(
        pixel_coords_of_hypotheses(
            jnp.asarray(poses), jnp.asarray(intr), jnp.asarray(ii),
            jnp.asarray(jj), jnp.asarray(disps))
    )  # (B,V,D,H,W,2)
    out = np.zeros((B, V, H, W, n_hyp), np.float32)
    for b in range(B):
        for v in range(V):
            f1 = f[b, ii[v]]
            f2 = f[b, jj[v]]
            for d in range(n_hyp):
                for y in range(H):
                    for x in range(W):
                        sx, sy = coords[b, v, d, y, x]
                        x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                        fx, fy = sx - x0, sy - y0
                        acc = 0.0
                        for (cy, cx, w) in [
                            (y0, x0, (1 - fx) * (1 - fy)),
                            (y0, x0 + 1, fx * (1 - fy)),
                            (y0 + 1, x0, (1 - fx) * fy),
                            (y0 + 1, x0 + 1, fx * fy),
                        ]:
                            if 0 <= cy < H and 0 <= cx < W:
                                acc += w * float(f1[y, x] @ f2[cy, cx])
                        out[b, v, y, x, d] = acc
    return out


def test_volume_matches_oracle(rng):
    fmaps, poses, intr = _random_scene(rng)
    ii = np.array([0, 0])
    jj = np.array([1, 2])
    n_hyp, incre = 8, 0.01
    origin = np.full((1, 1, 8, 10), n_hyp // 2 * incre, np.float32)

    ours = np.asarray(
        build_corr_volume(
            jnp.asarray(fmaps), jnp.asarray(poses), jnp.asarray(intr),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(origin),
            n_hyp, incre, hyp_chunk=3)
    )
    ref = _oracle_volume(fmaps, poses, intr, ii, jj, origin, n_hyp, incre)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_volume_grad_flows_to_fmaps_not_coords(rng):
    fmaps, poses, intr = _random_scene(rng, H=6, W=6, C=8)
    ii, jj = jnp.array([0]), jnp.array([1])
    origin = jnp.full((1, 1, 6, 6), 0.04, jnp.float32)

    def loss_fmaps(f):
        v = build_corr_volume(f, jnp.asarray(poses), jnp.asarray(intr),
                              ii, jj, origin, 4, 0.01, hyp_chunk=4)
        return jnp.sum(v ** 2)

    g = jax.grad(loss_fmaps)(jnp.asarray(fmaps))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    # no gradient w.r.t. the pose/intrinsics path (coords are stop_gradient,
    # matching the CUDA backward's zero coords_grad)
    def loss_poses(p):
        v = build_corr_volume(jnp.asarray(fmaps), p, jnp.asarray(intr),
                              ii, jj, origin, 4, 0.01, hyp_chunk=4)
        return jnp.sum(v ** 2)

    gp = jax.grad(loss_poses)(jnp.asarray(poses))
    np.testing.assert_allclose(np.asarray(gp), 0.0, atol=1e-12)


def test_pyramid_avgpool(rng):
    corr = jnp.asarray(rng.randn(1, 2, 3, 4, 8).astype(np.float32))
    levels = build_pyramid(corr, 3)
    assert [l.shape[-1] for l in levels] == [8, 4, 2]
    np.testing.assert_allclose(
        np.asarray(levels[1][..., 0]),
        np.asarray((corr[..., 0] + corr[..., 1]) / 2),
        rtol=1e-6,
    )


def test_slab_origin_shift_rule():
    disp = jnp.asarray(np.array([[[[0.0, 0.05, 0.2]]]], np.float32))
    n_hyp, incre = 8, 0.01
    # stage 0: clamp up to D//2 * incre = 0.04
    out = np.asarray(slab_origin(disp, n_hyp, incre, shift=True))
    np.testing.assert_allclose(out[0, 0, 0], [0.04, 0.05, 0.2])
    # later stages: passthrough
    out = np.asarray(slab_origin(disp, n_hyp, incre, shift=False))
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 0.05, 0.2])


def test_lookup_shapes_and_center_tap(rng):
    """When zinv equals a slab position exactly, the center tap at level 0
    must return that hypothesis' correlation value."""
    fmaps, poses, intr = _random_scene(rng)
    ii = np.array([0, 0])
    jj = np.array([1, 2])
    n_hyp, incre = 8, 0.01
    disp0 = jnp.zeros((1, 1, 8, 10), jnp.float32)
    pyr = build_corr_pyramid(
        jnp.asarray(fmaps), jnp.asarray(poses), jnp.asarray(intr),
        jnp.asarray(ii), jnp.asarray(jj), disp0, n_hyp, incre,
        shift=True, num_levels=3, hyp_chunk=4)

    # choose zinv = origin + (k - D//2)*incre for k=5 -> index 5
    k = 5
    zinv = pyr.origin + (k - n_hyp // 2) * incre  # (B,1,H,W)
    zinv = jnp.broadcast_to(zinv, (1, 2, 8, 10))
    out = lookup(pyr, zinv, radius=2)
    assert out.shape == (1, 2, 8, 10, 3 * 5)
    center = out[..., 2]  # tap 0 of level 0 (radius 2 -> index 2)
    np.testing.assert_allclose(
        np.asarray(center), np.asarray(pyr.levels[0][..., k]), rtol=1e-4, atol=1e-5
    )


def test_lookup_clamps_below_zero(rng):
    """zinv far below the slab clamps the index to 0 (core/corr.py:107)."""
    fmaps, poses, intr = _random_scene(rng)
    ii, jj = np.array([0]), np.array([1])
    n_hyp, incre = 8, 0.01
    disp0 = jnp.zeros((1, 1, 8, 10), jnp.float32)
    pyr = build_corr_pyramid(
        jnp.asarray(fmaps), jnp.asarray(poses), jnp.asarray(intr),
        jnp.asarray(ii), jnp.asarray(jj), disp0, n_hyp, incre,
        shift=True, num_levels=1, hyp_chunk=4)
    zinv = jnp.full((1, 1, 8, 10), -10.0)
    out = lookup(pyr, zinv, radius=1)
    # index clamps to 0: taps at -1, 0, 1
    np.testing.assert_allclose(np.asarray(out[..., 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[..., 1]), np.asarray(pyr.levels[0][..., 0]), rtol=1e-5
    )
