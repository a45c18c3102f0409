"""Sampler tests, cross-checked against torch.grid_sample (CPU oracle) to pin
down the reference's exact align-corners / zero-padding semantics
(utils/bilinear_sampler.py:6-43)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cermvs_tpu.ops.sampling import (
    bilinear_sample,
    interp1d,
    resize_bilinear_align_corners,
)


def torch_sampler1(img_np, coords_np):
    """Literal bilinear_sampler1 (1-D along last axis, y passthrough)."""
    img = torch.from_numpy(img_np)  # (B, C, 1, D)
    coords = torch.from_numpy(coords_np)  # (B, 1, K, 2) pixel coords
    W = img.shape[-1]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True).numpy()


def test_interp1d_matches_grid_sample(rng):
    B, D, K = 6, 16, 11
    vals = rng.randn(B, D).astype(np.float32)
    # positions spanning in-range and out-of-range
    x = (rng.rand(B, K).astype(np.float32) * (D + 8)) - 4

    ours = np.asarray(interp1d(jnp.asarray(vals), jnp.asarray(x)))

    img = vals[:, None, None, :]  # (B, 1, 1, D)
    coords = np.stack([x, np.zeros_like(x)], -1)[:, None]  # (B,1,K,2)
    ref = torch_sampler1(img, coords)[:, 0, 0, :]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_interp1d_integer_positions(rng):
    vals = rng.randn(3, 8).astype(np.float32)
    x = np.tile(np.arange(8, dtype=np.float32), (3, 1))
    out = np.asarray(interp1d(jnp.asarray(vals), jnp.asarray(x)))
    np.testing.assert_allclose(out, vals, rtol=1e-6)


def test_bilinear_sample_matches_grid_sample(rng):
    H, W, C = 9, 13, 4
    img = rng.randn(H, W, C).astype(np.float32)
    n = 50
    coords = np.stack(
        [rng.rand(n) * (W + 4) - 2, rng.rand(n) * (H + 4) - 2], -1
    ).astype(np.float32)

    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))

    timg = torch.from_numpy(img.transpose(2, 0, 1))[None]  # (1,C,H,W)
    x = torch.from_numpy(coords[:, 0])
    y = torch.from_numpy(coords[:, 1])
    gx = 2 * x / (W - 1) - 1
    gy = 2 * y / (H - 1) - 1
    grid = torch.stack([gx, gy], -1).view(1, 1, n, 2)
    ref = F.grid_sample(timg, grid, align_corners=True).numpy()[0, :, 0, :].T
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bilinear_sample_mask(rng):
    H, W, C = 5, 5, 1
    img = np.ones((H, W, C), np.float32)
    coords = np.array([[2.0, 2.0], [-0.5, 2.0], [4.5, 2.0], [2.0, 6.0]], np.float32)
    _, mask = bilinear_sample(jnp.asarray(img), jnp.asarray(coords), with_mask=True)
    np.testing.assert_allclose(np.asarray(mask), [1.0, 0.0, 0.0, 0.0])


def test_resize_align_corners_matches_torch(rng):
    H, W = 7, 11
    OH, OW = 19, 29
    img = rng.randn(2, 3, H, W).astype(np.float32)
    ours = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(img), OH, OW)
    )
    ref = F.interpolate(
        torch.from_numpy(img), [OH, OW], mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_downsample_matches_torch(rng):
    img = rng.randn(1, 1, 16, 20).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), 4, 5))
    ref = F.interpolate(
        torch.from_numpy(img), [4, 5], mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
