"""Bilinear sampling ops, vectorized for XLA.

TPU-native replacements for ``/root/reference/utils/bilinear_sampler.py``.
Instead of wrapping ``grid_sample`` with imperative 16-way chunking
(``bilinear_sampler.py:16-23``), these are pure gather/lerp formulations that
vmap/jit cleanly; memory is governed by the caller's scan/shard granularity.

Semantics match ``F.grid_sample(align_corners=True, padding_mode='zeros')``:
coordinates are in pixel units, out-of-range corner taps contribute zero.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp1d(values: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation along the last axis with zero padding.

    values: (..., D); x: (..., K) fractional positions in [0, D-1] pixel units
    (positions outside contribute zero, matching the y-passthrough 1-D use of
    ``grid_sample`` in ``bilinear_sampler1``, ``utils/bilinear_sampler.py:6-25``).
    Returns (..., K).
    """
    D = values.shape[-1]
    x0 = jnp.floor(x)
    f = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    v0 = jnp.take_along_axis(values, jnp.clip(i0, 0, D - 1), axis=-1,
                             mode="clip")
    v1 = jnp.take_along_axis(values, jnp.clip(i1, 0, D - 1), axis=-1,
                             mode="clip")
    valid0 = ((i0 >= 0) & (i0 <= D - 1)).astype(values.dtype)
    valid1 = ((i1 >= 0) & (i1 <= D - 1)).astype(values.dtype)
    f = f.astype(values.dtype)
    return (1.0 - f) * v0 * valid0 + f * v1 * valid1


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray, with_mask: bool = False
):
    """Sample ``img`` (H, W, C) at pixel coords (..., 2) -> (..., C).

    Zero padding outside the image; align-corners pixel-coordinate convention
    (``utils/bilinear_sampler.py:29-43``).  When ``with_mask`` also returns a
    float mask of strictly-inside samples, used by fusion
    (``/root/reference/fusion.py:68``).
    """
    H, W, _ = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    flat = img.reshape(H * W, -1)

    def tap(iy, ix, w):
        inside = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        v = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (flat.shape[-1],))
        return v * (w * inside.astype(img.dtype))[..., None]

    out = (
        tap(iy0, ix0, (1 - fx) * (1 - fy))
        + tap(iy0, ix0 + 1, fx * (1 - fy))
        + tap(iy0 + 1, ix0, (1 - fx) * fy)
        + tap(iy0 + 1, ix0 + 1, fx * fy)
    )
    if with_mask:
        # strictly-inside mask in normalized coords, as fusion uses it
        gx = 2 * x / (W - 1) - 1
        gy = 2 * y / (H - 1) - 1
        mask = ((gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)).astype(img.dtype)
        return out, mask
    return out


def resize_bilinear_align_corners(img: jnp.ndarray, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True as two 1-D interp matmuls.

    Matches ``F.interpolate(mode='bilinear', align_corners=True)`` used by the
    loss (``/root/reference/loss.py:18``) and data pipeline, but maps onto the
    MXU instead of a gather.

    img: (..., H, W) -> (..., out_h, out_w).
    """
    H, W = img.shape[-2], img.shape[-1]

    def interp_matrix(n_out: int, n_in: int) -> jnp.ndarray:
        if n_in == 1:
            return jnp.ones((n_out, 1), img.dtype)
        if n_out == 1:
            m = jnp.zeros((1, n_in), img.dtype)
            return m.at[0, 0].set(1.0)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
        f = pos - i0.astype(jnp.float32)
        m = jnp.zeros((n_out, n_in), jnp.float32)
        rows = jnp.arange(n_out)
        m = m.at[rows, i0].add(1.0 - f)
        m = m.at[rows, i0 + 1].add(f)
        return m.astype(img.dtype)

    A = interp_matrix(out_h, H)
    B = interp_matrix(out_w, W)
    out = jnp.einsum("oh,...hw->...ow", A, img)
    return jnp.einsum("pw,...hw->...hp", B, out)
