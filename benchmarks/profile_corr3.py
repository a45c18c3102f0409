"""Construction variants round 3: quad-corner rows + chunk sweep.

Quad packing: precompute (H*(W+2), 4C) rows holding all four bilinear corners
[f[y,x], f[y,x+1], f[y+1,x], f[y+1,x+1]] so ONE gather per (pixel, hypothesis)
fetches 4C contiguous floats (1 KB) — 4x fewer gather descriptors than the
original per-corner formulation.
"""

import math
import time

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection, apply_projection


def timeit(fn, *args, iters=3):
    out = fn(*args)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / iters


def make_quads(f_src):
    """(B,V,H,W,C) -> (B,V,(H+2)*(W+2),4C): row i holds the four bilinear
    corners [f[y,x], f[y,x+1], f[y+1,x], f[y+1,x+1]] of padded coords."""
    B, V, H, W, C = f_src.shape
    Wp = W + 2
    f_pad = jnp.pad(f_src, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    flat = f_pad.reshape(B, V, (H + 2) * Wp, C)
    r1 = jnp.roll(flat, -1, axis=2)
    rW = jnp.roll(flat, -Wp, axis=2)
    rW1 = jnp.roll(flat, -(Wp + 1), axis=2)
    return jnp.concatenate([flat, r1, rW, rW1], axis=-1)


def variant_quads(f_ref, f_quads, Pij, origin, n_hyp, incre, hyp_chunk, H, W):
    B, V = f_ref.shape[:2]
    C = f_ref.shape[-1]
    Wp = W + 2

    n_chunks = max(1, math.ceil(n_hyp / hyp_chunk))
    padded = n_chunks * hyp_chunk
    offsets = (jnp.arange(padded) - n_hyp // 2).astype(jnp.float32) * incre
    offsets = offsets.reshape(n_chunks, hyp_chunk)

    def one_chunk(offs):
        disps = origin[:, :, None, :, :] + offs[None, None, :, None, None]
        coords = apply_projection(Pij, disps)
        x, y = coords[..., 0], coords[..., 1]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)
        fy = (y - y0)
        ix = x0.astype(jnp.int32)
        iy = y0.astype(jnp.int32)
        K = offs.shape[0]

        xp = jnp.clip(ix + 1, 0, W)
        yp = jnp.clip(iy + 1, 0, H)
        idx = yp * Wp + xp
        in_x0 = ((ix >= 0) & (ix <= W - 1)).astype(jnp.float32)
        in_x1 = ((ix + 1 >= 0) & (ix + 1 <= W - 1)).astype(jnp.float32)
        in_y0 = ((iy >= 0) & (iy <= H - 1)).astype(jnp.float32)
        in_y1 = ((iy + 1 >= 0) & (iy + 1 <= H - 1)).astype(jnp.float32)
        w4 = jnp.stack([
            (1 - fx) * (1 - fy) * in_x0 * in_y0,
            fx * (1 - fy) * in_x1 * in_y0,
            (1 - fx) * fy * in_x0 * in_y1,
            fx * fy * in_x1 * in_y1,
        ], axis=-1)  # (B,V,K,H,W,4)

        g = jnp.take_along_axis(
            f_quads, idx.reshape(B, V, K * H * W)[..., None], axis=2)
        g = g.reshape(B, V, K, H, W, 4, C)
        return jnp.einsum("bvkhwqc,bvhwc,bvkhwq->bvkhw", g, f_ref, w4)

    out = jax.lax.map(one_chunk, offsets)
    out = jnp.moveaxis(out, 0, 2).reshape(B, V, padded, H, W)[:, :, :n_hyp]
    return jnp.moveaxis(out, 2, -1)


def main():
    H, W = 512, 640
    N, C = 5, 64
    h, w = H // 4, W // 4
    V = N - 1
    rng = np.random.RandomState(0)
    fmaps = jnp.asarray(rng.rand(1, N, h, w, C).astype(np.float32))
    K = np.array([[900.0, 0, w / 2], [0, 900.0, h / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (1, N, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
    for i in range(1, N):
        poses[0, i, :3, 3] = rng.randn(3) * 20
    poses = jnp.asarray(poses)
    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
    n_hyp, incre = 64, 0.0025 / 64

    f = fmaps / 8.0
    f_ref = jnp.take(f, ii, axis=1)
    f_src = jnp.take(f, jj, axis=1)
    Pij = relative_projection(poses, intr, ii, jj)

    base = None
    for chunk in [16, 32, 64]:
        fB = jax.jit(lambda fr, fs, o, _c=chunk: corr_ops.build_corr_volume_from(
            fr, fs, Pij, o, n_hyp, incre, _c))
        t = timeit(fB, f_ref, f_src, origin)
        v = fB(f_ref, f_src, origin)
        if base is None:
            base = v
        print(f"pairs chunk={chunk:2d}:   {t*1e3:7.1f} ms  "
              f"err={float(jnp.max(jnp.abs(v - base))):.6f}")

    quads = make_quads(f_src)
    for chunk in [16, 32, 64]:
        fQ = jax.jit(lambda fr, q, o, _c=chunk: variant_quads(
            fr, q, Pij, o, n_hyp, incre, _c, h, w))
        t = timeit(fQ, f_ref, quads, origin)
        v = fQ(f_ref, quads, origin)
        print(f"quads chunk={chunk:2d}:   {t*1e3:7.1f} ms  "
              f"err={float(jnp.max(jnp.abs(v - base))):.6f}")


if __name__ == "__main__":
    main()
