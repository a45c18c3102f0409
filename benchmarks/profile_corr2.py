"""Measure cost-volume construction variants + banded lookup on the TPU.

Variants:
  A: current take_along_axis per corner (fp32)
  B: paired-corner rows (concat+roll -> one 2C-row take per y-pair)
  C: B with bf16 gather operand, fp32 accumulation
  D: banded lookup vs gather lookup timing
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection, apply_projection


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def variant_pairs(f_ref, f_src, Pij, origin, n_hyp, incre, hyp_chunk,
                  gather_dtype):
    """Paired-corner gather: one take of a (2C)-row per corner y-pair."""
    B, V, H, W, C = f_ref.shape
    fsf = f_src.reshape(B, V, H * W, C).astype(gather_dtype)
    # (HW, 2C): row i holds f[i] ++ f[i+1]
    rolled = jnp.roll(fsf, -1, axis=2)
    f_pairs = jnp.concatenate([fsf, rolled], axis=-1)  # (B,V,HW,2C)

    import math
    n_chunks = max(1, math.ceil(n_hyp / hyp_chunk))
    padded = n_chunks * hyp_chunk
    offsets = (jnp.arange(padded) - n_hyp // 2).astype(jnp.float32) * incre
    offsets = offsets.reshape(n_chunks, hyp_chunk)

    def one_chunk(offs):
        disps = origin[:, :, None, :, :] + offs[None, None, :, None, None]
        coords = apply_projection(Pij, disps)
        x, y = coords[..., 0], coords[..., 1]
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = x - x0f
        fy = y - y0f
        ix = x0f.astype(jnp.int32)
        iy = y0f.astype(jnp.int32)
        K = offs.shape[0]

        def ypair(iyr, wrow):
            inside_y = (iyr >= 0) & (iyr <= H - 1)
            inside_x0 = (ix >= 0) & (ix <= W - 1)
            inside_x1 = (ix + 1 >= 0) & (ix + 1 <= W - 1)
            idx = jnp.clip(iyr, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            g = jnp.take_along_axis(
                f_pairs, idx.reshape(B, V, K * H * W)[..., None], axis=2)
            g = g.reshape(B, V, K, H, W, 2 * C).astype(jnp.float32)
            d0 = jnp.einsum("bvkhwc,bvhwc->bvkhw", g[..., :C], f_ref)
            d1 = jnp.einsum("bvkhwc,bvhwc->bvkhw", g[..., C:], f_ref)
            w0 = (1 - fx) * wrow * (inside_y & inside_x0)
            w1 = fx * wrow * (inside_y & inside_x1)
            return d0 * w0 + d1 * w1

        return ypair(iy, 1 - fy) + ypair(iy + 1, fy)

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

    fA = jax.jit(lambda fr, fs, o: corr_ops.build_corr_volume_from(
        fr, fs, Pij, o, n_hyp, incre, 16))
    tA = timeit(fA, f_ref, f_src, origin)
    volA = fA(f_ref, f_src, origin)
    print(f"A take_along_axis fp32:      {tA*1e3:7.1f} ms")

    for tag, dt in [("B pairs fp32", jnp.float32), ("C pairs bf16", jnp.bfloat16)]:
        fB = jax.jit(lambda fr, fs, o, _dt=dt: variant_pairs(
            fr, fs, Pij, o, n_hyp, incre, 16, _dt))
        tB = timeit(fB, f_ref, f_src, origin)
        volB = fB(f_ref, f_src, origin)
        err = float(jnp.max(jnp.abs(volA - volB)))
        print(f"{tag}:            {tB*1e3:7.1f} ms   max|err|={err:.5f}")

    # lookup comparison
    vol = jnp.asarray(rng.rand(1, V, h, w, 64).astype(np.float32))
    origin4 = origin
    pyr = corr_ops.CorrPyramid(
        levels=corr_ops.build_pyramid(vol, 3), origin=origin4,
        incre=incre, n_hyp=64)
    zinv = jnp.broadcast_to(origin4[:, 0][:, None], (1, V, h, w)) + 0.001
    x0 = jnp.maximum((zinv - origin4) / incre + 32, 0.0)

    fband = jax.jit(lambda x: corr_ops._lookup_banded(pyr.levels, x, 5))
    t = timeit(fband, x0, iters=10)
    print(f"D banded lookup:             {t*1e3:7.1f} ms/iter "
          f"(x16 = {16*t*1e3:.0f} ms)")

    from cermvs_tpu.ops.sampling import interp1d
    def gather_lookup(x0):
        dx = jnp.arange(-5, 6, dtype=x0.dtype)
        outs = []
        for i, corr in enumerate(pyr.levels):
            taps = x0[..., None] / (2.0 ** i) + dx
            outs.append(interp1d(corr, taps))
        return jnp.concatenate(outs, axis=-1)
    fg = jax.jit(gather_lookup)
    t = timeit(fg, x0, iters=3)
    print(f"E gather lookup (old):       {t*1e3:7.1f} ms/iter")
    err = float(jnp.max(jnp.abs(fband(x0) - fg(x0))))
    print(f"banded vs gather max|err| = {err:.6f}")


if __name__ == "__main__":
    main()
