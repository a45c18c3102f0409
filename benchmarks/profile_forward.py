"""Post-optimization breakdown of the full-size inference forward.

Times (scalar-fetch, amortized in-graph): encoders, per-stage mean-volume
construction, 8-iteration lookup+GRU scan, and the full model, at the DTU
scale-1 shape.  Run from repo root: python benchmarks/profile_forward.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection


def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    H, W, N = 1152, 1600, 11
    h, w, C, V = H // 4, W // 4, 64, N - 1
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(1, N, H, W, 3) * 255).astype(np.float32))
    K = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
                  [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (1, N, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (1, N, 1, 1))
    for i in range(1, N):
        poses[0, i, :3, 3] = rng.randn(3) * 20
    poses = jnp.asarray(poses)

    model = RAFT(test_mode=True, hyp_chunk=8)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr,
                        jnp.ones(1))

    # 1) encoders only
    def encoders(p, im):
        im = im.astype(jnp.float32) * (2 / 255.0) - 1
        def enc(mdl, carry, img):
            return carry, mdl.fnet(img)
        import flax.linen as nn
        fm = nn.scan(enc, variable_broadcast="params",
                     split_rngs={"params": False}, in_axes=1, out_axes=1)
        fmaps = model.apply(p, (), im, method=lambda m, c, x: fm(m, c, x))[1]
        return jnp.sum(fmaps.astype(jnp.float32))

    t = timeit_scalar(jax.jit(encoders), params, images)
    print(f"fnet x{N} frames:           {t*1e3:7.1f} ms")

    # 2) stage-0 mean-volume construction
    fmaps = jnp.asarray(rng.rand(1, N, h, w, C).astype(np.float32))
    intr4 = intr.at[:, :, :2].divide(4.0)
    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)

    def build(fm, o, n_hyp, incre):
        return corr_ops.build_corr_volume(
            fm, poses, intr4, ii, jj, o, n_hyp, incre, 8, True,
            jnp.bfloat16).sum()

    for n_hyp, n_div, tag in [(64, 64, "stage0 D=64"), (44, 320, "stage1 D=44")]:
        f = jax.jit(lambda fm, o, _n=n_hyp, _d=n_div: build(
            fm, o, _n, 0.0025 / _d))
        t = timeit_scalar(f, fmaps, origin)
        print(f"mean-volume {tag}:     {t*1e3:7.1f} ms")

    # 3) 8-iteration lookup on the mean volume (B,1,...)
    vol = jnp.asarray(rng.rand(1, 1, h, w, 64).astype(np.float32))

    def scan8(v, o, z):
        pyr = corr_ops.CorrPyramid(corr_ops.build_pyramid(v, 3), o,
                                   0.0025 / 64, 64, 3)
        def body(zc, _):
            out = corr_ops.lookup(pyr, zc, 5)
            return zc + 1e-6 * out[..., 0], out.sum()
        _, s = jax.lax.scan(body, z, None, length=8)
        return s.sum()

    z0 = jnp.broadcast_to(origin[:, 0][:, None], (1, 1, h, w))
    t = timeit_scalar(jax.jit(scan8), vol, origin, z0)
    print(f"8x mean-volume lookups:     {t*1e3:7.1f} ms")

    # 4) full forward
    fwd = jax.jit(lambda p, im: model.apply(p, im, poses, intr,
                                            jnp.ones(1)).sum())
    t = timeit_scalar(fwd, params, images)
    print(f"FULL forward:               {t*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
