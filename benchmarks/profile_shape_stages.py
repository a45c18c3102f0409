"""Per-stage time budget of the inference forward at PRODUCTION shapes.

Round-3 VERDICT #1: the BENCH_NOTES budget table existed only at the DTU
scale-1 headline shape while the large shapes (DTU scale-2, TNT nf15)
looked 6-11x off area*view scaling.  This profiler times each stage at any
(H, W, nf) with device-resident inputs and scalar-fetch amortization, so
the table can name where large-shape time actually goes.

Usage (repo root, on the TPU):
    python benchmarks/profile_shape_stages.py 2304 3200 10
    python benchmarks/profile_shape_stages.py 1088 1920 15
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import dtu_ring_poses
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.ops import corr as corr_ops


def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def main(H=2304, W=3200, nf=10):
    N = nf + 1
    h, w, C, V = H // 4, W // 4, 64, N - 1
    rng = np.random.RandomState(0)
    images = jnp.asarray(
        (rng.rand(1, N, H, W, 3) * 255).astype(np.float32)).astype(
            jnp.bfloat16)
    K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
                  [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (1, N, 1, 1)))
    poses = jnp.asarray(dtu_ring_poses(N, None)[None])
    jax.block_until_ready(images)
    print(f"shape {H}x{W} nf{nf} (features {h}x{w}, V={V})", flush=True)

    model = RAFT(test_mode=True, hyp_chunk=8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, poses, intr,
                                 jnp.ones(1))

    rows = {}

    # 1) encoders (the test-mode per-frame fnet scan)
    def encoders(p, im):
        im = im.astype(jnp.float32) * (2 / 255.0) - 1
        def enc(mdl, carry, img):
            return carry, mdl.fnet(img)
        import flax.linen as nn
        fm = nn.scan(enc, variable_broadcast="params",
                     split_rngs={"params": False}, in_axes=1, out_axes=1)
        fmaps = model.apply(p, (), im, method=lambda m, c, x: fm(m, c, x))[1]
        return jnp.sum(fmaps.astype(jnp.float32))

    rows[f"fnet x{N} frames"] = timeit_scalar(jax.jit(encoders), params,
                                              images)

    # 2) exact mean-volume construction per stage
    fmaps = jnp.asarray(
        rng.rand(1, N, h, w, C).astype(np.float32)).astype(jnp.bfloat16)
    intr4 = intr.at[:, :, :2].divide(4.0)
    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)

    def build(fm, o, n_hyp, incre):
        return corr_ops.build_corr_volume(
            fm, poses, intr4, ii, jj, o, n_hyp, incre, 8, True,
            jnp.bfloat16).sum()

    for n_hyp, n_div, tag in [(64, 64, "volume stage0 D=64"),
                              (44, 320, "volume stage1 D=44")]:
        f = jax.jit(lambda fm, o, _n=n_hyp, _d=n_div: build(
            fm, o, _n, 0.0025 / _d))
        rows[tag] = timeit_scalar(f, fmaps, origin)

    # 3) 16 lookup iterations (2 stages x 8) on the mean volume
    vol = jnp.asarray(
        rng.rand(1, 1, h, w, 64).astype(np.float32))

    def scan16(v, o, z):
        pyr = corr_ops.CorrPyramid(corr_ops.build_pyramid(v, 3), o,
                                   0.0025 / 64, 64, 3)
        def body(zc, _):
            out = corr_ops.lookup(pyr, zc, 5)
            return zc + 1e-6 * out[..., 0], out.sum()
        _, s = jax.lax.scan(body, z, None, length=16)
        return s.sum()

    z0 = jnp.broadcast_to(origin[:, 0][:, None], (1, 1, h, w))
    rows["16x volume lookups"] = timeit_scalar(jax.jit(scan16), vol, origin,
                                               z0)

    # 4) full forward (device-resident, scalar fetch)
    fwd = jax.jit(lambda p, im: model.apply(p, im, poses, intr,
                                            jnp.ones(1)).sum())
    rows["FULL forward"] = timeit_scalar(fwd, params, images)

    other = rows["FULL forward"] - sum(
        v for k, v in rows.items() if k != "FULL forward")
    for k, v in rows.items():
        print(f"{k:26s} {v*1e3:9.1f} ms", flush=True)
    print(f"{'other (GRU/update/glue)':26s} {other*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]] or []
    main(*args)
