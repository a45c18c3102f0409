"""Does XLA CSE fold the identical stage-0/stage-1 rect warps?

Both cascade stages warp the SAME features through the SAME rect geometry
(only base/sigma/D differ).  Compare jit(stage0+stage1 together) against
jit(stage0) + jit(stage1) — if the combined time is close to the sum, CSE is
NOT folding the shared warps and the builder should share them explicitly.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops.rectify import plan_rectification
from cermvs_tpu.ops.corr_rectified import build_corr_volume_rectified
from bench import dtu_ring_poses, H, W, NUM_FRAMES

n = NUM_FRAMES + 1
h, w = H // 4, W // 4
poses = jnp.asarray(dtu_ring_poses(n, np.random.RandomState(1))[None])
K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
              [0, 0, 1]], np.float32)
K4 = np.tile(K, (1, n, 1, 1)).copy()
K4[..., :2, :] /= 4
intr = jnp.asarray(K4)
plan = plan_rectification(np.asarray(poses), K4, h, w)
ii = jnp.zeros(n - 1, jnp.int32)
jj = jnp.arange(1, n, dtype=jnp.int32)
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.randn(1, n, h, w, 64).astype(np.float32)).astype(
    jnp.bfloat16)
org0 = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
org1 = jnp.asarray(rng.rand(1, 1, h, w).astype(np.float32) * 0.002)


def stage0(fm, po, it, og):
    return build_corr_volume_rectified(
        fm, po, it, ii, jj, og, 64, 0.0025 / 64, plan, mean_over_views=True,
        gather_dtype=jnp.bfloat16, zero_slab=True)


def stage1(fm, po, it, og):
    return build_corr_volume_rectified(
        fm, po, it, ii, jj, og, 44, 0.0025 / 44, plan, mean_over_views=True,
        gather_dtype=jnp.bfloat16)


def timeit(label, f, *args, n_iter=4):
    out = f(*args)
    float(sum(x.sum() for x in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
        float(sum(x.sum().astype(jnp.float32)
                  for x in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)


timeit("stage0 alone", jax.jit(lambda fm, po, it: stage0(fm, po, it, org0)),
       fmaps, poses, intr)
timeit("stage1 alone", jax.jit(lambda fm, po, it: stage1(fm, po, it, org1)),
       fmaps, poses, intr)
timeit("both in one jit",
       jax.jit(lambda fm, po, it: (stage0(fm, po, it, org0),
                                   stage1(fm, po, it, org1))),
       fmaps, poses, intr)
