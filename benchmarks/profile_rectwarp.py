"""Cost split of the rectified construction's non-kernel parts on TPU.

Times, at bench-scene production scale (plan h_r=512 w_r=512 ws=1104, V=10,
feature grid 288x400 C=64): rect_geometry (homography grids), the three
warp_image resamples, and the full build_corr_volume_rectified (oracle off,
pallas on) — to locate the 0.69-maps/s bottleneck.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.rectify import plan_rectification
from cermvs_tpu.ops.corr_rectified import build_corr_volume_rectified

sys.path.insert(0, "/root/repo")
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
print("plan:", plan, flush=True)
ii = jnp.zeros(n - 1, jnp.int32)
jj = jnp.arange(1, n, dtype=jnp.int32)
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.randn(1, n, h, w, 64).astype(np.float32)).astype(
    jnp.bfloat16)
origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)


def timeit(label, f, *args, n_iter=5):
    t0 = time.perf_counter()
    v = jax.tree_util.tree_map(np.asarray, f(*args))
    t1 = time.perf_counter()
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
        # force: fetch a scalar reduce
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.stack([x.sum().astype(jnp.float32) for x in leaves]).sum())
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{label}: {dt*1e3:.1f} ms (compile {t1-t0:.0f}s)", flush=True)


geo_fn = jax.jit(lambda p, k: rectify.rect_geometry(p, k, ii, jj, h, w, plan))
timeit("rect_geometry (all grids)", geo_fn, poses, intr)

geo = geo_fn(poses, intr)
f_ref = (fmaps.astype(jnp.float32) / 8).astype(jnp.bfloat16)[0, 0]


def warps_only(rrx, rry, rsx, rsy, fs):
    fr_rect = jax.vmap(lambda x, y: rectify.warp_image(f_ref, x, y))(rrx, rry)
    fs_rect = jax.vmap(rectify.warp_image)(fs, rsx, rsy)
    return fr_rect.astype(jnp.bfloat16).sum(), fs_rect.astype(
        jnp.bfloat16).sum()


f_src = jnp.broadcast_to(f_ref, (n - 1,) + f_ref.shape)
timeit("feature warps (ref+src, 10 views)", jax.jit(warps_only),
       *geo["ref_ref_xy"], *geo["ref_src_xy"], f_src)


def backwarp_only(vol_rect, fwx, fwy):
    return jax.vmap(rectify.warp_image)(vol_rect, fwx, fwy).sum()


vol = jnp.asarray(rng.randn(n - 1, plan.h_r, plan.w_r, 64).astype(np.float32))
timeit("volume back-warp (D=64, 10 views)", jax.jit(backwarp_only), vol,
       *geo["fwd_xy"])

for D, name in ((64, "stage0 D=64"), (44, "stage1 D=44")):
    fn = jax.jit(lambda fm, po, it, og, D=D: build_corr_volume_rectified(
        fm, po, it, ii, jj, og, D, 0.0025 / D, plan, mean_over_views=True,
        gather_dtype=jnp.bfloat16, impl="pallas"))
    timeit(f"full build {name} (pallas, mean)", fn, fmaps, poses, intr, origin,
           n_iter=3)
