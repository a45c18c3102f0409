"""Component breakdown of the rectified construction at bench shapes.

Times (TPU, honest host-fetch sync):
  1. rect_features (geometry + all-view feature warps)
  2. stage 0 construction GIVEN the shared ctx (kernel + back-warp only)
  3. stage 1 construction GIVEN the shared ctx
  4. the volume back-warps alone (9 views, D=64)
  5. combined stage0+stage1 via the sharing closure vs direct calls (CSE only)
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.rectify import plan_rectification
from cermvs_tpu.ops.corr_rectified import (
    build_corr_volume_rectified, make_rectified_volume_fn, rect_features)
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
print("plan:", plan.h_r, plan.w_r, plan.s_max, plan.view_s_max, flush=True)
ii = jnp.zeros(n - 1, jnp.int32)
jj = jnp.arange(1, n, dtype=jnp.int32)
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.randn(1, n, h, w, 64).astype(np.float32)).astype(
    jnp.bfloat16)
org0 = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
org1 = jnp.asarray(rng.rand(1, 1, h, w).astype(np.float32) * 0.002)


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f)
    out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
    float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out)))
    dt = (time.perf_counter() - t0) / n_iter * 1000
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


def feats(fm):
    return rect_features(fm, poses, intr, ii, jj, plan, jnp.bfloat16)


timeit("rect_features (geo + 9-view warps)", feats, fmaps)


def stage0_ctx(fm, og):
    ctx = feats(fm)
    return build_corr_volume_rectified(
        fm, poses, intr, ii, jj, og, 64, 0.0025 / 64, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16, zero_slab=True,
        rect_ctx=ctx)


def stage1_ctx(fm, og):
    ctx = feats(fm)
    return build_corr_volume_rectified(
        fm, poses, intr, ii, jj, og, 44, 0.0025 / 44, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16, rect_ctx=ctx)


t0i = timeit("stage0 (incl feats)", stage0_ctx, fmaps, org0)
t1i = timeit("stage1 (incl feats)", stage1_ctx, fmaps, org1)


def backwarp_only(fm):
    ctx = feats(fm)
    geo, warped = ctx
    fwx, fwy = geo["fwd_xy"] if geo["fwd_xy"] is not None else (None, None)
    acc = None
    for v in range(n - 1):
        vol = (warped[v][0][:, : plan.w_r // 2] @
               jnp.swapaxes(warped[v][1][:, : 64], 1, 2)).astype(jnp.float32)
        # shape (h_r, w_r//2 ... ) — build a (h_r, w_r, 64) stand-in volume
        vol = jnp.broadcast_to(vol[:, :, :1], (plan.h_r, plan.w_r // 2, 64))
        vol = jnp.concatenate([vol, vol], axis=1)
        if fwx is None:
            bw = rectify.warp_image_twopass(
                vol.astype(jnp.bfloat16), geo["H_fwd"][v], h, w)
        else:
            bw = rectify.warp_image(vol, fwx[v], fwy[v])
        acc = bw if acc is None else acc + bw
    return acc


timeit("9x back-warp D=64 (+ tiny matmul stand-in)", backwarp_only, fmaps)


def combined_shared(fm, og0, og1):
    vfn = make_rectified_volume_fn(plan)
    a = vfn(fm, poses, intr, ii, jj, og0, 64, 0.0025 / 64,
            mean_over_views=True, gather_dtype=jnp.bfloat16, zero_slab=True)
    b = vfn(fm, poses, intr, ii, jj, og1, 44, 0.0025 / 44,
            mean_over_views=True, gather_dtype=jnp.bfloat16)
    return a, b


def combined_direct(fm, og0, og1):
    a = build_corr_volume_rectified(
        fm, poses, intr, ii, jj, og0, 64, 0.0025 / 64, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16, zero_slab=True)
    b = build_corr_volume_rectified(
        fm, poses, intr, ii, jj, og1, 44, 0.0025 / 44, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16)
    return a, b


timeit("stage0+stage1, explicit sharing", combined_shared, fmaps, org0, org1)
timeit("stage0+stage1, direct (CSE only)", combined_direct, fmaps, org0, org1)


# isolate the combined-jit gap: both stages with the ctx PRECOMPUTED and
# passed in as jit inputs (no warp work inside)
ctx_val = jax.jit(feats)(fmaps)
ctx_val = jax.tree_util.tree_map(jnp.asarray, ctx_val)


def combined_given_ctx(ctx, og0, og1):
    a = build_corr_volume_rectified(
        fmaps, poses, intr, ii, jj, og0, 64, 0.0025 / 64, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16, zero_slab=True,
        rect_ctx=ctx)
    b = build_corr_volume_rectified(
        fmaps, poses, intr, ii, jj, og1, 44, 0.0025 / 44, plan,
        mean_over_views=True, gather_dtype=jnp.bfloat16, rect_ctx=ctx)
    return a, b


timeit("stage0+stage1 given precomputed ctx", combined_given_ctx,
       ctx_val, org0, org1)
