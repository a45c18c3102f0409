"""Volume back-warp (rect grid -> image grid) variants at bench shapes.

profile_rect_parts.py: construction = feats 18.4 + stage0 46 + stage1 71 ms;
the twopass hat back-warps (9 views x D=64 per stage, ~2.2 ms each on the
XLA engine) are a major slice and run at ~5% MFU (M=64 batched matmuls).
Variants:

  loop      — current: per-view warp_image_twopass, python loop + mean
  loop_f32  — same in fp32 (accuracy-class comparison)
  p2concat  — pass 1 per view, pass 2 as ONE matmul with the view axis
              folded into the contraction (K: h_r -> V*h_r); the cross-view
              mean is linear in pass 2, so summing there is exact
  pallas    — per-view engine="pallas" (hat tiles in VMEM)

Run: python benchmarks/profile_backwarp.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from bench import H, W, NUM_FRAMES, dtu_ring_poses
from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.rectify import (_twopass_maps, homography_grid,
                                    plan_rectification)

n = NUM_FRAMES + 1
V = n - 1
h, w = H // 4, W // 4
D = 64
poses = np.asarray(dtu_ring_poses(n, np.random.RandomState(1))[None])
K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
              [0, 0, 1]], np.float32)
K4 = np.tile(K, (1, n, 1, 1)).copy()
K4[..., :2, :] /= 4
plan = plan_rectification(poses, K4, h, w)
print("plan:", plan.h_r, plan.w_r, "twopass:", plan.twopass, flush=True)
assert plan.twopass

from cermvs_tpu.ops.corr_rectified import rect_features

ii = jnp.zeros(V, jnp.int32)
jj = jnp.arange(1, n, dtype=jnp.int32)
rng = np.random.RandomState(0)
fmaps = jnp.asarray(rng.randn(1, n, h, w, 64).astype(np.float32)).astype(
    jnp.bfloat16)
geo, _ = rect_features(fmaps, jnp.asarray(poses), jnp.asarray(K4), ii, jj,
                       plan, jnp.bfloat16)
Hf = jnp.stack([jnp.asarray(x) for x in jax.device_get(geo["H_fwd"])])

vols = jnp.asarray(
    rng.randn(V, plan.h_r, plan.w_r, D).astype(np.float32)).astype(
        jnp.bfloat16)


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f)
    try:
        out = f_j(*args)
        float(jnp.sum(out.astype(jnp.float32)))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{label}: {(time.perf_counter()-t0)/n_iter*1000:.1f} ms",
          flush=True)
    return np.asarray(out)


def loop(vols, Hf):
    acc = None
    for v in range(V):
        bw = rectify.warp_image_twopass(vols[v], Hf[v], h, w)
        acc = bw if acc is None else acc + bw
    return acc / V


def loop_f32(vols, Hf):
    acc = None
    for v in range(V):
        bw = rectify.warp_image_twopass(vols[v].astype(jnp.float32), Hf[v],
                                        h, w)
        acc = bw if acc is None else acc + bw
    return acc / V


def loop_pallas(vols, Hf):
    acc = None
    for v in range(V):
        bw = rectify.warp_image_twopass(vols[v], Hf[v], h, w,
                                        engine="pallas")
        acc = bw if acc is None else acc + bw
    return acc / V


def p2concat(vols, Hf):
    h_r, w_r = plan.h_r, plan.w_r
    tmps = []
    ks = []
    for v in range(V):
        m = jax.lax.stop_gradient(_twopass_maps(Hf[v], h_r, w))  # (h_r, w)
        k = jax.lax.stop_gradient(
            homography_grid(Hf[v], h, w)[1])                     # (h, w)
        s = jax.lax.broadcasted_iota(jnp.float32, (h_r, w_r, w), 1)
        S = jnp.maximum(1.0 - jnp.abs(s - m[:, None, :]), 0.0)
        tmp = jnp.einsum("rsc,rsx->rxc", vols[v],
                         S.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        tmps.append(tmp.astype(jnp.bfloat16))
        ks.append(k)
    # pass 2, all views in one contraction: out[y, x, c] =
    #   sum_v sum_r hat(r - k_v[y, x]) * tmp_v[r, x, c]
    tmp_all = jnp.concatenate(tmps, axis=0).transpose(1, 0, 2)  # (w, V*h_r, C)
    yy = jax.lax.broadcasted_iota(jnp.float32, (w, V * h_r, h), 1) % h_r
    vband = (jax.lax.broadcasted_iota(jnp.int32, (w, V * h_r, h), 1)
             // h_r)
    # hat positions per view segment: k_v[y, x] with x the batch dim
    k_all = jnp.stack(ks, axis=0)                   # (V, h, w)
    kx = k_all.transpose(2, 0, 1)                   # (w, V, h)
    kx = jnp.repeat(kx, h_r, axis=1)                # (w, V*h_r, h) positions
    T = jnp.maximum(1.0 - jnp.abs(yy - kx), 0.0)
    out = jnp.einsum("xrc,xry->xyc", tmp_all, T.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.transpose(1, 0, 2) / V


ref = timeit("loop bf16 (current)", loop, vols, Hf)
for name, fn in [("loop f32", loop_f32), ("loop pallas", loop_pallas),
                 ("p2concat bf16", p2concat)]:
    got = timeit(name, fn, vols, Hf)
    if got is not None and ref is not None:
        denom = np.abs(ref).mean() + 1e-6
        print(f"  {name} rel err vs loop: "
              f"{np.abs(got - ref).max() / denom:.4f}", flush=True)
