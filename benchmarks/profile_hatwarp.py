"""Pallas hat-resample kernel vs the XLA einsum two-pass warp.

Shapes mirror the rectified DTU scale-1 forward's back-warp (the largest
warp class: rect volume (h_r, w_r, D) -> ref grid (h, w)) and the feature
warps.  The XLA path materializes the hat tensors to HBM; the kernel
builds them in VMEM (ops/pallas/hatwarp.py).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from cermvs_tpu.ops import rectify

rng = np.random.RandomState(0)


def timeit(label, f, *args, n_iter=4):
    f_j = jax.jit(f)
    out = f_j(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f_j(*args)
        _ = float(jnp.asarray(out).ravel()[0])
    print(f"{label}: {(time.perf_counter()-t0)/n_iter*1000:.1f} ms",
          flush=True)


def H_rot(angle, h, w, persp=1e-5):
    c, s = np.cos(angle), np.sin(angle)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    T = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [persp, persp / 2, 1.0]])
    Ti = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    return jnp.asarray((T @ R @ Ti).astype(np.float32))


# back-warp shape: rect vol (512, 512, 44) -> (288, 400); x9 views
vol = jnp.asarray(rng.randn(512, 512, 44).astype(np.float32)).astype(
    jnp.bfloat16)
Hv = H_rot(0.05, 512, 512)
for eng in ("xla", "pallas"):
    timeit(f"back-warp (512,512,44)->(288,400) x9 {eng}",
           lambda v: sum(rectify.warp_image_twopass(
               v, Hv, 288, 400, engine=eng) for _ in range(9)).sum(), vol)

# feature warp: (288, 400, 64) -> rect (512, 512); x9
feat = jnp.asarray(rng.randn(288, 400, 64).astype(np.float32)).astype(
    jnp.bfloat16)
Hf = H_rot(-0.04, 288, 400)
for eng in ("xla", "pallas"):
    timeit(f"feat-warp (288,400,64)->(512,512) x9 {eng}",
           lambda v: sum(rectify.warp_image_twopass(
               v, Hf, 512, 512, engine=eng) for _ in range(9)).sum(), feat)

# src feature warp: (288, 400, 64) -> (512, 1088); x9
for eng in ("xla", "pallas"):
    timeit(f"src-warp (288,400,64)->(512,1088) x9 {eng}",
           lambda v: sum(rectify.warp_image_twopass(
               v, Hf, 512, 1088, engine=eng) for _ in range(9)).sum(), feat)

# numeric agreement on-device
a = rectify.warp_image_twopass(feat, Hf, 512, 512, engine="xla")
b = rectify.warp_image_twopass(feat, Hf, 512, 512, engine="pallas")
d = float(jnp.abs(a - b).max())
print("max |xla - pallas| (bf16 feat):", d, flush=True)
