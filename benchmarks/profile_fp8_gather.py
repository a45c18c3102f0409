"""fp8 corner gathers for the exact construction: perf + accuracy study.

ROADMAP item 5 / round-3 VERDICT #3a.  The exact builder's dominant cost is
the random-read gather of packed corner quads (``corr._make_corner_quads``);
``gather_dtype=float8_e4m3fn`` halves those bytes again (vs bf16).  The MXU
has no fp8 mode, so the dot upcasts to bf16 — the win is HBM traffic only.

Accuracy: e4m3 carries ~6% per-element rounding; the 64-channel correlation
dot averages it down.  The study reports (a) volume relative error vs an
fp32 oracle, and (b) WTA depth error on a textured-plane scene with
analytic GT — the decision metric (a fraction of one hypothesis quantum is
invisible downstream).

Run on the TPU from repo root: python benchmarks/profile_fp8_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import dtu_ring_poses
from cermvs_tpu.ops import corr as corr_ops


def timeit_scalar(fn, *args, iters=3):
    v = float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(fn(*args))
    return (time.perf_counter() - t0) / iters


def perf(h=576, w=800, V=10, C=64, D=64):
    """Construction time at the DTU scale-2 feature shape."""
    rng = np.random.RandomState(0)
    N = V + 1
    fmaps = jnp.asarray(
        rng.randn(1, N, h, w, C).astype(np.float32) / 8).astype(jnp.bfloat16)
    K = np.array([[2892.0 * w / 400, 0, w / 2], [0, 2892.0 * w / 400, h / 2],
                  [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (1, N, 1, 1)))
    poses = jnp.asarray(dtu_ring_poses(N, None)[None])
    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    origin = jnp.full((1, 1, h, w), 32 * 0.0025 / 64, jnp.float32)
    for gd, tag in ((jnp.bfloat16, "bf16"), (jnp.float8_e4m3fn, "fp8_e4m3")):
        f = jax.jit(lambda fm, o, _g=gd: corr_ops.build_corr_volume(
            fm, poses, intr, ii, jj, o, D, 0.0025 / 64, 8, True, _g).sum())
        t = timeit_scalar(f, fmaps, origin)
        print(f"construction D={D} gather={tag}: {t*1e3:8.1f} ms", flush=True)


def accuracy(h=96, w=128, V=4, C=64, D=64):
    """Volume error vs fp32 oracle + WTA depth error on a textured plane."""
    from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses
    from cermvs_tpu.ops.sampling import bilinear_sample

    rng = np.random.RandomState(1)
    N = V + 1
    Z = 500.0
    K = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]],
                 np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    tex = rng.randn(h, w, C).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
               + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 5
    fmaps = np.zeros((1, N, h, w, C), np.float32)
    fmaps[0, 0] = tex
    for v in range(1, N):
        poses[v, 0, 3] = 30.0 * (1 if v % 2 else -1) * ((v + 1) // 2)
        back = np.asarray(pixel_coords_of_hypotheses(
            jnp.asarray(poses[None]), jnp.asarray(np.tile(K, (1, N, 1, 1))),
            jnp.array([v]), jnp.array([0]),
            jnp.full((1, 1, 1, h, w), 1.0 / Z)))[0, 0, 0]
        fmaps[0, v] = np.asarray(bilinear_sample(jnp.asarray(tex),
                                                 jnp.asarray(back)))
    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    incre = 0.0025 / 64
    origin = jnp.full((1, 1, h, w), (D // 2) * incre, jnp.float32)
    fm = jnp.asarray(fmaps)

    vols = {}
    for gd, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16"),
                    (jnp.float8_e4m3fn, "fp8_e4m3")):
        f = jax.jit(lambda x, _g=gd: corr_ops.build_corr_volume(
            x.astype(_g if _g != jnp.float8_e4m3fn else jnp.bfloat16),
            jnp.asarray(poses[None]), jnp.asarray(np.tile(K, (1, N, 1, 1))),
            ii, jj, origin, D, incre, 8, True, _g))
        vols[tag] = np.asarray(f(fm))[0, 0]

    lams = (np.arange(D) - 0) * incre  # zero-slab: origin - D//2*incre = 0
    depth_true = Z
    for tag, vol in vols.items():
        rel = (np.linalg.norm(vol - vols["fp32"])
               / np.linalg.norm(vols["fp32"]))
        k = vol.argmax(-1)
        lam = np.maximum(lams[k], 1e-6)
        depth = 1.0 / lam
        err = np.abs(depth[8:-8, 8:-8] - depth_true)
        q = 1.0 / max(lams[int(np.median(k))] - incre, 1e-9) - 1.0 / max(
            lams[int(np.median(k))], 1e-9)  # one-quantum depth step
        print(f"{tag}: vol rel err vs fp32 {rel:.5f}; WTA depth err "
              f"median {np.median(err):.2f} p90 {np.quantile(err, .9):.2f} "
              f"(quantum ~{abs(q):.2f})", flush=True)


if __name__ == "__main__":
    accuracy()
    perf()
