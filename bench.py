"""Benchmark: depth-maps/sec/chip on a DTU-shaped inference workload.

Runs the flagship cascaded-RAFT forward (test mode) on synthetic inputs shaped
like the reference's DTU low-res pass (num_frames=10 neighbors + ref at
1152x1600, cascade (64,64,8)/(44,320,8) — ``configs/inference_DTU.gin`` +
``core/raft.py:14``) and reports throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no per-view latency (BASELINE.md) — the
``do_report`` timer at ``/root/reference/inference.py:52-56`` is the only
instrument.  We use 0.5 depth-maps/sec (2 s/view on the reference's RTX 3090
class hardware for this configuration) as the comparison point; vs_baseline =
ours / 0.5.

Camera geometry mirrors the DTU rig (cameras on a ~600 mm sphere looking at
the object — mostly-lateral pairwise baselines), so the default
``--construction auto`` exercises the rectified construction (fast path when
the host planner accepts the scene, exact otherwise; ``--construction
exact`` forces the gather-based path).  Measured on this scene: rectified
1.47 maps/s vs exact 1.02 (stage-shared rectification features, zero-slab
stage-0 diagonal-band kernel, bf16 segment sums — see BENCH_NOTES.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MAPS_PER_SEC = 0.5

# DTU low-res inference shape (1200x1600 images, cropped to stride-multiple)
H, W = 1152, 1600
NUM_FRAMES = 10  # neighbors; total views = 11


def dtu_ring_poses(n, rs):
    """World-to-camera poses of a DTU-like rig: cameras on a sphere of
    radius ~600 mm looking at the object at the origin (the DTU robot-arm
    geometry — mostly lateral pairwise baselines of 20-100 mm)."""
    poses = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        ang = 0.06 * ((i + 1) // 2) * (1 if i % 2 else -1)
        elev = 0.04 * (i % 3 - 1)
        eye = 600.0 * np.array(
            [np.sin(ang), np.sin(elev), -np.cos(ang) * np.cos(elev)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd]).astype(np.float32)
        poses[i, :3, :3] = R
        poses[i, :3, 3] = -R @ eye.astype(np.float32)
        poses[i, 3, 3] = 1.0
    return poses


def main():
    from cermvs_tpu.utils.relay import require_tpu_relay

    require_tpu_relay()  # jax.devices() hangs (not errors) when the relay is down

    import jax
    import jax.numpy as jnp
    from cermvs_tpu.models.raft import RAFT

    small = "--small" in sys.argv
    construction = "auto"
    if "--construction" in sys.argv:
        construction = sys.argv[sys.argv.index("--construction") + 1]
    h, w, n = (256, 320, 4) if small else (H, W, NUM_FRAMES + 1)

    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(1, n, h, w, 3) * 255).astype(np.float32))
    K = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
                  [0, 0, 1]], np.float32)
    intrinsics = jnp.asarray(np.tile(K, (1, n, 1, 1)))
    poses = jnp.asarray(dtu_ring_poses(n, np.random.RandomState(1))[None])
    scale = jnp.ones((1,), jnp.float32)

    volume_fn = None
    if construction in ("rectified", "auto"):
        import dataclasses

        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
        from cermvs_tpu.ops.rectify import plan_rectification

        K4 = np.asarray(intrinsics).copy()
        K4[..., :2, :] /= 4
        plan = plan_rectification(np.asarray(poses), K4, h // 4, w // 4)
        # --warp quad|twopass: force the warp impl for A/B timing (default:
        # the plan's own gate decision)
        if "--warp" in sys.argv:
            warp = sys.argv[sys.argv.index("--warp") + 1]
            plan = dataclasses.replace(plan, twopass=(warp == "twopass"))
        if plan.ok:
            volume_fn = make_rectified_volume_fn(plan)
            print(f"construction: rectified (plan {plan.h_r}x{plan.w_r} "
                  f"s_max={plan.s_max} twopass={plan.twopass})",
                  file=sys.stderr)
        elif construction == "rectified":
            raise RuntimeError(f"rectified plan rejected: {plan.reason}")

    model = RAFT(test_mode=True, hyp_chunk=8, volume_fn=volume_fn)
    params = model.init(jax.random.PRNGKey(0), images, poses, intrinsics, scale)

    fwd = jax.jit(lambda p, im, po, k, s: model.apply(p, im, po, k, s))

    # compile + warmup (host fetch forces real completion through the
    # remote-execution path — block_until_ready alone has proven unreliable
    # on tunneled backends)
    out = fwd(params, images, poses, intrinsics, scale)
    _ = np.asarray(out)

    iters = 3 if small else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images, poses, intrinsics, scale)
        _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters

    maps_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "depth-maps/sec/chip (DTU 1152x1600 nf10 synthetic)",
        "value": round(maps_per_sec, 4),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
