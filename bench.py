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


def main():
    import jax
    import jax.numpy as jnp
    from cermvs_tpu.models.raft import RAFT

    small = "--small" in sys.argv
    h, w, n = (256, 320, 4) if small else (H, W, NUM_FRAMES + 1)

    model = RAFT(test_mode=True, hyp_chunk=8)
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(1, n, h, w, 3) * 255).astype(np.float32))
    K = np.array([[2892.0 * w / 1600, 0, w / 2], [0, 2892.0 * w / 1600, h / 2],
                  [0, 0, 1]], np.float32)
    intrinsics = jnp.asarray(np.tile(K, (1, n, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (1, n, 1, 1))
    rs = np.random.RandomState(1)
    for i in range(1, n):
        # DTU-like ring of cameras: small rotations + ~baseline translations
        angle = 0.05 * i
        c, s = np.cos(angle), np.sin(angle)
        poses[0, i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        poses[0, i, :3, 3] = rs.randn(3) * 20.0
    poses = jnp.asarray(poses)
    scale = jnp.ones((1,), jnp.float32)

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
