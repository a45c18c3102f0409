"""Small-scene batching: batched + rectified vs the round-2 alternatives.

Round 2 forfeited the rectified construction whenever view_batch > 1; the
batched path now unions per-ref plans (pipeline/inference.py
_rect_model_batched).  This measures maps/s on a SMALL-scene workload
(where batching is the documented advice) for:

  vb=1 rectified   — round-2 fast path
  vb=4 exact       — round-2 batching advice (forfeited rectified)
  vb=4 rectified   — the new combination

Run: python benchmarks/profile_viewbatch_rect.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

from cermvs_tpu.utils.relay import require_tpu_relay

require_tpu_relay()

import jax
import jax.numpy as jnp

from bench import dtu_ring_poses
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.pipeline.inference import InferenceRunner

print("devices:", jax.devices(), flush=True)

H, W, NF = 384, 512, 6
N_REFS = 16
n = NF + 1

rng = np.random.RandomState(0)
K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
              [0, 0, 1]], np.float32)
scenes = []
for r in range(N_REFS):
    poses = dtu_ring_poses(n, None).copy()
    # per-ref baseline jitter (plans differ, PlanCache must bucket them)
    poses[1:, 0, 3] *= 1.0 + 0.02 * (r % 5)
    images = (rng.rand(n, H, W, 3) * 255).astype(np.float32)
    scenes.append((images, poses, np.tile(K, (n, 1, 1))))

model = RAFT(test_mode=True, hyp_chunk=8)
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.asarray(scenes[0][0][None]),
    jnp.asarray(scenes[0][1][None]), jnp.asarray(scenes[0][2][None]),
    jnp.ones((1,), jnp.float32))


def run(construction, vb, label):
    runner = InferenceRunner(params, construction=construction, hyp_chunk=8)

    def one_pass():
        pend = []
        for s in range(0, N_REFS, vb):
            chunk = scenes[s:s + vb]
            fut = runner.submit_batch(
                np.stack([c[0] for c in chunk]),
                np.stack([c[1] for c in chunk]),
                np.stack([c[2] for c in chunk]), [1.0] * len(chunk))
            pend.append(fut)
            if len(pend) > 1:
                runner.finalize_batch(pend.pop(0))
        for f in pend:
            runner.finalize_batch(f)

    one_pass()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(3):
        one_pass()
    dt = (time.perf_counter() - t0) / 3
    used_rect = bool(runner._rect_models)
    print(f"{label:22s}: {N_REFS / dt:7.2f} maps/s "
          f"({dt / N_REFS * 1000:.1f} ms/view, rectified={used_rect}, "
          f"plan_buckets={len(runner._plan_cache)})", flush=True)


run("rectified", 1, "vb=1 rectified")
run("exact", 4, "vb=4 exact")
run("rectified", 4, "vb=4 rectified")
