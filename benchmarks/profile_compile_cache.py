"""Cold/warm process-start latency with the persistent XLA compile cache.

Measures first-view latency (jit trace + compile + run) of the production
rectified inference forward at a chosen shape, in a FRESH process, with the
persistent compilation cache either empty (cold) or populated by a previous
run (warm).  Usage:

    rm -rf /tmp/cermvs_xla_cache   # once, to reset
    python benchmarks/profile_compile_cache.py --shape 1152 1600 --nf 10
    python benchmarks/profile_compile_cache.py --shape 1152 1600 --nf 10

Run twice; the first prints the cold number, the second the warm one.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[1152, 1600])
    ap.add_argument("--nf", type=int, default=10)
    ap.add_argument("--cache-dir", default="/tmp/cermvs_xla_cache")
    ap.add_argument("--construction", default="rectified")
    args = ap.parse_args()

    from cermvs_tpu.utils.compile_cache import setup_compilation_cache
    setup_compilation_cache(args.cache_dir)

    import jax
    import jax.numpy as jnp
    from bench import dtu_ring_poses
    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.pipeline.inference import InferenceRunner

    h, w = args.shape
    n = args.nf + 1
    rng = np.random.RandomState(0)
    images = (rng.rand(n, h, w, 3) * 255).astype(np.float32)
    K = np.array([[2892.0 * w / 1600, 0, w / 2],
                  [0, 2892.0 * w / 1600, h / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (n, 1, 1))
    poses = dtu_ring_poses(n, np.random.RandomState(1)).astype(np.float32)

    t0 = time.perf_counter()
    model = RAFT(test_mode=True)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n, 64, 128, 3), jnp.bfloat16),
        jnp.asarray(poses[None, :, :, :]),
        jnp.asarray(intr[None]), jnp.ones((1,), jnp.float32)))()
    jax.block_until_ready(params)
    t_init = time.perf_counter() - t0
    runner = InferenceRunner(params, construction=args.construction)
    t0 = time.perf_counter()
    depth = runner(images, poses, intr, 1.0)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    depth = runner(images, poses, intr, 1.0)
    t_second = time.perf_counter() - t0
    n_entries = len(os.listdir(args.cache_dir))
    print(f"shape {h}x{w} nf{args.nf} {args.construction} "
          f"(path={runner._last_path}): init {t_init:.1f}s, "
          f"first view {t_first:.1f}s, steady view {t_second:.2f}s, "
          f"cache entries {n_entries}", flush=True)


if __name__ == "__main__":
    main()
