"""Measured HBM-peak memo: is any workload hypothesis(D)-bound?

VERDICT (round 2) asked for hypothesis-axis (D) sharding OR a measured memo
demonstrating no supported workload is D-bound.  This probe AOT-compiles the
test-mode forward at the production shapes — DTU scale-1/scale-2 and the
TNT nf15/nf25 passes — in both volume layouts (mean-folded V=1 and per-view,
the max/std-aggregation class) and reports each compiled program's planned
HBM peak (argument+output+temp bytes; device.memory_stats() is empty through
the axon relay, and the compiled plan IS the static peak).

The D axis is bounded by the ARCHITECTURE (D = 64 stage 0 / 44 auto stage 1,
core/raft.py:14,76-80) regardless of image size, so volume memory scales as
h*w*(V or 1)*D — the already-sharded row (h) and view (V) axes.  The table
this prints (BENCH_NOTES.md / ROADMAP §12) shows the margin to the 16 GB
chip at the largest supported shapes.

Run (TPU): python benchmarks/memo_hbm.py [--execute]
"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

from cermvs_tpu.utils.relay import require_tpu_relay

require_tpu_relay()

import jax
import jax.numpy as jnp

from bench import dtu_ring_poses
from cermvs_tpu.models.raft import RAFT

print("devices:", jax.devices(), flush=True)

CONFIGS = [
    # (H, W, nf, per_view, note)
    (1152, 1600, 10, False, "DTU scale-1, mean-folded"),
    (1152, 1600, 10, True, "DTU scale-1, per-view (max/std class)"),
    (1088, 1920, 15, False, "TNT low-res nf15, mean-folded"),
    (1088, 1920, 25, False, "TNT nf25, mean-folded"),
    (1088, 1920, 25, True, "TNT nf25, per-view"),
    (2304, 3200, 10, False, "DTU scale-2, mean-folded"),
    (2304, 3200, 10, True, "DTU scale-2, per-view"),
]

print("| shape | nf | volume layout | args GB | temps GB | peak GB |")
print("|---|---|---|---|---|---|")
for H, W, nf, per_view, note in CONFIGS:
    n = nf + 1
    model = RAFT(test_mode=True, hyp_chunk=8,
                 force_per_view_volumes=per_view)
    rng = np.random.RandomState(0)
    images = jnp.asarray(np.zeros((1, n, H, W, 3), np.float32))
    K = np.array([[2892.0 * W / 1600, 0, W / 2],
                  [0, 2892.0 * W / 1600, H / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (1, n, 1, 1)))
    poses = jnp.asarray(dtu_ring_poses(n, None)[None])
    scale = jnp.ones((1,), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), images, poses, intr,
                           scale))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    try:
        c = jax.jit(
            lambda p, im, po, k, s: model.apply(p, im, po, k, s)).lower(
                params, images, poses, intr, scale).compile()
        ma = c.memory_analysis()
        args = ma.argument_size_in_bytes / 2 ** 30
        temps = ma.temp_size_in_bytes / 2 ** 30
        peak = args + temps + ma.output_size_in_bytes / 2 ** 30
        print(f"| {H}x{W} | {nf} | {'per-view' if per_view else 'mean'} | "
              f"{args:.2f} | {temps:.2f} | {peak:.2f} | ({note})",
              flush=True)
    except Exception as e:
        print(f"| {H}x{W} | {nf} | {'per-view' if per_view else 'mean'} | "
              f"FAILED {type(e).__name__}: {str(e)[:120]} | ({note})",
              flush=True)
