"""Training-step throughput on the DTU configuration.

Reference point: 216,090 steps / 6 days on 2x RTX 3090 at batch 2, crop
1056x1440, 10 neighbors (BASELINE.md) => 0.417 steps/s total, 0.21
steps/s/GPU.

Prints one JSON line {metric, value, unit, vs_baseline} with
vs_baseline = our steps/s/chip / 0.21.

Usage: python bench_train.py [--small] [--batch N] [--crop H W]
                             [--construction exact|rectified]

``--construction rectified`` trains through the rectified epiband kernels
(custom VJP; ops/pallas/epiband.py) with a plan_union covering the batch —
the construction fwd+bwd is ~70% of the exact-path step.
"""

import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC_PER_CHIP = 0.21


def main():
    from cermvs_tpu.utils.relay import require_tpu_relay

    require_tpu_relay()  # jax.devices() hangs (not errors) when the relay is down
    from cermvs_tpu.utils.compile_cache import setup_compilation_cache

    setup_compilation_cache()  # compile-time only; timings unaffected

    import jax
    import jax.numpy as jnp

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.training.optim import fetch_optimizer
    from cermvs_tpu.training.step import init_state, make_train_step

    small = "--small" in sys.argv
    argv = sys.argv
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 2
    if "--crop" in argv:
        i = argv.index("--crop")
        H, W = int(argv[i + 1]), int(argv[i + 2])
    else:
        H, W = (256, 320) if small else (1056, 1440)
    N = 4 if small else 11  # ref + neighbors (DTU train nf=10)

    rng = np.random.RandomState(0)
    K = np.array([[2892.0 * W / 1600, 0, W / 2], [0, 2892.0 * W / 1600, H / 2],
                  [0, 0, 1]], np.float32)
    # DTU-rig camera sphere (same generator as bench.py) — representative
    # lateral-dominant baselines; the gather-based exact construction's cost
    # is pose-independent (same sample count), so this scene serves both
    # construction modes
    from bench import dtu_ring_poses
    poses = np.stack([dtu_ring_poses(N, np.random.RandomState(1 + b))
                      for b in range(batch)])
    batch_data = {
        "images": jnp.asarray((rng.rand(batch, N, H, W, 3) * 255).astype(np.float32)),
        "depths": jnp.asarray((rng.rand(batch, N, H, W) * 400 + 400).astype(np.float32)),
        "poses": jnp.asarray(poses),
        "intrinsics": jnp.asarray(np.tile(K, (batch, N, 1, 1))),
    }

    construction = "exact"
    if "--construction" in argv:
        construction = argv[argv.index("--construction") + 1]
    model_kw = {}
    if construction == "rectified":
        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
        from cermvs_tpu.ops.rectify import plan_rectification, plan_union

        K4 = np.tile(K, (N, 1, 1)).copy()
        K4[:, :2] /= 4.0
        plans = [plan_rectification(poses[b], K4, H // 4, W // 4)
                 for b in range(batch)]
        plan = plan_union(plans)
        if not plan.ok:
            raise RuntimeError(f"rectified plan rejected: {plan.reason}")
        print(f"plan: {plan.h_r}x{plan.w_r} s_max={plan.s_max}",
              file=sys.stderr)
        model_kw["volume_fn"] = make_rectified_volume_fn(plan)

    mesh = None
    if "--data-parallel" in argv:
        from cermvs_tpu.parallel.mesh import make_mesh
        from cermvs_tpu.training.step import shard_batch

        mesh = make_mesh(n_data=len(jax.devices()), n_view=1)

    model = RAFT(hyp_chunk=8, **model_kw)
    tx, _ = fetch_optimizer(num_steps=1000)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch_data)
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    if mesh is not None:
        batch_data = shard_batch(batch_data, mesh)

    state, metrics = step(state, batch_data, 0.5)
    _ = float(metrics["loss"])  # force completion

    iters = 2 if not small else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data, 0.5)
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    sps = 1.0 / dt
    tag = "" if construction == "exact" else f" {construction}"
    out = {
        "metric": f"train steps/s/chip (DTU {H}x{W} b{batch} nf{N-1}{tag})",
        "value": round(sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC_PER_CHIP, 3),
    }
    from cermvs_tpu.utils.flops import flops_of, mfu

    # FLOPs counted on the pure-XLA oracle twin (the Pallas kernel cannot
    # lower on the CPU cost-model backend; same matmul structure)
    fl_step = step
    if construction == "rectified":
        fl_model = RAFT(hyp_chunk=8, volume_fn=make_rectified_volume_fn(
            plan, impl="oracle"))
        fl_step = make_train_step(fl_model, tx, mesh=mesh, donate=False)
    step_flops = flops_of(fl_step, state, batch_data, 0.5)
    if step_flops is not None:
        out["gflops_per_step"] = round(step_flops / 1e9, 1)
        m = mfu(step_flops, dt)
        if m is not None:
            out["mfu"] = round(m, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
