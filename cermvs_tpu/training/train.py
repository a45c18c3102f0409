"""Training loop.

Re-design of ``/root/reference/train.py:36-113`` on the jitted data-parallel
step: curriculum weight ramps 0->1 over training (``train.py:76-79``),
checkpoints carry full state and RESUME (the reference cannot,
SURVEY.md section 5), metrics flow through the running-mean logger, host data
loading overlaps device compute via the threaded loader + one-step prefetch.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from cermvs_tpu.config import configurable


@configurable("train")
def train(
    name: str = "test",
    batch_size: int = 2,
    SAVE_FREQ: int = 5000,
    fix_gradual_weight: Optional[float] = None,
    num_steps: int = 100000,
    checkpoint_dir: str = "checkpoints",
    data_parallel: bool = True,
    resume: bool = True,
    seed: int = 1234,
    log_every: int = 100,
    construction: str = "exact",
):
    import jax
    import jax.numpy as jnp

    from cermvs_tpu.data import get_train_data_loader
    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.parallel.mesh import make_mesh
    from cermvs_tpu.training.checkpoint import CheckpointManager
    from cermvs_tpu.training.optim import fetch_optimizer
    from cermvs_tpu.training.step import init_state, make_train_step, shard_batch
    from cermvs_tpu.utils.logger import Logger

    model = RAFT()
    tx, schedule = fetch_optimizer(num_steps=num_steps)
    loader = get_train_data_loader(batch_size=batch_size)

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        mesh = make_mesh(n_data=len(jax.devices()), n_view=1)

    first = next(iter(loader))
    state = init_state(model, tx, jax.random.PRNGKey(seed), first)

    mgr = CheckpointManager(f"{checkpoint_dir}/{name}", save_interval=SAVE_FREQ)
    if resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        print(f"resumed from step {int(state.step)}")

    step_fn = make_train_step(model, tx, mesh=mesh)

    # construction="rectified": train through the rectified epiband kernels
    # (differentiable; ops/pallas/epiband.py) when the batch geometry admits
    # a rectification plan — the exact gather path's construction fwd+bwd is
    # ~70% of the step (benchmarks/profile_train_parts.py).  Per-batch
    # host-side plans bucket into few compiled variants (snapped grids);
    # non-rectifiable batches fall back to the exact step.  Works under the
    # data mesh too: the shard_map step (training/step.py) applies the model
    # per LOCAL shard, so the builder's static per-sample loop never slices
    # the sharded axis.  Multi-host: per-host plans (computed from the LOCAL
    # batch) are allgathered and every host takes the same plan_union, so
    # all processes compile the identical step.  Compiled steps are keyed
    # through a PlanCache: a cached step whose (widened) plan COVERS the
    # batch's plan is reused, so long-run pose diversity stays bounded to a
    # handful of compiled variants (tests/test_train_rectified.py).
    from cermvs_tpu.ops.rectify import PlanCache

    _rect_steps = {}
    _plan_cache = PlanCache()

    def pick_step(batch):
        """Choose the compiled step from the HOST batch (call before
        shard_batch — plans need concrete numpy poses)."""
        if construction != "rectified":
            return step_fn
        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
        from cermvs_tpu.ops.rectify import (
            pack_plan, plan_rectification, plan_union, unpack_plan)

        poses_np = np.asarray(batch["poses"], np.float64)
        intr_np = np.asarray(batch["intrinsics"], np.float64).copy()
        f = model.stride_factor
        intr_np[..., :2, :] /= f
        H, W = batch["images"].shape[2:4]
        n_views = poses_np.shape[1] - 1
        plan = plan_union(
            plan_rectification(poses_np[b], intr_np[b], H // f, W // f)
            for b in range(poses_np.shape[0]))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            vecs = multihost_utils.process_allgather(
                pack_plan(plan, n_views))
            plan = plan_union(unpack_plan(v, n_views) for v in vecs)
        if not plan.ok:
            return step_fn
        plan = _plan_cache.key_for(plan)
        if plan not in _rect_steps:
            stages = [(model._auto_hyps(d), 0.0025 / n)
                      for d, n, _ in model.cascade]
            m = RAFT(volume_fn=make_rectified_volume_fn(plan,
                                                        stages=stages))
            _rect_steps[plan] = make_train_step(m, tx, mesh=mesh)
        return _rect_steps[plan]

    logger = Logger(name, lr_fn=schedule, SUM_FREQ=log_every,
                    is_host0=jax.process_index() == 0)

    total_steps = int(state.step)
    tic = None
    total_time = 0.0
    initial_steps = total_steps

    while total_steps <= num_steps:
        for batch in loader:
            chosen = pick_step(batch)  # host-side plan BEFORE sharding
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            gw = (fix_gradual_weight if fix_gradual_weight is not None
                  else total_steps / num_steps)
            state, metrics = chosen(state, batch, jnp.float32(gw))
            total_steps += 1

            logger.push({k: float(v) for k, v in metrics.items()})
            mgr.maybe_save(state)

            if tic is not None:
                total_time += time.time() - tic
                done = total_steps - initial_steps
                if done % log_every == 0:
                    per = total_time / done
                    eta_days = per * (num_steps - total_steps) / 86400
                    print(f"time per step: {per:.3f}s, eta: {eta_days:.2f} days")
            tic = time.time()
            if total_steps > num_steps:
                break

    mgr.maybe_save(state, force=True)
    mgr.wait()
    logger.close()
    return state
