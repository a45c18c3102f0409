"""End-to-end training-loop test of construction="rectified": the loop must
plan per batch, bucket compiled steps, and fall back to the exact path for
non-rectifiable geometry (cermvs_tpu/training/train.py pick_step)."""

import numpy as np
import jax.numpy as jnp
import pytest

import cermvs_tpu.data as data_mod
from cermvs_tpu.config import bind_parameter, clear_config
from cermvs_tpu.training.train import train

pytestmark = pytest.mark.slow


def _batches(n_batches, B=2, n=3, H=32, W=64, forward_motion=False):
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    rng = np.random.RandomState(0)
    out = []
    for _ in range(n_batches):
        poses = np.tile(np.eye(4, dtype=np.float32), (B, n, 1, 1))
        for b in range(B):
            for i, bx in enumerate([0.0, 1.2 + 0.2 * b, -1.6]):
                if forward_motion:
                    poses[b, i, 2, 3] = bx  # along the optical axis
                else:
                    poses[b, i, 0, 3] = -bx
        out.append({
            "images": jnp.asarray(
                (rng.rand(B, n, H, W, 3) * 255).astype(np.float32)),
            "depths": jnp.asarray(
                (rng.rand(B, n, H, W) * 20 + 20).astype(np.float32)),
            "poses": jnp.asarray(poses),
            "intrinsics": jnp.asarray(np.tile(K, (B, n, 1, 1))),
        })
    return out


def test_train_step_dp_rectified_matches_single():
    """8-way data-parallel rectified step == single-device rectified step.

    The shard_map step (training/step.py) applies the model to each LOCAL
    shard, so the rectified builder's static per-sample loop runs per-shard
    (1 sample/device here) instead of slicing the sharded batch axis;
    pmean'd grads must reproduce the single-device update (SGD: linear in
    the gradient)."""
    import jax
    import optax

    from cermvs_tpu.models.raft import RAFT
    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification, plan_union
    from cermvs_tpu.parallel.mesh import make_mesh
    from cermvs_tpu.training.step import init_state, make_train_step, shard_batch

    B, H, W = 8, 32, 64
    batch = _batches(1, B=B, H=H, W=W)[0]
    f = 4  # RAFT.stride_factor
    poses_np = np.asarray(batch["poses"], np.float64)
    intr_np = np.asarray(batch["intrinsics"], np.float64).copy()
    intr_np[..., :2, :] /= f
    plan = plan_union(
        plan_rectification(poses_np[b], intr_np[b], H // f, W // f)
        for b in range(B))
    assert plan.ok, plan.reason

    model = RAFT(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32,
                 volume_fn=make_rectified_volume_fn(plan))
    tx = optax.sgd(1e-3)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)

    single = make_train_step(model, tx, donate=False)
    s1, m1 = single(state, batch, 0.5)

    mesh = make_mesh(n_data=8, n_view=1)
    dp = make_train_step(model, tx, mesh=mesh, donate=False)
    s2, m2 = dp(state, shard_batch(batch, mesh), 0.5)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.parametrize("forward_motion", [False, True])
def test_train_loop_rectified(tmp_path, monkeypatch, forward_motion):
    clear_config()
    bind_parameter("RAFT.cascade", ((4, 64, 1),))
    bind_parameter("RAFT.dtype", jnp.float32)
    bind_parameter("RAFT.hyp_chunk", 4)
    try:
        batches = _batches(2, forward_motion=forward_motion)
        monkeypatch.setattr(
            data_mod, "get_train_data_loader",
            lambda batch_size=2, **kw: batches)
        state = train(
            name="t_rect", batch_size=2, num_steps=2, SAVE_FREQ=1000,
            checkpoint_dir=str(tmp_path / "ckpt"), data_parallel=False,
            resume=False, log_every=1000, construction="rectified")
        assert int(state.step) >= 2
        leaves = [np.asarray(x) for x in
                  __import__("jax").tree_util.tree_leaves(state.params)]
        assert all(np.isfinite(a).all() for a in leaves)
    finally:
        clear_config()


def test_plan_bucketing_bounds_compile_cache():
    """Long-run compile-cache growth: snapped plan grids must collapse a
    diverse stream of training batches into FEW distinct plans.

    Simulates DTU-like pose diversity across many batches — jittered
    baseline lengths, small rotations, and scale-augmentation intrinsics
    jitter (random_scale_and_crop scales fx/fy by 2^U(-0.15, 0.5)) — and
    routes every batch's ``plan_union`` result through the same
    :class:`PlanCache` that ``train.pick_step`` keys compiled steps by;
    each distinct key costs one compiled train step."""
    from cermvs_tpu.ops.rectify import (PlanCache, plan_rectification,
                                        plan_union)

    B, n, H, W, f = 2, 4, 32, 64, 4
    rng = np.random.RandomState(7)
    cache = PlanCache()
    raw_plans = set()
    n_batches = 200
    for _ in range(n_batches):
        batch_plans = []
        aug = 2.0 ** rng.uniform(-0.15, 0.5)  # data/augment.py scale law
        for _b in range(B):
            poses = np.tile(np.eye(4), (n, 1, 1))
            for i in range(1, n):
                bx = (1.0 + 0.35 * rng.rand()) * (-1) ** i
                poses[i, 0, 3] = bx
                poses[i, 1, 3] = 0.08 * rng.randn()
                # small rotation around y (realistic convergent rig)
                a = 0.03 * rng.randn()
                ca, sa = np.cos(a), np.sin(a)
                poses[i, :3, :3] = np.array(
                    [[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]])
            fx = 40.0 * aug
            K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]])
            Kf = K.copy()
            Kf[:2] /= f
            batch_plans.append(
                plan_rectification(poses, np.tile(Kf, (n, 1, 1)),
                                   H // f, W // f))
        plan = plan_union(batch_plans)
        assert plan.ok, plan.reason
        raw_plans.add(plan)
        key = cache.key_for(plan)
        # the compiled step's (widened) plan must be sound for this batch
        assert key.covers(plan)
    # 200 diverse batches must bucket into a handful of compiled variants
    assert len(cache) <= 8, (
        f"{len(cache)} compiled-step buckets from {n_batches} batches "
        f"({len(raw_plans)} raw plans) — PlanCache widening is "
        "fragmenting the jit cache")
    # and the cache must actually be doing work (raw plans fragment)
    assert len(raw_plans) > len(cache)


def test_plan_covers_and_widen():
    """RectPlan.covers / widen_plan invariants used by PlanCache."""
    from cermvs_tpu.ops.rectify import RectPlan, widen_plan

    base = RectPlan(64, 128, 96, 8, True, "", rate_lo=0.8, rate_hi=1.2,
                    view_rates=((0.8, 1.0), (0.9, 1.2)),
                    view_s_max=(64, 96), twopass=False)
    wide = widen_plan(base)
    assert wide.covers(base)
    assert not base.covers(wide)          # covering is one-directional
    assert wide.rate_lo <= base.rate_lo and wide.rate_hi >= base.rate_hi
    for (wl, wh), (bl, bh) in zip(wide.view_rates, base.view_rates):
        assert wl <= bl and wh >= bh

    # narrower batch plan: covered; wider: not
    nar = RectPlan(48, 128, 80, 8, True, "", rate_lo=0.9, rate_hi=1.1,
                   view_rates=((0.9, 1.0), (0.9, 1.1)),
                   view_s_max=(48, 80), twopass=False)
    assert wide.covers(nar)
    big = RectPlan(64, 256, 96, 8, True, "", rate_lo=0.8, rate_hi=1.2,
                   view_rates=base.view_rates, view_s_max=base.view_s_max,
                   twopass=False)
    assert not wide.covers(big)           # wider grid than compiled

    # view-count mismatch never covers
    other = RectPlan(64, 128, 96, 8, True, "", rate_lo=0.8, rate_hi=1.2,
                     view_rates=((0.8, 1.2),), view_s_max=(96,),
                     twopass=False)
    assert not wide.covers(other)

    # not-ok plans neither cover nor are covered
    bad = RectPlan(0, 0, 0, 0, False, "forward motion")
    assert not wide.covers(bad) and not bad.covers(base)

    # twopass: a twopass step must not serve a non-twopass batch, and its
    # sampled-gate margin bounds how far the compiled grids may exceed the
    # batch's own
    tp = RectPlan(64, 128, 96, 8, True, "", rate_lo=0.8, rate_hi=1.2,
                  view_rates=base.view_rates, view_s_max=base.view_s_max,
                  twopass=True)
    ntp_batch = RectPlan(64, 128, 96, 8, True, "", rate_lo=0.9, rate_hi=1.1,
                         view_rates=base.view_rates,
                         view_s_max=base.view_s_max, twopass=False)
    assert not tp.covers(ntp_batch)
