"""Training subsystem tests: loss vs a literal torch port of the reference,
OneCycle schedule vs torch, data-parallel train step on the 8-device mesh,
checkpoint round-trip, and a loss-goes-down smoke run."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch
import torch.nn.functional as F

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.parallel.mesh import make_mesh
from cermvs_tpu.training.loss import sequence_loss
from cermvs_tpu.training.optim import fetch_optimizer, one_cycle_linear
from cermvs_tpu.training.step import (
    TrainState, disp_ground_truth, init_state, make_train_step, shard_batch,
)


def torch_sequence_loss(disp_est, disp_gt, gradual_weight, gamma=0.9,
                        depthloss_threshold=100, depth_cut=1e-3):
    """Literal port of /root/reference/loss.py:4-38 as an oracle."""
    disp_est = [torch.from_numpy(d)[:, None] for d in disp_est]
    disp_gt = torch.from_numpy(disp_gt)[:, None]
    n = len(disp_est)
    valid = disp_gt > 0.0
    ht, wd = disp_gt.shape[-2:]
    disp_est = [
        F.interpolate(d, [ht, wd], mode="bilinear", align_corners=True)
        for d in disp_est
    ]
    flow_loss = 0.0
    for i in range(n):
        w = gamma ** (n - i - 1)
        loss_disp = (disp_est[i] - disp_gt).abs()
        loss_depth = (
            1.0 / disp_est[i].clamp(min=depth_cut)
            - 1.0 / disp_gt.clamp(min=depth_cut)
        ).abs()
        loss_depth = loss_depth.clamp(max=depthloss_threshold) / 3.6e5
        i_loss = gradual_weight * loss_depth + (1 - gradual_weight) * loss_disp
        flow_loss += w * (valid * i_loss).mean()
        flow_loss += 0.01 * w * i_loss.mean()
    epe = (1.0 / disp_est[-1].clamp(min=depth_cut) - 1.0 / disp_gt).abs()
    epe = epe.view(-1)[valid.view(-1)]
    return float(flow_loss), {
        "mean_depth_error": float(epe.mean()),
        "less3": float((epe < 3).float().mean()),
        "less10": float((epe < 10).float().mean()),
        "less25": float((epe < 25).float().mean()),
    }


@pytest.mark.slow
def test_sequence_loss_matches_reference(rng):
    T, B, h, w, H, W = 3, 2, 4, 6, 8, 12
    est = (rng.rand(T, B, h, w).astype(np.float32) * 0.2 + 1e-3)
    gt = rng.rand(B, H, W).astype(np.float32) * 0.2
    gt[gt < 0.05] = 0.0  # invalid holes
    for gw in [0.0, 0.3, 1.0]:
        loss, metrics = sequence_loss(jnp.asarray(est), jnp.asarray(gt), gw)
        ref_loss, ref_metrics = torch_sequence_loss(list(est), gt, gw)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
        for k in ref_metrics:
            np.testing.assert_allclose(
                float(metrics[k]), ref_metrics[k], rtol=1e-4, atol=1e-6)


def test_one_cycle_matches_torch():
    max_lr, total = 0.00025, 1000
    sched = one_cycle_linear(max_lr, total, pct_start=0.01)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr, total, pct_start=0.01, cycle_momentum=False,
        anneal_strategy="linear")
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(tsched.get_last_lr()[0])
        opt.step()
        tsched.step()
    ours = [float(sched(i)) for i in range(total)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=2e-2, atol=1e-8)


def test_disp_ground_truth():
    depths = jnp.asarray(
        np.array([[[[2.0, 0.0], [4.0, 0.5]]], [[[1.0, 1.0], [0.0, 8.0]]]],
                 np.float32))  # (2,1,2,2)
    gt = np.asarray(disp_ground_truth(depths))
    np.testing.assert_allclose(gt[0], [[0.5, 0.0], [0.25, 2.0]])
    np.testing.assert_allclose(gt[1], [[1.0, 1.0], [0.0, 0.125]])


def _tiny_batch(rng, B=2, N=3, H=32, W=48):
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    depths = (rng.rand(B, N, H, W).astype(np.float32) * 5 + 5)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.5 * n
    return {
        "images": jnp.asarray(images), "depths": jnp.asarray(depths),
        "poses": jnp.asarray(poses), "intrinsics": jnp.asarray(intr),
    }


TINY = ((8, 64, 2), (-1, 320, 2))


@pytest.mark.slow
def test_train_step_runs_and_improves(rng):
    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32)
    tx, _ = fetch_optimizer(num_steps=50, lr=1e-3)
    batch = _tiny_batch(rng)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, tx, donate=False)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, 0.0)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch


@pytest.mark.slow
def test_train_step_data_parallel_matches_single(rng):
    """8-way data-parallel step must produce the same update as single-device.

    Uses SGD so the update is linear in the gradient: Adam's first-step
    sign(g) behavior would amplify mere reduction-order noise to 2*lr.
    """
    model = RAFT(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32)
    tx = optax.sgd(1e-3)
    batch = _tiny_batch(rng, B=8, H=16, W=16)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)

    single = make_train_step(model, tx, donate=False)
    s1, m1 = single(state, batch, 0.5)

    mesh = make_mesh(n_data=8, n_view=1)
    dp = make_train_step(model, tx, mesh=mesh, donate=False)
    sharded = shard_batch(batch, mesh)
    s2, m2 = dp(state, sharded, 0.5)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, rng):
    from cermvs_tpu.training.checkpoint import CheckpointManager

    model = RAFT(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32)
    tx, _ = fetch_optimizer(num_steps=10)
    batch = _tiny_batch(rng, B=1, H=16, W=16)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    state = state._replace(step=jnp.asarray(5, jnp.int32))

    mgr = CheckpointManager(tmp_path / "ckpt", save_interval=5)
    assert mgr.maybe_save(state)
    mgr.wait()
    target = init_state(model, tx, jax.random.PRNGKey(1), batch)
    restored = mgr.restore(target)
    assert int(restored.step) == 5
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
