"""End-to-end training-loop test of construction="rectified": the loop must
plan per batch, bucket compiled steps, and fall back to the exact path for
non-rectifiable geometry (cermvs_tpu/training/train.py pick_step)."""

import numpy as np
import jax.numpy as jnp
import pytest

import cermvs_tpu.data as data_mod
from cermvs_tpu.config import bind_parameter, clear_config
from cermvs_tpu.training.train import train


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
