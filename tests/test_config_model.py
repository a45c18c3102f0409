"""Config bindings must reach the flax model classes (gin-CLI parity) and the
LR encoder variant must run end to end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cermvs_tpu import config as cfg
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.models.update import UpdateBlock


def test_cli_repeated_flags_accumulate():
    """Repeated ``-p``/``-g`` flags must ALL apply (argparse's plain
    nargs='+' silently keeps only the last occurrence — the round-4 CLI
    drill caught every multi-override invocation losing its bindings)."""
    import argparse

    parser = argparse.ArgumentParser()
    cfg.add_cli_flags(parser)
    args = parser.parse_args(
        ["-p", "RAFT.hyp_chunk = 4", "-p", 'RAFT.encoder_type = "LR"',
         "-p", "RAFT.cascade = [[4, 64, 1]]"])
    assert len(args.gin_param) == 3
    cfg.clear_config()
    try:
        cfg.parse_config(args.gin_param)
        m = RAFT()
        assert m.hyp_chunk == 4 and m.encoder_type == "LR"
    finally:
        cfg.clear_config()


def test_raft_config_binding():
    cfg.clear_config()
    cfg.parse_config([
        'RAFT.encoder_type = "LR"',
        "RAFT.cascade = [[4, 64, 1]]",
        "RAFT.hyp_chunk = 4",
    ])
    m = RAFT()
    assert m.encoder_type == "LR"
    assert tuple(tuple(c) for c in m.cascade) == ((4, 64, 1),)
    assert m.stride_factor == 8
    # explicit kwargs still win
    m2 = RAFT(encoder_type="HR")
    assert m2.encoder_type == "HR"
    cfg.clear_config()
    assert RAFT().encoder_type == "HR"


def test_update_block_config_binding():
    cfg.clear_config()
    cfg.parse_config(["UpdateBlock.radius = 3", "UpdateBlock.share_delta = True"])
    ub = UpdateBlock(cascade=((4, 64, 1),))
    assert ub.radius == 3 and ub.share_delta
    assert ub.cor_planes == 3 * 7
    cfg.clear_config()


@pytest.mark.slow
def test_raft_lr_encoder_forward(rng):
    model = RAFT(cascade=((4, 64, 1),), encoder_type="LR", hyp_chunk=4,
                 dtype=jnp.float32, test_mode=True)
    B, N, H, W = 1, 3, 32, 48
    images = jnp.asarray((rng.rand(B, N, H, W, 3) * 255).astype(np.float32))
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = jnp.asarray(np.tile(K, (B, N, 1, 1)))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    poses[:, 1, 0, 3] = 0.4
    poses[:, 2, 0, 3] = 0.8
    params = model.init(jax.random.PRNGKey(0), images, jnp.asarray(poses),
                        intr, jnp.ones(1))
    out = model.apply(params, images, jnp.asarray(poses), intr, jnp.ones(1))
    assert out.shape == (1, H // 8, W // 8)  # LR => 1/8 resolution
    assert np.isfinite(np.asarray(out)).all()
