"""Model tests: encoder shapes/param counts, GRU semantics, disp context vs
torch unfold, update block, and the full RAFT forward (train + test modes)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cermvs_tpu.models.extractor import BasicEncoder, instance_norm
from cermvs_tpu.models.update import ConvGRU, UpdateBlock, disp_context
from cermvs_tpu.models.raft import RAFT


def n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    tref = torch.nn.functional.instance_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, tref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_encoder_hr_shapes(rng):
    enc = BasicEncoder(output_dim=64, norm_fn="instance", type="HR",
                       dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 2, 32, 48, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 2, 8, 12, 64)
    assert enc.stride_factor == 4


def test_encoder_lr_shapes(rng):
    enc = BasicEncoder(output_dim=128, norm_fn="none", type="LR",
                       dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (2, 4, 6, 128)
    assert enc.stride_factor == 8


def test_encoder_param_count_matches_reference_arch():
    """Conv-for-conv parameter count of the HR encoder
    (core/extractor.py:62-155 with norm='instance' => no norm params)."""
    enc = BasicEncoder(output_dim=64, norm_fn="instance", type="HR",
                       dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def conv(cin, cout, k):
        return cin * cout * k * k + cout

    expected = (
        conv(3, 32, 7)
        # layer1: RB(32->32) x2: each 2 convs
        + 2 * (conv(32, 32, 3) + conv(32, 32, 3))
        # layer2: RB(32->64, s2) = conv(32,64,3)+conv(64,64,3)+downsample conv(32,64,1)
        + conv(32, 64, 3) + conv(64, 64, 3) + conv(32, 64, 1)
        + conv(64, 64, 3) + conv(64, 64, 3)
        + conv(64, 64, 1)
    )
    assert n_params(params) == expected


def test_conv_gru_matches_naive_three_conv(rng):
    """The fused/hoisted ConvGRU equals the reference formulation — three
    separate convs over ``[net, inp]`` (q over ``[r*net, inp]``), biases in
    every gate (``core/update.py:9-25``) — on the same parameters."""
    from cermvs_tpu.models.update import _conv2d

    h, s, d = 8, 4, 8
    gru = ConvGRU(h_planes=h, static_planes=s, dyn_planes=d,
                  dtype=jnp.float32)
    net = jnp.asarray(np.tanh(rng.randn(2, 6, 6, h)).astype(np.float32))
    sta = jnp.asarray(rng.randn(2, 6, 6, s).astype(np.float32))
    dyn = jnp.asarray(rng.randn(2, 6, 6, d).astype(np.float32))
    params = gru.init(jax.random.PRNGKey(3), sta, method=ConvGRU.ctx)
    ctx = gru.apply(params, sta, method=ConvGRU.ctx)
    out = gru.apply(params, net, dyn, ctx)

    p = params["params"]
    inp = jnp.concatenate([sta, dyn], axis=-1)
    net_inp = jnp.concatenate([net, inp], axis=-1)

    def gate(name, x):
        return _conv2d(x, p[name]["kernel"]) + p[name]["bias"]

    z = jax.nn.sigmoid(gate("convz", net_inp))
    r = jax.nn.sigmoid(gate("convr", net_inp))
    q = jnp.tanh(gate("convq", jnp.concatenate([r * net, inp], axis=-1)))
    ref = (1 - z) * net + z * q
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_gru_interpolates(rng):
    """GRU output is a convex combination: with q bounded in [-1,1], output
    stays within [min(net,-1), max(net,1)]."""
    gru = ConvGRU(h_planes=8, static_planes=4, dyn_planes=8,
                  dtype=jnp.float32)
    net = jnp.asarray(np.tanh(rng.randn(1, 6, 6, 8)).astype(np.float32))
    sta = jnp.asarray(rng.randn(1, 6, 6, 4).astype(np.float32))
    dyn = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
    params = gru.init(jax.random.PRNGKey(0), sta, method=ConvGRU.ctx)
    ctx = gru.apply(params, sta, method=ConvGRU.ctx)
    out = gru.apply(params, net, dyn, ctx)
    assert out.shape == net.shape
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5


def test_disp_context_matches_unfold(rng):
    d = rng.randn(2, 9, 11, 1).astype(np.float32)
    ours = np.asarray(disp_context(jnp.asarray(d), 7))

    t = torch.from_numpy(d.transpose(0, 3, 1, 2))  # (B,1,H,W)
    unf = F.unfold(t, [7, 7], padding=3).view(2, 49, 9, 11)
    ref = (unf - t).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_update_block_shapes(rng):
    ub = UpdateBlock(cascade=((8, 64, 2), (-1, 320, 2)), dtype=jnp.float32)
    B, V, H, W = 1, 3, 8, 10
    net = jnp.asarray(np.tanh(rng.randn(B, H, W, 64)).astype(np.float32))
    inp = jnp.asarray(rng.randn(B, H, W, 64).astype(np.float32))
    disp = jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32) * 0.1)
    corr = jnp.asarray(rng.randn(B, V, H, W, 33).astype(np.float32))
    params = ub.init(jax.random.PRNGKey(0), net, inp, disp, corr, 0)
    net2, delta = ub.apply(params, net, inp, disp, corr, 0)
    assert net2.shape == (B, H, W, 64)
    assert delta.shape == (B, H, W, 1)
    # per-stage delta heads, shared gru/corr encoder
    keys = set(params["params"].keys())
    assert "delta0" in keys and "delta1" in keys
    assert "gru" in keys and "corr_encoder" in keys


def _tiny_scene(rng, B=1, N=3, H=32, W=48):
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.5 * n
    return jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr)


TINY_CASCADE = ((8, 64, 2), (-1, 320, 2))


@pytest.mark.slow
def test_raft_train_forward(rng):
    model = RAFT(cascade=TINY_CASCADE, hyp_chunk=4, dtype=jnp.float32)
    images, poses, intr = _tiny_scene(rng)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr)
    preds = model.apply(params, images, poses, intr)
    assert preds.shape == (4, 1, 8, 12)  # T_total=4, B=1, H/4, W/4
    assert np.isfinite(np.asarray(preds)).all()


@pytest.mark.slow
def test_raft_test_mode(rng):
    model = RAFT(cascade=TINY_CASCADE, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    images, poses, intr = _tiny_scene(rng)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr,
                        jnp.ones(1))
    out = model.apply(params, images, poses, intr, jnp.full((1,), 2.0))
    assert out.shape == (1, 8, 12)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_raft_scan_matches_unrolled(rng):
    """The nn.scan path must be numerically identical to the unrolled loop."""
    images, poses, intr = _tiny_scene(rng)
    m_scan = RAFT(cascade=TINY_CASCADE, hyp_chunk=4, dtype=jnp.float32,
                  remat=False)
    m_unroll = RAFT(cascade=TINY_CASCADE, hyp_chunk=4, dtype=jnp.float32,
                    unroll_iters=True)
    p = m_scan.init(jax.random.PRNGKey(0), images, poses, intr)
    a = m_scan.apply(p, images, poses, intr)
    b = m_unroll.apply(p, images, poses, intr)
    # fp32 reassociation differs between the fused scan body and the unrolled
    # graph; agreement to ~1e-4 over 4 iterations is exact-modulo-rounding
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_raft_gradients_flow(rng):
    images, poses, intr = _tiny_scene(rng, H=16, W=16)
    model = RAFT(cascade=((4, 64, 2),), hyp_chunk=4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr)

    def loss(p):
        preds = model.apply(p, images, poses, intr)
        return jnp.mean(jnp.abs(preds - 0.01))

    g = jax.grad(loss)(params)
    norms = {k: float(jnp.sqrt(sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(v))))
             for k, v in g["params"].items()}
    # every top-level module must receive gradient
    for k, v in norms.items():
        assert np.isfinite(v), k
    assert norms["fnet"] > 0  # via cost volume + lookups
    assert norms["cnet"] > 0
    assert norms["update_block"] > 0


def test_encoder_group_norm(rng):
    enc = BasicEncoder(output_dim=32, norm_fn="group", type="HR",
                       dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 8, 8, 32)
    assert np.isfinite(np.asarray(y)).all()
