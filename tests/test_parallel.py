"""Parallel tests on the 8-device CPU mesh: view-sharded inference must match
the single-device forward, including the padded (V not divisible) case."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.parallel.infer import view_sharded_forward
from cermvs_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow

TINY = ((8, 64, 2), (-1, 320, 2))


def _scene(rng, B=1, N=9, H=32, W=48):
    images = (rng.rand(B, N, H, W, 3) * 255).astype(np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(K, (B, N, 1, 1))
    poses = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    for n in range(1, N):
        poses[:, n, 0, 3] = 0.3 * n
        poses[:, n, 1, 3] = 0.1 * ((-1) ** n)
    return jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr)


@pytest.mark.parametrize("n_frames", [9, 6])  # V=8 (even) and V=5 (padded)
def test_view_sharded_matches_single(rng, n_frames):
    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32, test_mode=True)
    images, poses, intr = _scene(rng, N=n_frames)
    scale = jnp.full((1,), 1.5)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)

    ref = model.apply(params, images, poses, intr, scale)

    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale, mesh)

    assert out.shape == ref.shape
    # view-mean is reduced in a different order (volume-level psum vs
    # per-view lookup mean); agreement to ~1e-4 over 4 iterations is
    # exact-modulo-fp32-rounding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n_frames", [9, 6])  # V=8 (even) and V=5 (padded)
def test_view_sharded_rectified_matches_single(rng, n_frames):
    """Sharded partial volumes built by the RECTIFIED construction (scene-
    wide kernel windows, one traced program per shard) must match the
    unsharded rectified forward; padded shards replicate a real view's pose
    (zero-weight features) rather than an identity pose (NaN geometry)."""
    import dataclasses

    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification

    images, poses, intr = _scene(rng, N=n_frames)
    K4 = np.asarray(intr).copy()
    K4[..., :2, :] /= 4.0
    H, W = images.shape[2:4]
    plan = plan_rectification(np.asarray(poses), K4, H // 4, W // 4)
    assert plan.ok, plan.reason
    plan_sw = dataclasses.replace(plan, view_rates=(), view_s_max=())

    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    scale = jnp.ones((1,))
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    m_rect = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                  test_mode=True,
                  volume_fn=make_rectified_volume_fn(plan_sw))
    ref = m_rect.apply(params, images, poses, intr, scale)

    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale,
                               mesh, plan=plan)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_view_sharded_view_scan_matches_single(rng):
    """The grouped lax.scan construction under the view mesh (one traced
    epiband instance per window group) must match the unsharded forward."""
    import dataclasses

    from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification

    images, poses, intr = _scene(rng, N=9)
    K4 = np.asarray(intr).copy()
    K4[..., :2, :] /= 4.0
    H, W = images.shape[2:4]
    plan = plan_rectification(np.asarray(poses), K4, H // 4, W // 4)
    assert plan.ok, plan.reason
    plan_sw = dataclasses.replace(plan, view_rates=(), view_s_max=())

    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    scale = jnp.ones((1,))
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    m_rect = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                  test_mode=True,
                  volume_fn=make_rectified_volume_fn(plan_sw,
                                                     view_scan=True))
    ref = m_rect.apply(params, images, poses, intr, scale)
    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale,
                               mesh, plan=plan, view_scan=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_view_sharded_mixed_matches_unsharded(rng):
    """MIXED construction under the view mesh: rect slices for
    ``rect_views``, exact gathers for the rest, each shard running the
    identical [rect | exact] slot layout — must match the unsharded mixed
    volume_fn forward (the production TNT nf25 path, demo.py:49)."""
    import dataclasses

    from cermvs_tpu.ops.corr_rectified import make_mixed_volume_fn
    from cermvs_tpu.ops.rectify import plan_rectification

    images, poses, intr = _scene(rng, N=9)  # V=8
    rect_views = (0, 2, 3, 5, 6)            # 5 rect + 3 exact
    K4 = np.asarray(intr).copy()
    K4[..., :2, :] /= 4.0
    H, W = images.shape[2:4]
    sub = [0] + [v + 1 for v in rect_views]
    pplan = plan_rectification(np.asarray(poses)[0][sub], K4[0][sub],
                               H // 4, W // 4)
    assert pplan.ok, pplan.reason
    pplan_sw = dataclasses.replace(pplan, view_rates=(), view_s_max=())

    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    scale = jnp.ones((1,))
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    m_mixed = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                   test_mode=True,
                   volume_fn=make_mixed_volume_fn(pplan_sw, rect_views))
    ref = m_mixed.apply(params, images, poses, intr, scale)
    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale,
                               mesh, plan=pplan, rect_views=rect_views)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("agg", [("mean", "max"), ("mean", "max", "std")])
@pytest.mark.parametrize("n_frames", [9, 6])  # V=8 (even) and V=5 (padded)
def test_view_sharded_max_std_aggregation(rng, agg, n_frames):
    """max/std view aggregation (core/update.py:101-109's configurable
    options) under the view mesh: per-view volumes stay shard-local and
    the looked-up correlation features aggregate with psum/pmax each
    iteration — must match the unsharded per-view-volume forward."""
    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True, aggregation=agg)
    images, poses, intr = _scene(rng, N=n_frames)
    scale = jnp.full((1,), 1.5)
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    ref = model.apply(params, images, poses, intr, scale)
    mesh = make_mesh(n_data=1, n_view=8)
    out = view_sharded_forward(model, params, images, poses, intr, scale,
                               mesh)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_runner_mesh_resolves_mixed(rng, monkeypatch):
    """InferenceRunner(mesh=...) resolves the MIXED construction when the
    kernel budget rejects a view (max_k_chunks=1 pins round-4 routing),
    dispatches through view_sharded_forward's mixed slot layout, and
    matches the unmeshed runner's mixed result."""
    from cermvs_tpu.pipeline.inference import InferenceRunner

    H, W = 64, 192
    K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                 np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
    poses[1, 0, 3] = -0.8
    poses[2, 0, 3] = 1.0
    poses[3, 0, 3] = -6.0   # large baseline: over-budget window
    prng = np.random.RandomState(0)
    images = prng.rand(4, H, W, 3).astype(np.float32) * 255
    intr = np.tile(K, (4, 1, 1))

    from cermvs_tpu.ops.pallas import epiband
    from cermvs_tpu.ops.pallas.epiband import kernel_vmem_bytes
    from cermvs_tpu.ops.rectify import plan_rectification

    intr4 = intr.astype(np.float64).copy()
    intr4[:, :2] /= 4.0
    plan = plan_rectification(poses.astype(np.float64), intr4, H // 4,
                              W // 4, lambda_max=0.1)
    assert plan.ok, plan.reason
    d0, n_div = 8, 0.5
    costs = [kernel_vmem_bytes(
        d0, plan.view_params(v)[0] * 0.0025 / n_div,
        plan.view_params(v)[1] * 0.0025 / n_div,
        plan.w_r + plan.view_params(v)[2] + plan.s_neg, 64)
        for v in range(3)]
    cap = (max(costs) + min(costs)) // 2
    monkeypatch.setattr(epiband, "EPIBAND_VMEM_CAP", int(cap))

    model = RAFT(test_mode=True, cascade=((8, 0.5, 2),), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images[None]),
                        jnp.asarray(poses[None]), jnp.asarray(intr[None]),
                        jnp.asarray([1.0]))
    kw = dict(cascade=((8, 0.5, 2),), dtype=jnp.float32,
              rect_lambda_max=0.1, max_k_chunks=1)
    mesh = make_mesh(n_data=1, n_view=8)
    meshed = InferenceRunner(params, mesh=mesh, construction="auto", **kw)
    # compare raw DISPARITIES: near-zero disparities make the 1/disp depth
    # conversion amplify fp noise unboundedly under random weights
    disp_mesh = np.asarray(meshed.submit(images, poses, intr, 1.0))[0]
    assert meshed._last_path == "mixed", meshed._last_path

    # equality vs the unsharded forward built from the runner's OWN
    # resolved (pplan, rect_views) key — the meshed and unmeshed runners
    # may legitimately keep different rect subsets (the union-window gate
    # can shrink further), and with random weights any construction
    # difference amplifies chaotically, so same-key comparison is the
    # valid contract (the dryrun asserts the same)
    import dataclasses

    from cermvs_tpu.ops.corr_rectified import make_mixed_volume_fn

    ((_, key),) = meshed._cache.keys()
    pplan, rv = key
    assert isinstance(rv, tuple) and 0 < len(rv) < 3
    pplan_sw = dataclasses.replace(pplan, view_rates=(), view_s_max=())
    ref_model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32,
                     volume_fn=make_mixed_volume_fn(pplan_sw, rv))
    # neighbor order: the runner canonicalizes by ascending baseline; it
    # also ships images in bf16 — round the reference's inputs identically
    # (random weights amplify any input difference chaotically)
    order = meshed._neighbor_order(poses)
    im_ref = jnp.asarray(images[None][:, order]).astype(
        jnp.bfloat16).astype(jnp.float32)
    ref = ref_model.apply(params, im_ref,
                          jnp.asarray(poses[None][:, order]),
                          jnp.asarray(intr[None][:, order]),
                          jnp.asarray([1.0]))
    np.testing.assert_allclose(disp_mesh, np.asarray(ref)[0],
                               rtol=1e-3, atol=1e-4)


def test_runner_mesh_rectified_matches_unsharded(rng):
    """InferenceRunner(mesh=..., construction='auto') routes B==1 views
    through the sharded RECTIFIED construction and must agree with the
    unsharded runner."""
    from cermvs_tpu.pipeline.inference import InferenceRunner

    images, poses, intr = _scene(rng, N=6)
    model = RAFT(cascade=TINY, hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    scale = 1.0
    params = model.init(jax.random.PRNGKey(0), images, poses, intr,
                        jnp.ones((1,)))
    kw = dict(cascade=TINY, hyp_chunk=4, dtype=jnp.float32)
    single = InferenceRunner(params, construction="auto", **kw)
    mesh = make_mesh(n_data=1, n_view=8)
    sharded = InferenceRunner(params, mesh=mesh, construction="auto", **kw)
    # the runner must actually select a rectified plan for this scene
    plan = sharded._plan_for(np.asarray(poses[0]), np.asarray(intr[0]),
                             scale, images.shape[2:4], mem_shards=8)
    assert plan.ok, plan.reason
    d_single = single(np.asarray(images[0]), np.asarray(poses[0]),
                      np.asarray(intr[0]), scale)
    d_sharded = sharded(np.asarray(images[0]), np.asarray(poses[0]),
                        np.asarray(intr[0]), scale)
    np.testing.assert_allclose(d_sharded, d_single, rtol=1e-3, atol=1e-3)


def test_view_sharded_on_two_shards(rng):
    model = RAFT(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32,
                 test_mode=True)
    images, poses, intr = _scene(rng, N=5, H=16, W=16)
    scale = jnp.ones((1,))
    params = model.init(jax.random.PRNGKey(0), images, poses, intr, scale)
    ref = model.apply(params, images, poses, intr, scale)
    mesh = make_mesh(n_data=4, n_view=2)
    out = view_sharded_forward(model, params, images, poses, intr, scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
