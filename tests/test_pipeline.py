"""Pipeline tests: inference writes the PFM contract, multires merge rule,
and fusion on a synthetic multi-camera plane scene produces a correct cloud."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.data.loader import Dataset, DataLoader
from cermvs_tpu.io.pfm import read_pfm, write_pfm
from cermvs_tpu.io.ply import read_ply
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.pipeline.fusion import fusion, align_image_to_depth
from cermvs_tpu.pipeline.inference import inference
from cermvs_tpu.pipeline.multires import multires


class PlaneScene(Dataset):
    """N cameras looking at the plane z = Z0 (world), w2c translations along x."""

    def __init__(self, n=4, H=24, W=32, Z0=10.0, num_frames=2):
        self.n = n
        self.H, self.W, self.Z0 = H, W, Z0
        self.num_frames = num_frames
        self.K = np.array([[30.0, 0, W / 2], [0, 30.0, H / 2], [0, 0, 1]],
                          np.float32)
        self.poses = []
        for i in range(n):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = -0.6 * i  # camera centers along +x
            self.poses.append(E)
        rng = np.random.RandomState(0)
        self.tex = (rng.rand(H, W, 3) * 255).astype(np.float32)

    def __len__(self):
        return self.n

    def depth(self, i):
        # plane z = Z0 in world; cameras translated in x only -> depth Z0
        return np.full((self.H, self.W), self.Z0, np.float32)

    def __getitem__(self, i):
        ids = [i] + [j for j in range(self.n) if j != i][: self.num_frames]
        images = np.stack([self.tex for _ in ids])
        poses = np.stack([self.poses[j] for j in ids])
        intr = np.stack([self.K for _ in ids])
        names = [str(j) for j in ids]
        return images, poses, intr, names, 1.0


@pytest.mark.slow
def test_inference_writes_pfm(tmp_path):
    scene = PlaneScene(n=3, H=32, W=32, num_frames=2)
    loader = DataLoader(scene, batch_size=None, num_workers=0)
    model = RAFT(test_mode=True, cascade=((4, 64, 1),), hyp_chunk=4,
                 dtype=jnp.float32)
    sample = scene[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(sample[0])[None],
                        jnp.asarray(sample[1])[None],
                        jnp.asarray(sample[2])[None], jnp.ones(1))
    inference(loader, output_folder=tmp_path, rescale=1, params=params,
              model_kwargs=dict(cascade=((4, 64, 1),), hyp_chunk=4,
                                dtype=jnp.float32))
    files = sorted((tmp_path / "depths").glob("*.pfm"))
    assert len(files) == 3
    assert files[0].name == "0_scale1_nf2.pfm"
    d = read_pfm(files[0])
    # depth maps are written at the encoder's 1/4 resolution, matching the
    # reference contract (core/raft.py:106-108 -> inference.py:57-59)
    assert d.shape == (8, 8)
    assert np.isfinite(d).all()


def test_multires_merge_rule(tmp_path):
    (tmp_path / "depths").mkdir(parents=True)
    lo = np.full((8, 10), 10.0, np.float32)
    hi = np.full((16, 20), 10.1, np.float32)
    hi[0, 0] = 20.0  # disagrees -> low-res wins there
    write_pfm(tmp_path / "depths" / "0_scale1.pfm", lo)
    write_pfm(tmp_path / "depths" / "0_scale2.pfm", hi)
    multires(tmp_path, suffix1="", suffix2="", th=0.02)
    merged = read_pfm(tmp_path / "depths" / "0_th0.02.pfm")
    assert merged.shape == (16, 20)
    np.testing.assert_allclose(merged[8, 8], 10.1)  # agree -> high res
    np.testing.assert_allclose(merged[0, 0], 10.0)  # disagree -> low res


def test_align_image_to_depth_identity():
    img = np.zeros((24, 32, 3), np.float32)
    depth = np.zeros((24, 32), np.float32)
    K = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]])
    E = np.eye(4)
    img2, K2, E2 = align_image_to_depth(img, depth, 1, K, E)
    assert img2.shape == (24, 32, 3)
    np.testing.assert_allclose(K2, K)


def test_fusion_plane_scene(tmp_path):
    """Consistent plane depths across views -> nearly all pixels pass, fused
    cloud lies on the plane z = Z0."""
    scene = PlaneScene(n=4, H=24, W=32, Z0=10.0, num_frames=2)
    (tmp_path / "depths").mkdir(parents=True)
    for i in range(4):
        write_pfm(tmp_path / "depths" / f"{i}_m.pfm", scene.depth(i))

    loader = DataLoader(scene, batch_size=None, num_workers=0)
    out = fusion(loader, tmp_path, suffix="_m", glb=0.25, rescale=1,
                 tot_iter=4)
    xyz, rgb = read_ply(out)
    assert xyz.shape[0] > 0.5 * 4 * 24 * 32  # most pixels kept
    np.testing.assert_allclose(xyz[:, 2], 10.0, atol=1e-3)
    assert rgb.dtype == np.uint8


@pytest.mark.slow
def test_inference_view_batched(tmp_path):
    """view_batch>1 must write identical PFMs as one-view-at-a-time."""
    scene = PlaneScene(n=5, H=32, W=32, num_frames=2)
    model = RAFT(test_mode=True, cascade=((4, 64, 1),), hyp_chunk=4,
                 dtype=jnp.float32)
    sample = scene[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(sample[0])[None],
                        jnp.asarray(sample[1])[None],
                        jnp.asarray(sample[2])[None], jnp.ones(1))
    # pin the construction: view_batch>1 always uses the exact path (the
    # rectified planner requires B==1), so under "auto" the batched and
    # unbatched runs would compare DIFFERENT constructions (~1e-5 apart)
    kw = dict(rescale=1, params=params, construction="exact",
              model_kwargs=dict(cascade=((4, 64, 1),), hyp_chunk=4,
                                dtype=jnp.float32))
    inference(DataLoader(scene, batch_size=None, num_workers=0),
              output_folder=tmp_path / "a", **kw)
    inference(DataLoader(scene, batch_size=None, num_workers=0),
              output_folder=tmp_path / "b", view_batch=2, **kw)
    for f in sorted((tmp_path / "a" / "depths").glob("*.pfm")):
        a = read_pfm(f)
        b = read_pfm(tmp_path / "b" / "depths" / f.name)
        # rtol 1e-4, not 1e-5: batching views changes XLA's fusion/reduction
        # order (batched vs per-view executables), which perturbs fp32 sums
        # by ~5e-5 rel on CPU.  The paths are algorithmically identical.
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


class WideBaselineScene(Dataset):
    """Pathological epipolar geometry: a tiny image with a HUGE lateral
    baseline relative to depth — the planner accepts (no forward motion, no
    grid blow-up past ``max_width_factor``) but the disparity band ``s_max``
    dwarfs the image, so the planned epiband work exceeds the exact
    construction's (``rect_cost_ratio`` > 1)."""

    def __init__(self, H=64, W=64):
        self.H, self.W = H, W
        self.num_frames = 2
        self.K = np.array([[800.0, 0, W / 2], [0, 800.0, H / 2], [0, 0, 1]],
                          np.float32)
        self.poses = []
        for tx in (0.0, -600.0, 600.0):
            E = np.eye(4, dtype=np.float32)
            E[0, 3] = tx
            self.poses.append(E)
        rng = np.random.RandomState(0)
        self.tex = (rng.rand(H, W, 3) * 255).astype(np.float32)

    def sample(self):
        images = np.stack([self.tex] * 3)
        poses = np.stack(self.poses)
        intr = np.stack([self.K] * 3)
        return images, poses, intr


def test_auto_gate_trips_on_pathological_plan():
    """The auto-mode work gate (rect_cost_ratio_max): a scene whose planned
    epiband work exceeds the exact construction's (ratio > 1) must resolve
    to the exact path when the gate is set — and to rectified when the gate
    is off (the default), proving the gate is live, not dead code."""
    from cermvs_tpu.ops.rectify import plan_rectification, rect_cost_ratio
    from cermvs_tpu.pipeline.inference import InferenceRunner

    scene = WideBaselineScene()
    images, poses, intr = scene.sample()
    h, w = scene.H // 4, scene.W // 4
    intr_feat = intr.astype(np.float64).copy()
    intr_feat[..., :2, :] /= 4
    plan = plan_rectification(poses.astype(np.float64), intr_feat, h, w)
    assert plan.ok, plan.reason
    ratio = rect_cost_ratio(plan, h, w, poses.shape[0] - 1)
    assert ratio > 1.0, ratio  # pathological: rectified work exceeds exact

    model = RAFT(test_mode=True, cascade=((4, 64, 1),), hyp_chunk=4,
                 dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(images)[None],
                        jnp.asarray(poses)[None], jnp.asarray(intr)[None],
                        jnp.ones(1))
    kw = dict(cascade=((4, 64, 1),), hyp_chunk=4, dtype=jnp.float32)

    gated = InferenceRunner(params, construction="auto",
                            rect_cost_ratio_max=1.0, **kw)
    gplan = gated._plan_for(poses, intr, 1.0, (scene.H, scene.W))
    assert not gplan.ok and "work ratio" in gplan.reason

    _ = gated(images, poses, intr, 1.0)
    assert not gated._rect_models  # resolved to the exact path

    ungated = InferenceRunner(params, construction="auto", **kw)
    _ = ungated(images, poses, intr, 1.0)
    assert ungated._rect_models  # default-off gate: rectified runs


def test_batched_rectified_warns():
    """Explicit construction='rectified' with a view batch is the measured-
    slower combination (benchmarks/profile_viewbatch_rect.py) — the runner
    must say so instead of silently running it."""
    from cermvs_tpu.pipeline.inference import InferenceRunner

    scene = PlaneScene(n=4, H=32, W=32, num_frames=2)
    model = RAFT(test_mode=True, cascade=((4, 64, 1),), hyp_chunk=4,
                 dtype=jnp.float32)
    sample = scene[0]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(sample[0])[None],
                        jnp.asarray(sample[1])[None],
                        jnp.asarray(sample[2])[None], jnp.ones(1))
    runner = InferenceRunner(params, construction="rectified",
                             cascade=((4, 64, 1),), hyp_chunk=4,
                             dtype=jnp.float32)
    a, b = scene[0], scene[1]
    with pytest.warns(UserWarning, match="measured slower"):
        out = runner.submit_batch(np.stack([a[0], b[0]]),
                                  np.stack([a[1], b[1]]),
                                  np.stack([a[2], b[2]]), [1.0, 1.0])
    assert np.isfinite(runner.finalize_batch(out)).all()


def test_prefetched_order_and_errors():
    """_prefetched preserves order, applies fn in the worker, and re-raises
    the producer's exception in the consumer."""
    from cermvs_tpu.pipeline.inference import _prefetched

    assert list(_prefetched(range(7), lambda x: x * x)) == [
        x * x for x in range(7)]

    def bad(x):
        if x == 3:
            raise ValueError("boom")
        return x

    out = []
    try:
        for v in _prefetched(range(7), bad):
            out.append(v)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert out == [0, 1, 2]


def test_prefetched_early_exit_stops_worker():
    """Abandoning the generator (break) releases the worker thread even when
    the bounded queue is full — no leaked thread, no blocked put."""
    import threading
    import time

    from cermvs_tpu.pipeline.inference import _prefetched

    produced = []

    def fn(x):
        produced.append(x)
        return x

    gen = _prefetched(range(1000), fn, depth=2)
    assert next(gen) == 0
    gen.close()  # consumer walks away; worker must unblock and exit
    deadline = time.time() + 5.0
    while time.time() < deadline:
        if len(produced) == (n_seen := len(produced)):
            time.sleep(0.3)
            if len(produced) == n_seen:
                break
    stalled = len(produced)
    time.sleep(0.5)
    assert len(produced) == stalled  # production stopped
    assert stalled < 1000  # and stopped EARLY (bounded by queue depth)
