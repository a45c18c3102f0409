"""BlendedMVS-like pose geometry vs the rectified-construction planner.

Evidence for the ``train.construction = "rectified"`` default in
``configs/train_BlendedMVS.gin``: BlendedMVS scenes are dominated by
aerial/orbital captures (drone orbits and lawnmower sweeps around buildings
— the 113-scene collection's capture style), whose pairwise baselines are
lateral and accept a rectification plan; genuinely handheld forward-walk
segments reject at the near-forward-baseline gate and the training loop
falls back to the exact step FOR THAT BATCH (``training/train.py
pick_step``), so the default is safe for any mixture.

Reference parity point: ``/root/reference/configs/train_BlendedMVS.gin:2-3``
(the reference trains BlendedMVS with the same model/loss as DTU; the
construction is our TPU-side degree of freedom).
"""

import numpy as np

from cermvs_tpu.ops.rectify import plan_rectification, plan_union

# BlendedMVS training crop (configs/train_BlendedMVS.gin) at encoder stride 4
H, W = 1376, 1824
FEAT = (H // 4, W // 4)
F = 2000.0  # ~BlendedMVS-class focal at this resolution


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """World-to-camera pose of a camera at ``eye`` looking at ``target``."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    E = np.eye(4)
    R = np.stack([right, down, fwd])
    E[:3, :3] = R
    E[:3, 3] = -R @ eye
    return E


def intr(n):
    K = np.array([[F, 0, W / 8], [0, F, H / 8], [0, 0, 1]], np.float64)
    return np.tile(K, (n, 1, 1))


def orbit_poses(n=8, radius=600.0, step_deg=4.0):
    """Drone orbit around a building at the origin (median depth ~600 after
    the Blended median-600 normalization, ``datasets/blended.py:72-81``)."""
    poses = []
    for i in range(n):
        a = np.deg2rad(step_deg * ((i + 1) // 2) * (1 if i % 2 else -1))
        eye = radius * np.array([np.sin(a), -0.3, -np.cos(a)])
        poses.append(look_at(eye, [0.0, 0.0, 0.0]))
    return np.stack(poses)


def sweep_poses(n=8, alt=600.0, spacing=40.0):
    """Aerial lawnmower sweep: nadir-ish cameras translating laterally."""
    poses = []
    for i in range(n):
        eye = np.array([spacing * ((i + 1) // 2) * (1 if i % 2 else -1),
                        -alt, 10.0 * (i % 2)])
        poses.append(look_at(eye, [eye[0] * 0.8, 0.0, eye[2] * 0.8],
                             up=(0.0, 0.0, 1.0)))
    return np.stack(poses)


def forward_walk_poses(n=6, step=30.0):
    """Handheld walk INTO the scene: baselines nearly parallel to the
    optical axis — the degenerate case for rectification."""
    poses = []
    for i in range(n):
        eye = np.array([1.0 * (i % 2), 0.0, -600.0 + step * i])
        poses.append(look_at(eye, [0.0, 0.0, 100.0]))
    return np.stack(poses)


def test_orbit_accepts():
    plan = plan_rectification(orbit_poses(), intr(8), *FEAT)
    assert plan.ok, plan.reason


def test_sweep_accepts():
    plan = plan_rectification(sweep_poses(), intr(8), *FEAT)
    assert plan.ok, plan.reason


def test_forward_walk_rejects_and_falls_back():
    plan = plan_rectification(forward_walk_poses(), intr(6), *FEAT)
    assert not plan.ok
    assert "forward" in plan.reason
    # the batch-union path the training loop takes: ANY rejecting sample
    # sends the whole batch to the exact step (training/train.py pick_step)
    union = plan_union([plan_rectification(orbit_poses(), intr(8), *FEAT),
                        plan])
    assert not union.ok


def test_mixed_capture_batches_bucket():
    """Orbit batches with jittered radii/steps bucket into FEW compiled
    variants through the PlanCache (the long-run compile-cache bound the
    DTU default relies on, tests/test_train_rectified.py)."""
    from cermvs_tpu.ops.rectify import PlanCache

    cache = PlanCache()
    rng = np.random.RandomState(0)
    sizes = []
    for _ in range(24):
        r = 600.0 * 2 ** rng.uniform(-0.15, 0.5)  # the train-time scale aug
        s = rng.uniform(3.0, 5.0)
        p = plan_rectification(orbit_poses(radius=r, step_deg=s), intr(8),
                               *FEAT)
        assert p.ok, p.reason
        cache.key_for(p)
        sizes.append(len(cache))
    # the radius jitter spreads s_max over ~2x (960-2048 px), so more
    # variants than DTU's fixed rig — but growth is BOUNDED and tails off:
    # once the widest plans are cached they cover the stream (at most one
    # new compile over the second half of the run)
    assert len(cache) <= 8, len(cache)
    assert len(cache) - sizes[11] <= 1, sizes
