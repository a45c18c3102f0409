"""Rectified cost-volume construction: geometry identities and volume parity.

Validates the rectification path (ops/rectify.py + ops/corr_rectified.py)
against the exact builder (ops/corr.py, whose semantics are pinned to the
reference's CUDA sampler by tests/test_corr.py):

  * sample-position identity for GENERAL poses (pure math, no resampling);
  * exact volume equality under pure lateral motion (warps degenerate to
    integer shifts, so even the resamples are lossless);
  * approximate volume parity for general poses on smooth features;
  * host planner accept/reject behavior.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.corr_rectified import build_corr_volume_rectified
from cermvs_tpu.ops.geometry import pixel_coords_of_hypotheses


def lookat_pose(eye, target, up=(0, 1, 0)):
    """World-to-camera 4x4 with +z looking from eye toward target."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], 0)  # rows: camera axes in world
    t = -R @ eye
    P = np.eye(4)
    P[:3, :3] = R
    P[:3, 3] = t
    return P


def general_scene(h=8, w=24, n=3):
    """Cameras on an arc looking at the origin (moderate rotations)."""
    K = np.array([[20.0, 0, 12.0], [0, 20.0, 4.0], [0, 0, 1]], np.float64)
    eyes = [(0.0, 0.0, -10.0), (2.0, 0.6, -9.5), (-1.8, -0.8, -9.8)][:n]
    poses = np.stack([lookat_pose(e, (0.1, -0.1, 0.0)) for e in eyes])
    intr = np.tile(K, (n, 1, 1))
    return poses[None].astype(np.float32), intr[None].astype(np.float32), h, w


def lateral_scene(h=8, w=24, n=3):
    """Identity rotations, x-only baselines: rectification is exact."""
    K = np.array([[20.0, 0, 12.0], [0, 20.0, 4.0], [0, 0, 1]], np.float64)
    poses = np.stack([np.eye(4) for _ in range(n)])
    for i, bx in enumerate([0.0, 1.0, -1.5]):
        poses[i, 0, 3] = -bx  # w2c translation t = -C for identity rotation
    intr = np.tile(K, (n, 1, 1))
    return poses[None].astype(np.float32), intr[None].astype(np.float32), h, w


def _pairs(n):
    return jnp.zeros(n - 1, jnp.int32), jnp.arange(1, n, dtype=jnp.int32)


@pytest.mark.slow
def test_sample_position_identity():
    """rect-frame sample position == exact projective sample position."""
    poses, intr, h, w = general_scene()
    N = poses.shape[1]
    ii, jj = _pairs(N)
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.14)
    assert plan.ok, plan.reason
    geo = rectify.rect_geometry(jnp.asarray(poses), jnp.asarray(intr),
                                ii, jj, h, w, plan)

    lams = np.array([0.06, 0.09, 0.125], np.float32)
    disps = jnp.broadcast_to(
        jnp.asarray(lams)[None, None, :, None, None], (1, 1, 3, h, w))
    exact = pixel_coords_of_hypotheses(
        jnp.asarray(poses), jnp.asarray(intr), ii, jj, disps)  # (1,V,3,h,w,2)

    fwd = np.stack([np.asarray(geo["fwd_xy"][0]),
                    np.asarray(geo["fwd_xy"][1])], -1)  # (V, h, w, 2)
    R_ri = np.asarray(geo["R_ri"])
    R_rj = np.asarray(geo["R_rj"])
    bl = np.asarray(geo["baseline"])
    ox = np.asarray(geo["ox"])
    oy = np.asarray(geo["oy"])
    fx_r = float(geo["fx_r"])
    fy_r = float(geo["fy_r"])
    Kj = intr[0, 1:]  # (V, 3, 3)

    for v in range(N - 1):
        q = fwd[v]  # (h, w, 2) rect coords of each ref pixel
        ray = np.stack([(q[..., 0] - ox[v]) / fx_r,
                        (q[..., 1] - oy[v]) / fy_r,
                        np.ones_like(q[..., 0])], -1)
        g = ray @ R_ri[v][:, 2]  # (R_ri^T ray)_3: third COLUMN
        for li, lam in enumerate(lams):
            xp_rect = q[..., 0] - fx_r * bl[v] * g * lam  # rect-src x coord
            # map (xp_rect, q_y) back to the original src image
            hom = np.stack([(xp_rect - ox[v]) / fx_r,
                            (q[..., 1] - oy[v]) / fy_r,
                            np.ones_like(xp_rect)], -1)
            psrc = hom @ R_rj[v] @ Kj[v].T  # rows: K_j (R_rj^T hom)
            psrc = psrc[..., :2] / psrc[..., 2:3]
            np.testing.assert_allclose(
                psrc, np.asarray(exact[0, v, li]), atol=2e-3)


@pytest.mark.slow
def test_lateral_motion_volume_exact():
    """Pure lateral baselines: rectified volume == exact volume (lossless)."""
    poses, intr, h, w = lateral_scene()
    N = poses.shape[1]
    ii, jj = _pairs(N)
    rng = np.random.RandomState(0)
    C, D, incre = 16, 8, 0.01
    fmaps = jnp.asarray(rng.randn(1, N, h, w, C).astype(np.float32))
    origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)

    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
    assert plan.ok, plan.reason

    vol_exact = corr_ops.build_corr_volume(
        fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
        D, incre, mean_over_views=True)
    vol_rect = build_corr_volume_rectified(
        fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
        D, incre, plan, mean_over_views=True)
    assert vol_rect.shape == vol_exact.shape == (1, 1, h, w, D)
    np.testing.assert_allclose(np.asarray(vol_rect), np.asarray(vol_exact),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_lateral_motion_per_view():
    poses, intr, h, w = lateral_scene()
    N = poses.shape[1]
    ii, jj = _pairs(N)
    rng = np.random.RandomState(1)
    C, D, incre = 8, 8, 0.01
    fmaps = jnp.asarray(rng.randn(1, N, h, w, C).astype(np.float32))
    origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
    vol_exact = corr_ops.build_corr_volume(
        fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
        D, incre, mean_over_views=False)
    vol_rect = build_corr_volume_rectified(
        fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
        D, incre, plan, mean_over_views=False)
    assert vol_rect.shape == vol_exact.shape == (1, N - 1, h, w, D)
    np.testing.assert_allclose(np.asarray(vol_rect), np.asarray(vol_exact),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_general_poses_smooth_features():
    """General rotations: resampling is lossy but small on smooth features."""
    poses, intr, h, w = general_scene(h=16, w=48)
    N = poses.shape[1]
    ii, jj = _pairs(N)
    rng = np.random.RandomState(2)
    C, D, incre = 8, 8, 0.01
    origin_val = 0.095
    origin = jnp.full((1, 1, h, w), origin_val, jnp.float32)
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
    assert plan.ok, plan.reason

    # restrict the comparison to ref pixels whose samples all land well
    # inside the source images: out-of-bounds handling differs by design
    # (the exact path zeroes original-image corner taps, the rectified path
    # zeroes in rect space) in a ~2px band that is negligible at real
    # image sizes but dominates on this toy grid
    lams = origin_val + (np.arange(D) - D // 2) * incre
    disps = jnp.broadcast_to(
        jnp.asarray(lams, dtype=jnp.float32)[None, None, :, None, None],
        (1, 1, D, h, w))
    co = np.asarray(pixel_coords_of_hypotheses(
        jnp.asarray(poses), jnp.asarray(intr), ii, jj, disps))
    m = 2.0
    inside = ((co[..., 0] >= m) & (co[..., 0] <= w - 1 - m)
              & (co[..., 1] >= m) & (co[..., 1] <= h - 1 - m))
    inside = inside.all(axis=(1, 2))[0]  # (h, w)
    assert inside.mean() > 0.25

    def rel_err(coarse_h, coarse_w):
        coarse = rng.randn(1, N, coarse_h, coarse_w, C).astype(np.float32)
        fmaps = jax.image.resize(
            jnp.asarray(coarse), (1, N, h, w, C), "linear")
        vol_exact = np.asarray(corr_ops.build_corr_volume(
            fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre, mean_over_views=True))[0, 0]
        vol_rect = np.asarray(build_corr_volume_rectified(
            fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre, plan, mean_over_views=True))[0, 0]
        return (np.linalg.norm((vol_rect - vol_exact)[inside])
                / np.linalg.norm(vol_exact[inside]))

    # resampling error decays with feature smoothness (second-order interp
    # error); very smooth features agree tightly
    rough = rel_err(8, 16)
    smooth = rel_err(2, 4)
    assert smooth < 0.04, (smooth, rough)
    assert smooth < 0.25 * rough, (smooth, rough)


def many_view_scene(h=8, w=24, n=7):
    """Cameras on an arc with a ~4x baseline spread: per-view snapped
    windows differ, so :func:`group_views` has real work to do."""
    K = np.array([[20.0, 0, 12.0], [0, 20.0, 4.0], [0, 0, 1]], np.float64)
    eyes = [(0.0, 0.0, -10.0)]
    for i in range(1, n):
        s = 1 if i % 2 else -1
        eyes.append((s * 0.55 * i, 0.12 * s * (i % 3), -10.0 + 0.08 * i))
    poses = np.stack([lookat_pose(e, (0.1, -0.1, 0.0)) for e in eyes])
    intr = np.tile(K, (n, 1, 1))
    return poses[None].astype(np.float32), intr[None].astype(np.float32), h, w


class TestViewScan:
    """Grouped lax.scan construction (program size O(groups), the nf25
    compile-cap fix) must match the unrolled builder."""

    def test_group_views_partitions_and_covers(self):
        poses, intr, h, w = many_view_scene()
        plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
        assert plan.ok, plan.reason
        from cermvs_tpu.ops.corr_rectified import group_views

        V = poses.shape[1] - 1
        for mg in (1, 2, 4, 16):
            groups = group_views(plan, V, max_groups=mg)
            assert len(groups) <= mg
            seen = sorted(v for *_, idx in groups for v in idx)
            assert seen == list(range(V))
            for lo, hi, s, idx in groups:
                for v in idx:
                    vlo, vhi, vs = plan.view_params(v)
                    assert lo <= vlo and hi >= vhi and s >= vs

    @pytest.mark.parametrize("mean", [True, False])
    def test_matches_unrolled_general_scene(self, mean):
        poses, intr, h, w = many_view_scene()
        N = poses.shape[1]
        ii, jj = _pairs(N)
        rng = np.random.RandomState(3)
        C, D, incre = 8, 8, 0.01
        fmaps = jnp.asarray(rng.randn(1, N, h, w, C).astype(np.float32))
        origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)
        plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
        assert plan.ok, plan.reason
        kw = dict(mean_over_views=mean)
        ref = np.asarray(build_corr_volume_rectified(
            fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre, plan, **kw))
        for mg in (2, 4):
            got = np.asarray(build_corr_volume_rectified(
                fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj,
                origin, D, incre, plan, view_scan=True,
                groups=__import__(
                    "cermvs_tpu.ops.corr_rectified",
                    fromlist=["group_views"]).group_views(
                        plan, N - 1, max_groups=mg), **kw))
            # same kernels and math; only the fp32 accumulation order and
            # the (sound) widened group windows differ
            np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    def test_lateral_exactness_through_scan(self):
        """Pure lateral motion stays EXACT through the grouped path."""
        poses, intr, h, w = lateral_scene()
        N = poses.shape[1]
        ii, jj = _pairs(N)
        rng = np.random.RandomState(0)
        C, D, incre = 16, 8, 0.01
        fmaps = jnp.asarray(rng.randn(1, N, h, w, C).astype(np.float32))
        origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)
        plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
        vol_exact = corr_ops.build_corr_volume(
            fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre, mean_over_views=True)
        vol_scan = build_corr_volume_rectified(
            fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre, plan, mean_over_views=True, view_scan=True)
        np.testing.assert_allclose(np.asarray(vol_scan),
                                   np.asarray(vol_exact),
                                   rtol=1e-4, atol=1e-4)

    def test_kernel_budget_gates_groups_and_views(self):
        """The VMEM budget model caps group merges and flags unaffordable
        per-view windows (the TNT nf25 mixed-routing inputs)."""
        from cermvs_tpu.ops.corr_rectified import (affordable_rect_views,
                                                   group_views)
        from cermvs_tpu.ops.pallas.epiband import (EPIBAND_VMEM_CAP,
                                                   kernel_vmem_bytes)

        # wide-rate plan shaped like a TNT nf-many scene: far views carry
        # sigma ~17 px/hypothesis at D=64
        incre = 0.0025 / 64
        rates = [(3e4, 3.5e4), (3e4, 3.5e4), (1.2e5, 1.5e5),
                 (2.8e5, 3.2e5), (3.0e5, 4.5e5)]
        plan = rectify.RectPlan(
            64, 640, 1600, 16, True, "", rate_lo=3e4, rate_hi=4.5e5,
            view_rates=tuple(rates),
            view_s_max=(256, 256, 640, 1344, 1600))
        # UNCHUNKED (round-4 semantics, max_k_chunks=1): far view over cap
        ok1 = affordable_rect_views(plan, 5, 64, incre, max_k_chunks=1)
        assert 0 in ok1 and 1 in ok1        # narrow windows fit
        assert 4 not in ok1                 # sigma ~17.6: beyond the cap
        # CHUNKED (round-5 default): every view affordable at some n_k —
        # the kernel that lifted the whole-window VMEM limit
        from cermvs_tpu.ops.pallas.epiband import pick_k_chunks

        ok = affordable_rect_views(plan, 5, 64, incre)
        assert ok == (0, 1, 2, 3, 4)
        lo4, hi4, s4 = plan.view_params(4)
        kc4 = pick_k_chunks(64, lo4 * incre, hi4 * incre,
                            plan.w_r + s4 + plan.s_neg, 64, s_max=s4)
        assert kc4 > 1                      # needs chunking, gets it
        # unchunked grouping never merges past the cap
        groups = group_views(plan, 5, max_groups=1, n_hyp=64, incre=incre,
                             max_k_chunks=1)
        assert len(groups) > 1              # a single group would blow VMEM
        for lo, hi, s, idx in groups:
            ws = plan.w_r + s + plan.s_neg
            assert kernel_vmem_bytes(
                64, lo * incre, hi * incre, ws, 64) <= EPIBAND_VMEM_CAP or \
                len(idx) == 1  # singletons may exceed (routed to mixed)
        # chunk-aware grouping reaches the target group count
        groups_c = group_views(plan, 5, max_groups=1, n_hyp=64, incre=incre)
        assert len(groups_c) == 1

    @pytest.mark.slow
    def test_chunked_kernel_far_view_exactness(self):
        """The hypothesis-chunked kernel matches the XLA oracle at a
        TNT-far-view window (sigma ~17 px/hypothesis) whose UNCHUNKED
        expansion exceeds the VMEM cap — the round-4 VERDICT's prescribed
        'sigma~17 view passing the exactness test'."""
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import (
            EPIBAND_VMEM_CAP, epiband_resample, kernel_vmem_bytes,
            pick_k_chunks)

        V, h_r, w_r, C = 1, 32, 256, 16
        s_max, s_neg = 1280, 16
        ws = w_r + s_max + s_neg
        D = 64
        sig_lo, sig_hi = 14.0, 17.5
        assert kernel_vmem_bytes(D, sig_lo, sig_hi, ws, C,
                                 s_max=s_max) > EPIBAND_VMEM_CAP
        kc = pick_k_chunks(D, sig_lo, sig_hi, ws, C, s_max=s_max)
        assert kc > 1
        rng = np.random.RandomState(0)
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        base = jnp.asarray(
            rng.uniform(-30.0, 150.0, (V, h_r, w_r)).astype(np.float32))
        sigma = jnp.asarray(
            rng.uniform(sig_lo, sig_hi, (V, h_r, w_r)).astype(np.float32))
        out = epiband_resample(fr, fs, base, sigma, D, s_max, sig_lo,
                               sig_hi, k_chunks=kc)
        ref = _resample_rows_oracle(fr[0], fs[0], base[0], sigma[0], D,
                                    s_max)
        # tolerance set by the kernel<->oracle fp32 position-rounding
        # baseline (unchunked k=1 differs from the oracle by the same
        # ~4e-3 at this window); chunking adds no error class
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                                   rtol=2e-3, atol=1e-2)
        out1 = epiband_resample(fr, fs, base, sigma, D, s_max, sig_lo,
                                sig_hi, k_chunks=1)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out1[0]),
                                   rtol=1e-3, atol=2e-3)

    def test_kernel_budget_gates_all_cascade_stages(self):
        """The VMEM gate takes the max over ALL cascade stages: a small-D
        first stage inverts which stage's window dominates (stage-1's
        D^2*incre expansion ~6x stage-0's for ((8,64,2),(-1,320,2))), and
        rate_hi <= 0 plans fall back to the full-band window estimate —
        not the degenerate M=4 one (round-4 advisor findings)."""
        from cermvs_tpu.ops.corr_rectified import affordable_rect_views
        from cermvs_tpu.ops.pallas.epiband import kernel_vmem_bytes

        rates = [(3e4, 3.5e4), (3.0e5, 4.5e5)]
        plan = rectify.RectPlan(
            64, 640, 1600, 16, True, "", rate_lo=3e4, rate_hi=4.5e5,
            view_rates=tuple(rates), view_s_max=(256, 1600))
        small_d = [(8, 0.0025 / 64), (44, 0.0025 / 320)]
        costs = [max(kernel_vmem_bytes(
            d, plan.view_params(v)[0] * i, plan.view_params(v)[1] * i,
            plan.w_r + plan.view_params(v)[2] + plan.s_neg, 64,
            s_max=plan.view_params(v)[2]) for d, i in small_d)
            for v in range(2)]
        # stage-1 (D=44) dominates the far view for the small-D cascade
        s0 = kernel_vmem_bytes(8, rates[1][0] * 0.0025 / 64,
                               rates[1][1] * 0.0025 / 64,
                               plan.w_r + 1600 + 16, 64, s_max=1600)
        assert costs[1] > s0
        # gate on a cap between the two stages' estimates: stage-0-only
        # gating would accept the view, the multi-stage gate rejects it
        cap = (s0 + costs[1]) // 2
        ok_stage0 = affordable_rect_views(plan, 2, 8, 0.0025 / 64, cap=cap)
        ok_all = affordable_rect_views(plan, 2, stages=small_d, cap=cap)
        assert 1 in ok_stage0 and 1 not in ok_all
        # rate_hi <= 0 (full-band fallback): estimate must mirror the
        # builder's whole-band window, far above the degenerate one
        full = kernel_vmem_bytes(64, 0.0, 0.0, plan.w_r + 1600 + 16, 64,
                                 s_max=1600)
        degenerate = kernel_vmem_bytes(64, 0.0, 1e-9, plan.w_r + 1600 + 16,
                                       64)
        assert full > 10 * degenerate

    def test_volume_fn_auto_threshold(self):
        """make_rectified_volume_fn('auto') switches to the scan at
        VIEW_SCAN_AUTO_MIN views and matches the unrolled closure."""
        from cermvs_tpu.ops import corr_rectified as cr

        poses, intr, h, w = many_view_scene()
        N = poses.shape[1]
        ii, jj = _pairs(N)
        rng = np.random.RandomState(5)
        C, D, incre = 8, 8, 0.01
        fmaps = jnp.asarray(rng.randn(1, N, h, w, C).astype(np.float32))
        origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)
        plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
        args = (fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj,
                origin, D, incre)
        unrolled = np.asarray(
            cr.make_rectified_volume_fn(plan, view_scan=False)(
                *args, mean_over_views=True))
        forced = np.asarray(
            cr.make_rectified_volume_fn(plan, view_scan=True)(
                *args, mean_over_views=True))
        np.testing.assert_allclose(forced, unrolled, rtol=2e-4, atol=2e-4)
        old = cr.VIEW_SCAN_AUTO_MIN
        try:
            cr.VIEW_SCAN_AUTO_MIN = N - 1  # auto trips at this view count
            auto = np.asarray(cr.make_rectified_volume_fn(plan)(
                *args, mean_over_views=True))
        finally:
            cr.VIEW_SCAN_AUTO_MIN = old
        np.testing.assert_allclose(auto, forced, rtol=1e-6, atol=1e-6)


def test_planner_rejects_forward_motion():
    K = np.array([[20.0, 0, 12.0], [0, 20.0, 4.0], [0, 0, 1]], np.float32)
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(2)])
    poses[1, 2, 3] = -1.0  # src moved along +z (forward)
    intr = np.tile(K, (2, 1, 1))
    plan = rectify.plan_rectification(poses[None], intr[None], 8, 24)
    assert not plan.ok
    assert "baseline" in plan.reason


def test_planner_grid_shapes():
    poses, intr, h, w = general_scene()
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.14)
    assert plan.ok
    assert plan.h_r % 8 == 0 and plan.w_r % 128 == 0
    assert plan.ws_r == plan.w_r + plan.s_max + plan.s_neg
    # warped ref pixels must land inside the rect grid
    N = poses.shape[1]
    ii, jj = _pairs(N)
    geo = rectify.rect_geometry(jnp.asarray(poses), jnp.asarray(intr),
                                ii, jj, h, w, plan)
    fx, fy = (np.asarray(a) for a in geo["fwd_xy"])
    assert fx.min() > 0 and fx.max() < plan.w_r - 1
    assert fy.min() > 0 and fy.max() < plan.h_r - 1


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "clamp"])
def test_warp_image_quad_matches_taps(mode):
    """Packed corner-quad gathers (one descriptor/pixel) must equal the
    4-tap formulation bit-for-bit, including out-of-image samples and the
    gradients w.r.t. the image."""
    from cermvs_tpu.ops.rectify import warp_image

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(12, 17, 5).astype(np.float32))
    # positions spanning in-range, boundary, and far out-of-range
    x = jnp.asarray(rng.uniform(-6, 23, (9, 11)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-6, 18, (9, 11)).astype(np.float32))

    out_q = warp_image(img, x, y, mode=mode, impl="quad")
    out_t = warp_image(img, x, y, mode=mode, impl="taps")
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_t))

    g_q = jax.grad(lambda i: jnp.sum(
        warp_image(i, x, y, mode=mode, impl="quad") ** 2))(img)
    g_t = jax.grad(lambda i: jnp.sum(
        warp_image(i, x, y, mode=mode, impl="taps") ** 2))(img)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_t),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
class TestEpibandKernel:
    """Fused Pallas kernel vs the XLA oracle resampler (interpret mode)."""

    @pytest.fixture(autouse=True)
    def _interpret(self):
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield

    def _check(self, rng, sigma_rng=(1.0, 3.0), base_rng=(-4.0, 40.0),
               bounds=True, D=8):
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import epiband_resample
        V, h_r, w_r, ws, C = 2, 8, 128, 224, 8
        s_max = ws - w_r - 16
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        base = jnp.asarray(
            rng.uniform(*base_rng, (V, h_r, w_r)).astype(np.float32))
        sigma = jnp.asarray(
            rng.uniform(*sigma_rng, (V, h_r, w_r)).astype(np.float32))
        ref = jax.vmap(lambda a, b, c, d: _resample_rows_oracle(
            a, b, c, d, D, s_max))(fr, fs, base, sigma)
        out = epiband_resample(
            fr, fs, base, sigma, D, s_max,
            sigma_lo=sigma_rng[0] if bounds else 0.0,
            sigma_hi=sigma_rng[1] if bounds else None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_matches_oracle_bounded(self, rng):
        self._check(rng)

    def test_matches_oracle_full_window(self, rng):
        self._check(rng, bounds=False)

    def test_out_of_band_positions(self, rng):
        # slabs partly left of the band (large base) and right of it
        # (negative base beyond the s_neg margin) must zero out like interp1d
        self._check(rng, base_rng=(-60.0, 90.0))

    def test_narrow_sigma_stage1(self, rng):
        self._check(rng, sigma_rng=(0.4, 0.7), base_rng=(-10.0, 70.0), D=16)

    def test_bf16_features_tolerance(self, rng):
        # bf16 features select the single-pass bf16 segment sum; results
        # agree with the fp32 oracle to bf16 relative precision
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import epiband_resample
        V, h_r, w_r, ws, C, D = 1, 8, 128, 256, 8, 8
        s_max = 64
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        base = jnp.asarray(
            rng.uniform(-10.0, 40.0, (V, h_r, w_r)).astype(np.float32))
        sigma = jnp.asarray(
            rng.uniform(1.0, 3.0, (V, h_r, w_r)).astype(np.float32))
        ref = jax.vmap(lambda a, b, c, d: _resample_rows_oracle(
            a, b, c, d, D, s_max))(fr, fs, base, sigma)
        out = epiband_resample(
            fr.astype(jnp.bfloat16), fs.astype(jnp.bfloat16), base, sigma,
            D, s_max, sigma_lo=1.0, sigma_hi=3.0)
        # bf16 features + bf16 window sums on |G| ~ sqrt(C) correlations
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.2)

    @pytest.mark.parametrize("D,sigma_rng", [(8, (1.0, 3.0)),
                                             (16, (0.4, 0.7))])
    def test_static_base_matches_oracle(self, rng, D, sigma_rng):
        # stage-0 kernel: base == 0 statically -> diagonal-band variant
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import epiband_resample
        V, h_r, w_r, ws, C = 2, 8, 128, 224, 8
        s_max = ws - w_r - 16
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        base = jnp.zeros((V, h_r, w_r), jnp.float32)
        sigma = jnp.asarray(
            rng.uniform(*sigma_rng, (V, h_r, w_r)).astype(np.float32))
        ref = jax.vmap(lambda a, b, c, d: _resample_rows_oracle(
            a, b, c, d, D, s_max))(fr, fs, base, sigma)
        out = epiband_resample(
            fr, fs, base, sigma, D, s_max,
            sigma_lo=sigma_rng[0], sigma_hi=sigma_rng[1], static_base=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_vjp_out_of_band_positions(self, rng):
        """Slabs partly/fully outside the band: the backward's inverse-roll
        wrap positions must carry zeros (validity mask), matching the
        oracle's zero-padding gradients."""
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import epiband_resample
        V, h_r, w_r, ws, C, D = 1, 8, 128, 224, 8, 8
        s_max = ws - w_r - 16
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        base = jnp.asarray(
            rng.uniform(-60.0, 90.0, (V, h_r, w_r)).astype(np.float32))
        sigma = jnp.asarray(
            rng.uniform(1.0, 3.0, (V, h_r, w_r)).astype(np.float32))
        cot = jnp.asarray(rng.randn(V, h_r, w_r, D).astype(np.float32))

        g_ref = jax.grad(lambda a, b: jnp.sum(jax.vmap(
            lambda q, s, c, d: _resample_rows_oracle(q, s, c, d, D, s_max))(
                a, b, base, sigma) * cot), argnums=(0, 1))(fr, fs)
        g = jax.grad(lambda a, b: jnp.sum(epiband_resample(
            a, b, base, sigma, D, s_max, sigma_lo=1.0, sigma_hi=3.0) * cot),
            argnums=(0, 1))(fr, fs)
        for a, b in zip(g_ref, g):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)

    @pytest.mark.parametrize("static_base", [False, True])
    def test_vjp_matches_oracle_grad(self, rng, static_base):
        """Custom backward kernels vs jax.grad of the differentiable oracle.

        base/sigma cotangents are zero by design (reference parity: the CUDA
        backward never writes coords_grad, correlation_kernel.cu:307,323).
        """
        from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle
        from cermvs_tpu.ops.pallas.epiband import epiband_resample
        V, h_r, w_r, ws, C, D = 1, 8, 128, 256, 8, 8
        s_max = 64  # ws - w_r - s_max = 64 margin; static needs 8-aligned ws
        fr = jnp.asarray(rng.randn(V, h_r, w_r, C).astype(np.float32))
        fs = jnp.asarray(rng.randn(V, h_r, ws, C).astype(np.float32))
        if static_base:
            base = jnp.zeros((V, h_r, w_r), jnp.float32)
        else:
            base = jnp.asarray(
                rng.uniform(-10.0, 40.0, (V, h_r, w_r)).astype(np.float32))
        sigma = jnp.asarray(
            rng.uniform(1.0, 3.0, (V, h_r, w_r)).astype(np.float32))
        cot = jnp.asarray(rng.randn(V, h_r, w_r, D).astype(np.float32))

        def loss_oracle(fr, fs):
            out = jax.vmap(lambda a, b, c, d: _resample_rows_oracle(
                a, b, c, d, D, s_max))(fr, fs, base, sigma)
            return jnp.sum(out * cot)

        def loss_kern(fr, fs, base, sigma):
            out = epiband_resample(fr, fs, base, sigma, D, s_max,
                                   sigma_lo=1.0, sigma_hi=3.0,
                                   static_base=static_base)
            return jnp.sum(out * cot)

        g_ref = jax.grad(loss_oracle, argnums=(0, 1))(fr, fs)
        g = jax.grad(loss_kern, argnums=(0, 1, 2, 3))(fr, fs, base, sigma)
        for a, b in zip(g_ref, g[:2]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)
        assert float(jnp.abs(g[2]).max()) == 0.0  # d_base
        assert float(jnp.abs(g[3]).max()) == 0.0  # d_sigma


@pytest.mark.slow
class TestRectifiedTraining:
    """Differentiable rectified construction for the TRAIN path."""

    def _scene(self, B=2, n=3, H=32, W=64):
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                     np.float32)
        rng = np.random.RandomState(0)
        poses = np.tile(np.eye(4, dtype=np.float32), (B, n, 1, 1))
        for b in range(B):
            for i, bx in enumerate([0.0, 1.2 + 0.2 * b, -1.6]):
                poses[b, i, 0, 3] = -bx
        images = rng.rand(B, n, H, W, 3).astype(np.float32) * 255
        return images, poses, np.tile(K, (B, n, 1, 1))

    def _plan(self, poses, intr, H, W, B):
        from cermvs_tpu.ops.rectify import plan_rectification, plan_union
        K4 = intr.copy()
        K4[..., :2, :] /= 4.0
        return plan_union(plan_rectification(
            poses[b], K4[b], H // 4, W // 4, lambda_max=0.1)
            for b in range(B))

    def test_train_grads_match_exact_on_lateral_scene(self):
        """Pure lateral motion: rectified warps are lossless, so the FULL
        train-mode gradient (through volume construction, pyramid, lookups,
        GRU) must match the exact gather path's."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn

        images, poses, intr = self._scene()
        B, n, H, W, _ = images.shape
        plan = self._plan(poses, intr, H, W, B)
        assert plan.ok, plan.reason
        kw = dict(cascade=((8, 0.5, 2),), dtype=jnp.float32)
        m_exact = RAFT(**kw)
        m_rect = RAFT(volume_fn=make_rectified_volume_fn(plan), **kw)
        args = (jnp.asarray(images), jnp.asarray(poses), jnp.asarray(intr))
        params = m_exact.init(jax.random.PRNGKey(0), *args)

        def loss(m):
            def f(p):
                preds = m.apply(p, *args)
                return jnp.sum(jnp.stack(preds) ** 2)
            return f

        g_exact = jax.grad(loss(m_exact))(params)
        g_rect = jax.grad(loss(m_rect))(params)
        le, lr = map(jax.tree_util.tree_leaves, (g_exact, g_rect))
        assert any(float(jnp.abs(g).max()) > 0 for g in le)
        for a, b in zip(le, lr):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-2, atol=1e-4)

    def test_batched_matches_per_sample(self):
        from cermvs_tpu.ops.corr_rectified import (
            build_corr_volume_rectified, make_rectified_volume_fn)

        images, poses, intr = self._scene()
        B, n, H, W, _ = images.shape
        h, w = H // 4, W // 4
        plan = self._plan(poses, intr, H, W, B)
        rng = np.random.RandomState(1)
        fmaps = jnp.asarray(rng.randn(B, n, h, w, 8).astype(np.float32))
        K4 = intr.copy()
        K4[..., :2, :] /= 4.0
        ii = jnp.zeros(n - 1, jnp.int32)
        jj = jnp.arange(1, n, dtype=jnp.int32)
        origin = jnp.asarray(
            rng.rand(B, 1, h, w).astype(np.float32) * 0.02)
        vfn = make_rectified_volume_fn(plan)
        vol = vfn(fmaps, jnp.asarray(poses), jnp.asarray(K4), ii, jj,
                  origin, 8, 0.005, mean_over_views=True)
        assert vol.shape == (B, 1, h, w, 8)
        for b in range(B):
            ref = build_corr_volume_rectified(
                fmaps[b:b + 1], jnp.asarray(poses[b:b + 1]),
                jnp.asarray(K4[b:b + 1]), ii, jj, origin[b:b + 1],
                8, 0.005, plan, mean_over_views=True)
            np.testing.assert_allclose(np.asarray(vol[b:b + 1]),
                                       np.asarray(ref), rtol=1e-5,
                                       atol=1e-5)

    def test_plan_union(self):
        from cermvs_tpu.ops.rectify import plan_rectification, plan_union

        images, poses, intr = self._scene()
        B, n, H, W, _ = images.shape
        K4 = intr.copy()
        K4[..., :2, :] /= 4.0
        plans = [plan_rectification(poses[b], K4[b], H // 4, W // 4,
                                    lambda_max=0.1) for b in range(B)]
        u = plan_union(plans)
        assert u.ok
        assert u.h_r == max(p.h_r for p in plans)
        assert u.s_max == max(p.s_max for p in plans)
        assert u.rate_lo <= min(p.rate_lo for p in plans)
        assert u.rate_hi >= max(p.rate_hi for p in plans)
        for v in range(n - 1):
            for p in plans:
                lo, hi, sm = p.view_params(v)
                ulo, uhi, usm = u.view_params(v)
                assert ulo <= lo and uhi >= hi and usm >= sm


@pytest.mark.slow
class TestInferenceRunnerIntegration:
    """construction="auto"/"rectified" through the inference driver."""

    def _scene(self, H=64, W=192, n=3):
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                     np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(n)])
        for i, bx in enumerate([0.0, 1.2, -1.6]):
            poses[i, 0, 3] = -bx
        rng = np.random.RandomState(0)
        images = rng.rand(n, H, W, 3).astype(np.float32) * 255
        return images, poses, np.tile(K, (n, 1, 1))

    def test_auto_matches_exact_on_lateral_scene(self):
        from cermvs_tpu.pipeline.inference import InferenceRunner
        from cermvs_tpu.models.raft import RAFT

        images, poses, intr = self._scene()
        kwargs = dict(cascade=((8, 0.5, 2),), dtype=jnp.float32,
                      rect_lambda_max=0.1)
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        r_exact = InferenceRunner(params, construction="exact", **{
            k: v for k, v in kwargs.items() if k != "rect_lambda_max"})
        r_auto = InferenceRunner(params, construction="auto", **kwargs)
        d_exact = r_exact(images, poses, intr, 1.0)
        d_auto = r_auto(images, poses, intr, 1.0)
        assert r_auto._rect_models, "rectified path was not engaged"
        # lateral motion: rectified sampling is lossless; trained-free
        # weights still map identical volumes to identical outputs
        np.testing.assert_allclose(d_auto, d_exact, rtol=1e-3, atol=1e-4)

    def test_auto_falls_back_on_memory_budget(self):
        from cermvs_tpu.pipeline.inference import InferenceRunner
        from cermvs_tpu.models.raft import RAFT

        images, poses, intr = self._scene()
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        runner = InferenceRunner(params, construction="auto",
                                 rect_lambda_max=0.1,
                                 rect_memory_budget=1.0,  # reject everything
                                 cascade=((8, 0.5, 2),), dtype=jnp.float32)
        depth = runner(images, poses, intr, 1.0)
        assert not runner._rect_models  # exact path used
        assert np.isfinite(depth).all()

    def test_auto_falls_back_on_cost_ratio(self):
        """rect_cost_ratio_max gates the auto mode on planned epiband work
        (TNT-class wide-window scenes); a tiny threshold must route to the
        exact path, None (default) must keep the rectified one."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.ops.rectify import plan_rectification, rect_cost_ratio
        from cermvs_tpu.pipeline.inference import InferenceRunner

        images, poses, intr = self._scene()
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        kwargs = dict(rect_lambda_max=0.1, cascade=((8, 0.5, 2),),
                      dtype=jnp.float32)
        gated = InferenceRunner(params, construction="auto",
                                rect_cost_ratio_max=1e-6, **kwargs)
        d_gated = gated(images, poses, intr, 1.0)
        assert not gated._rect_models  # exact path used
        open_ = InferenceRunner(params, construction="auto", **kwargs)
        d_open = open_(images, poses, intr, 1.0)
        assert open_._rect_models      # rectified path kept
        assert np.isfinite(d_gated).all() and np.isfinite(d_open).all()
        # the proxy itself: scale-invariant-ish, positive, and monotone in
        # the window widths
        f = model.stride_factor
        intr_f = intr.astype(np.float64).copy()
        intr_f[..., :2, :] /= f
        h, w = images.shape[1] // f, images.shape[2] // f
        plan = plan_rectification(poses.astype(np.float64), intr_f, h, w,
                                  lambda_max=0.1)
        assert plan.ok
        r = rect_cost_ratio(plan, h, w, poses.shape[0] - 1)
        assert r > 0
        import dataclasses
        wider = dataclasses.replace(
            plan, view_s_max=tuple(2 * s for s in plan.view_s_max)
            or (), s_max=2 * plan.s_max)
        assert rect_cost_ratio(wider, h, w, poses.shape[0] - 1) > r

    def test_batched_rectified_matches_per_view(self):
        """view_batch > 1 keeps the rectified fast path via per-batch plan
        unions (training-path bucketing) — batched submit must reproduce the
        per-view results and engage the rectified model."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.pipeline.inference import InferenceRunner

        B = 3
        scenes = []
        for b in range(B):
            images, poses, intr = self._scene()
            poses = poses.copy()
            poses[1, 0, 3] = -(1.2 + 0.15 * b)   # per-ref baseline jitter
            poses[2, 0, 3] = 1.6 + 0.1 * b
            scenes.append((images, poses, intr))

        kwargs = dict(cascade=((8, 0.5, 2),), dtype=jnp.float32,
                      rect_lambda_max=0.1)
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        im0, po0, k0 = scenes[0]
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(im0[None]),
            jnp.asarray(po0[None]), jnp.asarray(k0[None]),
            jnp.asarray([1.0]))

        r_single = InferenceRunner(params, construction="auto", **kwargs)
        per_view = np.stack([r_single(im, po, k, 1.0)
                             for im, po, k in scenes])
        assert r_single._rect_models, "per-view rectified not engaged"

        # batched rectified is explicit-only ("auto" picks exact for
        # batches — measured faster; profile_viewbatch_rect.py)
        r_batch = InferenceRunner(params, construction="rectified", **kwargs)
        fut = r_batch.submit_batch(
            np.stack([s[0] for s in scenes]), np.stack([s[1] for s in scenes]),
            np.stack([s[2] for s in scenes]), [1.0] * B)
        batched = r_batch.finalize_batch(fut)
        assert r_batch._rect_models, "batched rectified not engaged"
        assert len(r_batch._plan_cache) == 1
        # union plans widen kernel windows but lateral-motion sampling stays
        # lossless: same tolerance as the per-view auto-vs-exact test
        np.testing.assert_allclose(batched, per_view, rtol=1e-3, atol=1e-4)

        # a second batch with jittered geometry must REUSE the compiled
        # program (PlanCache covering) instead of compiling a new variant
        scenes2 = []
        for b in range(B):
            images, poses, intr = self._scene()
            poses = poses.copy()
            poses[1, 0, 3] = -(1.25 + 0.12 * b)
            poses[2, 0, 3] = 1.55 + 0.11 * b
            scenes2.append((images, poses, intr))
        fut2 = r_batch.submit_batch(
            np.stack([s[0] for s in scenes2]),
            np.stack([s[1] for s in scenes2]),
            np.stack([s[2] for s in scenes2]), [1.0] * B)
        assert np.isfinite(r_batch.finalize_batch(fut2)).all()
        assert len(r_batch._plan_cache) == 1

    def test_auto_falls_back_on_forward_motion(self):
        from cermvs_tpu.pipeline.inference import InferenceRunner
        from cermvs_tpu.models.raft import RAFT

        images, poses, intr = self._scene()
        poses[1, :3, 3] = [0.0, 0.0, -1.0]  # forward baseline
        poses[2, :3, 3] = [0.0, 0.0, 1.0]
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        runner = InferenceRunner(params, construction="auto",
                                 cascade=((8, 0.5, 2),), dtype=jnp.float32)
        depth = runner(images, poses, intr, 1.0)
        assert not runner._rect_models
        assert np.isfinite(depth).all()


@pytest.mark.slow
class TestMixedConstruction:
    """Partial planning + mixed rectified/exact construction: scenes where
    only SOME neighbors pass the rectification gates keep the fast path for
    those views (plan_rectification_partial + make_mixed_volume_fn)."""

    def _scene(self, H=64, W=192):
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                     np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
        poses[1, 0, 3] = -1.2            # lateral (rectifiable)
        poses[2, :3, 3] = [0, 0, -1.0]   # forward (gate-rejected)
        poses[3, 0, 3] = 1.6             # lateral (rectifiable)
        rng = np.random.RandomState(0)
        images = rng.rand(4, H, W, 3).astype(np.float32) * 255
        return images, poses, np.tile(K, (4, 1, 1))

    def test_partial_planner_selects_lateral_views(self):
        from cermvs_tpu.ops.rectify import (plan_rectification,
                                            plan_rectification_partial)

        _, poses, intr = self._scene()
        intr4 = intr.astype(np.float64).copy()
        intr4[:, :2] /= 4.0
        full = plan_rectification(poses.astype(np.float64), intr4, 16, 48,
                                  lambda_max=0.1)
        assert not full.ok
        plan, rect_views = plan_rectification_partial(
            poses.astype(np.float64), intr4, 16, 48, lambda_max=0.1)
        assert plan.ok and rect_views == (0, 2)
        assert len(plan.view_s_max) == 2

    def test_auto_engages_mixed_on_mixed_motion(self):
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.pipeline.inference import InferenceRunner

        images, poses, intr = self._scene()
        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        r_exact = InferenceRunner(params, construction="exact",
                                  cascade=((8, 0.5, 2),), dtype=jnp.float32)
        r_auto = InferenceRunner(params, construction="auto",
                                 rect_lambda_max=0.1,
                                 cascade=((8, 0.5, 2),), dtype=jnp.float32)
        d_exact = r_exact(images, poses, intr, 1.0)
        d_auto = r_auto(images, poses, intr, 1.0)
        keys = list(r_auto._rect_models)
        assert keys and isinstance(keys[0], tuple), "mixed path not engaged"
        # the rectified views are pure-lateral (lossless warps); the forward
        # view runs the exact path verbatim.  rtol 2e-3: the mixed mean
        # re-associates the view sum ((vol_r*2 + vol_e)/3 vs the exact
        # scan's accumulation), which random untrained weights amplify on
        # isolated pixels
        np.testing.assert_allclose(d_auto, d_exact, rtol=2e-3, atol=1e-4)

    def test_kernel_budget_routes_to_mixed(self, monkeypatch):
        """When SOME views' per-view epiband windows exceed the VMEM cap
        (geometry fine — the TNT nf25 situation), the runner resolves the
        MIXED construction and matches the exact path."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.ops.pallas import epiband
        from cermvs_tpu.ops.pallas.epiband import kernel_vmem_bytes
        from cermvs_tpu.ops.rectify import plan_rectification
        from cermvs_tpu.pipeline.inference import InferenceRunner

        H, W = 64, 192
        K = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                     np.float32)
        poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
        poses[1, 0, 3] = -0.8   # small baseline: cheap window
        poses[2, 0, 3] = 1.0
        poses[3, 0, 3] = -6.0   # large baseline: expensive window
        rng = np.random.RandomState(0)
        images = rng.rand(4, H, W, 3).astype(np.float32) * 255
        intr = np.tile(K, (4, 1, 1))

        intr4 = intr.astype(np.float64).copy()
        intr4[:, :2] /= 4.0
        plan = plan_rectification(poses.astype(np.float64), intr4,
                                  H // 4, W // 4, lambda_max=0.1)
        assert plan.ok, plan.reason
        incre = 0.1 / 8  # matches rect_lambda_max-scale slabs below
        d0, n_div = 8, 0.5
        costs = [kernel_vmem_bytes(
            d0, plan.view_params(v)[0] * 0.0025 / n_div,
            plan.view_params(v)[1] * 0.0025 / n_div,
            plan.w_r + plan.view_params(v)[2] + plan.s_neg, 64)
            for v in range(3)]
        assert max(costs) > min(costs)  # baselines spread the windows
        cap = (max(costs) + min(costs)) // 2
        monkeypatch.setattr(epiband, "EPIBAND_VMEM_CAP", int(cap))

        model = RAFT(test_mode=True, cascade=((8, 0.5, 2),),
                     dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(images[None]),
            jnp.asarray(poses[None]), jnp.asarray(intr[None]),
            jnp.asarray([1.0]))
        kw = dict(cascade=((8, 0.5, 2),), dtype=jnp.float32,
                  rect_lambda_max=0.1)
        # max_k_chunks=1 pins the round-4 route-to-mixed behavior: with the
        # default chunked kernel the over-budget view becomes affordable
        # (test_kernel_budget_gates_all_cascade_stages covers that side);
        # mixed remains the fallback for geometric rejections either way
        r_auto = InferenceRunner(params, construction="auto",
                                 max_k_chunks=1, **kw)
        d_auto = r_auto(images, poses, intr, 1.0)
        assert r_auto._last_path == "mixed", r_auto._last_path
        assert np.isfinite(d_auto).all()
        # the compiled key carries the kept subset: the expensive view is
        # NOT among the rectified views
        (pplan, kept), = r_auto._rect_models.keys()
        assert len(kept) < 3

        # numeric parity of the budget-filtered mixed volume vs the exact
        # volume (model-level comparisons through RANDOM weights are
        # chaotic by design — the volume is the contract)
        from cermvs_tpu.ops import corr as corr_ops
        from cermvs_tpu.ops.corr_rectified import make_mixed_volume_fn

        h, w = H // 4, W // 4
        rngf = np.random.RandomState(1)
        fmaps = jnp.asarray(rngf.rand(1, 4, h, w, 16).astype(np.float32))
        ii = jnp.zeros(3, jnp.int32)
        jj = jnp.arange(1, 4, dtype=jnp.int32)
        D, incre = 8, 0.005
        origin = jnp.full((1, 1, h, w), (D // 2) * incre, jnp.float32)
        intrj = jnp.asarray(intr4[None].astype(np.float32))
        posesj = jnp.asarray(poses[None])
        # note the runner canonicalizes neighbor order; for the volume
        # check use the ORIGINAL order with the same kept/dropped split
        exact_vol = np.asarray(corr_ops.build_corr_volume(
            fmaps, posesj, intrj, ii, jj, origin, D, incre, 8, True))
        sub = [0] + [v + 1 for v in (0, 1)]
        pplan2 = plan_rectification(poses[sub].astype(np.float64),
                                    intr4[sub], h, w, lambda_max=0.1)
        mixed_vol = np.asarray(make_mixed_volume_fn(pplan2, (0, 1),
                                                    impl="oracle")(
            fmaps, posesj, intrj, ii, jj, origin, D, incre,
            mean_over_views=True))
        np.testing.assert_allclose(mixed_vol, exact_vol, rtol=1e-4,
                                   atol=1e-5)

    def test_mixed_volume_per_view_order(self):
        """Per-view (non-mean) layout must restore the original jj order."""
        from cermvs_tpu.ops.corr import build_corr_volume
        from cermvs_tpu.ops.corr_rectified import make_mixed_volume_fn
        from cermvs_tpu.ops.rectify import plan_rectification_partial

        images, poses, intr = self._scene(H=32, W=96)
        h, w = 8, 24
        intr4 = intr.astype(np.float64).copy()
        intr4[:, :2] /= 4.0
        plan, rect_views = plan_rectification_partial(
            poses.astype(np.float64), intr4, h, w, lambda_max=0.1)
        assert plan.ok and rect_views == (0, 2)

        rng = np.random.RandomState(1)
        fmaps = jnp.asarray(rng.rand(1, 4, h, w, 16).astype(np.float32))
        K4 = jnp.asarray(intr4[None].astype(np.float32))
        posesj = jnp.asarray(poses[None])
        ii = jnp.zeros(3, jnp.int32)
        jj = jnp.arange(1, 4, dtype=jnp.int32)
        origin = jnp.full((1, 1, h, w), 4 * 0.0125, jnp.float32)

        fn = make_mixed_volume_fn(plan, rect_views)
        mixed = fn(fmaps, posesj, K4, ii, jj, origin, 8, 0.0125,
                   hyp_chunk=4, mean_over_views=False)
        exact = build_corr_volume(fmaps, posesj, K4, ii, jj, origin, 8,
                                  0.0125, hyp_chunk=4,
                                  mean_over_views=False)
        assert mixed.shape == exact.shape
        # the forward view (jj position 1) came from the exact builder:
        # bit-identical; lateral views within the lossless-warp tolerance
        np.testing.assert_allclose(np.asarray(mixed[:, 1]),
                                   np.asarray(exact[:, 1]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(exact),
                                   rtol=1e-3, atol=1e-3)
