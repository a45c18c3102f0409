"""Two-pass hat-matrix warp (``rectify.warp_image_twopass``) tests.

Pins the MXU warp formulation against the quad-gather oracle
(``rectify.warp_image``):

  * EXACT equality (up to fp32 association) for separable warps —
    translations and axis-aligned affine scales, incl. the pure-lateral
    rectification case the volume tests rely on;
  * smoothness-scaled agreement for genuine homographies (the two-pass
    samples sit on the warp curve, not the bilinear footprint: the
    deviation is O(tilt x feature gradient), so it must shrink with
    feature smoothness);
  * boundary semantics for both modes ("zero": out-of-image samples
    contribute nothing; "clamp": edge extension);
  * linearity in the image + zero gradient to the homography (reference
    parity: coords get no grad, ``correlation_kernel.cu:307``);
  * the host-side eligibility gate (``rectify._twopass_ok`` /
    ``RectPlan.twopass``).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.corr_rectified import build_corr_volume_rectified

from test_rectified import general_scene, lateral_scene, _pairs


def _H(rows):
    return jnp.asarray(rows, jnp.float32)


def _translate(tx, ty):
    return _H([[1, 0, tx], [0, 1, ty], [0, 0, 1]])


def _grids(H_inv, out_h, out_w):
    return rectify.homography_grid(H_inv, out_h, out_w)


def _smooth(rng, h, w, c, passes=4):
    img = rng.randn(h, w, c).astype(np.float32)
    for _ in range(passes):
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3
    return jnp.asarray(img)


def _rot_homography(angle, h, w, persp=0.0):
    """Rotation about the image center plus optional mild perspective."""
    c, s = np.cos(angle), np.sin(angle)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    T = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [persp, persp / 2, 1.0]])
    return _H(T @ R @ np.linalg.inv(T))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "clamp"])
@pytest.mark.parametrize("t", [(3.0, -2.0), (0.25, 0.6), (-1.75, 10.4)])
def test_separable_translation_matches_quad(mode, t):
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(24, 40, 5).astype(np.float32))
    Hi = _translate(*t)
    x, y = _grids(Hi, 20, 48)
    ref = rectify.warp_image(img, x, y, mode=mode)
    out = rectify.warp_image_twopass(img, Hi, 20, 48, mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "clamp"])
def test_separable_affine_scale_matches_quad(mode):
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(16, 32, 3).astype(np.float32))
    Hi = _H([[0.85, 0, 1.3], [0, 1.2, -0.7], [0, 0, 1]])
    x, y = _grids(Hi, 24, 24)
    ref = rectify.warp_image(img, x, y, mode=mode)
    out = rectify.warp_image_twopass(img, Hi, 24, 24, mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_rotation_error_scales_with_smoothness():
    rng = np.random.RandomState(2)
    Hi = _rot_homography(0.12, 48, 64, persp=1e-4)
    x, y = _grids(Hi, 48, 64)

    def rel_err(img):
        ref = np.asarray(rectify.warp_image(img, x, y))
        out = np.asarray(rectify.warp_image_twopass(img, Hi, 48, 64))
        # interior only: boundary partial-weight cells see different
        # footprints by design
        sl = (slice(4, -4), slice(4, -4))
        return (np.linalg.norm((out - ref)[sl])
                / (np.linalg.norm(ref[sl]) + 1e-9))

    rough = rel_err(jnp.asarray(rng.randn(48, 64, 4).astype(np.float32)))
    smooth = rel_err(_smooth(rng, 48, 64, 4))
    assert smooth < 0.02, (smooth, rough)
    assert smooth < 0.3 * rough, (smooth, rough)


def test_zero_mode_outside_is_zero():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(8, 8, 2).astype(np.float32)) + 1.0
    out = np.asarray(rectify.warp_image_twopass(
        img, _translate(30.0, 0.0), 8, 8, mode="zero"))
    assert np.all(out == 0.0)


@pytest.mark.slow
def test_bf16_runs_and_tracks_fp32():
    rng = np.random.RandomState(4)
    img = _smooth(rng, 32, 48, 8)
    Hi = _rot_homography(0.08, 32, 48)
    hi = np.asarray(rectify.warp_image_twopass(img, Hi, 32, 48))
    lo = np.asarray(rectify.warp_image_twopass(
        img.astype(jnp.bfloat16), Hi, 32, 48))
    assert lo.dtype == np.float32
    assert np.linalg.norm(lo - hi) < 0.05 * np.linalg.norm(hi)


@pytest.mark.slow
def test_linear_in_image_and_no_homography_grad():
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.randn(16, 24, 3).astype(np.float32))
    d = jnp.asarray(rng.randn(16, 24, 3).astype(np.float32))
    Hi = _rot_homography(0.1, 16, 24)
    f = lambda im: rectify.warp_image_twopass(im, Hi, 12, 28)
    # positions are stop-gradiented => the warp is exactly linear in img
    lhs = np.asarray(f(img + 2.5 * d) - f(img))
    rhs = 2.5 * np.asarray(f(d))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)
    gH = jax.grad(lambda H: rectify.warp_image_twopass(
        img, H, 12, 28).sum())(Hi)
    assert float(jnp.abs(gH).max()) == 0.0
    g = jax.grad(lambda im: (f(im) ** 2).sum())(img)
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.parametrize("mode", ["zero", "clamp"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_engine_matches_xla(mode, dtype):
    """The fused hat-resample kernel (ops/pallas/hatwarp.py, interpreted on
    CPU) == the XLA einsum formulation: same hat weights, same dtype path,
    different only in MXU tiling/summation order."""
    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randn(24, 40, 5).astype(np.float32)).astype(dtype)
    Hi = _rot_homography(0.08, 24, 40, persp=1e-4)
    ref = rectify.warp_image_twopass(img, Hi, 28, 44, mode=mode,
                                     engine="xla")
    out = rectify.warp_image_twopass(img, Hi, 28, 44, mode=mode,
                                     engine="pallas")
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)


def test_pallas_engine_image_grad_matches_xla():
    """The kernel's custom VJP (transposed hat resample) == XLA autodiff
    through the einsum passes; homography grads stay exactly zero."""
    rng = np.random.RandomState(12)
    img = jnp.asarray(rng.randn(16, 24, 3).astype(np.float32))
    Hi = _rot_homography(0.1, 16, 24)

    def loss(im, engine):
        return (rectify.warp_image_twopass(im, Hi, 12, 28,
                                           engine=engine) ** 2).sum()

    g_ref = jax.grad(lambda im: loss(im, "xla"))(img)
    g_pal = jax.grad(lambda im: loss(im, "pallas"))(img)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    gH = jax.grad(lambda H: rectify.warp_image_twopass(
        img, H, 12, 28, engine="pallas").sum())(Hi)
    assert float(jnp.abs(gH).max()) == 0.0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zero", "clamp"])
def test_chunked_matches_unchunked(mode):
    """Explicit row/col chunking (the over-budget path) is bit-equal to the
    single-einsum path (fp32 HIGHEST: same products, same order per output)."""
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randn(24, 40, 3).astype(np.float32))
    Hi = _rot_homography(0.1, 24, 40, persp=1e-4)
    one = rectify.warp_image_twopass(img, Hi, 28, 44, mode=mode)
    chk = rectify.warp_image_twopass(img, Hi, 28, 44, mode=mode,
                                     row_chunk=8, col_chunk=16)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(chk))


@pytest.mark.slow
def test_clamp_mode_never_samples_a_pole_rows_edge():
    """Rows whose crossing solve degenerates (m at the +-1e4 clip) must stay
    zero-weight in clamp mode — clamping them to column 0 would read the
    edge column at full weight (regression: found by review on a strong-
    perspective warp that still passes the gate)."""
    img = np.zeros((32, 32, 1), np.float32)
    img[:, 0, :] = 100.0  # poisoned edge column
    img = jnp.asarray(img)
    Hi = _rot_homography(0.05, 32, 32, persp=0.03)
    x, y = _grids(Hi, 32, 32)
    ref = np.asarray(rectify.warp_image(img, x, y, mode="clamp"))
    out = np.asarray(rectify.warp_image_twopass(img, Hi, 32, 32,
                                                mode="clamp"))
    # wherever the true clamp-warp does NOT read the poisoned column, the
    # two-pass warp must not either
    far = ref < 1.0
    assert far.any()
    assert out[far].max() < 50.0, out[far].max()


def test_plan_union_growth_drops_twopass():
    """plan_union keeps twopass only while the union stays inside every
    constituent's gated 25% margin."""
    poses, intr, h, w = lateral_scene()
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.05)
    assert plan.twopass
    same = rectify.plan_union([plan, plan])
    assert same.twopass
    big = dataclasses.replace(plan, w_r=plan.w_r * 2, h_r=plan.h_r * 2)
    grown = rectify.plan_union([plan, big])
    assert not grown.twopass  # plan's gate never sampled big's domain
    assert rectify.plan_union([big, big]).twopass  # big gated itself


def test_gate_accepts_near_identity_rejects_quarter_turn():
    assert rectify._twopass_ok(np.eye(3), 32, 32, 32, 32)
    assert rectify._twopass_ok(
        np.asarray(_rot_homography(0.15, 32, 32)), 32, 32, 32, 32)
    # 90-degree rotation: output columns run parallel to input rows — the
    # vertical solve degenerates and the gate must refuse
    assert not rectify._twopass_ok(
        np.asarray(_rot_homography(np.pi / 2, 32, 32)), 32, 32, 32, 32)


def test_plans_flag_twopass():
    poses, intr, h, w = lateral_scene()
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.05)
    assert plan.ok and plan.twopass, plan
    poses, intr, h, w = general_scene()
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
    assert plan.ok and plan.twopass, plan


@pytest.mark.slow
def test_volume_twopass_vs_quad_general_poses():
    """Construction parity: the two warp impls agree on smooth features."""
    poses, intr, h, w = general_scene(h=16, w=48)
    N = poses.shape[1]
    ii, jj = _pairs(N)
    rng = np.random.RandomState(6)
    D, incre = 8, 0.01
    origin = jnp.full((1, 1, h, w), 0.095, jnp.float32)
    plan = rectify.plan_rectification(poses, intr, h, w, lambda_max=0.16)
    assert plan.ok and plan.twopass, plan
    coarse = rng.randn(1, N, 2, 4, 8).astype(np.float32)
    fmaps = jax.image.resize(jnp.asarray(coarse), (1, N, h, w, 8), "linear")
    args = (fmaps, jnp.asarray(poses), jnp.asarray(intr), ii, jj, origin,
            D, incre)
    vol_tp = np.asarray(build_corr_volume_rectified(
        *args, plan, mean_over_views=True))
    vol_q = np.asarray(build_corr_volume_rectified(
        *args, dataclasses.replace(plan, twopass=False),
        mean_over_views=True))
    err = np.linalg.norm(vol_tp - vol_q) / np.linalg.norm(vol_q)
    assert err < 0.02, err
