"""Pairwise stereo rectification for TPU-native cost-volume construction.

Motivation (TPU-first redesign of ``alt_cuda_corr`` + ``core/corr.py:46-99``):
the exact construction path samples ``V * D * H * W`` arbitrary fractional
locations in the source feature maps — HBM random reads dominate (measured:
~75 GB/s effective + per-descriptor overhead, BENCH_NOTES.md).  Rectifying
each (reference, source) pair by pure camera ROTATIONS makes every epipolar
sample land on the SAME image row at positions that are LINEAR in inverse
depth:

    rect-src x  =  rect-ref x  -  fx_r * B * g(q) * lambda
    rect-src y  =  rect-ref y                                   (exactly)

with ``B`` the baseline length and ``g(q)`` a smooth per-pixel factor (the
third component of the rect-ray in the original reference frame).  Cost-volume
construction then becomes, per (view, row): one MXU matmul
``G = F_ref_row @ F_src_row^T`` followed by a lane-local banded resample of
``G`` rows — no data-dependent HBM gathers at all.  See
``ops/corr_rectified.py`` (XLA oracle + builder) and
``ops/pallas/epiband.py`` (fused kernel).

Geometry. For a pair (i=ref, j=src) with world-to-camera poses ``P_i, P_j``
(reference convention, ``utils/projective_ops.py:17-23``): let
``[R|t] = P_j P_i^{-1}`` (ref-cam -> src-cam) and ``C = -R^T t`` the src
center in ref-cam coords.  The rectifying rotation (ref-cam -> rect frame)
has rows ``r1 = C/||C||``, ``r2 = normalize(z x r1)``, ``r3 = r1 x r2``; the
src side uses ``R_rect_j = R_rect_i R^T``.  Both rect cameras share
intrinsics ``K_r`` (focals of the ref view, per-view principal offsets chosen
so the warped ref image fits the rect grid).  For a rect-ref pixel ``q`` and
reference-frame inverse depth ``lambda``:

    Y3(q)    = rect depth of the point  = (1/lambda) * g(q)^{-1} ...
    g(q)     = (R_rect_i^T K_r^{-1} q~)_3        (third row of R^T . ray)
    disparity s(q, lambda) = fx_r * B * lambda * g(q)            (exact)

Degenerate when the baseline is nearly parallel to the optical axis (forward
motion): the host-side :func:`plan_rectification` detects this (and grid
overflow) so callers fall back to the exact path.

This module is geometry + warps only; it has no Pallas dependencies and is
exercised on CPU by ``tests/test_rectified.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Core rotation construction (dtype-generic: works for jnp and np arrays)
# ---------------------------------------------------------------------------


def _normalize(v, xp, eps=1e-12):
    return v / (xp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def rect_rotations(R, t, xp=jnp):
    """Rectifying rotations for relative pose(s) ``[R|t]`` (ref-cam->src-cam).

    R: (..., 3, 3); t: (..., 3).  Returns (R_rect_i, R_rect_j, baseline) with
    shapes (..., 3, 3), (..., 3, 3), (...,).  ``xp`` may be ``numpy`` for the
    host planner or ``jax.numpy`` for in-graph use.
    """
    C = -xp.einsum("...ji,...j->...i", R, t)  # src center in ref-cam coords
    baseline = xp.linalg.norm(C, axis=-1)
    r1 = C / (baseline[..., None] + 1e-12)
    z = xp.zeros_like(r1)
    if xp is np:
        z[..., 2] = 1.0
    else:
        z = z.at[..., 2].set(1.0)
    r2 = _normalize(xp.cross(z, r1), xp)
    r3 = xp.cross(r1, r2)
    R_rect_i = xp.stack([r1, r2, r3], axis=-2)  # rows
    R_rect_j = xp.einsum("...ik,...jk->...ij", R_rect_i, R)  # R_rect_i @ R^T
    return R_rect_i, R_rect_j, baseline


def rect_degeneracy(R, t, xp=np):
    """sin(angle between baseline and optical axis), per pair.

    Near 0 => forward motion => rectification unusable for that pair.
    """
    C = -xp.einsum("...ji,...j->...i", R, t)
    r1 = C / (xp.linalg.norm(C, axis=-1, keepdims=True) + 1e-12)
    sin = xp.sqrt(xp.clip(r1[..., 0] ** 2 + r1[..., 1] ** 2, 0.0, 1.0))
    return sin


def relative_pose(poses, ii, jj, xp=jnp):
    """[R|t] of P_jj @ P_ii^{-1} for each pair.  poses: (B, N, 4, 4)."""
    Pi = xp.take(poses, ii, axis=1)
    Pj = xp.take(poses, jj, axis=1)
    Ri = Pi[..., :3, :3]
    ti = Pi[..., :3, 3]
    Rj = Pj[..., :3, :3]
    tj = Pj[..., :3, 3]
    # P_j P_i^{-1} = [Rj Ri^T | tj - Rj Ri^T ti]
    R = xp.einsum("...ik,...jk->...ij", Rj, Ri)
    t = tj - xp.einsum("...ij,...j->...i", R, ti)
    return R, t


# ---------------------------------------------------------------------------
# Homography helpers
# ---------------------------------------------------------------------------


def _K(fx, fy, cx, cy, xp=jnp):
    """(...,) scalars -> (..., 3, 3) intrinsic matrices."""
    fx, fy, cx, cy = xp.broadcast_arrays(fx, fy, cx, cy)
    z = xp.zeros_like(fx)
    o = xp.ones_like(fx)
    rows = [
        xp.stack([fx, z, cx], -1),
        xp.stack([z, fy, cy], -1),
        xp.stack([z, z, o], -1),
    ]
    return xp.stack(rows, -2)


def _K_inv(fx, fy, cx, cy, xp=jnp):
    return _K(1.0 / fx, 1.0 / fy, -cx / fx, -cy / fy, xp)


def homography_grid(H, out_h: int, out_w: int, xp=jnp, clamp: float = 1e4):
    """Apply 3x3 homography(ies) to the pixel grid of an (out_h, out_w) image.

    H: (..., 3, 3) -> (qx, qy) each (..., out_h, out_w), perspective-divided
    and clamped.  Componentwise on (h, w)-shaped grids: stacking a trailing
    xyz/xy dim puts a size-2/3 axis in the TPU lane dimension — XLA pads it
    to 128 lanes (measured 64x HBM blowups at production scale), so small
    trailing dims are banned from every large array on this path.
    """
    y = xp.arange(out_h, dtype=xp.float32)
    x = xp.arange(out_w, dtype=xp.float32)
    if xp is np:
        gy, gx = np.meshgrid(y, x, indexing="ij")
    else:
        gy, gx = jnp.meshgrid(y, x, indexing="ij")
    shape = H.shape[:-2] + (1, 1)
    comp = lambda i: (H[..., i, 0].reshape(shape) * gx
                      + H[..., i, 1].reshape(shape) * gy
                      + H[..., i, 2].reshape(shape))
    qx, qy, w = comp(0), comp(1), comp(2)
    w = xp.where(xp.abs(w) < 1e-9, 1e-9, w)
    return (xp.clip(qx / w, -clamp, clamp), xp.clip(qy / w, -clamp, clamp))


def _corner_quads(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) -> ((H+2)*(W+2), 4C) zero-padded corner-quad rows.

    Row ``(y+1)*(W+2) + (x+1)`` holds ``[f[y,x], f[y,x+1], f[y+1,x],
    f[y+1,x+1]]`` — the four bilinear corners of sample cell (y, x) as ONE
    contiguous row, so a warp costs one gather descriptor per output pixel
    instead of four (same packing as ``corr._make_corner_quads``; measured
    ~2.6x on the exact construction's gathers).
    """
    H, W, C = img.shape
    Wp = W + 2
    flat = jnp.pad(img, ((1, 1), (1, 1), (0, 0))).reshape((H + 2) * Wp, C)
    return jnp.concatenate(
        [flat, jnp.roll(flat, -1, axis=0), jnp.roll(flat, -Wp, axis=0),
         jnp.roll(flat, -(Wp + 1), axis=0)], axis=-1)


def warp_image(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
               mode: str = "zero", impl: str = "quad"):
    """Inverse-warp ``img`` (H, W, C) at pixel positions x/y (...,).

    mode="zero": out-of-image samples contribute zero (feature warps — matches
    the exact path's zero out-of-bounds corners, ``correlation_kernel.cu``
    boundary masks). mode="clamp": edge-extend (per-pixel parameter maps like
    the slab origin, where zero bleed-in would corrupt boundary values).
    Taps are gathered in ``img.dtype`` (bf16-safe); lerp weights stay fp32.

    impl="quad" (default) gathers all four corners as one packed 4C row
    (:func:`_corner_quads`); impl="taps" is the 4-descriptor variant (same
    values bit-for-bit, kept as the oracle).
    """
    H, W = img.shape[:2]
    if mode == "clamp":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    def inside(iy, ix):
        return ((ix >= 0) & (ix <= W - 1) & (iy >= 0)
                & (iy <= H - 1)).astype(jnp.float32)

    if impl == "quad":
        C = img.shape[-1] if img.ndim == 3 else 1
        quads = _corner_quads(img.reshape(H, W, C))
        # padded index: in-range for ix in [-1, W-1], iy in [-1, H-1] (the
        # pad ring holds zeros); farther out every corner weight is masked
        idx = (jnp.clip(iy0 + 1, 0, H) * (W + 2)
               + jnp.clip(ix0 + 1, 0, W))
        g = jnp.take(quads, idx.reshape(-1), axis=0, mode="clip").reshape(
            idx.shape + (4 * C,))
        weights = [
            (1 - fx) * (1 - fy) * inside(iy0, ix0),
            fx * (1 - fy) * inside(iy0, ix0 + 1),
            (1 - fx) * fy * inside(iy0 + 1, ix0),
            fx * fy * inside(iy0 + 1, ix0 + 1),
        ]
        return sum(g[..., q * C:(q + 1) * C].astype(jnp.float32)
                   * weights[q][..., None] for q in range(4))

    flat = img.reshape(H * W, -1)

    def tap(iy, ix, w):
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        # mode='clip' (indices pre-clipped): the default fill mode
        # materializes an extra select buffer the size of the gather output
        # (DEVNOTES.md)
        v = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            idx.shape + (flat.shape[-1],))
        return v.astype(jnp.float32) * (w * inside(iy, ix))[..., None]

    return (tap(iy0, ix0, (1 - fx) * (1 - fy))
            + tap(iy0, ix0 + 1, fx * (1 - fy))
            + tap(iy0 + 1, ix0, (1 - fx) * fy)
            + tap(iy0 + 1, ix0 + 1, fx * fy))


# ---------------------------------------------------------------------------
# Two-pass hat-matrix warp (MXU formulation of the homography resample)
# ---------------------------------------------------------------------------


def _twopass_maps(Hi: jnp.ndarray, h_s: int, out_w: int) -> jnp.ndarray:
    """Horizontal-pass sample positions ``m(y', x)`` for a two-pass warp.

    ``Hi`` maps output pixels to input pixels (the inverse-warp homography).
    ``m[y', x]`` is the input COLUMN where output column x's warp curve
    crosses input row ``y'``: solving ``Y(x, y*) = y'`` for the output row
    ``y*`` (rational in ``(x, y')``) and evaluating ``X(x, y*)``.  Rows where
    the curve never crosses (pole of the solve) are pushed out of range so
    their hat weights vanish; the host-side :func:`_twopass_ok` gate keeps
    such rows out of the weight support entirely.
    """
    Hi = Hi.astype(jnp.float32)
    yp = jnp.arange(h_s, dtype=jnp.float32)[:, None]       # (h_s, 1)
    x = jnp.arange(out_w, dtype=jnp.float32)[None, :]      # (1, out_w)
    den1 = Hi[1, 1] - yp * Hi[2, 1]                        # (h_s, 1)
    safe1 = jnp.where(jnp.abs(den1) < 1e-6, 1e-6, den1)
    ystar = (yp * (Hi[2, 0] * x + Hi[2, 2])
             - (Hi[1, 0] * x + Hi[1, 2])) / safe1          # (h_s, out_w)
    den2 = Hi[2, 0] * x + Hi[2, 1] * ystar + Hi[2, 2]
    safe2 = jnp.where(jnp.abs(den2) < 1e-6, 1e-6, den2)
    m = (Hi[0, 0] * x + Hi[0, 1] * ystar + Hi[0, 2]) / safe2
    bad = (jnp.abs(den1) < 1e-6) | (jnp.abs(den2) < 1e-6)
    return jnp.where(bad, -1e4, jnp.clip(m, -1e4, 1e4))


def warp_image_twopass(img: jnp.ndarray, H_inv: jnp.ndarray, out_h: int,
                       out_w: int, mode: str = "zero",
                       row_chunk: Optional[int] = None,
                       col_chunk: Optional[int] = None,
                       hat_budget: int = 384 * 1024 * 1024,
                       engine: str = "auto") -> jnp.ndarray:
    """Inverse-warp ``img`` (h_s, w_s, C) through homography ``H_inv`` as two
    1-D hat-matrix resamples (matmuls) instead of 2-D HBM gathers.

    The quad-gather :func:`warp_image` reads ~4C bytes from a random HBM
    location per output pixel (~75 GB/s effective, BENCH_NOTES.md); this
    formulation reads the image SEQUENTIALLY and puts the resample on the
    MXU:

      pass 1 (horizontal): ``tmp[y', x, :] = img[y', :, :]^T @ hat(s - m)``
        per row chunk, with ``m(y', x)`` the column where output column x's
        warp curve crosses input row y' (:func:`_twopass_maps`);
      pass 2 (vertical):   ``out[y, x, :] = hat(y' - k)^T @ tmp[:, x, :]``
        per column chunk, with ``k(x, y)`` the direct vertical map.

    Equals direct bilinear EXACTLY for separable warps (axis-aligned affine,
    e.g. the pure-lateral-motion rectifications); for general homographies
    the two samples sit ON the warp curve at integer input rows — a valid
    linear resample of the same continuous signal whose deviation from
    direct bilinear is O(row-tilt x local feature gradient).  Eligibility
    (poles outside range, bounded tilt) is decided host-side by
    :func:`_twopass_ok` / ``RectPlan.twopass``.

    ``mode`` as in :func:`warp_image`: "zero" zeroes out-of-image samples
    (the hat support does this naturally), "clamp" edge-extends ALONG THE
    WARP CURVE — vertically clamped pixels sample the edge row at that
    row's crossing position (equal to direct clamping for separable warps,
    within O(tilt) of it near the edges otherwise; far-outside extension is
    only faithful for gently tilted, gate-passing warps).  Returns
    fp32; bf16 inputs run bf16 matmuls (fp32 accumulation), fp32 inputs run
    HIGHEST-precision matmuls (the TPU default truncates fp32 operands).
    Position maps carry ``stop_gradient`` (reference parity: the CUDA
    backward never writes coordinate grads, ``correlation_kernel.cu:307``);
    image gradients flow through the transposed matmuls, with hat matrices
    rematerialized (``jax.checkpoint``) rather than saved.

    ``row_chunk``/``col_chunk``: None (default) auto-selects — a single
    unchunked einsum per pass while the hat tensor fits ``hat_budget``
    bytes as an HBM transient, else a ``lax.map`` over chunks.

    ``engine``: "xla" (einsum passes, the materialized-hat formulation
    above), "pallas" (``ops/pallas/hatwarp.hat_resample_rows`` — hat tiles
    built in VMEM, no HBM transient), or "auto" (pallas on TPU, xla on CPU
    where the kernel would run interpreted).  Same math and dtype path;
    gradients flow identically (image via the transposed resample,
    positions zero).
    """
    h_s, w_s, C = img.shape
    k = homography_grid(H_inv, out_h, out_w)[1]            # (out_h, out_w)
    m = _twopass_maps(H_inv, h_s, out_w)
    if mode == "clamp":
        # edge-extend only SANE crossings: a pole/wrong-branch row's m sits
        # at the +-1e4 clip (or the -1e4 sentinel) — clamping that to an
        # edge column would read the edge at full weight; keep such rows
        # zero-weight instead (for gated warps no weighted row is ill-posed)
        m = jnp.where(jnp.abs(m) > 9e3, -1e4, jnp.clip(m, 0.0, w_s - 1.0))
        k = jnp.clip(k, 0.0, h_s - 1.0)
    m = jax.lax.stop_gradient(m)
    k = jax.lax.stop_gradient(k)
    cdtype = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if cdtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)
    bpe = jnp.dtype(cdtype).itemsize

    if engine == "auto":
        # measured (TPU v5e, in-graph amortized): XLA fuses the hat
        # construction well and beats the kernel at EVERY profiled shape —
        # bench: 2.2 vs 2.4 ms back-warp, 2.6 vs 4.4 ms wide src-warp;
        # scale-2 over-budget (1024x1024x44 -> 576x800, where this path
        # chunks via lax.map): 48 vs 91 ms.  The kernel remains available
        # as an explicit engine (bit-identical output, own VJP; see
        # benchmarks/profile_hatwarp.py) for future tuning.
        engine = "xla"
    if engine == "pallas":
        from cermvs_tpu.ops.pallas.hatwarp import hat_resample_rows

        tmp = hat_resample_rows(img, m).astype(cdtype)     # (h_s, out_w, C)
        out = hat_resample_rows(tmp.transpose(1, 0, 2), k.T)
        return out.transpose(1, 0, 2)                      # (out_h, out_w, C)

    # chunk sizes: None => auto.  Unchunked passes (one einsum, hat tensor
    # as a single HBM transient) compile to 2 ops instead of a lax.map scan
    # — with tens of warps per forward the scans dominated trace/compile
    # time through the remote-compile tunnel; chunking only pays when the
    # hat tensor would not fit the transient budget.
    if row_chunk is None:
        row_chunk = h_s if h_s * w_s * out_w * bpe <= hat_budget else 32
    if col_chunk is None:
        col_chunk = out_w if out_w * h_s * out_h * bpe <= hat_budget else 64

    hp = -(-h_s // row_chunk) * row_chunk
    imgp = jnp.pad(img, ((0, hp - h_s), (0, 0), (0, 0)))
    # padded rows get out-of-range positions AFTER any clamp: zero hat rows,
    # so they contribute nothing to either mode
    mp = jnp.pad(m, ((0, hp - h_s), (0, 0)), constant_values=-1e4)

    @jax.checkpoint
    def row_body(args):
        img_c, m_c = args                                  # (r, w_s, C)
        s = jax.lax.broadcasted_iota(jnp.float32,
                                     (row_chunk, w_s, out_w), 1)
        S = jnp.maximum(1.0 - jnp.abs(s - m_c[:, None, :]), 0.0)
        tmp = jnp.einsum("rsc,rsx->rxc", img_c.astype(cdtype),
                         S.astype(cdtype),
                         preferred_element_type=jnp.float32, precision=prec)
        return tmp.astype(cdtype)

    n_r = hp // row_chunk
    if n_r == 1:
        tmp = row_body((imgp, mp))
    else:
        tmp = jax.lax.map(row_body, (imgp.reshape(n_r, row_chunk, w_s, C),
                                     mp.reshape(n_r, row_chunk, out_w)))
        tmp = tmp.reshape(hp, out_w, C)
    tmp = tmp.transpose(1, 0, 2)                           # (out_w, hp, C)

    wp = -(-out_w // col_chunk) * col_chunk
    tmpp = jnp.pad(tmp, ((0, wp - out_w), (0, 0), (0, 0)))
    kT = jnp.pad(k.T, ((0, wp - out_w), (0, 0)), constant_values=-1e4)

    @jax.checkpoint
    def col_body(args):
        t_c, k_c = args                                    # (cc, hp, C)
        y = jax.lax.broadcasted_iota(jnp.float32,
                                     (col_chunk, hp, out_h), 1)
        T = jnp.maximum(1.0 - jnp.abs(y - k_c[:, None, :]), 0.0)
        return jnp.einsum("xyc,xyz->xzc", t_c, T.astype(cdtype),
                          preferred_element_type=jnp.float32, precision=prec)

    n_c = wp // col_chunk
    if n_c == 1:
        out = col_body((tmpp, kT))
    else:
        out = jax.lax.map(col_body, (tmpp.reshape(n_c, col_chunk, hp, C),
                                     kT.reshape(n_c, col_chunk, out_h)))
        out = out.reshape(wp, out_h, C)
    return out[:out_w].transpose(1, 0, 2)


# ---------------------------------------------------------------------------
# Static plan (host side)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RectPlan:
    """Static (shape-determining) rectification parameters for one scene.

    Produced host-side by :func:`plan_rectification` from concrete poses;
    everything value-like stays dynamic in-graph — only shapes live here, so
    one compiled graph serves all scenes that bucket to the same plan.
    """

    h_r: int          # rect grid rows (shared ref/src)
    w_r: int          # rect-ref grid cols
    s_max: int        # max disparity covered (px); src band extends left
    s_neg: int        # negative-disparity margin (px, behind-slab hypotheses)
    ok: bool = True   # False => caller must use the exact path
    reason: str = ""
    # scene-wide bounds on the disparity rate fx_r*B*g (px per unit inverse
    # depth) — static inputs for the fused kernel's banded-select windows
    rate_lo: float = 0.0
    rate_hi: float = 0.0
    # per-view refinements (leading index = view position in jj): rate bounds
    # and disparity band, both snapped to coarse grids so views bucket into
    # few kernel variants.  Within one view the rate spread is ~1.1x (g only)
    # while across views it follows the baseline spread (~5x on DTU rigs) —
    # per-view windows keep the kernel's static selects near-minimal.
    # Empty tuples => use the scene-wide values for every view.
    view_rates: Tuple[Tuple[float, float], ...] = ()
    view_s_max: Tuple[int, ...] = ()
    # True => every (view, warp) passed the two-pass eligibility gate
    # (:func:`_twopass_ok`) and the builder may use the MXU hat-matrix warp
    # (:func:`warp_image_twopass`) instead of quad gathers
    twopass: bool = False

    @property
    def ws_r(self) -> int:
        return self.w_r + self.s_max + self.s_neg

    def view_params(self, v: int) -> Tuple[float, float, int]:
        """(rate_lo, rate_hi, s_max) for view ``v`` (scene-wide fallback)."""
        if self.view_rates:
            lo, hi = self.view_rates[v]
            return lo, hi, self.view_s_max[v]
        return self.rate_lo, self.rate_hi, self.s_max

    def covers(self, other: "RectPlan") -> bool:
        """True iff a builder compiled for ``self`` is sound for any batch
        whose own plan is ``other``.

        Plans are over-approximations (grids large enough, rate intervals /
        disparity bands wide enough): a superset plan serves a narrower
        batch exactly the way :func:`plan_union` serves the widest sample
        of a training batch.  The one non-monotone field is ``twopass`` —
        its host gate (:func:`_twopass_ok`) sampled a 25% margin around the
        OTHER plan's grids, so a twopass step may only be reused while
        self's grids stay inside that sampled domain (the same rule
        :func:`plan_union` applies when merging)."""
        if not (self.ok and other.ok):
            return False
        if len(self.view_s_max) != len(other.view_s_max):
            return False
        if not (self.h_r >= other.h_r and self.w_r >= other.w_r
                and self.s_max >= other.s_max and self.s_neg >= other.s_neg
                and self.rate_lo <= other.rate_lo + 1e-12
                and self.rate_hi >= other.rate_hi - 1e-12):
            return False
        if bool(self.view_rates) != bool(other.view_rates):
            return False
        for (slo, shi), (olo, ohi), ss, os_ in zip(
                self.view_rates, other.view_rates,
                self.view_s_max, other.view_s_max):
            if not (slo <= olo + 1e-12 and shi >= ohi - 1e-12 and ss >= os_):
                return False
        if self.twopass:
            if not other.twopass:
                return False
            if (self.h_r > 1.25 * other.h_r or self.w_r > 1.25 * other.w_r
                    or self.s_max > other.s_max + 0.25 * other.ws_r):
                return False
        return True


def rect_cost_ratio(plan: "RectPlan", h: int, w: int, n_views: int,
                    d0: int = 64) -> float:
    """Planned epiband work per unit of exact-construction work.

    A shape-level proxy for gating the rectified construction in "auto"
    mode: the epiband kernels sweep ``h_r x (w_r + view_s_max_v)``
    rectified rows per view, while the exact gather path touches
    ``h*w*D`` samples per view (stage-0 ``d0`` dominates).  Dimensionless;
    at FEATURE resolution the bench scenes measure 0.06-0.13 (DTU s1/s2,
    TNT nf15/nf25 — see BENCH_NOTES.md round-3 shape rows, where the
    rectified path wins or ties every production shape that compiles), so
    only a pathological plan (ratio well above 1) warrants the gate."""
    views = (plan.view_s_max if plan.view_s_max
             else (plan.s_max,) * max(n_views, 1))
    rect = plan.h_r * sum(plan.w_r + s for s in views)
    exact = h * w * d0 * max(n_views, 1)
    return rect / max(exact, 1)


def _round_up(v: float, m: int) -> int:
    return int(math.ceil(v / m)) * m


def _twopass_ok(Hi: np.ndarray, out_h: int, out_w: int, in_h: int,
                in_w: int, tilt_max: float = 3.0) -> bool:
    """Host-side eligibility of ONE warp for :func:`warp_image_twopass`.

    Requires, over the evaluated domain (input rows x output columns, with a
    1-px margin): (1) the vertical solve's denominator ``h11 - y' h21``
    bounded away from 0 and sign-constant (every output column's warp curve
    crosses each input row exactly once); (2) the homography denominator
    bounded away from 0 on both the crossing points and the output grid (no
    horizon in range); (3) horizontal drift per input row (= how far the
    two-pass samples sit from the direct bilinear footprint) under
    ``tilt_max`` pixels.  Rectification homographies (rotation-only, planner
    pre-gated) sit comfortably inside these bounds; anything else falls back
    to the quad-gather warp.
    """
    Hi = np.asarray(Hi, np.float64)
    scale = max(abs(Hi[1, 1]), 1e-12)
    # anchor the legitimate projective branch at the forward projection of
    # the INPUT image center (definitionally a legitimate sample); output
    # grids may legally contain a horizon in their dead zones (the rect-src
    # grid is mostly disparity-band padding outside the warped footprint)
    pc = np.linalg.inv(Hi) @ np.array([(in_w - 1) / 2, (in_h - 1) / 2, 1.0])
    if abs(pc[2]) < 1e-9:
        return False
    den_c = (Hi[2, 0] * pc[0] + Hi[2, 1] * pc[1]) / pc[2] + Hi[2, 2]
    if abs(den_c) < 1e-3:
        return False
    sgn = np.sign(den_c)
    # sample the output grid with a 25% margin (plan_union may enlarge the
    # grids after gating; the per-view centering offsets shift with them):
    # only pixels whose vertical map k lands within hat range of the input
    # rows matter — a horizon beyond the footprint gets zero weight either
    # way
    xs = np.linspace(-0.25 * out_w, 1.25 * out_w, 41)
    ys = np.linspace(-0.25 * out_h, 1.25 * out_h, 41)
    Yg, Xg = np.meshgrid(ys, xs, indexing="ij")
    den = Hi[2, 0] * Xg + Hi[2, 1] * Yg + Hi[2, 2]
    dsafe = np.where(np.abs(den) < 1e-12, 1e-12, den)
    k = (Hi[1, 0] * Xg + Hi[1, 1] * Yg + Hi[1, 2]) / dsafe
    kmask = (k > -2.0) & (k < in_h + 1.0)

    # the vertical hats only touch input rows y' within 1 of the legitimate
    # crossing k(x, y) (clamp mode pins k inside [0, in_h-1], zero mode
    # zero-weights out-of-range rows): the solve must be well-posed exactly
    # there, not on the full (y', x) rectangle — a horizon crossing far from
    # the warp footprint is harmless (its hat weights vanish)
    if not kmask.any():
        return True  # nothing ever sampled: all-zero output either way
    ms = []
    for dy in (-1.5, 0.0, 1.5):
        yp = np.clip(k + dy, -2.0, in_h + 1.0)
        den1 = Hi[1, 1] - yp * Hi[2, 1]
        d1safe = np.where(np.abs(den1) < 1e-12, 1e-12, den1)
        ystar = (yp * (Hi[2, 0] * Xg + Hi[2, 2])
                 - (Hi[1, 0] * Xg + Hi[1, 2])) / d1safe
        den2 = Hi[2, 0] * Xg + Hi[2, 1] * ystar + Hi[2, 2]
        d2safe = np.where(np.abs(den2) < 1e-12, 1e-12, den2)
        m = (Hi[0, 0] * Xg + Hi[0, 1] * ystar + Hi[0, 2]) / d2safe
        # an out-of-range (or non-finite) m never gets hat weight: only
        # points that would SAMPLE are held to the branch/conditioning rules
        # — a wrong-branch (den2 sign flip) or ill-conditioned (den1 ~ 0)
        # solve whose m lands in range would silently sample garbage
        in_range = np.isfinite(m) & (np.abs(m) < in_w + 2.0)
        live = kmask & in_range
        bad = live & ((den2 * sgn <= 0) | (np.abs(den1) < 0.2 * scale))
        if bad.any():
            return False
        ms.append((m, live))
    both = ms[0][1] & ms[2][1]
    if both.any():
        drift = np.abs(ms[2][0][both] - ms[0][0][both]) / 3.0
        if drift.max() > tilt_max:
            return False
    return True


def plan_rectification(
    poses: np.ndarray,
    intrinsics: np.ndarray,
    h: int,
    w: int,
    lambda_max: float = 0.00375,
    s_neg: int = 16,
    min_baseline_sin: float = 0.25,
    pad: int = 8,
    max_width_factor: float = 2.5,
) -> RectPlan:
    """Decide whether/with what grid sizes a scene can use the rectified path.

    poses: (N, 4, 4) or (B, N, 4, 4) world-to-camera; intrinsics: matching
    (..., N, 3, 3) at the FEATURE stride (i.e. already divided by the encoder
    factor); (h, w): feature-grid size.  ``lambda_max``: largest inverse depth
    any hypothesis slab may reach (default 1.5x the stage-0 slab top 0.0025,
    ``core/raft.py:81``); with the reference's scale conventions (min depth
    400, ``datasets/tnt.py:74-76``) estimates stay under it.
    """
    poses = np.asarray(poses, np.float64)
    intrinsics = np.asarray(intrinsics, np.float64)
    if poses.ndim == 4:
        if poses.shape[0] != 1:
            return RectPlan(0, 0, 0, 0, False, "rectified path requires B==1")
        poses, intrinsics = poses[0], intrinsics[0]
    N = poses.shape[0]
    ii = np.zeros(N - 1, np.int64)
    jj = np.arange(1, N)
    R, t = relative_pose(poses[None], ii, jj, xp=np)
    R, t = R[0], t[0]

    sin = rect_degeneracy(R, t, xp=np)
    if np.any(sin < min_baseline_sin):
        return RectPlan(0, 0, 0, 0, False,
                        f"near-forward baseline (min sin={sin.min():.3f})")

    R_ri, R_rj, bl = rect_rotations(R, t, xp=np)
    if np.any(bl < 1e-6):
        return RectPlan(0, 0, 0, 0, False, "zero baseline pair")

    Ki = intrinsics[0]
    fx_r, fy_r = Ki[0, 0], Ki[1, 1]
    Ki_inv = np.linalg.inv(Ki)

    corners = np.array(
        [[0, 0, 1], [w - 1, 0, 1], [0, h - 1, 1], [w - 1, h - 1, 1]],
        np.float64)

    w_need, h_need, s_need = 0.0, 0.0, 0.0
    rate_lo, rate_hi = np.inf, 0.0
    v_lo, v_hi, v_s = [], [], []
    for v in range(N - 1):
        A = _K(fx_r, fy_r, 0.0, 0.0, xp=np) @ R_ri[v] @ Ki_inv
        q = corners @ A.T
        if np.any(q[:, 2] <= 1e-6):
            return RectPlan(0, 0, 0, 0, False,
                            f"rect horizon crosses ref image (view {v})")
        q = q[:, :2] / q[:, 2:3]
        w_need = max(w_need, q[:, 0].max() - q[:, 0].min())
        h_need = max(h_need, q[:, 1].max() - q[:, 1].min())
        # g over the warped ref image is bounded by its corner values only
        # approximately; sample a coarse interior grid for a sound bound
        gy, gx = np.meshgrid(np.linspace(0, h - 1, 8),
                             np.linspace(0, w - 1, 8), indexing="ij")
        rays = np.stack([gx, gy, np.ones_like(gx)], -1) @ Ki_inv.T
        g = rays @ R_ri[v][2]  # = (R_ri^T . e3) . ray = r3 . ray
        if np.any(g <= 0.05):
            return RectPlan(0, 0, 0, 0, False,
                            f"rect ray grazes principal plane (view {v})")
        s_need = max(s_need, fx_r * bl[v] * g.max() * lambda_max)
        rate_lo = min(rate_lo, fx_r * bl[v] * g.min())
        rate_hi = max(rate_hi, fx_r * bl[v] * g.max())
        v_lo.append(fx_r * bl[v] * g.min())
        v_hi.append(fx_r * bl[v] * g.max())
        v_s.append(fx_r * bl[v] * g.max() * lambda_max)

    # coarse rounding so per-ref-view plans within a scan bucket to one
    # compiled graph (the plan is part of the jit cache key downstream)
    w_r = _round_up(w_need + 2 * pad, 128)
    h_r = _round_up(h_need + 2 * pad, 32)
    s_max = _round_up(s_need + pad, 64)
    if w_r + s_max + s_neg > max_width_factor * (w + s_need + 2 * pad) + 256:
        return RectPlan(0, 0, 0, 0, False,
                        f"rect grid blow-up (w_r={w_r}, s_max={s_max})")
    # sampled g grids bound interior extrema only approximately; pad the rate
    # interval so the kernel's static select windows stay sound, then snap to
    # a multiplicative grid (outward) so float jitter across per-view plans
    # cannot fragment the jit cache
    lo, hi = _snap_rates(rate_lo, rate_hi)
    # per-view refinements, snapped the same way (plus per-view disparity
    # bands rounded to 64) so views bucket into few kernel variants
    view_rates = tuple(_snap_rates(a, b) for a, b in zip(v_lo, v_hi))
    view_s_max = tuple(min(_round_up(s + pad, 64), s_max) for s in v_s)

    # two-pass warp eligibility: the three inverse-warp homographies per view
    # (:func:`host_rect_homographies`, the np mirror of rect_geometry's
    # construction) must each pass _twopass_ok; view bands only shift
    # H_src_inv horizontally (translation does not move poles/tilt), so the
    # scene-wide s_max band is checked
    ws_r = w_r + s_max + int(s_neg)
    H_ref_inv, H_src_inv, H_fwd = host_rect_homographies(
        poses, intrinsics, h, w, h_r, w_r, s_max)
    twopass = True
    for v in range(N - 1):
        twopass = (twopass
                   and _twopass_ok(H_ref_inv[v], h_r, w_r, h, w)
                   and _twopass_ok(H_src_inv[v], h_r, ws_r, h, w)
                   and _twopass_ok(H_fwd[v], h, w, h_r, w_r))
        if not twopass:
            break
    return RectPlan(h_r, w_r, s_max, int(s_neg), True, "",
                    rate_lo=float(lo), rate_hi=float(hi),
                    view_rates=view_rates, view_s_max=view_s_max,
                    twopass=twopass)


def plan_rectification_partial(
    poses: np.ndarray,
    intrinsics: np.ndarray,
    h: int,
    w: int,
    **kwargs,
) -> Tuple[RectPlan, Tuple[int, ...]]:
    """Plan rectification for the SUBSET of neighbor views that pass the
    per-view gates (mixed construction).

    The full planner rejects a scene if ANY pair fails (near-forward
    baseline, horizon, grazing ray) — but those gates are per-pair, and a
    typical forward-motion sequence still has several lateral neighbors.
    This variant gates each (ref, neighbor) pair separately and plans over
    the passing subset, so inference can build those views' volume slices
    through the epiband fast path and only the failing views through the
    exact gathers (``ops/corr_rectified.make_mixed_volume_fn``).

    Returns (plan, rect_views): ``rect_views`` are 0-based neighbor
    positions (indices into jj) in ascending order; ``plan`` covers exactly
    those views (``plan.view_params(i)`` follows rect_views order).  When
    no view passes, plan.ok is False and rect_views is empty; when all
    pass, this equals ``plan_rectification``.
    """
    poses = np.asarray(poses, np.float64)
    intrinsics = np.asarray(intrinsics, np.float64)
    if poses.ndim == 4:
        if poses.shape[0] != 1:
            return (RectPlan(0, 0, 0, 0, False,
                             "rectified path requires B==1"), ())
        poses, intrinsics = poses[0], intrinsics[0]
    N = poses.shape[0]
    ok = []
    for v in range(1, N):
        pair = plan_rectification(poses[[0, v]], intrinsics[[0, v]], h, w,
                                  **kwargs)
        if pair.ok:
            ok.append(v - 1)
    if not ok:
        return RectPlan(0, 0, 0, 0, False, "no rectifiable view"), ()
    if len(ok) == N - 1:
        return plan_rectification(poses, intrinsics, h, w, **kwargs), tuple(ok)
    sub = [0] + [v + 1 for v in ok]
    plan = plan_rectification(poses[sub], intrinsics[sub], h, w, **kwargs)
    return plan, tuple(ok)


def plan_union(plans) -> RectPlan:
    """Smallest RectPlan covering every plan in ``plans``.

    For TRAINING batches (B > 1): per-sample geometry differs, but one
    static plan must serve the whole batch (shapes are part of the compiled
    graph).  Inputs must share the view count.  Rates/bands are already
    snapped to coarse grids by :func:`plan_rectification`, so min/max of
    grid points stay on the grid and batches bucket into few compiled
    variants.
    """
    plans = list(plans)
    for p in plans:
        if not p.ok:
            return p
    nv = {len(p.view_s_max) for p in plans}
    if len(nv) > 1:
        return RectPlan(0, 0, 0, 0, False, "view-count mismatch in union")
    V = nv.pop() if all(p.view_rates for p in plans) else 0
    view_rates = tuple(
        (min(p.view_rates[v][0] for p in plans),
         max(p.view_rates[v][1] for p in plans))
        for v in range(V))
    s_max = max(p.s_max for p in plans)
    return RectPlan(
        max(p.h_r for p in plans), max(p.w_r for p in plans),
        s_max, max(p.s_neg for p in plans), True, "",
        rate_lo=min(p.rate_lo for p in plans),
        rate_hi=max(p.rate_hi for p in plans),
        view_rates=view_rates,
        view_s_max=tuple(min(max(p.view_s_max[v] for p in plans), s_max)
                         for v in range(V)),
        # each plan's gate sampled a 25% margin around ITS grids
        # (_twopass_ok); the union may only keep the flag if it stays
        # inside every constituent's gated domain
        twopass=all(
            p.twopass
            and max(q.h_r for q in plans) <= 1.25 * p.h_r
            and max(q.w_r for q in plans) <= 1.25 * p.w_r
            and s_max <= p.s_max + 0.25 * p.ws_r
            for p in plans))


def host_rect_homographies(
    poses: np.ndarray,
    intrinsics: np.ndarray,
    h: int,
    w: int,
    h_r: int,
    w_r: int,
    s_max: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """np mirror of :func:`rect_geometry`'s three homographies, host-side.

    Returns ``(H_ref_inv, H_src_inv, H_fwd)``, each (V, 3, 3) float64, for
    the N-1 (ref=0, src=v) pairs.  The centering offsets (ox, oy) follow
    rect_geometry's formula exactly (keep in sync); they depend only on
    rotations, so SCALED poses (training's depth rescale) give the same
    matrices.  Used by the twopass eligibility gate and by
    :func:`plan_row_bands` (row-sharded inference).
    """
    poses = np.asarray(poses, np.float64)
    intrinsics = np.asarray(intrinsics, np.float64)
    if poses.ndim == 4:
        poses, intrinsics = poses[0], intrinsics[0]
    N = poses.shape[0]
    ii = np.zeros(N - 1, np.int64)
    jj = np.arange(1, N)
    R, t = relative_pose(poses[None], ii, jj, xp=np)
    R_ri, R_rj, _ = rect_rotations(R[0], t[0], xp=np)
    Ki = intrinsics[0]
    fx_r, fy_r = Ki[0, 0], Ki[1, 1]
    Ki_inv = np.linalg.inv(Ki)
    corners = np.array(
        [[0, 0, 1], [w - 1, 0, 1], [0, h - 1, 1], [w - 1, h - 1, 1]],
        np.float64)
    H_ref_inv = np.zeros((N - 1, 3, 3))
    H_src_inv = np.zeros((N - 1, 3, 3))
    H_fwd = np.zeros((N - 1, 3, 3))
    for v in range(N - 1):
        A = _K(fx_r, fy_r, 0.0, 0.0, xp=np) @ R_ri[v] @ Ki_inv
        q = corners @ A.T
        q = q[:, :2] / q[:, 2:3]
        ox = -q[:, 0].min() + (w_r - 1 - (q[:, 0].max() - q[:, 0].min())) / 2
        oy = -q[:, 1].min() + (h_r - 1 - (q[:, 1].max() - q[:, 1].min())) / 2
        Kj = intrinsics[1 + v]
        H_ref_inv[v] = Ki @ R_ri[v].T @ _K_inv(fx_r, fy_r, ox, oy, xp=np)
        H_src_inv[v] = Kj @ R_rj[v].T @ _K_inv(fx_r, fy_r, ox + s_max, oy,
                                               xp=np)
        H_fwd[v] = _K(fx_r, fy_r, ox, oy, xp=np) @ R_ri[v] @ Ki_inv
    return H_ref_inv, H_src_inv, H_fwd


def plan_row_bands(
    poses: np.ndarray,
    intrinsics: np.ndarray,
    h: int,
    w: int,
    plan: RectPlan,
    n_shards: int,
    ghost: int,
    margin: int = 4,
) -> Tuple[np.ndarray, int]:
    """Static per-(shard, view) rect-row bands for row-sharded rectified
    construction (``parallel/spatial.row_sharded_forward``).

    Shard ``s`` owns feature rows ``[s*hloc, (s+1)*hloc)`` extended by
    ``ghost`` rows; its volume back-warp for view ``v`` samples rect rows
    ``fwd_y`` over that block (+-1 bilinear tap).  The band
    ``[q0[s, v], q0[s, v] + band_h)`` covers those rows with ``margin``
    slack; ``fwd_y`` is a pole-free Möbius map on gated scenes, so its
    extrema sit on the sampled block boundary (a coarse grid suffices).

    Returns ``(q0, band_h)``: ``q0`` (n_shards, V) int32 band starts in
    global rect rows, ``band_h`` the uniform static band height (multiple
    of 8, capped at ``plan.h_r``).  ``q0`` enters the shard_map as a
    sharded per-shard input; ``band_h`` is a shape.
    """
    assert plan.ok, plan.reason
    assert h % n_shards == 0, (h, n_shards)
    _, _, H_fwd = host_rect_homographies(
        poses, intrinsics, h, w, plan.h_r, plan.w_r, plan.s_max)
    V = H_fwd.shape[0]
    hloc = h // n_shards
    xs = np.linspace(0.0, w - 1.0, 65)
    q_lo = np.zeros((n_shards, V))
    q_hi = np.zeros((n_shards, V))
    for s in range(n_shards):
        y0 = max(s * hloc - ghost, 0)
        y1 = min(s * hloc + hloc + ghost, h) - 1
        ys = np.linspace(float(y0), float(y1), 65)
        Yg, Xg = np.meshgrid(ys, xs, indexing="ij")
        for v in range(V):
            den = H_fwd[v, 2, 0] * Xg + H_fwd[v, 2, 1] * Yg + H_fwd[v, 2, 2]
            assert np.all(np.abs(den) > 1e-9), "horizon inside gated scene"
            k = (H_fwd[v, 1, 0] * Xg + H_fwd[v, 1, 1] * Yg
                 + H_fwd[v, 1, 2]) / den
            q_lo[s, v] = np.floor(k.min()) - 1 - margin
            q_hi[s, v] = np.ceil(k.max()) + 2 + margin
    extent = float((q_hi - q_lo).max())
    band_h = min(int(-(-extent // 8) * 8), plan.h_r)
    q0 = np.clip(q_lo, 0, plan.h_r - band_h).astype(np.int32)
    return q0, band_h


def pack_plan(plan: RectPlan, n_views: int) -> np.ndarray:
    """Encode a RectPlan as a flat float64 vector for cross-process exchange
    (multi-host training computes per-host plans from LOCAL batches; the
    hosts allgather packed plans and each takes the same :func:`plan_union`
    so every process compiles the identical step).  ``n_views`` = number of
    neighbor views (len(jj)); a plan without per-view refinements packs the
    scene-wide values.  Inverse: :func:`unpack_plan`."""
    head = [float(plan.ok), plan.h_r, plan.w_r, plan.s_max, plan.s_neg,
            plan.rate_lo, plan.rate_hi, float(plan.twopass)]
    if plan.ok and plan.view_rates:
        pv = [x for v in range(n_views)
              for x in (*plan.view_rates[v], plan.view_s_max[v])]
    else:
        pv = [plan.rate_lo, plan.rate_hi, plan.s_max] * n_views
    return np.asarray(head + pv, np.float64)


def unpack_plan(vec: np.ndarray, n_views: int) -> RectPlan:
    """Inverse of :func:`pack_plan` (the ``reason`` string is not carried)."""
    vec = np.asarray(vec, np.float64)
    if vec[0] == 0.0:
        return RectPlan(0, 0, 0, 0, False, "remote plan not ok")
    pv = vec[8:].reshape(n_views, 3)
    return RectPlan(
        int(vec[1]), int(vec[2]), int(vec[3]), int(vec[4]), True, "",
        rate_lo=float(vec[5]), rate_hi=float(vec[6]),
        view_rates=tuple((float(a), float(b)) for a, b, _ in pv),
        view_s_max=tuple(int(s) for _, _, s in pv),
        twopass=bool(vec[7]))


def _snap_rates(rate_lo: float, rate_hi: float) -> Tuple[float, float]:
    """Outward-snap a rate interval to a multiplicative grid.

    Sampled g grids bound interior extrema only approximately; pad the
    interval 2%, then snap to a log-1.15 grid so float jitter across per-
    ref-view plans cannot fragment the jit cache.
    """
    margin = 0.02 * (rate_hi - rate_lo) + 1e-6
    lo, hi = max(rate_lo - margin, 1e-6), rate_hi + margin
    step = math.log(1.15)
    lo = math.exp(math.floor(math.log(lo) / step) * step)
    hi = math.exp(math.ceil(math.log(hi) / step) * step)
    return float(lo), float(hi)


def widen_plan(plan: RectPlan, notches: int = 2) -> RectPlan:
    """Outward-widen a plan's rate intervals by ``notches`` steps of the
    snap grid (1.15 per notch), staying on the grid.

    Used by :class:`PlanCache` before compiling a step for a cache miss:
    the snapped per-batch plans of a long training run land on MANY nearby
    grid points (each baseline/augmentation jitter moves lo/hi by a point
    or two, and per-view rates multiply the combinations), so caching the
    exact plan compiles a near-new step per batch.  A widened plan COVERS
    the whole neighborhood, collapsing the stream into a handful of
    compiled variants at the cost of slightly wider static kernel select
    windows (the epiband kernel's band width scales with ``rate_hi``; two
    notches cost ~32% extra window at the top end).
    """
    if not plan.ok:
        return plan
    f = 1.15 ** notches

    def out(lo, hi):
        return _snap_rates(lo / f, hi * f)

    lo, hi = out(plan.rate_lo, plan.rate_hi)
    return RectPlan(
        plan.h_r, plan.w_r, plan.s_max, plan.s_neg, True, "",
        rate_lo=lo, rate_hi=hi,
        view_rates=tuple(out(a, b) for a, b in plan.view_rates),
        view_s_max=plan.view_s_max, twopass=plan.twopass)


class PlanCache:
    """Bounds compile-cache growth under pose diversity.

    ``key_for(plan)`` returns the cached covering plan if one exists
    (its compiled step is sound for this batch — see
    :meth:`RectPlan.covers`), else registers and returns a widened
    version of ``plan``.  Deterministic: every host replaying the same
    plan stream makes the same decisions, so multi-host training keeps
    compiling identical steps (train.pick_step allgathers plans first).
    """

    def __init__(self, notches: int = 2):
        self.notches = notches
        self._plans: list = []

    def key_for(self, plan: RectPlan) -> RectPlan:
        for q in self._plans:
            if q.covers(plan):
                return q
        wide = widen_plan(plan, self.notches)
        self._plans.append(wide)
        return wide

    def __len__(self) -> int:
        return len(self._plans)


# ---------------------------------------------------------------------------
# In-graph geometry (dynamic values, static shapes from a RectPlan)
# ---------------------------------------------------------------------------


def rect_geometry(
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    h: int,
    w: int,
    plan: RectPlan,
    need_grids: bool = True,
):
    """All per-view rectification maps, computed inside jit.

    ``need_grids=False`` (the twopass-warp path) skips evaluating the two
    largest pixel grids — ``ref_src_xy`` (V, h_r, ws_r) and ``fwd_xy`` —
    whose warps read the homographies directly; the keys are then None.
    (Inside jit XLA would DCE them, but eager callers pay for real.)

    poses: (1, N, 4, 4); intrinsics: (1, N, 3, 3) at feature stride.
    Returns a dict of arrays (leading axis V; coordinates are (x, y) PAIRS of
    (V, h, w) arrays — no trailing xy dim, see :func:`homography_grid`):
      ref_src_xy       original-src coords per rect-src cell (V, h_r, ws_r)x2
      ref_ref_xy       original-ref coords per rect-ref cell (V, h_r, w_r)x2
      fwd_xy           rect-ref coords of each ref pixel (V, h, w)x2
      g                (V, h_r, w_r)      per-pixel disparity-rate factor
      rate             (V, h_r, w_r)      fx_r * B * g  (disparity per unit
                                          inverse depth)
    Sample identity (tested): for ref pixel p at inverse depth lam the exact
    projection into src equals mapping ``q = fwd(p)``, then
    ``x' = q_x - rate(q) * lam`` on row ``q_y`` of the rect-src image (whose
    array column is ``x' + s_max``).
    """
    assert poses.shape[0] == 1, "rectified path supports batch size 1"
    R, t = relative_pose(poses, ii, jj)  # (1, V, 3, 3), (1, V, 3)
    R_ri, R_rj, bl = rect_rotations(R[0], t[0])  # (V, 3, 3), (V,)
    V = R_ri.shape[0]

    Ki = intrinsics[0, 0].astype(jnp.float32)
    Kj = jnp.take(intrinsics[0], jj, axis=0).astype(jnp.float32)
    fx_r, fy_r = Ki[0, 0], Ki[1, 1]

    # principal offsets: center each view's warped ref bbox in the rect grid
    corners = jnp.array(
        [[0.0, 0.0, 1.0], [w - 1.0, 0.0, 1.0],
         [0.0, h - 1.0, 1.0], [w - 1.0, h - 1.0, 1.0]], jnp.float32)
    Kr0 = _K(fx_r, fy_r, jnp.float32(0.0), jnp.float32(0.0))
    Ki_inv = _K_inv(Ki[0, 0], Ki[1, 1], Ki[0, 2], Ki[1, 2])
    A = jnp.einsum("ij,vjk,kl->vil", Kr0, R_ri, Ki_inv)  # (V, 3, 3)
    qc = jnp.einsum("vij,cj->vci", A, corners)
    qc = qc[..., :2] / qc[..., 2:3]  # (V, 4, 2)
    ox = -qc[..., 0].min(1) + (plan.w_r - 1 -
                               (qc[..., 0].max(1) - qc[..., 0].min(1))) / 2
    oy = -qc[..., 1].min(1) + (plan.h_r - 1 -
                               (qc[..., 1].max(1) - qc[..., 1].min(1))) / 2

    Koff = _K(fx_r, fy_r, ox, oy)            # (V, 3, 3)
    Koff_inv = _K_inv(fx_r, fy_r, ox, oy)
    Ksrc = _K(fx_r, fy_r, ox + float(plan.s_max), oy)
    Ksrc_inv = _K_inv(fx_r, fy_r, ox + float(plan.s_max), oy)
    Kj_mat = Kj
    Kj_inv = _K_inv(Kj[:, 0, 0], Kj[:, 1, 1], Kj[:, 0, 2], Kj[:, 1, 2])

    # rect-src array cell -> original src pixel (inverse warp)
    H_src_inv = jnp.einsum("vij,vkj,vkl->vil", Kj_mat, R_rj, Ksrc_inv)
    ref_src_xy = (homography_grid(H_src_inv, plan.h_r, plan.ws_r)
                  if need_grids else None)

    # rect-ref cell -> original ref pixel
    H_ref_inv = jnp.einsum("ij,vkj,vkl->vil", _K(Ki[0, 0], Ki[1, 1],
                                                 Ki[0, 2], Ki[1, 2]),
                           R_ri, Koff_inv)
    ref_ref_xy = homography_grid(H_ref_inv, plan.h_r, plan.w_r)

    # ref pixel -> rect-ref coords (forward map, for the volume back-warp)
    H_fwd = jnp.einsum("vij,vjk,kl->vil", Koff, R_ri, Ki_inv)
    fwd_xy = homography_grid(H_fwd, h, w) if need_grids else None

    # g(q) = (R_ri^T . rect_ray)_3 — the THIRD COLUMN of R_ri dotted with the
    # rect-frame ray K_off^{-1} q~ (equals r3 . ref_ray when expressed on the
    # reference grid; the planner uses that dual form); componentwise to keep
    # every array (V, h, w)-shaped
    y = jnp.arange(plan.h_r, dtype=jnp.float32)
    x = jnp.arange(plan.w_r, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    a = R_ri[:, 0, 2][:, None, None]
    b = R_ri[:, 1, 2][:, None, None]
    cc = R_ri[:, 2, 2][:, None, None]
    g = (a * (gx[None] - ox[:, None, None]) / fx_r
         + b * (gy[None] - oy[:, None, None]) / fy_r + cc)
    rate = fx_r * bl[:, None, None] * g

    return {
        "ref_src_xy": ref_src_xy,
        "ref_ref_xy": ref_ref_xy,
        "fwd_xy": fwd_xy,
        "g": g,
        "rate": rate,
        "baseline": bl,
        "fx_r": fx_r,
        "fy_r": fy_r,
        "ox": ox,
        "oy": oy,
        "R_ri": R_ri,
        "R_rj": R_rj,
        # the inverse-warp homographies behind the three xy grids above,
        # for the two-pass hat-matrix warp (warp_image_twopass)
        "H_src_inv": H_src_inv,
        "H_ref_inv": H_ref_inv,
        "H_fwd": H_fwd,
    }
