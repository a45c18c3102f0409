"""Rectified epipolar cost-volume construction (inference fast path).

Replaces the exact gather-based builder (``ops/corr.py``,
semantics from ``core/corr.py:46-99`` + ``alt_cuda_corr``) with the
rectification formulation of ``ops/rectify.py``: after warping each
(ref, src) pair into a common rotated frame, every hypothesis sample lies on
the SAME rect row at position ``x_q - rate(q) * lambda``, so per (view, row)
construction is one MXU matmul ``G = F_ref_row @ F_src_row^T`` plus a
1-D resample of ``G`` rows — no data-dependent HBM gathers.

Numerics: the three bilinear resamples (feature warps + volume back-warp)
make this an APPROXIMATION of the exact volume (boundary handling and
sub-pixel interpolation differ at the fraction-of-a-feature level); it is an
opt-in inference path selected per scene by the host planner
(``rectify.plan_rectification``), with the exact path as fallback and as the
training path.  ``tests/test_rectified.py`` pins: exact equality under pure
lateral motion (warps degenerate to integer shifts), the sample-position
identity for general poses, and end-to-end model agreement tolerances.

Implementations of the row-resample step:
  * ``impl="oracle"`` — XLA: full ``G`` materialized per view, sampled with
    ``interp1d`` (gathers; for tests and as a reference).
  * ``impl="pallas"`` — fused kernel (``ops/pallas/epiband.py``): ``G`` never
    leaves VMEM; banded VPU select.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cermvs_tpu.ops import rectify
from cermvs_tpu.ops.rectify import RectPlan
from cermvs_tpu.ops.sampling import interp1d


def _resample_rows_oracle(fr_rect, fs_rect, base, sigma, n_hyp, s_max):
    """Per-view rect volume via materialized G + gather interp (reference).

    fr_rect: (h_r, w_r, C); fs_rect: (h_r, ws_r, C) -> (h_r, w_r, D).
    """
    G = jnp.einsum("hxc,hsc->hxs", fr_rect, fs_rect,
                   preferred_element_type=jnp.float32)
    w_r = fr_rect.shape[1]
    x = jax.lax.broadcasted_iota(jnp.float32, (base.shape[0], w_r), 1)
    k = jnp.arange(n_hyp, dtype=jnp.float32)
    # src array column of hypothesis k at rect pixel (y, x)
    idx = (x + float(s_max))[..., None] - (
        base[..., None] + sigma[..., None] * k)
    return interp1d(G, idx)


MAX_K_CHUNKS = 8


def _pick_kc(n_hyp, incre, lo, hi, s, plan, n_channels, cap=None,
             max_k=None):
    """Hypothesis-chunk count for one view/group's epiband kernel: 1 =
    unchunked fast path, >1 = the chunked kernel
    (``epiband._epiband_kernel_chunked``), 0 = unaffordable even chunked
    (route to exact gathers)."""
    from cermvs_tpu.ops.pallas.epiband import pick_k_chunks

    if max_k is None:
        max_k = MAX_K_CHUNKS  # resolved at call time (tests monkeypatch)
    ws = plan.w_r + s + plan.s_neg
    return pick_k_chunks(n_hyp, max(lo * incre, 0.0),
                         hi * incre if hi > 0 else 0.0, ws, n_channels,
                         cap=cap, max_k=max_k, s_max=s)


def _vmem_stages(n_hyp, incre, stages):
    """Normalize VMEM-gate inputs to a list of (n_hyp, incre) cascade
    stages.  Gating on EVERY stage matters: the default cascade's stage-0
    windows dominate, but small-D first stages (e.g. ((8,64,2),(-1,320,2)))
    invert the ordering — stage-1's ``D^2*incre`` expansion is then ~6x
    stage-0's (round-4 advisor finding)."""
    if stages is not None:
        return [(int(d), float(i)) for d, i in stages]
    if n_hyp is not None and incre is not None:
        return [(int(n_hyp), float(incre))]
    return None


def group_views(plan: RectPlan, n_views: int, max_groups: int = 4,
                n_hyp=None, incre=None, n_channels: int = 64, cap=None,
                stages=None, max_k_chunks=None):
    """Partition the views into few static-window groups.

    The unrolled builder emits one warp+kernel instance per view; at many
    views (TNT nf25, ``/root/reference/demo.py:49``) the HLO program grows
    past compile-service request limits and compile time balloons.  Views
    in one group share a single compiled instance driven by ``lax.scan``
    (:func:`build_corr_volume_rectified` with ``view_scan``), using the
    UNION of the group's snapped windows — a sound over-approximation, the
    same rule :func:`cermvs_tpu.ops.rectify.plan_union` applies across
    batches.  Groups merge in ascending-``s_max`` order, minimizing the
    extra band sweep (the dominant widening cost: kernel work per row is
    ~``w_r + s_max``).

    With ``n_hyp``/``incre`` (or ``stages``, a list of per-cascade-stage
    ``(n_hyp, incre)`` pairs) given, merges are additionally gated by the
    epiband kernel's VMEM budget
    (:func:`cermvs_tpu.ops.pallas.epiband.kernel_vmem_bytes`): merging
    views widens the static rate window, and the kernel's per-hypothesis
    slice expansion grows ~``D^2 * Delta-sigma / 2`` — a 4.6x-span TNT
    group crashed the Mosaic compile at ~11 MB.  The gate takes the MAX
    over all cascade stages' estimates.  ``max_groups`` is then a
    target, not a guarantee: when no legal merge remains the list stays
    longer (still O(groups) program size vs O(V)).

    Returns a list of ``(rate_lo, rate_hi, s_max, view_indices)``.
    """
    vstages = _vmem_stages(n_hyp, incre, stages)
    budget_gated = vstages is not None

    def affordable(lo, hi, s):
        # a merge is legal when EVERY stage's kernel fits the budget at
        # SOME chunk count (the chunked kernel bounds VMEM as (D/n_k)^2,
        # so this nearly always holds; max_k_chunks=1 reproduces the
        # round-4 unchunked gate)
        return all(_pick_kc(d, i, lo, hi, s, plan, n_channels, cap=cap,
                            max_k=max_k_chunks) != 0
                   for d, i in vstages)

    params = [plan.view_params(v) for v in range(n_views)]
    order = sorted(range(n_views), key=lambda v: (params[v][2], params[v][1],
                                                  params[v][0], v))
    groups = []  # [[(lo, hi, s), [views]], ...] ascending s
    for v in order:
        key = params[v]
        if groups and groups[-1][0] == key:
            groups[-1][1].append(v)
        else:
            groups.append([key, [v]])
    while len(groups) > max_groups:
        costs = []
        for i in range(len(groups) - 1):
            (l1, h1, s1), v1 = groups[i]
            (l2, h2, s2), v2 = groups[i + 1]
            ml, mh, ms = min(l1, l2), max(h1, h2), max(s1, s2)
            if budget_gated and not affordable(ml, mh, ms):
                continue
            costs.append((len(v1) * (ms - s1) + len(v2) * (ms - s2), i))
        if not costs:
            break  # no merge fits the kernel budget
        _, i = min(costs)
        (l1, h1, s1), v1 = groups[i]
        (l2, h2, s2), v2 = groups[i + 1]
        groups[i: i + 2] = [[(min(l1, l2), max(h1, h2), max(s1, s2)),
                             v1 + v2]]
    return [(lo, hi, s, tuple(vs)) for (lo, hi, s), vs in groups]


def affordable_rect_views(plan: RectPlan, n_views: int, n_hyp=None,
                          incre=None, n_channels: int = 64, cap=None,
                          stages=None, max_k_chunks=None):
    """Neighbor positions whose PER-VIEW epiband kernel fits the VMEM cap
    at EVERY cascade stage (``stages``: list of (n_hyp, incre)), at SOME
    hypothesis-chunk count up to ``max_k_chunks``.

    Far TNT views reach sigma ~17 px/hypothesis, where the UNCHUNKED
    window expansion (17-36 MB) exceeds what the Mosaic compiler accepts;
    with the chunked kernel (round-5) the per-chunk windows scale as
    ``(D/n_k)^2`` and every production view fits — ``max_k_chunks=1``
    reproduces the round-4 behavior (unaffordable views route to the MIXED
    construction's exact gathers, which remains the fallback for ``0``
    picks and geometric rejections).
    """
    vstages = _vmem_stages(n_hyp, incre, stages)
    ok = []
    for v in range(n_views):
        lo, hi, s = plan.view_params(v)
        if all(_pick_kc(d, i, lo, hi, s, plan, n_channels, cap=cap,
                        max_k=max_k_chunks) != 0 for d, i in vstages):
            ok.append(v)
    return tuple(ok)


def _take_static(a, idx):
    """Static reindex WITHOUT a gather: ``jnp.take`` feeding a ``lax.scan``
    unstacking miscompiles on the tunneled TPU backend (round-4 debugging:
    the first scanned element read corrupted values, 0.18 max abs on
    bf16 features; static slices + stack are bit-clean).  ``idx`` is a
    concrete tuple, so slicing costs nothing extra."""
    idx = list(idx)
    if idx == list(range(idx[0], idx[0] + len(idx))):
        return a[idx[0]: idx[0] + len(idx)]
    return jnp.stack([a[i] for i in idx], axis=0)


def rect_features_grouped(fmaps, poses, intrinsics, ii, jj, plan,
                          feature_dtype, groups):
    """Grouped variant of :func:`rect_features`: per group, the (ref, src)
    feature warps run under ``lax.map`` over the group's views — one traced
    warp instance per group instead of per view.  Returns
    ``(geo, [(fr_stack, fs_stack), ...])`` with stacks leading in the
    group's view order."""
    B, N, h, w, C = fmaps.shape
    geo = rectify.rect_geometry(poses, intrinsics, ii, jj, h, w, plan,
                                need_grids=not plan.twopass)

    f = fmaps.astype(jnp.float32) / 8.0  # core/corr.py:30-31 scaling
    f_ref = f[0, 0].astype(feature_dtype)
    f_src = jnp.take(f[0], jj, axis=0).astype(feature_dtype)  # (V, h, w, C)

    warped = []
    for lo, hi, s_g, idx in groups:
        col0 = plan.s_max - s_g  # src band: columns [col0, ws_r)
        fs_in = _take_static(f_src, idx)
        if plan.twopass:
            shift = jnp.asarray(
                [[1.0, 0.0, float(col0)], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                jnp.float32)
            H_ref = _take_static(geo["H_ref_inv"], idx)
            H_src = _take_static(geo["H_src_inv"], idx) @ shift

            def body(args, _col0=col0):
                fsv, Hr, Hs = args
                fr = rectify.warp_image_twopass(
                    f_ref, Hr, plan.h_r, plan.w_r).astype(feature_dtype)
                fs = rectify.warp_image_twopass(
                    fsv, Hs, plan.h_r,
                    plan.ws_r - _col0).astype(feature_dtype)
                return fr, fs

            fr_g, fs_g = jax.lax.map(body, (fs_in, H_ref, H_src))
        else:
            rrx, rry = geo["ref_ref_xy"]
            rsx, rsy = geo["ref_src_xy"]

            def body(args):
                fsv, rx, ry, sx, sy = args
                fr = rectify.warp_image(f_ref, rx, ry).astype(feature_dtype)
                fs = rectify.warp_image(fsv, sx, sy).astype(feature_dtype)
                return fr, fs

            fr_g, fs_g = jax.lax.map(
                body, (fs_in, _take_static(rrx, idx),
                       _take_static(rry, idx),
                       _take_static(rsx, idx)[:, :, col0:],
                       _take_static(rsy, idx)[:, :, col0:]))
        warped.append((fr_g, fs_g))
    return geo, warped


def rect_features(fmaps, poses, intrinsics, ii, jj, plan, feature_dtype):
    """Pose-dependent, stage-INDEPENDENT rectification work: the rect
    geometry and the per-view warped (ref, src) feature rows.

    Both cascade stages warp the SAME features through the SAME geometry
    (only base/sigma/D differ), so callers building several volumes from one
    feature set should compute this once and pass it via ``rect_ctx``
    (``make_rectified_volume_fn`` does so automatically).  XLA's CSE only
    recovers part of this duplication (benchmarks/profile_rect_cse.py:
    330 + 419 -> 653 ms for the two DTU stages in one jit).
    """
    B, N, h, w, C = fmaps.shape
    V = int(jj.shape[0])
    geo = rectify.rect_geometry(poses, intrinsics, ii, jj, h, w, plan,
                                need_grids=not plan.twopass)

    f = fmaps.astype(jnp.float32) / 8.0  # core/corr.py:30-31 scaling
    f_ref = f[0, 0].astype(feature_dtype)
    f_src = jnp.take(f[0], jj, axis=0).astype(feature_dtype)  # (V, h, w, C)

    rrx, rry = geo["ref_ref_xy"]
    rsx, rsy = geo["ref_src_xy"] if geo["ref_src_xy"] is not None else (None,
                                                                        None)
    warped = []
    for v in range(V):
        _, _, s_max_v = plan.view_params(v)
        col0 = plan.s_max - s_max_v  # src band: columns [col0, ws_r)
        if plan.twopass:
            # MXU hat-matrix warps (rectify.warp_image_twopass): the gather-
            # free formulation, eligible per the host planner's gate.  The
            # src band offset composes as an output-side translation.
            shift = jnp.asarray(
                [[1.0, 0.0, float(col0)], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                jnp.float32)
            fr_rect = rectify.warp_image_twopass(
                f_ref, geo["H_ref_inv"][v], plan.h_r,
                plan.w_r).astype(feature_dtype)
            fs_rect = rectify.warp_image_twopass(
                f_src[v], geo["H_src_inv"][v] @ shift, plan.h_r,
                plan.ws_r - col0).astype(feature_dtype)
        else:
            fr_rect = rectify.warp_image(
                f_ref, rrx[v], rry[v]).astype(feature_dtype)
            fs_rect = rectify.warp_image(
                f_src[v], rsx[v, :, col0:], rsy[v, :, col0:]).astype(
                    feature_dtype)
        warped.append((fr_rect, fs_rect))
    return geo, warped


def _build_grouped(rect_ctx, groups, origin, n_hyp, incre, plan, h, w, V,
                   mean_over_views, feature_dtype, impl, zero_slab):
    """View-scanned construction: per window group, ONE traced
    epiband+back-warp instance driven by ``lax.scan`` over the group's
    views.  Program size is O(#groups) instead of O(V) — the 25-view TNT
    programs that unrolled past the compile-service request cap now emit
    <= ``max_groups`` instances (round-3 VERDICT #2).  The mean accumulates
    in the scan carry, so peak memory matches the unrolled builder's."""
    geo, warped = rect_ctx
    org = origin[0, 0][..., None]  # (h, w, 1)
    rrx, rry = geo["ref_ref_xy"]
    fw = geo["fwd_xy"] if geo["fwd_xy"] is not None else None

    acc = jnp.zeros((h, w, n_hyp), jnp.float32)
    parts = [None] * V
    for (lo, hi, s_g, idx), (fr_g, fs_g) in zip(groups, warped):
        xs = {"fr": fr_g, "fs": fs_g,
              "rate": _take_static(geo["rate"], idx)}
        if not zero_slab:
            xs["rx"] = _take_static(rrx, idx)
            xs["ry"] = _take_static(rry, idx)
        if plan.twopass:
            xs["H_fwd"] = _take_static(geo["H_fwd"], idx)
        else:
            xs["fx"] = _take_static(fw[0], idx)
            xs["fy"] = _take_static(fw[1], idx)

        C_g = int(fr_g.shape[-1])
        kc_g = (_pick_kc(n_hyp, incre, lo, hi, s_g, plan, C_g)
                if impl == "pallas" else 1)

        def body(carry, x, _lo=lo, _hi=hi, _s=s_g, _kc=kc_g):
            if zero_slab:
                base = jnp.zeros((plan.h_r, plan.w_r), jnp.float32)
            else:
                origin_rect = rectify.warp_image(
                    org, x["rx"], x["ry"], mode="clamp")[..., 0]
                base = x["rate"] * (origin_rect - (n_hyp // 2) * incre)
            sigma = x["rate"] * incre
            if impl == "pallas" and _kc > 0:
                from cermvs_tpu.ops.pallas.epiband import epiband_resample

                vol_rect = epiband_resample(
                    x["fr"][None], x["fs"][None], base[None], sigma[None],
                    n_hyp, _s,
                    sigma_lo=max(_lo * incre, 0.0),
                    sigma_hi=_hi * incre if _hi > 0 else None,
                    static_base=zero_slab and _kc == 1,
                    k_chunks=_kc)[0]
            else:
                vol_rect = _resample_rows_oracle(
                    x["fr"], x["fs"], base, sigma, n_hyp, _s)
            if plan.twopass:
                out = rectify.warp_image_twopass(
                    vol_rect.astype(feature_dtype), x["H_fwd"], h, w)
            else:
                out = rectify.warp_image(
                    vol_rect.astype(feature_dtype), x["fx"], x["fy"])
            if mean_over_views:
                return carry + out, None
            return carry, out

        if mean_over_views:
            acc, _ = jax.lax.scan(body, acc, xs)
        else:
            _, outs = jax.lax.scan(body, acc, xs)
            for k, v in enumerate(idx):
                parts[v] = outs[k]
    if mean_over_views:
        return (acc / V)[None, None]
    return jnp.stack(parts)[None]


def build_corr_volume_rectified(
    fmaps: jnp.ndarray,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    origin: jnp.ndarray,
    n_hyp: int,
    incre: float,
    plan: RectPlan,
    mean_over_views: bool = False,
    gather_dtype=None,
    impl: str = "pallas",
    zero_slab: bool = False,
    rect_ctx=None,
    view_scan: bool = False,
    groups=None,
) -> jnp.ndarray:
    """Drop-in construction (signature parity with ``corr.build_corr_volume``
    modulo the static ``plan``/``impl``): returns (1, 1, h, w, D) when
    ``mean_over_views`` else (1, V, h, w, D), fp32.

    The view loop is unrolled: each view's kernel uses ITS OWN static
    disparity-rate window and src band (``RectPlan.view_rates/view_s_max``) —
    scene-wide windows measured 2.3-2.7x slower with DTU-rig baseline spread
    (benchmarks/profile_epiband2.py).  Views with identical snapped params
    share one compiled kernel.  Per-view intermediates die into the mean
    accumulator, so peak memory stays near the scanned version's.
    """
    B, N, h, w, C = fmaps.shape
    V = int(jj.shape[0])
    feature_dtype = gather_dtype or fmaps.dtype
    assert B == 1, "rectified construction supports batch size 1"
    if view_scan:
        if groups is None:
            groups = group_views(plan, V, n_hyp=n_hyp, incre=incre,
                                 n_channels=C)
        if rect_ctx is None:
            rect_ctx = rect_features_grouped(
                fmaps, poses, intrinsics, ii, jj, plan, feature_dtype,
                groups)
        return _build_grouped(
            rect_ctx, groups, origin, n_hyp, incre, plan, h, w, V,
            mean_over_views, feature_dtype, impl, zero_slab)
    if rect_ctx is None:
        rect_ctx = rect_features(
            fmaps, poses, intrinsics, ii, jj, plan, feature_dtype)
    geo, warped = rect_ctx
    org = origin[0, 0][..., None]  # (h, w, 1)

    rrx, rry = geo["ref_ref_xy"]
    fwx, fwy = geo["fwd_xy"] if geo["fwd_xy"] is not None else (None, None)

    def one_view(v):
        rate_lo, rate_hi, s_max_v = plan.view_params(v)
        fr_rect, fs_rect = warped[v]
        if zero_slab:
            # stage 0: origin == (D//2)*incre everywhere -> base == 0; skip
            # the origin warp and use the static diagonal-band kernel
            base = jnp.zeros((plan.h_r, plan.w_r), jnp.float32)
        else:
            origin_rect = rectify.warp_image(
                org, rrx[v], rry[v], mode="clamp")[..., 0]
            base = geo["rate"][v] * (origin_rect - (n_hyp // 2) * incre)
        sigma = geo["rate"][v] * incre
        kc = (_pick_kc(n_hyp, incre, rate_lo, rate_hi, s_max_v, plan, C)
              if impl == "pallas" else 1)
        if impl == "pallas" and kc > 0:
            from cermvs_tpu.ops.pallas.epiband import epiband_resample

            sigma_hi = rate_hi * incre if rate_hi > 0 else None
            vol_rect = epiband_resample(
                fr_rect[None], fs_rect[None], base[None], sigma[None],
                n_hyp, s_max_v,
                sigma_lo=max(rate_lo * incre, 0.0),
                sigma_hi=sigma_hi, static_base=zero_slab and kc == 1,
                k_chunks=kc)[0]
        else:
            # kc == 0: even maximal hypothesis chunking exceeds the kernel
            # VMEM budget (upstream gates normally route such views to the
            # exact gathers; this in-graph fallback keeps the builder safe)
            vol_rect = _resample_rows_oracle(
                fr_rect, fs_rect, base, sigma, n_hyp, s_max_v)
        # back-warp in the volume's feature dtype: bf16 halves the HBM
        # traffic (quad) / MXU passes (twopass).  Accuracy class: quad keeps
        # lerp weights fp32 and rounds taps; twopass rounds the hat weights
        # too (~2^-9 position quantization) but chains exact fp32-accumulated
        # matmuls — measured same order (2.4e-3 vs 3.7e-3 rel err on a
        # smooth rotation warp)
        if plan.twopass:
            return rectify.warp_image_twopass(
                vol_rect.astype(feature_dtype), geo["H_fwd"][v], h, w)
        return rectify.warp_image(
            vol_rect.astype(feature_dtype), fwx[v], fwy[v])  # (h, w, D) fp32

    if mean_over_views:
        vol = one_view(0)
        for v in range(1, V):
            vol = vol + one_view(v)
        return (vol / V)[None, None]
    return jnp.stack([one_view(v) for v in range(V)])[None]


def build_corr_volume_rectified_batched(
    fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre, plan,
    mean_over_views=False, gather_dtype=None, impl="pallas",
    zero_slab=False, rect_ctxs=None, view_scan=False, groups=None,
):
    """Batch-B wrapper over the B==1 builder (training batches).

    ``plan`` must COVER every sample (:func:`cermvs_tpu.ops.rectify.plan_union`
    of the per-sample plans); per-sample rect geometry stays dynamic, so one
    compiled graph serves every batch bucketing to the same union plan.
    ``rect_ctxs``: optional list of per-sample shared contexts.
    """
    B = fmaps.shape[0]
    vols = []
    for b in range(B):
        vols.append(build_corr_volume_rectified(
            fmaps[b:b + 1], poses[b:b + 1], intrinsics[b:b + 1], ii, jj,
            origin[b:b + 1], n_hyp, incre, plan,
            mean_over_views=mean_over_views, gather_dtype=gather_dtype,
            impl=impl, zero_slab=zero_slab,
            rect_ctx=rect_ctxs[b] if rect_ctxs else None,
            view_scan=view_scan, groups=groups))
    return jnp.concatenate(vols, axis=0)


# "auto" view_scan threshold: below this many views the unrolled builder
# compiles fine and lets XLA schedule views independently; at/above it the
# grouped scan bounds program size (each unrolled view adds ~5 warp/kernel
# instances per stage; nf15 compiled, nf25 exceeded the compile-request cap)
VIEW_SCAN_AUTO_MIN = 12


def make_rectified_volume_fn(plan: RectPlan, impl: str = "pallas",
                             view_scan="auto", max_view_groups: int = 4,
                             stages=None):
    """Closure matching ``corr.build_corr_volume``'s signature, for
    ``RAFT(volume_fn=...)`` / ``build_corr_pyramid(volume_fn=...)``.

    ``plan`` carries the static grid sizes (host-side, per scene); all pose-
    dependent values stay traced, so one compiled graph serves every scene
    bucketing to the same plan.

    ``view_scan``: True/False forces the grouped ``lax.scan`` construction
    (:func:`group_views` windows, program size O(groups)); "auto" (default)
    enables it from ``VIEW_SCAN_AUTO_MIN`` views — many-view programs (TNT
    nf25) otherwise unroll past compile-service request limits.

    The closure shares the warped-feature context across cascade stages
    with a one-entry cache keyed by the IDENTITY of the input arrays:
    within one trace the model passes the same ``fmaps``/``poses`` objects
    to every stage, so the second stage reuses the first's traced warp
    subgraph (strong refs keep the keyed objects alive, so ids cannot be
    recycled; a new trace passes fresh tracers and misses).

    Batches (B > 1, training): the plan must be a
    :func:`cermvs_tpu.ops.rectify.plan_union` over the samples; the builder
    loops samples with the shared per-sample contexts.
    """
    cache = {"key": None, "refs": None, "ctxs": None, "groups": None}

    def volume_fn(fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre,
                  hyp_chunk=16, mean_over_views=False, gather_dtype=None,
                  zero_slab=False):
        del hyp_chunk  # memory is governed by the kernel's own tiling
        feature_dtype = gather_dtype or fmaps.dtype
        B = fmaps.shape[0]
        V = int(jj.shape[0])
        scan = (view_scan if isinstance(view_scan, bool)
                else V >= VIEW_SCAN_AUTO_MIN)
        key = (id(fmaps), id(poses), id(intrinsics), id(ii), id(jj),
               jnp.dtype(feature_dtype).name, scan)
        if cache["key"] != key:
            # groups are computed ONCE per trace (all stages share one
            # warped-feature ctx and one grouping).  The VMEM gate covers
            # EVERY cascade stage when the caller passes ``stages``;
            # otherwise it falls back to the first-called stage's
            # (n_hyp, incre) — sound for the default cascade (stage 0's
            # windows dominate) but not for small-D first stages.
            groups = (group_views(plan, V, max_view_groups, n_hyp=n_hyp,
                                  incre=incre,
                                  n_channels=int(fmaps.shape[-1]),
                                  stages=stages)
                      if scan else None)
            mk = (rect_features_grouped if scan else rect_features)
            extra = (groups,) if scan else ()
            cache["ctxs"] = [
                mk(fmaps[b:b + 1], poses[b:b + 1], intrinsics[b:b + 1],
                   ii, jj, plan, feature_dtype, *extra)
                for b in range(B)]
            cache["refs"] = (fmaps, poses, intrinsics, ii, jj)
            cache["groups"] = groups
            cache["key"] = key
        groups = cache["groups"]
        if B == 1:
            return build_corr_volume_rectified(
                fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre, plan,
                mean_over_views=mean_over_views, gather_dtype=gather_dtype,
                impl=impl, zero_slab=zero_slab, rect_ctx=cache["ctxs"][0],
                view_scan=scan, groups=groups)
        return build_corr_volume_rectified_batched(
            fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre, plan,
            mean_over_views=mean_over_views, gather_dtype=gather_dtype,
            impl=impl, zero_slab=zero_slab, rect_ctxs=cache["ctxs"],
            view_scan=scan, groups=groups)

    return volume_fn


def make_mixed_volume_fn(plan: RectPlan, rect_views, impl: str = "pallas",
                         view_scan="auto", stages=None):
    """Mixed construction: rectified (epiband) volume slices for the views
    in ``rect_views``, exact gather slices for the rest, combined in the
    caller's aggregation layout.

    The full planner rejects a scene when ANY pair fails its geometric
    gates; forward-motion sequences typically still have several lateral
    neighbors.  ``plan``/``rect_views`` come from
    :func:`cermvs_tpu.ops.rectify.plan_rectification_partial` — the plan's
    per-view entries follow rect_views order.  Failing views run through
    ``corr.build_corr_volume`` (the bitwise-faithful path) so only the
    non-rectifiable slices pay the gather cost.
    """
    import numpy as np

    rect_views = tuple(rect_views)
    rect_fn = make_rectified_volume_fn(plan, impl, view_scan=view_scan,
                                       stages=stages)

    def volume_fn(fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre,
                  hyp_chunk=16, mean_over_views=False, gather_dtype=None,
                  zero_slab=False):
        from cermvs_tpu.ops.corr import build_corr_volume

        V = int(jj.shape[0])
        rv = np.asarray(rect_views, np.int64)
        ev = np.asarray([v for v in range(V) if v not in rect_views],
                        np.int64)
        assert len(ev), "all views rectifiable: use make_rectified_volume_fn"
        vol_r = rect_fn(fmaps, poses, intrinsics, ii[: len(rv)], jj[rv],
                        origin, n_hyp, incre, hyp_chunk=hyp_chunk,
                        mean_over_views=mean_over_views,
                        gather_dtype=gather_dtype, zero_slab=zero_slab)
        vol_e = build_corr_volume(fmaps, poses, intrinsics, ii[: len(ev)],
                                  jj[ev], origin, n_hyp, incre,
                                  hyp_chunk=hyp_chunk,
                                  mean_over_views=mean_over_views,
                                  gather_dtype=gather_dtype)
        if mean_over_views:
            return (vol_r * len(rv) + vol_e * len(ev)) / V
        # per-view volumes: restore the original jj order
        parts = [None] * V
        for k, v in enumerate(rect_views):
            parts[v] = vol_r[:, k]
        for k, v in enumerate(ev):
            parts[v] = vol_e[:, k]
        return jnp.stack(parts, axis=1)

    return volume_fn
