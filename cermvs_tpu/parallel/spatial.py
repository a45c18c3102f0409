"""Row-sharded (spatial, H-axis) inference forward.

The reference dodges the high-resolution memory wall with chunk asserts
(``/root/reference/utils/bilinear_sampler.py:19-22``) and per-frame loops
(``core/raft.py:66-69``) on a single 24 GB GPU.  The TPU-native answer is to
shard the IMAGE ROWS over the mesh: every per-pixel tensor (features, cost
volume, GRU state, lookups) lives 1/n-th per chip, and the couplings between
row blocks are handled explicitly:

  * **encoders** — convolutions exchange halo rows via ``lax.ppermute``
    (zero fill at the global image border == the convs' SAME padding), and
    fnet's instance norm computes its (global) spatial moments with a
    ``pmean`` over the row shards.  A functional mirror of
    ``models/extractor.BasicEncoder`` (same params, same dtype path) runs
    the convs with pre-exchanged halos — bit-identical modulo float
    reduction order of the norm moments.
  * **cost volume** — source features are all-gathered (they are the SMALL
    tensor; the volume is the memory hog and stays sharded), and each shard
    builds volume rows for its block extended by ``GHOST`` rows.  The ref-
    row offset enters through the projection matrix (right-multiplied
    homogeneous y-translation), so ``ops/corr.build_corr_volume_from`` is
    reused unchanged.
  * **GRU iterations** — each shard carries its (net, disp) block extended
    by ``GHOST`` rows; every iteration refreshes the ghost rows from the
    neighboring shards (one ``ppermute`` pair) and runs the unmodified
    update block on the extended block.  Out-of-image ghost rows are zeroed
    at each conv input (``UpdateBlock(row_mask=...)``), reproducing the
    unsharded model's zero padding, so OWNED rows are exact: the per-
    iteration receptive field (delta 2 + GRU 1 + disparity-context 3 = 6
    rows) is strictly inside the refreshed ghost margin.

Exactness: owned rows equal the unsharded forward up to float reduction
order (tests/test_spatial.py, rtol 1e-3 — the same tolerance class as the
view-sharded path).

Rectified (epiband) construction under row sharding — pass a
``RectPlan``: every per-view rect-space tensor is computed on a static-
height BAND of rect rows covering the shard's back-warp support
(``rectify.plan_row_bands`` derives the per-(shard, view) band starts
host-side; the traced band offset composes into the warp homographies as a
row translation).  Rows are independent in rect space (the epiband kernel
is row-local), so per-shard cost is ~band_h/h_r of the full rectified
construction — the fast path stays fast under spatial sharding.

Scope: test-mode forward, B == 1, mean aggregation; exact construction by
default, rectified with ``plan=``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ghost margin (feature-grid rows) >= per-iteration receptive field (6)
GHOST = 8
# rectified-path margin: the slab-origin warp edge-extends where a band row
# back-maps outside the shard's extended block — corrupting up to
# (row tilt + 2) ~ 5 outermost ghost VOLUME rows; 16 keeps >= 6 clean ghost
# rows (the receptive field) between any corruption and the owned rows
GHOST_RECT = 16


# ---------------------------------------------------------------------------
# Halo helpers (inside shard_map, axis name = row axis)
# ---------------------------------------------------------------------------


def _halo(x, up: int, down: int, axis_name: str, row_axis: int):
    """Concat ``up`` rows from the previous shard and ``down`` rows from the
    next around the local block (zeros at the global border — ppermute's
    fill — matching the convolutions' zero padding)."""
    n = jax.lax.axis_size(axis_name)
    parts = []
    if up:
        sl = [slice(None)] * x.ndim
        sl[row_axis] = slice(x.shape[row_axis] - up, None)
        fwd = [(i, i + 1) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[tuple(sl)], axis_name, fwd))
    parts.append(x)
    if down:
        sl = [slice(None)] * x.ndim
        sl[row_axis] = slice(0, down)
        bwd = [(i + 1, i) for i in range(n - 1)]
        parts.append(jax.lax.ppermute(x[tuple(sl)], axis_name, bwd))
    return jnp.concatenate(parts, axis=row_axis)


def _halo_conv(x, kernel, bias, stride: int, pad: int, axis_name: str,
               dtype):
    """SAME conv over row-sharded x (B, Hloc, W, C): rows padded by halo
    exchange (amount set by kernel/stride alignment), columns by zeros.

    Global-exactness conditions (even-aligned blocks): for stride 1, halo
    (pad, pad); for stride 2 with odd kernel k = 2*pad+1, halo (pad, pad-1)
    — derivation in parallel/spatial.py docstring notes."""
    k = kernel.shape[0]
    if stride == 1:
        up, down = pad, pad
    else:  # stride 2, SAME: out row t <- input rows 2t-pad .. 2t-pad+k-1
        up, down = pad, max(k - 1 - pad - 1, 0)
    if k > 1:
        x = _halo(x, up, down, axis_name, 1)
    elif stride == 2:
        pass  # 1x1 stride-2: pure row subsample, no halo
    x = x.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (stride, stride),
        ((0, 0), (pad, pad)) if k > 1 else ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias.astype(dtype)


def _pmean_instance_norm(x, axis_name: str, eps: float = 1e-5):
    """Instance norm with GLOBAL (H, W) moments: pmean over the equal-size
    row shards reproduces models/extractor.instance_norm exactly (modulo
    reduction order)."""
    x32 = x.astype(jnp.float32)
    mean = jax.lax.pmean(x32.mean(axis=(-3, -2), keepdims=True), axis_name)
    var = jax.lax.pmean(
        ((x32 - mean) ** 2).mean(axis=(-3, -2), keepdims=True), axis_name)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Functional mirror of models/extractor.BasicEncoder (same params)
# ---------------------------------------------------------------------------


def _res_block(p, x, stride: int, axis_name: str, norm, dtype):
    """Mirror of extractor.ResidualBlock on a row block (HR blocks only)."""
    y = _halo_conv(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], stride, 1,
                   axis_name, dtype)
    y = jax.nn.relu(norm(y))
    y = _halo_conv(y, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], 1, 1,
                   axis_name, dtype)
    y = jax.nn.relu(norm(y))
    if stride != 1:
        x = _halo_conv(x, p["Conv_2"]["kernel"], p["Conv_2"]["bias"], stride,
                       0, axis_name, dtype)
        x = norm(x)
    return jax.nn.relu(x + y)


def encoder_rows(params, x, axis_name: str, norm_fn: str = "instance",
                 dtype=jnp.bfloat16):
    """BasicEncoder (type="HR") on a row block (B, Hloc, W, 3) -> features
    (B, Hloc/4, W, C).  ``params``: the encoder's param subtree (e.g.
    ``params["fnet"]``).  Requires the global H divisible by 8*n_shards
    (even-aligned rows through both stride-2 convs).

    Mirrors extractor.BasicEncoder layer for layer (same param tree, same
    bf16 compute path); instance norm moments are pmean'd across shards.
    """
    if norm_fn == "instance":
        norm = lambda t: _pmean_instance_norm(t, axis_name)
    elif norm_fn == "none":
        norm = lambda t: t
    else:
        raise ValueError(f"unsupported norm_fn {norm_fn!r}")

    x = _halo_conv(x, params["Conv_0"]["kernel"], params["Conv_0"]["bias"],
                   2, 3, axis_name, dtype)
    x = jax.nn.relu(norm(x))
    x = _res_block(params["ResidualBlock_0"], x, 1, axis_name, norm, dtype)
    x = _res_block(params["ResidualBlock_1"], x, 1, axis_name, norm, dtype)
    x = _res_block(params["ResidualBlock_2"], x, 2, axis_name, norm, dtype)
    x = _res_block(params["ResidualBlock_3"], x, 1, axis_name, norm, dtype)
    x = _halo_conv(x, params["Conv_1"]["kernel"], params["Conv_1"]["bias"],
                   1, 0, axis_name, dtype)
    return x


# ---------------------------------------------------------------------------
# Rectified construction on per-shard rect-row bands
# ---------------------------------------------------------------------------


def _trans3(tx, ty):
    """3x3 translation; tx/ty may be traced scalars."""
    return (jnp.eye(3, dtype=jnp.float32)
            .at[0, 2].set(jnp.asarray(tx, jnp.float32))
            .at[1, 2].set(jnp.asarray(ty, jnp.float32)))


def rect_band_warps(plan, band_h, geo, f_ref_img, f_src_imgs, q0_loc, fdt):
    """Stage-independent per-view rect-row-band feature warps.

    ``geo``: ``rectify.rect_geometry(..., need_grids=False)``; ``f_ref_img``
    (h, w, C) and ``f_src_imgs`` (V, h, w, C) are the /8-scaled feature
    images; ``q0_loc`` (V,) int32 is this shard's band starts
    (``rectify.plan_row_bands``).  The traced band offset composes into each
    inverse-warp homography as an output-side row translation.  Returns
    per-view lists of (band_h, w_r, C) / (band_h, ws_r - col0, C) arrays.
    """
    from cermvs_tpu.ops import rectify as rect_mod

    V = f_src_imgs.shape[0]
    fr_bands, fs_bands = [], []
    for v in range(V):
        _, _, s_max_v = plan.view_params(v)
        col0 = plan.s_max - s_max_v
        q0v = q0_loc[v].astype(jnp.float32)
        if plan.twopass:
            fr_b = rect_mod.warp_image_twopass(
                f_ref_img, geo["H_ref_inv"][v] @ _trans3(0.0, q0v),
                band_h, plan.w_r)
            fs_b = rect_mod.warp_image_twopass(
                f_src_imgs[v],
                geo["H_src_inv"][v] @ _trans3(float(col0), q0v),
                band_h, plan.ws_r - col0)
        else:
            bx, by = rect_mod.homography_grid(
                geo["H_ref_inv"][v] @ _trans3(0.0, q0v), band_h, plan.w_r)
            fr_b = rect_mod.warp_image(f_ref_img, bx, by)
            sx, sy = rect_mod.homography_grid(
                geo["H_src_inv"][v] @ _trans3(float(col0), q0v),
                band_h, plan.ws_r - col0)
            fs_b = rect_mod.warp_image(f_src_imgs[v], sx, sy)
        fr_bands.append(fr_b.astype(fdt))
        fs_bands.append(fs_b.astype(fdt))
    return fr_bands, fs_bands


def rect_banded_volume(plan, band_h, geo, fr_bands, fs_bands, q0_loc, row0,
                       rows_ext, w, origin_ext, n_hyp, incre, zero_slab,
                       fdt, impl="pallas"):
    """(rows_ext, w, D) mean rect volume for one shard's extended block.

    Per view: slab base/sigma on the band rows (the slab-origin warp reads
    the LOCAL extended origin — clamp effects confined to far ghost rows,
    see GHOST_RECT), the epiband kernel on the band, back-warp into the
    local block.  ``origin_ext`` (rows_ext, w); ``row0`` the block's global
    start row (traced); ``impl`` "pallas" or "oracle" (XLA resample, for
    tests).
    """
    from cermvs_tpu.ops import rectify as rect_mod

    org = origin_ext[..., None]                    # (rows_ext, w, 1)
    acc = None
    V = len(fr_bands)
    for v in range(V):
        rate_lo, rate_hi, s_max_v = plan.view_params(v)
        q0v = q0_loc[v]
        q0f = q0v.astype(jnp.float32)
        rate_band = jax.lax.dynamic_slice_in_dim(
            geo["rate"][v], q0v, band_h, axis=0)
        sigma = rate_band * incre                  # (band_h, w_r)
        if zero_slab:
            base = jnp.zeros((band_h, plan.w_r), jnp.float32)
        else:
            px, py = rect_mod.homography_grid(
                geo["H_ref_inv"][v] @ _trans3(0.0, q0f), band_h, plan.w_r)
            origin_band = rect_mod.warp_image(
                org, px, py - row0, mode="clamp")[..., 0]
            base = rate_band * (origin_band - (n_hyp // 2) * incre)
        kc = 1
        if impl == "pallas":
            from cermvs_tpu.ops.corr_rectified import _pick_kc

            kc = _pick_kc(n_hyp, incre, rate_lo, rate_hi, s_max_v, plan,
                          int(fr_bands[v].shape[-1]))
        if impl == "pallas" and kc > 0:
            from cermvs_tpu.ops.pallas.epiband import epiband_resample

            vol_band = epiband_resample(
                fr_bands[v][None], fs_bands[v][None], base[None],
                sigma[None], n_hyp, s_max_v,
                sigma_lo=max(rate_lo * incre, 0.0),
                sigma_hi=rate_hi * incre if rate_hi > 0 else None,
                static_base=zero_slab and kc == 1,
                k_chunks=kc)[0]                    # (band_h, w_r, D)
        else:
            from cermvs_tpu.ops.corr_rectified import _resample_rows_oracle

            vol_band = _resample_rows_oracle(
                fr_bands[v], fs_bands[v], base, sigma, n_hyp, s_max_v)
        if plan.twopass:
            Hb = _trans3(0.0, -q0f) @ geo["H_fwd"][v] @ _trans3(0.0, row0)
            vol_loc = rect_mod.warp_image_twopass(
                vol_band.astype(fdt), Hb, rows_ext, w)
        else:
            wx, wy = rect_mod.homography_grid(
                geo["H_fwd"][v] @ _trans3(0.0, row0), rows_ext, w)
            vol_loc = rect_mod.warp_image(vol_band.astype(fdt), wx, wy - q0f)
        acc = vol_loc if acc is None else acc + vol_loc
    return acc / V


# ---------------------------------------------------------------------------
# Row-sharded forward
# ---------------------------------------------------------------------------


def row_sharded_forward(model, params, images, poses, intrinsics, scale,
                        mesh: Mesh, axis: str = "row", plan=None,
                        rect_impl: str = "pallas", bands=None):
    """Test-mode forward with image rows sharded over ``mesh[axis]``.

    images (1, N, H, W, 3) in [0, 255]; returns (1, h, w) scaled disparity
    identical (up to float reduction order) to ``model.apply``.

    Requires: B == 1, ``model.test_mode``, H divisible by 8 * n_shards.
    With ``plan=None`` uses the exact construction (the volume stays
    row-sharded; source features are all-gathered).  With a host-planned
    ``RectPlan`` (``rectify.plan_rectification``) the volume is built
    through the rectified epiband path on per-shard rect-row BANDS
    (``rectify.plan_row_bands``) — same approximation class as the
    unsharded rectified forward, ~band_h/h_r of its cost per shard.

    max/std view aggregation (``core/update.py:101-109``) is supported on
    the EXACT construction: the view axis is shard-LOCAL under row
    sharding (every shard holds all views for its rows), so per-view
    row-block volumes need no collective — UpdateBlock aggregates them
    in-block exactly as the unsharded model does.  The banded rectified
    path keeps the mean-folded volume (per-view banded volumes would
    multiply the band memory by V for a configuration no shipped gin file
    uses — ROADMAP §13).
    """
    assert model.test_mode, "row-sharded forward is a test-mode path"
    assert model.mean_volume or plan is None, \
        "row-sharded banded rectified construction requires mean aggregation"
    n = int(mesh.shape[axis])
    B, N, H, W, _ = images.shape
    assert B == 1, "row-sharded forward supports batch 1"
    factor = model.stride_factor
    assert factor == 4, "row sharding mirrors the HR encoder"
    assert H % (8 * n) == 0, f"H={H} must divide 8*n_shards={8 * n}"
    h, w = H // factor, W // factor
    hloc = h // n
    ghost = GHOST if plan is None else GHOST_RECT
    # ghost rows come from the IMMEDIATE neighbors only: each shard must own
    # at least ghost feature rows (production shapes are far above this —
    # scale 2 has 576/8 = 72 rows/shard)
    assert hloc >= ghost, f"{hloc} feature rows/shard < ghost margin {ghost}"
    V = N - 1
    p = params["params"] if "params" in params else params

    if plan is not None:
        assert plan.ok, plan.reason
        if bands is not None:
            # precomputed by the caller (jitted drivers: poses are tracers
            # there, so the host band planning must happen outside)
            q0_bands, band_h = bands
            q0_bands = jnp.asarray(q0_bands, jnp.int32)
        else:
            from cermvs_tpu.ops import rectify as rect_mod

            intr_feat = np.asarray(intrinsics, np.float64).copy()
            intr_feat[..., :2, :] /= factor
            # homographies are scale-invariant (rotations + centering only),
            # so unscaled host poses give valid bands for any depth rescale
            q0_np, band_h = rect_mod.plan_row_bands(
                np.asarray(poses, np.float64), intr_feat, h, w, plan, n,
                ghost)
            q0_bands = jnp.asarray(q0_np, jnp.int32)  # (n, V), sharded
    else:
        band_h = 0
        q0_bands = jnp.zeros((n, V), jnp.int32)

    from cermvs_tpu.ops import corr as corr_ops
    from cermvs_tpu.ops.geometry import relative_projection

    def body(p, images_loc, poses, intrinsics, scale, q0_loc):
        # --- raft.__call__ preamble (models/raft.py:108-123) ---
        scale_ = jnp.asarray(scale, jnp.float32).reshape(B, 1, 1)
        poses = poses.at[..., :3, 3].multiply(scale_)
        intr4 = intrinsics.at[:, :, :2].divide(float(factor))
        imgs = images_loc.astype(jnp.float32) * (2.0 / 255.0) - 1.0

        ii = jnp.zeros(V, jnp.int32)
        jj = jnp.arange(1, N, dtype=jnp.int32)

        # --- encoders (halo convs + pmean instance norm) ---
        frames = imgs.reshape(N, imgs.shape[2], W, 3)
        fmaps_loc = encoder_rows(p["fnet"], frames, axis,
                                 norm_fn="instance", dtype=model.dtype)
        fmaps_loc = fmaps_loc.astype(jnp.float32)  # (N, hloc, w, C)
        net_inp = encoder_rows(p["cnet"], frames[:1], axis, norm_fn="none",
                               dtype=model.dtype)
        net0 = jnp.tanh(net_inp[..., : model.dim_net])
        inp = jax.nn.relu(net_inp[..., model.dim_net:])  # (1, hloc, w, dim)

        # --- source features: all-gather rows (the small tensor) ---
        fmaps_full = jax.lax.all_gather(fmaps_loc, axis, axis=1, tiled=True)
        f_src_full = (fmaps_full[None] / 8.0)[:, 1:]  # (1, V, h, w, C)

        # extended ref rows [row0, row0 + hloc + 2*ghost) in global feature
        # coords, row0 = a - ghost; out-of-image rows are zero (padding) and
        # masked at every conv input
        idx = jax.lax.axis_index(axis)
        a = idx * hloc
        ref_pad = jnp.pad(fmaps_full[0] / 8.0,
                          ((ghost, ghost), (0, 0), (0, 0)))
        f_ref_ext = jax.lax.dynamic_slice_in_dim(
            ref_pad, a, hloc + 2 * ghost, axis=0)  # (rows_ext, w, C)
        rows_ext = hloc + 2 * ghost
        gr = jnp.arange(rows_ext)  # local ext row -> global row a - ghost + i
        valid = ((gr + a - ghost >= 0) & (gr + a - ghost < h))
        row_mask = valid.astype(jnp.float32)[None, :, None, None]

        # global-row offset into the projection: [x, y+row0, 1, d] =
        # E(row0) @ [x, y, 1, d] with E = I + row0 * e_y e_1^T
        Pij = relative_projection(poses, intr4, ii, jj)  # (1, V, 4, 4)
        row0 = (a - ghost).astype(jnp.float32)
        E = jnp.eye(4, dtype=Pij.dtype).at[1, 2].add(row0)
        Pij_ext = Pij @ E

        f_ref_ext = jnp.broadcast_to(
            f_ref_ext[None, None], (1, V) + f_ref_ext.shape)

        # ghost-row refresh: pull ghost owned rows from each neighbor
        def refresh(x):
            own = x[:, ghost:-ghost]
            return _halo(own, ghost, ghost, axis, 1)

        # --- rectified band machinery (plan is not None) ---
        if plan is not None:
            from cermvs_tpu.ops import rectify as rect_mod

            fdt = model.dtype
            geo = rect_mod.rect_geometry(poses, intr4, ii, jj, h, w, plan,
                                         need_grids=False)
            # stage-independent per-view band feature warps (hoisted: both
            # cascade stages reuse them — mirrors corr_rectified.rect_features)
            fr_bands, fs_bands = rect_band_warps(
                plan, band_h, geo, (fmaps_full[0] / 8.0).astype(fdt),
                f_src_full[0].astype(fdt), q0_loc[0], fdt)

            def build_volume_rect(origin_ext, n_hyp, incre, zero_slab):
                vol = rect_banded_volume(
                    plan, band_h, geo, fr_bands, fs_bands, q0_loc[0], row0,
                    rows_ext, w, origin_ext[0, 0], n_hyp, incre, zero_slab,
                    fdt, impl=rect_impl)
                return vol[None, None]

        # rebuild the update block with raft.setup's exact hyperparams
        # (models/raft.py:84-88) — submodules are not reachable on an
        # unbound Module, but the param subtree + config define it fully
        from cermvs_tpu.models.update import UpdateBlock

        ub = UpdateBlock(
            cascade=model.cascade, dim_net=model.dim_net,
            dim_inp=model.dim_inp, num_levels=model.num_levels,
            radius=model.radius, aggregation=model.aggregation,
            dtype=model.dtype)

        def apply_update(net, inp_ext, disp, corr_frames, stage, gctx):
            return ub.apply({"params": p["update_block"]}, net, inp_ext,
                            disp, corr_frames, stage, gru_ctx=gctx,
                            row_mask=row_mask)

        def apply_gru_ctx(inp_ext, stage):
            return ub.apply({"params": p["update_block"]}, inp_ext, stage,
                            method=lambda m, i, s: m.gru_ctx(i, s))

        inp_ext = _halo(inp, ghost, ghost, axis, 1)
        disp = jnp.zeros((1, rows_ext, w, 1), jnp.float32)
        net = _halo(net0, ghost, ghost, axis, 1).astype(jnp.float32)

        for stage, (n_hyp, n_div, n_iters) in enumerate(model.cascade):
            n_hyp = model._auto_hyps(n_hyp)
            incre = 0.0025 / n_div

            # the previous stage's final update touched OWNED rows only:
            # refresh the ghosts before they parameterize this stage's slab
            # origin (stale ghosts would corrupt the volume's ghost rows,
            # which feed the owned edge rows through the lookups)
            disp = refresh(disp)
            net = refresh(net)

            origin = corr_ops.slab_origin(
                jax.lax.stop_gradient(disp)[..., 0][:, None], n_hyp, incre,
                shift=(stage == 0))  # (1, 1, rows_ext, w)
            if plan is not None:
                vol = build_volume_rect(origin, n_hyp, incre,
                                        zero_slab=(stage == 0))
            else:
                # per-view row-block volumes when the model's aggregation
                # needs them (max/std): the view axis is shard-local, so
                # UpdateBlock aggregates exactly like the unsharded model
                vol = corr_ops.build_corr_volume_from(
                    f_ref_ext.astype(jnp.float32),
                    f_src_full.astype(jnp.float32), Pij_ext, origin, n_hyp,
                    incre, hyp_chunk=model.hyp_chunk,
                    mean_over_views=model.mean_volume,
                    gather_dtype=model.dtype)
            levels = (corr_ops.build_pyramid(vol, model.num_levels)
                      if model.lookup_impl != "pallas" else [vol])
            pyr = corr_ops.CorrPyramid(levels, origin, incre, n_hyp,
                                       model.num_levels)
            gctx = apply_gru_ctx(inp_ext.astype(model.dtype), stage)
            Vv = int(vol.shape[1])

            for _ in range(n_iters):
                disp = refresh(disp)
                net = refresh(net)
                zinv = jnp.broadcast_to(
                    jax.lax.stop_gradient(disp)[..., 0][:, None],
                    (1, Vv, rows_ext, w))
                corr_frames = corr_ops.lookup(pyr, zinv, model.radius,
                                              impl=model.lookup_impl)
                net, delta = apply_update(
                    net.astype(model.dtype), inp_ext,
                    jax.lax.stop_gradient(disp), corr_frames, stage, gctx)
                net = net.astype(jnp.float32)
                disp = jax.lax.stop_gradient(disp) + delta

        out = disp[:, ghost:-ghost, :, 0] * scale_[:, :, 0]
        return out  # (1, hloc, w)

    shardedf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P(), P(), P(), P(axis)),
        out_specs=P(None, axis),
        check_vma=False)
    out = shardedf(p, images, poses, intrinsics,
                   jnp.asarray(scale, jnp.float32), q0_bands)
    return out


# ---------------------------------------------------------------------------
# 2-D (rows x views) sharded forward
# ---------------------------------------------------------------------------


def grid_sharded_forward(model, params, images, poses, intrinsics, scale,
                         mesh: Mesh, row_axis: str = "row",
                         view_axis: str = "view", plan=None,
                         rect_impl: str = "pallas", bands=None):
    """Test-mode forward on a 2-D mesh: image ROWS over ``row_axis`` AND
    neighbor VIEWS over ``view_axis`` — the composition for scale-2
    many-view scans (per-chip work ~ (V / n_view) x (h / n_row)).

    Structure: each (row, view) shard encodes its row block of its local
    views (halo convs, row-``pmean`` norms), builds the row-block partial
    view-sum volume from its local views only (exact projection-offset
    construction, or the banded rectified construction with a RectPlan —
    scene-wide kernel windows, as in ``parallel/infer.py``), and ONE
    ``psum`` over the view axis per cascade stage yields the row-sharded
    global view-mean volume.  The GRU iterations then run row-sharded with
    ghost-row refresh, replicated across the view axis (zero per-iteration
    view communication — the same linearity argument as view-only
    sharding).  Views pad to a multiple of the view-axis size with zero
    feature weight; padded slots replicate the last real view's pose (a
    zero baseline would poison the rectified geometry with NaNs).

    Requires: B == 1, ``model.test_mode``, mean aggregation, H divisible by
    8 * n_row_shards.
    """
    assert model.test_mode, "grid-sharded forward is a test-mode path"
    assert model.mean_volume, "grid sharding requires mean aggregation"
    m = int(mesh.shape[row_axis])
    nv = int(mesh.shape[view_axis])
    B, N, H, W, _ = images.shape
    assert B == 1, "grid-sharded forward supports batch 1"
    factor = model.stride_factor
    assert factor == 4, "row sharding mirrors the HR encoder"
    assert H % (8 * m) == 0, f"H={H} must divide 8*n_row_shards={8 * m}"
    h, w = H // factor, W // factor
    hloc = h // m
    ghost = GHOST if plan is None else GHOST_RECT
    assert hloc >= ghost, f"{hloc} feature rows/shard < ghost margin {ghost}"
    V = N - 1
    V_pad = -(-V // nv) * nv
    pad = V_pad - V
    V_local = V_pad // nv
    p = params["params"] if "params" in params else params

    from cermvs_tpu.ops import corr as corr_ops
    from cermvs_tpu.ops.geometry import relative_projection

    if plan is not None:
        import dataclasses

        assert plan.ok, plan.reason
        if bands is not None:
            # precomputed by the caller (jitted drivers: poses are tracers)
            q0_v, band_h = bands
            q0_v = jnp.asarray(q0_v, jnp.int32)      # (m, V)
        else:
            from cermvs_tpu.ops import rectify as rect_mod

            intr_feat = np.asarray(intrinsics, np.float64).copy()
            intr_feat[..., :2, :] /= factor
            q0_np, band_h = rect_mod.plan_row_bands(
                np.asarray(poses, np.float64), intr_feat, h, w, plan, m,
                ghost)
            q0_v = jnp.asarray(q0_np, jnp.int32)
        # pad view columns replicating the last real view (as the poses do)
        q0_all = (jnp.concatenate(
            [q0_v, jnp.repeat(q0_v[:, -1:], pad, axis=1)], axis=1)
            if pad else q0_v)                        # (m, V_pad)
        # one traced program serves every shard: per-view static kernel
        # windows cannot differ across shards — scene-wide bounds
        plan = dataclasses.replace(plan, view_rates=(), view_s_max=())
    else:
        band_h = 0
        q0_all = jnp.zeros((m, V_pad), jnp.int32)

    # host-side view padding (weights zero the padded features)
    src_frames = jnp.concatenate(
        [images[0, 1:],
         jnp.zeros((pad, H, W, 3), images.dtype)], axis=0)  # (V_pad, H, W, 3)
    weight = jnp.concatenate(
        [jnp.ones((V,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    src_poses = jnp.concatenate(
        [poses[0, 1:], jnp.broadcast_to(poses[0, N - 1:N], (pad, 4, 4))],
        axis=0)                                       # (V_pad, 4, 4)
    src_K = jnp.concatenate(
        [intrinsics[0, 1:], jnp.broadcast_to(intrinsics[0, N - 1:N],
                                             (pad, 3, 3))], axis=0)

    def body(p, ref_frame, src_frames_l, ref_pose, src_poses_l, ref_K,
             src_K_l, weight_l, scale, q0_l):
        # ref_frame (1, Hloc, W, 3); src_frames_l (V_local, Hloc, W, 3)
        scale_ = jnp.asarray(scale, jnp.float32).reshape(1, 1, 1)
        poses_l = jnp.concatenate([ref_pose, src_poses_l[None]], axis=1)
        poses_l = poses_l.at[..., :3, 3].multiply(scale_)  # (1, 1+VL, 4, 4)
        intr_l = jnp.concatenate([ref_K, src_K_l[None]], axis=1)
        intr4 = intr_l.at[:, :, :2].divide(float(factor))
        ii = jnp.zeros(V_local, jnp.int32)
        jj = jnp.arange(1, V_local + 1, dtype=jnp.int32)

        frames = jnp.concatenate([ref_frame, src_frames_l], axis=0)
        frames = frames.astype(jnp.float32) * (2.0 / 255.0) - 1.0
        fmaps_loc = encoder_rows(p["fnet"], frames, row_axis,
                                 norm_fn="instance", dtype=model.dtype)
        fmaps_loc = fmaps_loc.astype(jnp.float32)    # (1+VL, hloc, w, C)
        # zero padded views' FEATURES (encoding a zero image is not zero)
        wv = jnp.concatenate([jnp.ones((1,), jnp.float32), weight_l])
        fmaps_loc = fmaps_loc * wv[:, None, None, None]
        net_inp = encoder_rows(p["cnet"], frames[:1], row_axis,
                               norm_fn="none", dtype=model.dtype)
        net0 = jnp.tanh(net_inp[..., : model.dim_net])
        inp = jax.nn.relu(net_inp[..., model.dim_net:])

        fmaps_full = jax.lax.all_gather(fmaps_loc, row_axis, axis=1,
                                        tiled=True)  # (1+VL, h, w, C)
        f_src_full = (fmaps_full[None] / 8.0)[:, 1:]

        idx = jax.lax.axis_index(row_axis)
        a = idx * hloc
        ref_pad_f = jnp.pad(fmaps_full[0] / 8.0,
                            ((ghost, ghost), (0, 0), (0, 0)))
        f_ref_ext = jax.lax.dynamic_slice_in_dim(
            ref_pad_f, a, hloc + 2 * ghost, axis=0)
        rows_ext = hloc + 2 * ghost
        gr = jnp.arange(rows_ext)
        valid = ((gr + a - ghost >= 0) & (gr + a - ghost < h))
        row_mask = valid.astype(jnp.float32)[None, :, None, None]

        Pij = relative_projection(poses_l, intr4, ii, jj)  # (1, VL, 4, 4)
        row0 = (a - ghost).astype(jnp.float32)
        E = jnp.eye(4, dtype=Pij.dtype).at[1, 2].add(row0)
        Pij_ext = Pij @ E
        f_ref_ext = jnp.broadcast_to(
            f_ref_ext[None, None], (1, V_local) + f_ref_ext.shape)
        w_sum = jax.lax.psum(jnp.sum(weight_l), view_axis)

        def refresh(x):
            own = x[:, ghost:-ghost]
            return _halo(own, ghost, ghost, row_axis, 1)

        if plan is not None:
            from cermvs_tpu.ops import rectify as rect_mod

            fdt = model.dtype
            geo = rect_mod.rect_geometry(poses_l, intr4, ii, jj, h, w, plan,
                                         need_grids=False)
            fr_bands, fs_bands = rect_band_warps(
                plan, band_h, geo, (fmaps_full[0] / 8.0).astype(fdt),
                f_src_full[0].astype(fdt), q0_l[0], fdt)

        def build_volume(origin_ext, n_hyp, incre, zero_slab):
            """Row-block global view-mean volume: local partial sum + one
            psum over the view axis."""
            if plan is not None:
                vol_l = rect_banded_volume(
                    plan, band_h, geo, fr_bands, fs_bands, q0_l[0], row0,
                    rows_ext, w, origin_ext[0, 0], n_hyp, incre, zero_slab,
                    model.dtype, impl=rect_impl)[None, None] * V_local
            else:
                vol_l = corr_ops.build_corr_volume_from(
                    f_ref_ext.astype(jnp.float32),
                    f_src_full.astype(jnp.float32), Pij_ext, origin_ext,
                    n_hyp, incre, hyp_chunk=model.hyp_chunk,
                    mean_over_views=True,
                    gather_dtype=model.dtype) * V_local
            return jax.lax.psum(vol_l, view_axis) / w_sum

        from cermvs_tpu.models.update import UpdateBlock

        ub = UpdateBlock(
            cascade=model.cascade, dim_net=model.dim_net,
            dim_inp=model.dim_inp, num_levels=model.num_levels,
            radius=model.radius, aggregation=model.aggregation,
            dtype=model.dtype)

        inp_ext = _halo(inp, ghost, ghost, row_axis, 1)
        disp = jnp.zeros((1, rows_ext, w, 1), jnp.float32)
        net = _halo(net0, ghost, ghost, row_axis, 1).astype(jnp.float32)

        for stage, (n_hyp, n_div, n_iters) in enumerate(model.cascade):
            n_hyp = model._auto_hyps(n_hyp)
            incre = 0.0025 / n_div
            disp = refresh(disp)
            net = refresh(net)
            origin = corr_ops.slab_origin(
                jax.lax.stop_gradient(disp)[..., 0][:, None], n_hyp, incre,
                shift=(stage == 0))
            vol = build_volume(origin, n_hyp, incre, zero_slab=(stage == 0))
            levels = (corr_ops.build_pyramid(vol, model.num_levels)
                      if model.lookup_impl != "pallas" else [vol])
            pyr = corr_ops.CorrPyramid(levels, origin, incre, n_hyp,
                                       model.num_levels)
            gctx = ub.apply({"params": p["update_block"]},
                            inp_ext.astype(model.dtype), stage,
                            method=lambda mm, i, s: mm.gru_ctx(i, s))
            for _ in range(n_iters):
                disp = refresh(disp)
                net = refresh(net)
                zinv = jax.lax.stop_gradient(disp)[..., 0][:, None]
                corr_frames = corr_ops.lookup(pyr, zinv, model.radius,
                                              impl=model.lookup_impl)
                net, delta = ub.apply(
                    {"params": p["update_block"]}, net.astype(model.dtype),
                    inp_ext, jax.lax.stop_gradient(disp), corr_frames,
                    stage, gru_ctx=gctx, row_mask=row_mask)
                net = net.astype(jnp.float32)
                disp = jax.lax.stop_gradient(disp) + delta

        out = disp[:, ghost:-ghost, :, 0] * scale_[:, :, 0]
        return out  # (1, hloc, w)

    shardedf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, row_axis), P(view_axis, row_axis), P(),
                  P(view_axis), P(), P(view_axis), P(view_axis), P(),
                  P(row_axis, view_axis)),
        out_specs=P(None, row_axis),
        check_vma=False)
    out = shardedf(p, images[:, 0], src_frames, poses[:, :1], src_poses,
                   intrinsics[:, :1], src_K, weight,
                   jnp.asarray(scale, jnp.float32), q0_all)
    return out
