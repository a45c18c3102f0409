"""View-sharded inference: neighbor views partitioned across the mesh.

The reference scales inference only by SLURM job fan-out
(``/root/reference/scripts/submit_depthmap.py``); per-view cost volumes for up
to 25 neighbors live on ONE GPU (the >=24 GB requirement).  Here the view axis
is sharded over the mesh's ``view`` axis with ``shard_map``:

  * each device encodes its local neighbor frames and builds a partial
    view-sum cost volume from its local views only (per-chip gather work and
    encoder work scale as V/n);
  * ONE ``psum`` per cascade stage reduces the partial sums into the global
    view-mean volume — the reference's per-iteration mean aggregation
    (``core/update.py:101-109``) collapses to a single collective because
    the lookup is linear and its index is view-independent;
  * the GRU/update and lookups then run replicated with zero per-iteration
    communication.

Views are zero-padded to a multiple of the axis size; padded views carry zero
weight in the mean.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cermvs_tpu.ops import corr as corr_ops
from cermvs_tpu.ops.geometry import relative_projection


def _slot_layout(V, n_shards, rect_views):
    """Static per-shard view-slot layout.

    Plain sharding: views 0..V-1 padded to a shard multiple (pads replicate
    the last view, zero weight).  MIXED construction (``rect_views`` a
    proper subset): shard_map traces ONE program per shard, so the
    rect/exact construction split must land at the SAME local slots on
    every shard — each shard's local layout is ``[r_per rect | e_per
    exact]`` slots, with the rect (exact) views distributed across shards'
    rect (exact) slots and per-group padding replicating the group's last
    view at zero weight.  Returns (slots, weights, r_per, e_per)."""
    if rect_views is None:
        V_pad = -(-V // n_shards) * n_shards
        slots = list(range(V)) + [V - 1] * (V_pad - V)
        weights = [1.0] * V + [0.0] * (V_pad - V)
        return np.asarray(slots), np.asarray(weights, np.float32), None, None
    rect_views = tuple(int(v) for v in rect_views)
    exact_views = tuple(v for v in range(V) if v not in rect_views)
    assert rect_views and exact_views, "mixed layout needs both groups"
    r_per = -(-len(rect_views) // n_shards)
    e_per = -(-len(exact_views) // n_shards)
    slots, weights = [], []
    for s in range(n_shards):
        for group, per in ((rect_views, r_per), (exact_views, e_per)):
            g = group[s * per: (s + 1) * per]
            slots += list(g) + [group[-1]] * (per - len(g))
            weights += [1.0] * len(g) + [0.0] * (per - len(g))
    return (np.asarray(slots), np.asarray(weights, np.float32), r_per,
            e_per)


def view_sharded_forward(model, params, images, poses, intrinsics, scale,
                         mesh: Mesh, plan=None, rect_views=None,
                         view_scan=False):
    """Test-mode forward with neighbor views sharded over ``mesh``'s 'view'
    axis.  Same contract as ``model.apply`` in test mode: returns (B, h, w)
    scaled disparity.

    Only ``aggregation=('mean',)`` is supported (the reference default).

    ``plan``: an accepted :class:`cermvs_tpu.ops.rectify.RectPlan` switches
    the per-shard partial volumes to the rectified construction (the fast
    path).  shard_map traces ONE program for every shard, so the per-view
    static kernel windows are widened to the plan's scene-wide bounds
    (``view_rates`` cleared); requires B == 1 like the unsharded path.

    ``rect_views``: a proper subset of neighbor positions selects the MIXED
    construction under the mesh — the production TNT nf25 path
    (``/root/reference/demo.py:49``) when some views fail the planner's
    per-pair gates: each shard builds rectified volume slices for its rect
    slots and exact gathers for its exact slots (``plan`` must then be the
    partial plan covering ``rect_views``, in their order).

    ``view_scan``: drive the per-shard rectified construction through the
    grouped ``lax.scan`` builder (program size O(groups); with scene-wide
    windows all local views share one group).

    Aggregations beyond the default mean (``core/update.py:101-109``'s
    max/std options) are supported: per-view volumes stay shard-local and
    each GRU iteration aggregates the looked-up correlation features with
    mesh collectives (psum for mean/std moments, pmax for max; padded
    slots enter max as -inf and the moments with zero weight).
    """
    per_view_agg = tuple(model.aggregation) != ("mean",)
    if plan is not None and not plan.ok:
        plan = None
    if plan is None:
        rect_views = None
    if plan is not None:
        assert images.shape[0] == 1, "rectified view sharding requires B==1"
        import dataclasses

        # one traced program serves every shard: per-view static windows
        # cannot differ across shards, so fall back to scene-wide bounds
        plan = dataclasses.replace(plan, view_rates=(), view_s_max=())
    n_shards = mesh.shape["view"]
    B, N, H, W, _ = images.shape
    V = N - 1
    factor = model.stride_factor
    h, w = H // factor, W // factor
    radius = model.radius
    num_levels = model.num_levels
    dim_net = model.dim_net

    scale = jnp.asarray(scale, jnp.float32).reshape(B, 1, 1)
    poses = poses.at[..., :3, 3].multiply(scale)
    intrinsics = intrinsics.at[:, :, :2].divide(float(factor))
    images = images.astype(jnp.float32) * (2.0 / 255.0) - 1.0

    ii = jnp.zeros(V, jnp.int32)
    jj = jnp.arange(1, N, dtype=jnp.int32)
    Pij_all = relative_projection(poses, intrinsics, ii, jj)  # (B, V, 4, 4)
    slots, w_np, r_per, e_per = _slot_layout(V, n_shards, rect_views)
    # static reindex by slot layout (pads REPLICATE a real view: identity
    # poses would put a zero baseline through rect_geometry and poison the
    # psum with NaNs — the pads' features are zeroed, so any valid
    # geometry contributes nothing)
    sel = lambda a: jnp.stack([a[:, g] for g in slots], axis=1)
    Pij = sel(Pij_all)
    view_weight = jnp.asarray(w_np)
    src_images = sel(images[:, 1:])
    src_poses = sel(poses[:, 1:])
    src_K = sel(intrinsics[:, 1:])
    # (shards, per_shard, ...) so shard_map splits the leading axis
    src_images = jnp.moveaxis(src_images, 1, 0)
    Pij_s = jnp.moveaxis(Pij, 1, 0)
    src_poses = jnp.moveaxis(src_poses, 1, 0)
    src_K = jnp.moveaxis(src_K, 1, 0)

    def cnet_fn(m, x):
        return m.cnet(x)

    def fnet_fn(m, x):
        return m.fnet(x)

    def update_fn(m, net, inp, disp, corr, stage, gctx, pre_agg=False):
        return m.update_block(net, inp, disp, corr, stage, gru_ctx=gctx,
                              pre_aggregated=pre_agg)

    def gru_ctx_fn(m, inp, stage):
        return m.update_block.gru_ctx(inp, stage)

    def stage_params(stage: int) -> Tuple[int, float, int]:
        n_hyp, n_div, n_iters = model.cascade[stage]
        n_hyp = model._auto_hyps(n_hyp)
        return n_hyp, 0.0025 / n_div, n_iters

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("view"), P("view"), P("view"),
                  P("view"), P("view")),
        out_specs=P(),
        check_vma=False,
    )
    def run(params, ref_image, ref_pose, ref_K, src_images_l, Pij_l,
            poses_l, K_l, weight_l):
        # src_images_l: (V_local, B, H, W, 3); weight_l: (V_local,)
        V_local = src_images_l.shape[0]
        net_inp = model.apply(params, ref_image, method=cnet_fn)
        net = jnp.tanh(net_inp[..., :dim_net])
        inp = jax.nn.relu(net_inp[..., dim_net:])

        # encode local neighbor frames serially (memory-bounded)
        f_src_raw = jax.lax.map(
            lambda img: model.apply(params, img, method=fnet_fn),
            src_images_l)  # (V_local, B, h, w, C)
        f_ref1 = model.apply(params, ref_image, method=fnet_fn)  # (B, h, w, C)

        # zero padded views' FEATURES (the encoder of a zero image is not
        # zero) so their volume contribution vanishes under the view sum
        f_src_raw = (jnp.moveaxis(f_src_raw, 0, 1)
                     * weight_l[None, :, None, None, None].astype(
                         f_src_raw.dtype))  # (B, V_local, h, w, C)
        f_src = f_src_raw.astype(jnp.float32) / 8.0
        f_ref = jnp.broadcast_to(
            (f_ref1.astype(jnp.float32) / 8.0)[:, None], f_src.shape)
        Pij_bl = jnp.moveaxis(Pij_l, 0, 1)  # (B, V_local, 4, 4)
        w_sum = jax.lax.psum(jnp.sum(weight_l), "view")

        if plan is not None:
            from cermvs_tpu.ops.corr_rectified import (
                build_corr_volume_rectified, group_views, rect_features,
                rect_features_grouped)

            # mixed layout: local slots [0, r_per) are rect-constructed,
            # [r_per, V_local) exact — identical on every shard by
            # construction (_slot_layout)
            n_rect = V_local if rect_views is None else r_per
            fmaps_local = jnp.concatenate(
                [f_ref1[:, None], f_src_raw[:, :n_rect]], axis=1)
            poses_local = jnp.concatenate(
                [ref_pose, jnp.moveaxis(poses_l, 0, 1)[:, :n_rect]], axis=1)
            K_local = jnp.concatenate(
                [ref_K, jnp.moveaxis(K_l, 0, 1)[:, :n_rect]], axis=1)
            ii_l = jnp.zeros(n_rect, jnp.int32)
            jj_l = jnp.arange(1, n_rect + 1, dtype=jnp.int32)
            # pose-dependent, stage-independent warps computed once
            if view_scan:
                groups_l = group_views(plan, n_rect)
                rect_ctx = rect_features_grouped(
                    fmaps_local, poses_local, K_local, ii_l, jj_l, plan,
                    model.dtype, groups_l)
            else:
                groups_l = None
                rect_ctx = rect_features(fmaps_local, poses_local, K_local,
                                         ii_l, jj_l, plan, model.dtype)

        disp = jnp.zeros((B, h, w, 1), jnp.float32)
        impl = model.lookup_impl
        for stage in range(len(model.cascade)):
            n_hyp, incre, n_iters = stage_params(stage)
            origin = corr_ops.slab_origin(
                disp[..., 0][:, None], n_hyp, incre, shift=(stage == 0))
            # local partial SUM of per-view volumes (padded views contribute
            # exactly zero: their features are zero), reduced ONCE per stage
            # into the global view-mean volume — the per-iteration psum of
            # lookup features collapses to this single collective because the
            # lookup is linear and its index is view-independent.
            mean_fold = not per_view_agg
            if plan is not None:
                vol_local = build_corr_volume_rectified(
                    fmaps_local, poses_local, K_local, ii_l, jj_l, origin,
                    n_hyp, incre, plan, mean_over_views=mean_fold,
                    gather_dtype=model.dtype, zero_slab=(stage == 0),
                    rect_ctx=rect_ctx, view_scan=view_scan,
                    groups=groups_l)
                if mean_fold:
                    vol_local = vol_local * n_rect
                if rect_views is not None:
                    # exact gathers for the local exact slots (padded slots
                    # carry zero features — exactly zero contribution)
                    vol_exact = corr_ops.build_corr_volume_from(
                        f_ref[:, n_rect:], f_src[:, n_rect:],
                        Pij_bl[:, n_rect:], origin, n_hyp, incre,
                        hyp_chunk=model.hyp_chunk, mean_over_views=mean_fold,
                        gather_dtype=model.dtype)
                    if mean_fold:
                        vol_local = vol_local + vol_exact * e_per
                    else:
                        vol_local = jnp.concatenate(
                            [vol_local, vol_exact], axis=1)
            else:
                vol_local = corr_ops.build_corr_volume_from(
                    f_ref, f_src, Pij_bl, origin, n_hyp, incre,
                    hyp_chunk=model.hyp_chunk, mean_over_views=mean_fold,
                    gather_dtype=model.dtype)
                if mean_fold:
                    vol_local = vol_local * V_local
            if mean_fold:
                vol = jax.lax.psum(vol_local, "view") / w_sum
                Vv = 1
            else:
                # per-view volumes stay LOCAL; aggregation happens on the
                # looked-up features each iteration (below)
                vol = vol_local
                Vv = V_local
            levels = (corr_ops.build_pyramid(vol, num_levels)
                      if impl != "pallas" else [vol])
            pyr = corr_ops.CorrPyramid(
                levels=levels, origin=origin, incre=incre, n_hyp=n_hyp,
                num_levels=num_levels)

            # loop-invariant context gate contributions, hoisted out of scan
            g_ctx = model.apply(params, inp, stage, method=gru_ctx_fn)
            wv = weight_l[None, :, None, None, None]

            def body(carry, _):
                net, disp = carry
                zinv = jnp.broadcast_to(disp[..., 0][:, None], (B, Vv, h, w))
                corr_l = corr_ops.lookup(pyr, zinv, radius, impl=impl)
                if mean_fold:
                    net2, delta = model.apply(
                        params, net, inp, disp, corr_l, stage,
                        method=update_fn, gctx=g_ctx)
                    return (net2, disp + delta), ()
                # collective view aggregation of the correlation features
                # (zero-weight padded slots excluded from every statistic)
                parts = []
                mean = None
                if "mean" in model.aggregation or "std" in model.aggregation:
                    mean = jax.lax.psum(
                        jnp.sum(corr_l * wv, axis=1), "view") / w_sum
                if "mean" in model.aggregation:
                    parts.append(mean)
                if "max" in model.aggregation:
                    big = jnp.where(wv > 0, corr_l, -jnp.inf)
                    parts.append(jax.lax.pmax(
                        jnp.max(big, axis=1), "view"))
                if "std" in model.aggregation:
                    d2 = jax.lax.psum(
                        jnp.sum(wv * (corr_l - mean[:, None]) ** 2, axis=1),
                        "view") / w_sum
                    parts.append(jnp.sqrt(d2))
                corr_agg = jnp.concatenate(parts, axis=-1)
                net2, delta = model.apply(
                    params, net, inp, disp, corr_agg, stage,
                    method=update_fn, gctx=g_ctx, pre_agg=True)
                return (net2, disp + delta), ()

            (net, disp), _ = jax.lax.scan(
                body, (net, disp), None, length=n_iters)

        return disp[..., 0]

    out = run(params, images[:, 0], poses[:, :1], intrinsics[:, :1],
              src_images, Pij_s, src_poses, src_K, view_weight)
    return out * scale[..., 0]
