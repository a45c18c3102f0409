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


def view_sharded_forward(model, params, images, poses, intrinsics, scale,
                         mesh: Mesh, plan=None):
    """Test-mode forward with neighbor views sharded over ``mesh``'s 'view'
    axis.  Same contract as ``model.apply`` in test mode: returns (B, h, w)
    scaled disparity.

    Only ``aggregation=('mean',)`` is supported (the reference default).

    ``plan``: an accepted :class:`cermvs_tpu.ops.rectify.RectPlan` switches
    the per-shard partial volumes to the rectified construction (the fast
    path).  shard_map traces ONE program for every shard, so the per-view
    static kernel windows are widened to the plan's scene-wide bounds
    (``view_rates`` cleared); requires B == 1 like the unsharded path.
    """
    assert tuple(model.aggregation) == ("mean",), \
        "view sharding requires mean aggregation (the reference default)"
    if plan is not None and not plan.ok:
        plan = None
    if plan is not None:
        assert images.shape[0] == 1, "rectified view sharding requires B==1"
        import dataclasses

        # one traced program serves every shard: per-view static windows
        # cannot differ across shards, so fall back to scene-wide bounds
        plan = dataclasses.replace(plan, view_rates=(), view_s_max=())
    n_shards = mesh.shape["view"]
    B, N, H, W, _ = images.shape
    V = N - 1
    V_pad = -(-V // n_shards) * n_shards
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
    Pij = relative_projection(poses, intrinsics, ii, jj)  # (B, V, 4, 4)
    # pad the view axis with identity projections and zero weight
    pad = V_pad - V
    Pij = jnp.concatenate(
        [Pij, jnp.broadcast_to(jnp.eye(4), (B, pad, 4, 4))], axis=1)
    view_weight = jnp.concatenate(
        [jnp.ones((V,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    src_images = jnp.concatenate(
        [images[:, 1:], jnp.zeros((B, pad, H, W, 3), images.dtype)], axis=1)
    # raw per-view poses/intrinsics for the rectified construction; padded
    # slots REPLICATE the last real view (identity poses would put a zero
    # baseline through rect_geometry and poison the psum with NaNs — the
    # pads' features are zeroed, so any valid geometry contributes nothing)
    src_poses = jnp.concatenate(
        [poses[:, 1:], jnp.broadcast_to(poses[:, N - 1:N],
                                        (B, pad, 4, 4))], axis=1)
    src_K = jnp.concatenate(
        [intrinsics[:, 1:], jnp.broadcast_to(intrinsics[:, N - 1:N],
                                             (B, pad, 3, 3))], axis=1)
    # (shards, per_shard, ...) so shard_map splits the leading axis
    src_images = jnp.moveaxis(src_images, 1, 0)
    Pij_s = jnp.moveaxis(Pij, 1, 0)
    src_poses = jnp.moveaxis(src_poses, 1, 0)
    src_K = jnp.moveaxis(src_K, 1, 0)

    def cnet_fn(m, x):
        return m.cnet(x)

    def fnet_fn(m, x):
        return m.fnet(x)

    def update_fn(m, net, inp, disp, corr, stage, gctx):
        return m.update_block(net, inp, disp, corr, stage, gru_ctx=gctx)

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
                build_corr_volume_rectified, rect_features)

            fmaps_local = jnp.concatenate(
                [f_ref1[:, None], f_src_raw], axis=1)  # (1, 1+V_local, ...)
            poses_local = jnp.concatenate(
                [ref_pose, jnp.moveaxis(poses_l, 0, 1)], axis=1)
            K_local = jnp.concatenate(
                [ref_K, jnp.moveaxis(K_l, 0, 1)], axis=1)
            ii_l = jnp.zeros(V_local, jnp.int32)
            jj_l = jnp.arange(1, V_local + 1, dtype=jnp.int32)
            # pose-dependent, stage-independent warps computed once
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
            if plan is not None:
                vol_local = build_corr_volume_rectified(
                    fmaps_local, poses_local, K_local, ii_l, jj_l, origin,
                    n_hyp, incre, plan, mean_over_views=True,
                    gather_dtype=model.dtype, zero_slab=(stage == 0),
                    rect_ctx=rect_ctx) * V_local
            else:
                vol_local = corr_ops.build_corr_volume_from(
                    f_ref, f_src, Pij_bl, origin, n_hyp, incre,
                    hyp_chunk=model.hyp_chunk, mean_over_views=True,
                    gather_dtype=model.dtype) * V_local
            vol = jax.lax.psum(vol_local, "view") / w_sum
            levels = (corr_ops.build_pyramid(vol, num_levels)
                      if impl != "pallas" else [vol])
            pyr = corr_ops.CorrPyramid(
                levels=levels, origin=origin, incre=incre, n_hyp=n_hyp,
                num_levels=num_levels)

            # loop-invariant context gate contributions, hoisted out of scan
            g_ctx = model.apply(params, inp, stage, method=gru_ctx_fn)

            def body(carry, _):
                net, disp = carry
                zinv = jnp.broadcast_to(disp[..., 0][:, None], (B, 1, h, w))
                corr_mean = corr_ops.lookup(pyr, zinv, radius, impl=impl)
                net2, delta = model.apply(
                    params, net, inp, disp, corr_mean, stage,
                    method=update_fn, gctx=g_ctx)
                return (net2, disp + delta), ()

            (net, disp), _ = jax.lax.scan(
                body, (net, disp), None, length=n_iters)

        return disp[..., 0]

    out = run(params, images[:, 0], poses[:, :1], intrinsics[:, :1],
              src_images, Pij_s, src_poses, src_K, view_weight)
    return out * scale[..., 0]
