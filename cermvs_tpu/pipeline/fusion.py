"""Point-cloud fusion with adaptive geometric-consistency thresholding.

TPU-native re-design of ``/root/reference/fusion.py`` (itself a port of
D2HC-RMVSNet fusion): the per-(ref, src) two-way reprojection check runs as a
single jitted kernel vmapped over source views, with the threshold passed as a
traced scalar so the 10-iteration binary search (``fusion.py:201-299``) reuses
one executable.  The search adapts a log10 threshold until the mean inlier
ratio across views reaches ``glb`` (default 0.25).

Vote semantics preserved (``fusion.py:85-106,244-260``):
  * per source, masks for levels i=2..10: ``dist < i/thre1`` and
    ``relative depth diff < i/thre2`` with ``thre1 = 4*10^t``,
    ``thre2 = 1300*10^t``;
  * a pixel is kept if >= i sources pass level i for any i (or all sources
    pass level 10);
  * fused depth = (sum of level-10-masked reprojected depths + ref) /
    (level-10 vote count + 1).
"""

from __future__ import annotations

import functools
import math
import os
from pathlib import Path
from typing import List

import cv2
import numpy as np

from cermvs_tpu.config import configurable
from cermvs_tpu.io.pfm import read_pfm
from cermvs_tpu.io.ply import write_ply


def _consistency_kernel(ref_depth, ref_K, ref_E, src_depth, src_K, src_E,
                        thre1, thre2):
    """Two-way reprojection consistency for ONE source view (jit + vmap'd).

    ref_depth/src_depth: (H, W); returns (masks (9, H, W) bool,
    depth_reprojected (H, W) with non-level-10 pixels zeroed, dist, reldiff).
    Mirrors ``reproject_with_depth`` + ``check_geometric_consistency``
    (``fusion.py:39-106``).
    """
    import jax.numpy as jnp
    from cermvs_tpu.ops.sampling import bilinear_sample

    H, W = ref_depth.shape
    y = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    x = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)

    ones = jnp.ones_like(x)
    pix = jnp.stack([x, y, ones], 0).reshape(3, -1)  # (3, HW)

    xyz_ref = jnp.linalg.inv(ref_K) @ (pix * ref_depth.reshape(1, -1))
    rel = src_E @ jnp.linalg.inv(ref_E)
    xyz_src = (rel @ jnp.concatenate([xyz_ref, ones.reshape(1, -1)], 0))[:3]
    K_xyz = src_K @ xyz_src
    xy_src = K_xyz[:2] / K_xyz[2:3]

    sampled = bilinear_sample(
        src_depth[..., None],
        jnp.stack([xy_src[0], xy_src[1]], -1).reshape(H, W, 2),
    )[..., 0]

    xyz_src2 = jnp.linalg.inv(src_K) @ (
        jnp.concatenate([xy_src, ones.reshape(1, -1)], 0)
        * sampled.reshape(1, -1))
    rel_back = ref_E @ jnp.linalg.inv(src_E)
    xyz_rp = (rel_back @ jnp.concatenate(
        [xyz_src2, ones.reshape(1, -1)], 0))[:3]
    depth_rp = xyz_rp[2].reshape(H, W)
    K_rp = ref_K @ xyz_rp
    xy_rp = K_rp[:2] / K_rp[2:3]

    dist = jnp.sqrt(
        (xy_rp[0].reshape(H, W) - x) ** 2 + (xy_rp[1].reshape(H, W) - y) ** 2)
    depth_diff = jnp.abs(depth_rp - ref_depth)
    rel_diff = depth_diff / ref_depth

    levels = jnp.arange(2, 11, dtype=jnp.float32)[:, None, None]
    masks = (dist[None] < levels / thre1) & (rel_diff[None] < levels / thre2)
    depth_rp = jnp.where(masks[-1], depth_rp, 0.0)
    return masks, depth_rp


def _one_ref_view(ref_depth, ref_K, ref_E, src_depths, src_Ks, src_Es,
                  thre1, thre2, n_src: int):
    import jax

    masks, depth_rp = jax.vmap(
        _consistency_kernel, in_axes=(None, None, None, 0, 0, 0, None, None)
    )(ref_depth, ref_K, ref_E, src_depths, src_Ks, src_Es, thre1, thre2)
    # (S, 9, H, W) -> per-level vote counts; level-10 = index -1
    vote = masks.astype("int32").sum(axis=0)  # (9, H, W)
    geo_sum10 = vote[-1]
    n = 1 + n_src
    geo_mask = geo_sum10 >= n
    levels = jax.numpy.arange(2, 11)[:, None, None]
    geo_mask = geo_mask | (vote >= levels).any(axis=0)
    fused = (depth_rp.sum(axis=0) + ref_depth) / (geo_sum10 + 1)
    return geo_mask, fused, geo_mask.mean()


@functools.lru_cache(maxsize=8)
def _batched_kernel(n_src: int, H: int, W: int):
    import jax

    return jax.jit(functools.partial(_one_ref_view, n_src=n_src))


@functools.lru_cache(maxsize=8)
def _refview_batched_kernel(n_src: int, H: int, W: int, mesh_key=None):
    """Kernel over a BATCH of reference views (P4: ref views are the natural
    parallel axis).  Takes the full per-scene stacks plus index arrays so the
    gathers happen on device; with a mesh the ref-view batch is sharded over
    the data axis while the (small) scene stacks are replicated."""
    import jax
    import jax.numpy as jnp

    def batched(depths, Ks, Es, ref_idx, src_idx, thre1, thre2):
        fn = jax.vmap(functools.partial(_one_ref_view, n_src=n_src),
                      in_axes=(0, 0, 0, 0, 0, 0, None, None))
        return fn(depths[ref_idx], Ks[ref_idx], Es[ref_idx],
                  depths[src_idx], Ks[src_idx], Es[src_idx], thre1, thre2)

    if mesh_key is None:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _MESHES[mesh_key]
    data = NamedSharding(mesh, P(("data", "view")))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        in_shardings=(repl, repl, repl, data, data, repl, repl),
        out_shardings=(data, data, data),
    )


_MESHES = {}


def register_fusion_mesh(mesh) -> str:
    """Register a mesh for ref-view-sharded fusion; returns its key."""
    key = f"mesh{id(mesh)}"
    _MESHES[key] = mesh
    return key


@functools.lru_cache(maxsize=8)
def _materialized_batched_kernel(n_src: int, H: int, W: int, mesh_key=None):
    """Kernel over a batch of MATERIALIZED ref-view tuples (the streamed
    memory model, P4 at scale): the host keeps the full scene stacks in RAM
    and uploads only the current batch's (ref, sources) maps, sharded over
    the mesh — device memory is O(batch x n_src x H x W) regardless of the
    scene's view count.  Contrast ``_refview_batched_kernel``, which
    replicates the whole stacks on every device and gathers by index (fast
    for scenes that fit; a TNT-advanced-scale scan does not).  Same math,
    same kernel, so results bit-match the in-memory path."""
    import jax

    def batched(ref_d, ref_K, ref_E, src_d, src_K, src_E, thre1, thre2):
        fn = jax.vmap(functools.partial(_one_ref_view, n_src=n_src),
                      in_axes=(0, 0, 0, 0, 0, 0, None, None))
        return fn(ref_d, ref_K, ref_E, src_d, src_K, src_E, thre1, thre2)

    if mesh_key is None:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _MESHES[mesh_key]
    data = NamedSharding(mesh, P(("data", "view")))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        batched,
        in_shardings=(data,) * 6 + (repl, repl),
        out_shardings=(data, data, data),
    )


def align_image_to_depth(ref_img, depth, rescale, intrinsics, extrinsics):
    """Resize/crop the RGB image onto the depth map's grid, fixing intrinsics
    (the bookkeeping at ``fusion.py:142-190``).

    ref_img: (H, W, 3) in [0, 1]; depth: (h, w) at the inference resolution
    (already rescaled by caller).  Returns (img, intrinsics, extrinsics).
    """
    intrinsics = np.array(intrinsics, np.float64)
    extrinsics = np.array(extrinsics, np.float64)
    scale = float(depth.shape[0]) / ref_img.shape[0]
    flag = 0
    if depth.shape[1] / ref_img.shape[1] > scale:
        scale = float(depth.shape[1]) / ref_img.shape[1]
        flag = 1
    img = cv2.resize(ref_img, None, fx=scale, fy=scale,
                     interpolation=cv2.INTER_LINEAR)
    if flag == 0:
        index = int(math.ceil((img.shape[1] - depth.shape[1]) / 2))
        img = img[:, index : depth.shape[1] + index, :]
    else:
        index = int(math.ceil((img.shape[0] - depth.shape[0]) / 2))
        img = img[index : img.shape[0] - index, :, :]
    intrinsics[:2, :] *= scale
    if flag == 0:
        intrinsics[0, 2] -= index
    else:
        intrinsics[1, 2] -= index
    return img, intrinsics, extrinsics


@configurable("fusion")
def fusion(
    data_loader,
    output_folder,
    suffix="",
    glb: float = 0.25,
    rescale: float = 1,
    tot_iter: int = 10,
    mesh=None,
    view_batch: int = 0,
    stream: bool = False,
    stream_above_bytes: int = 4 << 30,
    multihost: bool = True,
):
    """Adaptive-threshold fusion.  ``view_batch`` > 0 processes that many
    reference views per device call (vectorized); with a ``mesh`` the batch
    is additionally sharded over the data axis (distributed fusion, P4).
    ``view_batch=0`` uses the one-view-at-a-time path (lowest memory).

    Memory model: by default the scene's depth/intrinsic stacks live on
    device (replicated under a mesh) and ref/src maps are gathered by index
    — fastest when the scene fits.  With ``stream=True`` (auto-enabled when
    the stacks exceed ``stream_above_bytes``) the stacks stay in HOST RAM
    and each batch's (ref, sources) maps are uploaded sharded over the
    mesh: device memory is O(view_batch x n_src x H x W) regardless of
    scene size, so TNT-advanced-scale scans (hundreds of 1080p+ views) fuse
    on 16 GB chips.  The adaptive search re-uploads per iteration — the
    same recompute schedule as the in-memory path, which also re-runs the
    kernel per iteration; results bit-match.

    Multi-host (``multihost`` and ``jax.process_count() > 1``): ref views are
    round-robin split across processes; every iteration the per-host mask
    ratios are allgathered so ALL hosts binary-search the SAME global
    threshold (the reference's SLURM-sharded fusion jobs each search their
    own -- ``fusion.py:296-299`` semantics are preserved globally here), and
    host 0 merges the per-host PLY shards from the shared filesystem.  The
    compute (consistency kernels) is what distributes; each host still
    iterates the loader for scene metadata."""
    import jax
    import jax.numpy as jnp

    pc = jax.process_count() if multihost else 1
    pid = jax.process_index() if multihost else 0

    output_folder = Path(output_folder)
    n_images = len(data_loader)

    all_images: List[np.ndarray] = []
    all_depths: List[np.ndarray] = []
    all_intrinsics: List[np.ndarray] = []
    all_extrinsics: List[np.ndarray] = []
    refid_to_index = {}
    pair_data = []

    for i, (images, extrinsics, intrinsics, image_names, _) in enumerate(
            data_loader):
        refid = image_names[0]
        refid_to_index[refid] = i
        pair_data.append((refid, list(image_names[1:])))

        ref_img = images[0] / 255.0
        depth = read_pfm(output_folder / "depths" / f"{refid}{suffix}.pfm")
        h, w = depth.shape
        depth = cv2.resize(depth, (int(w * rescale), int(h * rescale)))
        img, K, E = align_image_to_depth(
            ref_img, depth, rescale, intrinsics[0], extrinsics[0])

        if all_depths and depth.shape != all_depths[0].shape:
            h0, w0 = all_depths[0].shape
            canvas = np.zeros((h0, w0), depth.dtype)
            sh, sw = min(h0, depth.shape[0]), min(w0, depth.shape[1])
            canvas[:sh, :sw] = depth[:sh, :sw]
            depth = canvas
            canvas = np.zeros_like(all_images[0])
            sh, sw = min(canvas.shape[0], img.shape[0]), min(canvas.shape[1], img.shape[1])
            canvas[:sh, :sw] = img[:sh, :sw]
            img = canvas
        all_images.append(img)
        all_depths.append(depth.astype(np.float32))
        all_intrinsics.append(K.astype(np.float32))
        all_extrinsics.append(E.astype(np.float32))

    H, W = all_depths[0].shape
    depths_np = np.stack(all_depths)
    Ks_np = np.stack(all_intrinsics)
    Es_np = np.stack(all_extrinsics)
    stream = stream or depths_np.nbytes > stream_above_bytes
    if stream and view_batch <= 0:
        view_batch = 8
    if not stream:
        depths = jnp.asarray(depths_np)
        Ks = jnp.asarray(Ks_np)
        Es = jnp.asarray(Es_np)

    thre_left, thre_right = -2.0, 2.0
    vertexs, vertex_colors = [], []

    # group ref views by source count so each group runs one compiled kernel
    groups = {}
    for refid, srcids in pair_data:
        ref = refid_to_index[refid]
        srcs = [refid_to_index[x] for x in srcids]
        assert srcs, "reference view needs at least one source"
        groups.setdefault(len(srcs), []).append((ref, srcs))

    if pc > 1:
        # round-robin split of each group's ref views across processes;
        # compute distributes, the threshold search stays GLOBAL (below)
        groups = {k: v[pid::pc] for k, v in groups.items()}
        groups = {k: v for k, v in groups.items() if v}

    mesh_key = register_fusion_mesh(mesh) if mesh is not None else None
    shard_n = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1

    def emit_points(ref, geo_mask, fused_depth):
        os.makedirs(output_folder / "mask", exist_ok=True)
        cv2.imwrite(str(output_folder / "mask" / f"{ref}{suffix}.png"),
                    geo_mask.astype(np.uint8) * 255)
        print(f"ref-view {ref}, mask: {geo_mask.mean():.4f}")
        ys, xs = np.where(geo_mask)
        d = fused_depth[ys, xs]
        color = all_images[ref][ys, xs]
        xyz_ref = np.linalg.inv(all_intrinsics[ref]) @ (
            np.vstack([xs, ys, np.ones_like(xs)]) * d)
        xyz_world = (np.linalg.inv(all_extrinsics[ref]) @ np.vstack(
            [xyz_ref, np.ones_like(xs)]))[:3]
        vertexs.append(xyz_world.T.astype(np.float32))
        vertex_colors.append((color * 255).astype(np.uint8))

    for it in range(tot_iter):
        thre = (thre_left + thre_right) / 2
        thre1 = jnp.float32(10.0 ** thre * 4.0)
        thre2 = jnp.float32(10.0 ** thre * 1300.0)
        mask_ratios = []
        last = it == tot_iter - 1

        for n_src, items in groups.items():
            if view_batch <= 0:
                kernel = _batched_kernel(n_src, H, W)
                for ref, srcs in items:
                    geo_mask, fused_depth, ratio = kernel(
                        depths[ref], Ks[ref], Es[ref],
                        depths[np.asarray(srcs)], Ks[np.asarray(srcs)],
                        Es[np.asarray(srcs)], thre1, thre2)
                    mask_ratios.append(float(ratio))
                    if last:
                        emit_points(ref, np.asarray(geo_mask),
                                    np.asarray(fused_depth))
                continue

            kernel = (_materialized_batched_kernel if stream
                      else _refview_batched_kernel)(n_src, H, W, mesh_key)
            bsz = max(view_batch, shard_n)
            bsz = (bsz // shard_n) * shard_n  # divisible by shard count
            for s in range(0, len(items), bsz):
                chunk = items[s : s + bsz]
                # pad the batch by repeating the last view (extra results
                # are discarded) so the sharded shape stays static
                padded = chunk + [chunk[-1]] * (bsz - len(chunk))
                ref_ids = np.asarray([r for r, _ in padded], np.int32)
                src_ids = np.asarray([ss for _, ss in padded], np.int32)
                if stream:
                    # upload ONLY this batch's maps (host keeps the stacks);
                    # the jit's in_shardings place the numpy slices directly
                    # onto their shards
                    gm, fd, ratios = kernel(
                        depths_np[ref_ids], Ks_np[ref_ids], Es_np[ref_ids],
                        depths_np[src_ids], Ks_np[src_ids], Es_np[src_ids],
                        thre1, thre2)
                else:
                    gm, fd, ratios = kernel(
                        depths, Ks, Es, jnp.asarray(ref_ids),
                        jnp.asarray(src_ids), thre1, thre2)
                mask_ratios.extend(float(r) for r in np.asarray(ratios)[: len(chunk)])
                if last:
                    gm = np.asarray(gm)
                    fd = np.asarray(fd)
                    for k, (ref, _) in enumerate(chunk):
                        emit_points(ref, gm[k], fd[k])

        if pc > 1:
            # global mean over ALL hosts' views: every host updates the
            # same threshold (deterministic, order-independent sums)
            from jax.experimental import multihost_utils

            v = multihost_utils.process_allgather(np.asarray(
                [float(np.sum(mask_ratios)), float(len(mask_ratios))],
                np.float64))
            mean_mask = float(v[..., 0].sum() / max(v[..., 1].sum(), 1.0))
        else:
            mean_mask = float(np.mean(mask_ratios))
        print(f"iter {it}: thre={10 ** thre:.5f} mean_mask={mean_mask:.4f}")
        if mean_mask >= glb:
            thre_left = thre
        else:
            thre_right = thre

    xyz = (np.concatenate(vertexs, axis=0) if vertexs
           else np.zeros((0, 3), np.float32))
    rgb = (np.concatenate(vertex_colors, axis=0) if vertex_colors
           else np.zeros((0, 3), np.uint8))
    out = output_folder / "result.ply"
    if pc > 1:
        from cermvs_tpu.io.ply import read_ply
        from jax.experimental import multihost_utils

        shard = output_folder / f"result.part{pid}.ply"
        write_ply(shard, xyz, rgb)
        # barrier: every shard file is on the shared FS before the merge
        multihost_utils.process_allgather(np.asarray([len(xyz)]))
        if pid == 0:
            parts = [read_ply(output_folder / f"result.part{q}.ply")
                     for q in range(pc)]
            write_ply(out, np.concatenate([a for a, _ in parts]),
                      np.concatenate([b for _, b in parts]))
            print("saving the final model to", out)
        # exit barrier: callers on every host may read result.ply after
        multihost_utils.process_allgather(np.asarray([0]))
        return out
    write_ply(out, xyz, rgb)
    print("saving the final model to", out)
    return out
