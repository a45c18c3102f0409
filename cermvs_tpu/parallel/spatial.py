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

Scope: test-mode forward, B == 1, mean aggregation, exact construction
(the rectified row-banded variant is future work; at scale 2 the exact
construction over n row shards costs ~1/n of its single-chip time, and the
volume/GRU memory drops by the same factor).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ghost margin (feature-grid rows) >= per-iteration receptive field (6)
GHOST = 8


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
# Row-sharded forward
# ---------------------------------------------------------------------------


def row_sharded_forward(model, params, images, poses, intrinsics, scale,
                        mesh: Mesh, axis: str = "row"):
    """Test-mode forward with image rows sharded over ``mesh[axis]``.

    images (1, N, H, W, 3) in [0, 255]; returns (1, h, w) scaled disparity
    identical (up to float reduction order) to ``model.apply``.

    Requires: B == 1, ``model.test_mode``, mean aggregation, H divisible by
    8 * n_shards.  Uses the exact construction (the volume stays row-
    sharded; source features are all-gathered).
    """
    assert model.test_mode, "row-sharded forward is a test-mode path"
    assert model.mean_volume, "row sharding requires mean aggregation"
    n = int(mesh.shape[axis])
    B, N, H, W, _ = images.shape
    assert B == 1, "row-sharded forward supports batch 1"
    factor = model.stride_factor
    assert factor == 4, "row sharding mirrors the HR encoder"
    assert H % (8 * n) == 0, f"H={H} must divide 8*n_shards={8 * n}"
    h, w = H // factor, W // factor
    hloc = h // n
    # ghost rows come from the IMMEDIATE neighbors only: each shard must own
    # at least GHOST feature rows (production shapes are far above this —
    # scale 2 has 576/8 = 72 rows/shard)
    assert hloc >= GHOST, f"{hloc} feature rows/shard < ghost margin {GHOST}"
    V = N - 1
    p = params["params"] if "params" in params else params

    from cermvs_tpu.ops import corr as corr_ops
    from cermvs_tpu.ops.geometry import relative_projection

    def body(p, images_loc, poses, intrinsics, scale):
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

        # extended ref rows [row0, row0 + hloc + 2*GHOST) in global feature
        # coords, row0 = a - GHOST; out-of-image rows are zero (padding) and
        # masked at every conv input
        idx = jax.lax.axis_index(axis)
        a = idx * hloc
        ref_pad = jnp.pad(fmaps_full[0] / 8.0,
                          ((GHOST, GHOST), (0, 0), (0, 0)))
        f_ref_ext = jax.lax.dynamic_slice_in_dim(
            ref_pad, a, hloc + 2 * GHOST, axis=0)  # (rows_ext, w, C)
        rows_ext = hloc + 2 * GHOST
        gr = jnp.arange(rows_ext)  # local ext row -> global row a - GHOST + i
        valid = ((gr + a - GHOST >= 0) & (gr + a - GHOST < h))
        row_mask = valid.astype(jnp.float32)[None, :, None, None]

        # global-row offset into the projection: [x, y+row0, 1, d] =
        # E(row0) @ [x, y, 1, d] with E = I + row0 * e_y e_1^T
        Pij = relative_projection(poses, intr4, ii, jj)  # (1, V, 4, 4)
        row0 = (a - GHOST).astype(jnp.float32)
        E = jnp.eye(4, dtype=Pij.dtype).at[1, 2].add(row0)
        Pij_ext = Pij @ E

        f_ref_ext = jnp.broadcast_to(
            f_ref_ext[None, None], (1, V) + f_ref_ext.shape)

        # ghost-row refresh: pull GHOST owned rows from each neighbor
        def refresh(x):
            own = x[:, GHOST:-GHOST]
            return _halo(own, GHOST, GHOST, axis, 1)

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

        inp_ext = _halo(inp, GHOST, GHOST, axis, 1)
        disp = jnp.zeros((1, rows_ext, w, 1), jnp.float32)
        net = _halo(net0, GHOST, GHOST, axis, 1).astype(jnp.float32)

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
            vol = corr_ops.build_corr_volume_from(
                f_ref_ext.astype(jnp.float32),
                f_src_full.astype(jnp.float32), Pij_ext, origin, n_hyp,
                incre, hyp_chunk=model.hyp_chunk, mean_over_views=True,
                gather_dtype=model.dtype)
            levels = (corr_ops.build_pyramid(vol, model.num_levels)
                      if model.lookup_impl != "pallas" else [vol])
            pyr = corr_ops.CorrPyramid(levels, origin, incre, n_hyp,
                                       model.num_levels)
            gctx = apply_gru_ctx(inp_ext.astype(model.dtype), stage)

            for _ in range(n_iters):
                disp = refresh(disp)
                net = refresh(net)
                zinv = jax.lax.stop_gradient(disp)[..., 0][:, None]
                corr_frames = corr_ops.lookup(pyr, zinv, model.radius,
                                              impl=model.lookup_impl)
                net, delta = apply_update(
                    net.astype(model.dtype), inp_ext,
                    jax.lax.stop_gradient(disp), corr_frames, stage, gctx)
                net = net.astype(jnp.float32)
                disp = jax.lax.stop_gradient(disp) + delta

        out = disp[:, GHOST:-GHOST, :, 0] * scale_[:, :, 0]
        return out  # (1, hloc, w)

    shardedf = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=False)
    out = shardedf(p, images, poses, intrinsics,
                   jnp.asarray(scale, jnp.float32))
    return out
