"""Epipolar cost volume: construction, depth pyramid, and multi-level lookup.

TPU-native re-design of ``/root/reference/core/corr.py`` + ``alt_cuda_corr``:

* The CUDA gather kernel (``alt_cuda_corr/correlation_kernel.cu:19-119``) is
  replaced by a vectorized project->quad-corner-gather->dot formulation; peak
  memory is bounded by scanning over views and hypothesis chunks instead of
  the reference's imperative python chunking (``core/corr.py:112-139``).
  The multi-level LOOKUP has a fused Pallas kernel
  (``cermvs_tpu.ops.pallas.lookup``) selectable via ``lookup(impl=...)``.
* Layout is hypothesis-minor: the volume is (B, V, H, W, D) with the D axis
  last (lane dimension), so the 3-level avg-pool pyramid
  (``core/corr.py:94-97``) and the 11-tap lookups (``core/corr.py:102-143``)
  are contiguous-lane operations.
* Gradients: coordinates carry zero gradient, matching the reference CUDA
  backward which never writes ``coords_grad``
  (``correlation_kernel.cu:307,323``); feature-map gradients flow through the
  gathers (JAX derives a deterministic scatter-add, replacing ``atomicAdd``).

Semantics preserved exactly:
  * hypothesis slab ``disps = (arange(D) - D//2) * incre + origin``
    (``core/corr.py:56,65``),
  * stage-0 "shift" rule clamping the origin to ``D//2 * incre``
    (``core/corr.py:59-62``),
  * feature scaling by 1/8 per map (``core/corr.py:30-31``),
  * coordinate clamp to +-1e4 (``core/corr.py:75``),
  * lookup index ``max((zinv - origin)/incre + D//2, 0)`` (``core/corr.py:107``).
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cermvs_tpu.ops.sampling import interp1d


class CorrPyramid(NamedTuple):
    """Correlation pyramid + slab parameters for one cascade stage.

    With the fused Pallas lookup only level 0 is materialized
    (``levels == [corr0]``); pooling happens inside the kernel.
    """

    levels: List[jnp.ndarray]  # each (B, V, H, W, D / 2^i), fp32
    origin: jnp.ndarray        # (B, 1, H, W) per-pixel slab origin (inv depth)
    incre: float               # hypothesis spacing (inverse-depth units)
    n_hyp: int                 # D at level 0
    num_levels: int = 3


def slab_origin(disp: jnp.ndarray, n_hyp: int, incre: float, shift: bool):
    """Per-pixel origin of the hypothesis slab.

    disp: (B, 1, H, W) current inverse-depth estimate (detached by caller).
    Stage 0 (``shift=True``): origin is clamped up to ``D//2 * incre`` so the
    slab starts at inverse depth 0 (``core/corr.py:59-62``); later stages
    center the slab on the estimate.
    """
    if shift:
        floor = n_hyp // 2 * incre
        return jnp.maximum(disp, floor)
    return disp


def _gather_corr_chunk(f_ref, f_quads, coords, H, W):
    """Correlation for one hypothesis chunk via quad-corner gathers.

    f_ref: (B, V, H, W, C) reference features (already scaled)
    f_quads: (B, V, (H+2)*(W+2), 4C) zero-padded source features where row i
        holds all four bilinear corners ``[f[y,x], f[y,x+1], f[y+1,x],
        f[y+1,x+1]]`` (see :func:`_make_corner_quads`) — ONE gather per
        (pixel, hypothesis) fetches every corner as a contiguous 4C row.
        Construction cost on TPU is a mix of per-descriptor overhead and
        random-read bandwidth (measured; see BENCH_NOTES.md), so one
        descriptor per sample in the narrowest lossless dtype is the
        optimum among the profiled formulations.
    coords: (B, V, K, H, W, 2) sample coords in the source view
    returns (B, V, K, H, W) correlation.
    """
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)

    B, V, K = x.shape[:3]
    C = f_ref.shape[-1]
    Wp = W + 2
    # padded indices: for ix in [-1, W-1] / iy in [-1, H-1] the quad holds the
    # true corners (padding rows/cols are zero); farther out every corner is
    # masked anyway, so the clip target is irrelevant
    xp = jnp.clip(ix + 1, 0, W)
    yp = jnp.clip(iy + 1, 0, H)
    idx = yp * Wp + xp
    in_x0 = ((ix >= 0) & (ix <= W - 1)).astype(f_ref.dtype)
    in_x1 = ((ix + 1 >= 0) & (ix + 1 <= W - 1)).astype(f_ref.dtype)
    in_y0 = ((iy >= 0) & (iy <= H - 1)).astype(f_ref.dtype)
    in_y1 = ((iy + 1 >= 0) & (iy + 1 <= H - 1)).astype(f_ref.dtype)

    # mode="clip": indices are pre-clipped; the default 'fill' mode would
    # materialize an extra full-size select buffer.  The ref grid's own dims
    # come from coords (they may be a ROW SLICE of the source grid —
    # row-sharded callers); H/W clamp against the SOURCE dims above.
    Hr, Wr = x.shape[-2:]
    g = jnp.take_along_axis(
        f_quads, idx.reshape(B, V, K * Hr * Wr)[..., None], axis=2,
        mode="clip")
    g = g.reshape(B, V, K, Hr, Wr, 4 * C)
    # fp8 gather buffers (opt-in, halves the random-read bytes again) are
    # upcast to bf16 for the dot: the v5e MXU has no fp8 mode, and the
    # win is HBM traffic, not matmul throughput
    cd = jnp.bfloat16 if jnp.dtype(g.dtype).itemsize == 1 else g.dtype
    dot = lambda q: jnp.einsum(
        "bvkhwc,bvhwc->bvkhw", g[..., q * C : (q + 1) * C].astype(cd),
        f_ref.astype(cd), preferred_element_type=jnp.float32)
    return (
        dot(0) * ((1 - fx) * (1 - fy) * in_x0 * in_y0)
        + dot(1) * (fx * (1 - fy) * in_x1 * in_y0)
        + dot(2) * ((1 - fx) * fy * in_x0 * in_y1)
        + dot(3) * (fx * fy * in_x1 * in_y1)
    )


def _make_corner_quads(f_src: jnp.ndarray) -> jnp.ndarray:
    """(B, V, H, W, C) -> (B, V, (H+2)*(W+2), 4C) padded corner-quad rows."""
    B, V, H, W, C = f_src.shape
    Wp = W + 2
    f_pad = jnp.pad(f_src, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    flat = f_pad.reshape(B, V, (H + 2) * Wp, C)
    r1 = jnp.roll(flat, -1, axis=2)
    rW = jnp.roll(flat, -Wp, axis=2)
    rW1 = jnp.roll(flat, -(Wp + 1), axis=2)
    return jnp.concatenate([flat, r1, rW, rW1], axis=-1)


def build_corr_volume_from(
    f_ref: jnp.ndarray,
    f_src: jnp.ndarray,
    Pij: jnp.ndarray,
    origin: jnp.ndarray,
    n_hyp: int,
    incre: float,
    hyp_chunk: int = 16,
    mean_over_views: bool = False,
    gather_dtype=None,
) -> jnp.ndarray:
    """Core volume builder on pre-gathered per-pair features.

    f_ref/f_src: (B, V, H, W, C) already scaled by 1/8; Pij: (B, V, 4, 4)
    relative projections; origin: (B, 1, H, W).  View-sharded callers hand in
    locally-sharded V slices.  Hypothesis chunks run under ``lax.map`` so the
    transient gather buffers stay at (B*V*chunk*H*W*C) regardless of D.

    f_ref may carry a ROW SLICE of the reference view (row-sharded callers,
    ``parallel/spatial.py``): source gathers clamp against f_src's own
    dims, and the caller encodes the slice's global row offset into ``Pij``
    (right-multiply by a homogeneous y-translation).

    ``mean_over_views=True`` returns the view-AVERAGED volume (B, 1, H, W, D).
    Because the lookup is linear in the volume and its index depends only on
    the (shared) reference disparity, ``mean_v lookup(vol_v) ==
    lookup(mean_v vol_v)`` EXACTLY — so for the reference's default mean
    aggregation (``core/update.py:101-103``) the per-view volumes never need
    to be materialized: V-fold less cost-volume memory and V-fold cheaper
    per-iteration lookups.

    ``gather_dtype``: dtype of the gathered corner buffer (the dominant HBM
    random-read traffic); products accumulate in fp32 regardless.  When the
    feature maps are bf16-VALUED (the model computes them in bf16,
    core/raft.py:55's autocast analog), ``bfloat16`` here is lossless AND
    halves gather bytes.  Defaults to the feature dtype heuristic: bf16 iff
    inputs are bf16-valued is unknowable cheaply, so callers opt in.
    """
    B, V, H, W, C = f_ref.shape
    Hs, Ws = f_src.shape[2:4]  # source dims (gather clamp targets)

    n_chunks = max(1, math.ceil(n_hyp / hyp_chunk))
    padded = n_chunks * hyp_chunk
    offsets = (jnp.arange(padded) - n_hyp // 2).astype(jnp.float32) * incre
    offsets = offsets.reshape(n_chunks, hyp_chunk)

    from cermvs_tpu.ops.geometry import apply_projection

    def view_volume(fr, fquads, pij):
        """(B, 1, ...) single-view volume; transients bounded by hyp_chunk."""

        def one_chunk(offs):
            disps = origin[:, :, None, :, :] + offs[None, None, :, None, None]
            coords = apply_projection(pij, disps)
            coords = jax.lax.stop_gradient(coords)
            return _gather_corr_chunk(fr, fquads, coords, Hs, Ws)

        if n_chunks == 1:
            corr = one_chunk(offsets[0])[:, :, None]
        else:
            corr = jax.lax.map(one_chunk, offsets)  # (n_chunks, B, 1, K, H, W)
            corr = jnp.moveaxis(corr, 0, 2)
        return corr.reshape(B, 1, padded, H, W)

    # scan over views: the gathered (B, K, H, W, 4C) transients exist for one
    # view at a time, and in mean mode the volume accumulates into the carry
    # so per-view volumes are never stacked (the reference instead relied on
    # imperative chunking + empty_cache, core/corr.py:123-139)
    xs = (
        jnp.moveaxis(f_ref, 1, 0)[:, :, None],   # (V, B, 1, H, W, C)
        jnp.moveaxis(f_src, 1, 0)[:, :, None],
        jnp.moveaxis(Pij, 1, 0)[:, :, None],     # (V, B, 1, 4, 4)
    )

    gd = gather_dtype or f_src.dtype

    # rematerialize each view's construction in the backward pass: without
    # this, scan residuals stack the gathered corner buffers across
    # views x chunks (tens of GB at training crops); recomputing the gathers
    # costs one extra construction pass — the standard memory/flops trade
    if mean_over_views:
        @jax.checkpoint
        def body(acc, x):
            fr, fs, pij = x
            quads = _make_corner_quads(fs.astype(gd))
            return acc + view_volume(fr, quads, pij), None

        corr, _ = jax.lax.scan(
            body, jnp.zeros((B, 1, padded, H, W), jnp.float32), xs)
        corr = corr / V
    else:
        @jax.checkpoint
        def body(carry, x):
            fr, fs, pij = x
            quads = _make_corner_quads(fs.astype(gd))
            return carry, view_volume(fr, quads, pij)[:, 0]

        _, corr = jax.lax.scan(body, 0, xs)  # (V, B, padded, H, W)
        corr = jnp.moveaxis(corr, 0, 1)

    corr = corr[:, :, :n_hyp]
    return jnp.moveaxis(corr, 2, -1)  # (B, Vo, H, W, D)


def build_corr_volume(
    fmaps: jnp.ndarray,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    origin: jnp.ndarray,
    n_hyp: int,
    incre: float,
    hyp_chunk: int = 16,
    mean_over_views: bool = False,
    gather_dtype=None,
    zero_slab: bool = False,
) -> jnp.ndarray:
    """Build the (B, V, H, W, D) epipolar correlation volume
    (or (B, 1, H, W, D) view-averaged — see :func:`build_corr_volume_from`).

    fmaps: (B, N, H, W, C) feature maps (fp32); origin: (B, 1, H, W).
    ``zero_slab`` (origin statically equals the stage-0 clamp) is a hint for
    alternative builders (ops/corr_rectified.py); the exact gather path
    gains nothing from it.
    """
    del zero_slab
    from cermvs_tpu.ops.geometry import relative_projection

    fmaps = fmaps.astype(jnp.float32) / 8.0
    f_ref = jnp.take(fmaps, ii, axis=1)
    f_src = jnp.take(fmaps, jj, axis=1)
    Pij = relative_projection(poses, intrinsics, ii, jj)
    return build_corr_volume_from(
        f_ref, f_src, Pij, origin, n_hyp, incre, hyp_chunk, mean_over_views,
        gather_dtype)


def build_pyramid(corr: jnp.ndarray, num_levels: int = 3) -> List[jnp.ndarray]:
    """Avg-pool pyramid along the hypothesis (last) axis (``core/corr.py:94-97``)."""
    levels = [corr]
    for _ in range(num_levels - 1):
        D = corr.shape[-1]
        corr = corr.reshape(corr.shape[:-1] + (D // 2, 2)).mean(-1)
        levels.append(corr)
    return levels


def lookup(
    pyramid: CorrPyramid,
    zinv: jnp.ndarray,
    radius: int = 5,
    impl: str = "banded",
) -> jnp.ndarray:
    """Sample 2r+1 taps per pyramid level around the current estimate.

    zinv: (B, V, H, W) current ref-view disparity broadcast per view (the
    reference passes ``disp[:, ii]``, ``core/raft.py:98``).
    Returns (B, V, H, W, num_levels*(2r+1)) matching ``core/corr.py:140-143``
    (channel order: level-major, tap-minor).

    TPU note: for the cascade's hypothesis counts (D <= 64 at every stage,
    ``core/raft.py:14,76-80``) this is computed GATHER-FREE as a banded
    weighted reduction over the hypothesis (lane) axis — the per-pixel
    fractional index only shifts a band of lerp weights, which XLA fuses into
    compare/select/multiply/reduce on the VPU.  The reference instead runs 33
    ``grid_sample`` gathers per pixel per iteration (``core/corr.py:112-139``).
    Falls back to gather-based interp for very large D.
    """
    x0 = jnp.maximum(
        (zinv - pyramid.origin) / pyramid.incre + pyramid.n_hyp // 2, 0.0
    )
    if impl == "pallas":
        from cermvs_tpu.ops.pallas.lookup import lookup_fused

        return lookup_fused(pyramid.levels[0], x0, radius, pyramid.num_levels)
    if impl == "banded" and pyramid.n_hyp <= 128:
        assert len(pyramid.levels) == pyramid.num_levels, \
            "banded lookup needs the materialized pyramid"
        return _lookup_banded(pyramid.levels, x0, radius)
    dx = jnp.arange(-radius, radius + 1, dtype=x0.dtype)
    outs = []
    for i, corr in enumerate(pyramid.levels):
        taps = x0[..., None] / (2.0 ** i) + dx
        outs.append(interp1d(corr, taps))
    return jnp.concatenate(outs, axis=-1)


def _lookup_banded(levels, x0: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather-free multi-level lookup.

    For level l, tap k: position q = x0/2^l + k; since k is an integer, the
    fractional part f_l = frac(x0/2^l) is shared by all taps and
    ``value[.., k] = (1-f_l) * pool_l[c0+k] + f_l * pool_l[c0+k+1]`` with
    ``c0 = floor(x0/2^l)``.  Selecting pool_l[c0+k] is a one-hot band over
    the D_l axis built from a static iota compared against c0 — a dense
    multiply-reduce instead of a gather, with zero padding outside [0, D_l-1]
    for free (the one-hot simply never fires).
    """
    K = 2 * radius + 1
    outs = []
    for lvl, corr in enumerate(levels):
        D_l = corr.shape[-1]
        q = x0 / (2.0 ** lvl)
        c0 = jnp.floor(q)
        f = (q - c0)[..., None]  # (..., 1)
        c0 = c0.astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, D_l), 4)
        # window cell index of each hypothesis: s[k] = pool[c0 - r + k]
        a = j - (c0[..., None] - radius)  # (..., D_l)
        k_idx = jnp.arange(K + 1, dtype=jnp.int32).reshape(K + 1, 1)
        onehot = (a[..., None, :] == k_idx).astype(corr.dtype)  # (..,K+1,D_l)
        s = jnp.einsum("bvhwj,bvhwkj->bvhwk", corr, onehot)
        outs.append((1.0 - f) * s[..., :-1] + f * s[..., 1:])
    return jnp.concatenate(outs, axis=-1)


def build_corr_pyramid(
    fmaps, poses, intrinsics, ii, jj, disp, n_hyp, incre,
    shift: bool, num_levels: int = 3, hyp_chunk: int = 16,
    volume_fn=None, materialize_pyramid: bool = True,
    mean_over_views: bool = False, gather_dtype=None,
    zero_slab: bool = False,
) -> CorrPyramid:
    """CorrBlock constructor equivalent (``core/corr.py:46-99``).

    disp: (B, 1, H, W) detached current estimate.  ``volume_fn`` lets callers
    swap in an alternative builder; it must match
    :func:`build_corr_volume`'s signature.  With
    ``materialize_pyramid=False`` only level 0 is kept (for the fused Pallas
    lookup, which pools in-kernel).  ``zero_slab``: caller asserts ``disp``
    is identically zero AND ``shift`` is set, i.e. the slab origin is
    statically ``(n_hyp//2)*incre`` everywhere (true for the cascade's
    stage 0) — builders may exploit this.
    """
    origin = slab_origin(jax.lax.stop_gradient(disp), n_hyp, incre, shift)
    fn = volume_fn or build_corr_volume
    corr = fn(fmaps, poses, intrinsics, ii, jj, origin, n_hyp, incre,
              hyp_chunk, mean_over_views, gather_dtype,
              zero_slab=zero_slab and shift)
    levels = build_pyramid(corr, num_levels) if materialize_pyramid else [corr]
    return CorrPyramid(
        levels=levels,
        origin=origin,
        incre=incre,
        n_hyp=n_hyp,
        num_levels=num_levels,
    )


def dense_corr(fmaps: jnp.ndarray, ii, jj) -> jnp.ndarray:
    """All-pairs correlation oracle (unused on the hot path, mirrors
    ``core/corr.py:148-158``); kept for tests and diagnostics."""
    f1 = jnp.take(fmaps, ii, axis=1) / 8.0
    f2 = jnp.take(fmaps, jj, axis=1) / 8.0
    B, V, H, W, C = f1.shape
    f1 = f1.reshape(B, V, H * W, C)
    f2 = f2.reshape(B, V, H * W, C)
    corr = jnp.einsum("bvpc,bvqc->bvpq", f1, f2)
    return corr.reshape(B, V, H, W, H, W)
