"""Depth-map inference driver.

Re-design of ``/root/reference/inference.py``: a jitted test-mode forward with
a per-shape compile cache (image sizes vary per dataset/rescale — each
(N, H, W) bucket compiles once), PFM outputs named
``{ref}_scale{rescale}_nf{num_frames}.pfm`` (``inference.py:59``), optional
per-view min-depth bootstrap files (``inference.py:60-65``).

The reference's imperative memory tricks (``empty_cache`` per view,
``inference.py:66``) are replaced by static memory planning under jit; the
test-mode model already serializes its encoder over frames and chunks the
hypothesis axis.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

from cermvs_tpu.config import configurable
from cermvs_tpu.data.augment import crop_operation, pad_to_multiple, scale_operation
from cermvs_tpu.io.pfm import write_pfm


def _prefetched(iterable, fn, depth: int = 2):
    """Apply ``fn`` to items of ``iterable`` in one background thread,
    ``depth`` items ahead — host-side sample prep overlaps device compute
    in the driver's software pipeline.

    Cancellation-safe: if the consumer abandons the generator early (break,
    or an exception downstream closes it), the worker sees the stop event on
    its next bounded put and exits instead of blocking forever on a full
    queue (which would leak the thread plus ``depth`` prepped batches)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    end = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put(fn(item)):
                    return
        except BaseException as e:  # surface in the consumer
            if not put(e):
                return
        put(end)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is end:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class InferenceRunner:
    """Owns the model + params and a shape-bucketed jit cache.

    With ``mesh`` the forward runs view-sharded over the mesh's 'view' axis
    (``cermvs_tpu.parallel.infer``) — neighbor cost volumes partitioned
    across chips.
    """

    def __init__(self, params, model=None, mesh=None, construction="auto",
                 rect_lambda_max: float = 0.00375,
                 rect_memory_budget: float = 6e9,
                 rect_cost_ratio_max: float = None,
                 max_k_chunks: int = None, **model_kwargs):
        import jax
        from cermvs_tpu.models.raft import RAFT

        self.model = model or RAFT(test_mode=True, **model_kwargs)
        self.model_kwargs = model_kwargs
        self.params = params
        self.mesh = mesh
        # construction: "exact" | "rectified" | "auto".  "rectified"/"auto"
        # swap in the rectification fast path (ops/corr_rectified.py) when
        # the host planner accepts the scene geometry; "auto" silently falls
        # back to exact, "rectified" warns on fallback.
        self.construction = construction
        self.rect_lambda_max = rect_lambda_max
        # HBM cap for the rectified path's persistent warped-feature rows
        # (shared across cascade stages): ~V*h_r*(w_r+ws_r)*C bf16 bytes.
        # Scale-2 passes with many views exceed any 16 GB chip — fall back
        # to the exact path rather than OOM.
        self.rect_memory_budget = rect_memory_budget
        # optional "auto"-mode work gate: when the planned epiband work per
        # unit of exact-construction work (ops/rectify.py:rect_cost_ratio,
        # at FEATURE resolution) exceeds this ratio, auto picks the exact
        # path.  Default off: per-shape measurements on one v5e chip
        # (bench.py shape rows time BOTH constructions) show the rectified
        # path winning or tying at every production shape that compiles —
        # DTU s1 0.28 vs 0.91 s/view, s2 20.0 vs 25.3, TNT nf15 9.8 vs
        # 10.4 (nf15 within the ~±1 s/view run-to-run relay variance) —
        # so there is no regime boundary to gate on; the knob remains for
        # scenes whose plans blow up (feature-res ratios run 0.06-0.13 at
        # the bench scenes; a pathological plan would sit well above 1).
        self.rect_cost_ratio_max = rect_cost_ratio_max
        # ceiling on the epiband kernel's hypothesis-chunk count (None =
        # corr_rectified.MAX_K_CHUNKS; 1 disables chunking, restoring the
        # round-4 route-to-mixed behavior for over-budget windows)
        self.max_k_chunks = max_k_chunks
        self._cache: Dict[tuple, object] = {}
        self._rect_models: Dict[object, object] = {}
        self._warned_fallback = False
        self._warned_batched_rect = False
        self._last_path = "exact"
        self._jax = jax
        # batched (view_batch > 1) rectified dispatch: plans of the B ref
        # views union per batch (exactly the training-path bucketing) and
        # key compiled programs through a PlanCache so ref-view diversity
        # across batches stays bounded to a few compiled variants
        from cermvs_tpu.ops.rectify import PlanCache

        self._plan_cache = PlanCache()

    def _vmem_stages(self):
        """Every cascade stage's (n_hyp, incre) for the epiband VMEM gates
        (``-1`` resolved through the model's own auto-D rule, so
        gin-configured radius/num_levels stay consistent)."""
        return [(self.model._auto_hyps(d), 0.0025 / n)
                for d, n, _ in self.model.cascade]

    def _plan_for(self, poses, intrinsics, scale, img_shape,
                  mem_shards: int = 1, union_windows: bool = False):
        """Host-side per-sample rectification plan (not-ok when the exact
        path must be used).  ``mem_shards``: how many chips the view axis is
        split over — the persistent warped-feature budget is per chip.
        ``union_windows``: the caller's dispatch widens kernels to the
        plan's SCENE-WIDE union bounds (meshed paths trace one program for
        all shards) — gate VMEM on those bounds, not per-view ones."""
        from cermvs_tpu.ops.rectify import (RectPlan, plan_rectification,
                                            rect_cost_ratio)

        f = self.model.stride_factor
        poses = np.asarray(poses, np.float64).copy()
        poses[..., :3, 3] *= float(scale)  # RAFT scales translations in-graph
        intr = np.asarray(intrinsics, np.float64).copy()
        intr[..., :2, :] /= f
        plan = plan_rectification(
            poses, intr, img_shape[0] // f, img_shape[1] // f,
            lambda_max=self.rect_lambda_max)
        if plan.ok:
            V = poses.shape[0] - 1
            C = self.model.dim_fmap
            rect_bytes = (2 * V * plan.h_r * (plan.w_r + plan.ws_r) * C
                          // max(mem_shards, 1))
            if rect_bytes > self.rect_memory_budget:
                plan = RectPlan(0, 0, 0, 0, False,
                                f"rect features ~{rect_bytes / 1e9:.1f} GB "
                                f"exceed budget")
            else:
                # per-view epiband kernel affordability: far views' static
                # rate windows can exceed the Mosaic VMEM budget (sigma
                # ~17 px/hypothesis at TNT nf25) — such scenes route to
                # the MIXED construction (_rect_model), rect for the
                # affordable views and exact gathers for the rest
                from cermvs_tpu.ops.corr_rectified import (
                    _pick_kc, affordable_rect_views)

                stages = self._vmem_stages()
                ok = affordable_rect_views(plan, V, stages=stages,
                                           n_channels=C,
                                           max_k_chunks=self.max_k_chunks)
                if len(ok) < V:
                    plan = RectPlan(
                        0, 0, 0, 0, False,
                        f"epiband window exceeds kernel budget for views "
                        f"{tuple(v for v in range(V) if v not in ok)}")
                elif union_windows or mem_shards > 1:
                    # meshed dispatch (view/row/grid sharding) traces ONE
                    # program for all shards, widening every kernel to the
                    # plan's scene-wide bounds — a scene whose views fit
                    # per-view can still blow VMEM union-wide
                    if any(_pick_kc(d, i, plan.rate_lo, plan.rate_hi,
                                    plan.s_max, plan, C,
                                    max_k=self.max_k_chunks) == 0
                           for d, i in stages):
                        plan = RectPlan(
                            0, 0, 0, 0, False,
                            "scene-wide union epiband window exceeds the "
                            "kernel budget under meshed dispatch")
            if (plan.ok and self.construction == "auto"
                    and self.rect_cost_ratio_max is not None):
                ratio = rect_cost_ratio(
                    plan, img_shape[0] // f, img_shape[1] // f, V,
                    d0=self.model.cascade[0][0])
                if ratio > self.rect_cost_ratio_max:
                    plan = RectPlan(0, 0, 0, 0, False,
                                    f"planned epiband work ratio "
                                    f"{ratio:.1f} > "
                                    f"{self.rect_cost_ratio_max:.1f}")
        if not plan.ok and (self.construction == "rectified"
                            and not self._warned_fallback):
            print(f"[inference] rectified construction unavailable "
                  f"({plan.reason}); using exact path")
            self._warned_fallback = True
        return plan

    def _mixed_plan(self, poses, intrinsics, scale, img_shape,
                    union_windows: bool = False, mem_shards: int = 1):
        """MIXED-construction planning: (pplan, rect_views) for the subset
        of neighbors that pass the per-pair geometric gates AND fit the
        kernel budget, or (None, None) when the exact path must be used.

        The full planner rejects a scene when ANY pair fails, but per-pair
        gates often pass for a subset (forward-motion sequences keep
        lateral neighbors) — those views' volume slices go through the
        fast path, the rest through exact gathers.  ``union_windows``:
        gate on the partial plan's scene-wide bounds (meshed dispatch)."""
        from cermvs_tpu.ops.corr_rectified import (_pick_kc,
                                                   affordable_rect_views)
        from cermvs_tpu.ops.rectify import (plan_rectification,
                                            plan_rectification_partial)

        f = self.model.stride_factor
        poses64 = np.asarray(poses, np.float64).copy()
        poses64[..., :3, 3] *= float(scale)
        intr = np.asarray(intrinsics, np.float64).copy()
        intr[..., :2, :] /= f
        pplan, rect_views = plan_rectification_partial(
            poses64, intr, img_shape[0] // f, img_shape[1] // f,
            lambda_max=self.rect_lambda_max)
        n_views = poses.shape[0] - 1
        stages = self._vmem_stages()
        C = self.model.dim_fmap

        def all_affordable():
            # drop views whose per-view epiband kernel exceeds the VMEM
            # budget; under meshed dispatch additionally require the
            # scene-wide union window of the kept subset to fit (one traced
            # program per shard)
            ok_pos = affordable_rect_views(
                pplan, len(rect_views), stages=stages, n_channels=C,
                max_k_chunks=self.max_k_chunks)
            stable = len(ok_pos) == len(rect_views)
            if stable and union_windows:
                stable = all(
                    _pick_kc(d, i, pplan.rate_lo, pplan.rate_hi,
                             pplan.s_max, pplan, C,
                             max_k=self.max_k_chunks) != 0
                    for d, i in stages)
                if not stable:
                    # no principled per-view drop order for a union
                    # violation: drop the widest-window view
                    ok_pos = tuple(range(len(rect_views) - 1))
            return ok_pos, stable

        # shrink until STABLE: re-planning a subset can widen a kept view's
        # window (union geometry changes), so loop until the affordability
        # check covers every kept view; if the bound trips without
        # converging, bail to the exact path rather than risk an
        # over-budget kernel compile
        stable = False
        for _ in range(8):
            if not pplan.ok or not rect_views:
                break
            ok_pos, stable = all_affordable()
            if stable:
                break
            rect_views = tuple(rect_views[i] for i in ok_pos)
            if not rect_views:
                break
            sub = [0] + [v + 1 for v in rect_views]
            pplan = plan_rectification(
                poses64[sub], intr[sub], img_shape[0] // f,
                img_shape[1] // f, lambda_max=self.rect_lambda_max)
        if (not stable or not pplan.ok or not rect_views
                or len(rect_views) == n_views):
            return None, None
        rect_bytes = (2 * len(rect_views) * pplan.h_r
                      * (pplan.w_r + pplan.ws_r) * C
                      // max(mem_shards, 1))
        if rect_bytes > self.rect_memory_budget:
            return None, None
        return pplan, rect_views

    def _rect_model(self, poses, intrinsics, scale, img_shape):
        """Host-side per-sample plan -> model with the rectified volume_fn
        (None when the exact path must be used)."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.ops.corr_rectified import (make_mixed_volume_fn,
                                                   make_rectified_volume_fn)

        plan = self._plan_for(poses, intrinsics, scale, img_shape)
        if plan.ok:
            if plan not in self._rect_models:
                self._rect_models[plan] = RAFT(
                    test_mode=True,
                    volume_fn=make_rectified_volume_fn(
                        plan, stages=self._vmem_stages()),
                    **self.model_kwargs)
            return self._rect_models[plan], plan
        pplan, rect_views = self._mixed_plan(poses, intrinsics, scale,
                                             img_shape)
        if pplan is None:
            return None, None
        stages = self._vmem_stages()
        key = (pplan, rect_views)
        if key not in self._rect_models:
            self._rect_models[key] = RAFT(
                test_mode=True,
                volume_fn=make_mixed_volume_fn(pplan, rect_views,
                                               stages=stages),
                **self.model_kwargs)
        return self._rect_models[key], key

    def _rect_model_batched(self, images, poses, intrinsics, scales):
        """Rectified construction for a BATCH of reference views: per-sample
        plans union into one static plan (the training path's bucketing,
        ``training/train.py pick_step``), and compiled programs key through
        the PlanCache so pose diversity across batches stays bounded.  Falls
        back to the exact path (model=None) when any sample rejects or the
        B-scaled feature budget is exceeded.  Returns the per-sample
        canonically-reordered arrays alongside (model, key) — replaces the
        B==1-only restriction that forfeited the fast construction for
        small-scene batching (``core/raft.py:63-69`` rationale)."""
        from cermvs_tpu.models.raft import RAFT
        from cermvs_tpu.ops.corr_rectified import make_rectified_volume_fn
        from cermvs_tpu.ops.rectify import plan_union

        B = images.shape[0]
        images, poses, intrinsics = (np.array(a) for a in
                                     (images, poses, intrinsics))
        for b in range(B):
            order = self._neighbor_order(poses[b])
            images[b], poses[b], intrinsics[b] = (
                images[b][order], poses[b][order], intrinsics[b][order])
        plans = [self._plan_for(poses[b], intrinsics[b], scales[b],
                                images[b].shape[1:3]) for b in range(B)]
        if not all(p.ok for p in plans):
            return None, None, images, poses, intrinsics
        plan = plan_union(plans)
        if not plan.ok:
            return None, None, images, poses, intrinsics
        V = poses.shape[1] - 1
        rect_bytes = (2 * B * V * plan.h_r * (plan.w_r + plan.ws_r)
                      * self.model.dim_fmap)
        if rect_bytes > self.rect_memory_budget:
            return None, None, images, poses, intrinsics
        plan = self._plan_cache.key_for(plan)
        if plan not in self._rect_models:
            self._rect_models[plan] = RAFT(
                test_mode=True,
                volume_fn=make_rectified_volume_fn(
                    plan, stages=self._vmem_stages()),
                **self.model_kwargs)
        return self._rect_models[plan], plan, images, poses, intrinsics

    @staticmethod
    def _neighbor_order(poses) -> np.ndarray:
        """[0, neighbors sorted by ascending baseline to the reference]."""
        po = np.asarray(poses, np.float64)
        rel = po[1:] @ np.linalg.inv(po[0])  # ref-cam -> neighbor-cam
        centers = -np.einsum("vji,vj->vi", rel[:, :3, :3], rel[:, :3, 3])
        return np.concatenate(
            [[0], 1 + np.argsort(np.linalg.norm(centers, axis=-1),
                                 kind="stable")])

    @property
    def grid_mesh(self) -> bool:
        return (self.mesh is not None and "row" in self.mesh.axis_names
                and "view" in self.mesh.axis_names)

    @property
    def row_mesh(self) -> bool:
        return (self.mesh is not None and "row" in self.mesh.axis_names
                and not self.grid_mesh)

    @property
    def shape_multiple(self) -> int:
        """Image-H divisibility the forward requires (inference() crops to
        it): the encoder stride, or 8 * n_row_shards under row sharding."""
        f = self.model.stride_factor
        if self.row_mesh or self.grid_mesh:
            return max(f, 8 * int(self.mesh.shape["row"]))
        return f

    def _fn(self, shape, model=None, key=None):
        import jax

        model = model or self.model
        cache_key = (shape, key)
        # first dispatch of a bucket traces + compiles inside the call:
        # the driver's do_report uses this to split compile from
        # steady-state in the per-view timer
        self.last_dispatch_compiled = cache_key not in self._cache
        if cache_key not in self._cache:
            if self.grid_mesh:
                from cermvs_tpu.parallel.spatial import grid_sharded_forward

                plan, band_h = key if key is not None else (None, 0)
                self._cache[cache_key] = jax.jit(
                    lambda p, im, po, k, s, q0: grid_sharded_forward(
                        self.model, p, im, po, k, s, self.mesh, plan=plan,
                        bands=(q0, band_h) if plan is not None else None))
            elif self.row_mesh:
                from cermvs_tpu.parallel.spatial import row_sharded_forward

                # ``key`` = (plan, band_h) for the banded rectified
                # construction (q0 band starts enter as a traced argument),
                # or None for the exact construction
                plan, band_h = key if key is not None else (None, 0)
                self._cache[cache_key] = jax.jit(
                    lambda p, im, po, k, s, q0: row_sharded_forward(
                        self.model, p, im, po, k, s, self.mesh, plan=plan,
                        bands=(q0, band_h) if plan is not None else None))
            elif self.mesh is not None:
                from cermvs_tpu.parallel.infer import view_sharded_forward

                # under a view mesh, ``key`` is the (hashable) RectPlan
                # selecting the sharded rectified construction, a
                # (pplan, rect_views) pair selecting the MIXED construction
                # (rect slices + exact gathers per shard), or None = exact
                plan_arg, rv = (key if isinstance(key, tuple)
                                else (key, None))
                self._cache[cache_key] = jax.jit(
                    lambda p, im, po, k, s: view_sharded_forward(
                        model, p, im, po, k, s, self.mesh, plan=plan_arg,
                        rect_views=rv))
            else:
                self._cache[cache_key] = jax.jit(
                    lambda p, im, po, k, s: model.apply(p, im, po, k, s))
        return self._cache[cache_key]

    def submit_batch(self, images, poses, intrinsics, scales):
        """Dispatch a BATCH of reference views (async under jax's dispatch).

        images (B,N,H,W,3): B ref views with their neighbor stacks — batching
        amortizes dispatch and encoder fixed costs; the cascaded model is
        batch-first throughout.  Images cross the host->device link in bf16
        (the encoder computes in bf16 regardless; at production sizes the
        fp32 transfer is a measurable share of latency).
        """
        import jax
        import jax.numpy as jnp

        if not isinstance(images, (np.ndarray, jax.Array)):
            # normalize list inputs ONCE so the dtype probe below does not
            # materialize a throwaway copy and .astype later cannot fail
            images = np.asarray(images)
        if images.dtype != jnp.bfloat16:
            # callers may pre-convert to bf16 off the critical path (the
            # driver's prep prefetcher does — ~73 ms/view at DTU scale 1);
            # device-resident jax.Array inputs pass through untouched (the
            # bench's device-resident timing path)
            images = np.asarray(images, np.float32)
        poses = np.asarray(poses, np.float32)
        intrinsics = np.asarray(intrinsics, np.float32)
        model, key = None, None
        q0 = None
        self._last_path = "exact"  # resolved construction of THIS dispatch
        # Under a mesh the plan is handed to view_sharded_forward
        # (scene-wide kernel windows) or, for a row mesh, to
        # row_sharded_forward with host-planned bands.  view_batch>1
        # (unmeshed) unions the B ref views' plans like the training path —
        # but only on EXPLICIT construction="rectified": measured at the
        # small-scene shapes batching is for (384x512 nf6), vb=4 exact runs
        # 4.30 maps/s vs 2.14 batched-rectified (the rectified builder's
        # per-sample loop doesn't batch and union plans widen every view's
        # kernel windows; benchmarks/profile_viewbatch_rect.py), so "auto"
        # picks the exact path for batches.
        if (self.construction == "rectified"
                and images.shape[0] > 1 and self.mesh is None):
            if not self._warned_batched_rect:
                import warnings

                warnings.warn(
                    "construction='rectified' with view_batch>1 measured "
                    "slower than batched exact (vb=4 at 384x512 nf6: 2.14 "
                    "vs 4.30 maps/s — the rectified builder's per-sample "
                    "loop doesn't batch and plan unions widen every view's "
                    "kernel windows; benchmarks/profile_viewbatch_rect.py). "
                    "Use construction='auto' (picks exact for batches) or "
                    "view_batch=1.")
                self._warned_batched_rect = True
            model, key, images, poses, intrinsics = self._rect_model_batched(
                images, poses, intrinsics, scales)
        elif (self.construction in ("rectified", "auto")
                and images.shape[0] == 1):
            # canonicalize neighbor order by baseline: view aggregation is
            # permutation-invariant (mean/max/std over views), and sorted
            # neighbors make per-view-bucketed plans (RectPlan.view_rates)
            # collide across reference views instead of fragmenting the
            # compile cache on neighbor order
            order = self._neighbor_order(poses[0])
            images, poses, intrinsics = (a[:, order] for a in
                                         (images, poses, intrinsics))
            if self.row_mesh or self.grid_mesh:
                key, q0 = self._row_plan(poses, intrinsics, scales, images)
            elif self.mesh is None:
                model, key = self._rect_model(
                    poses[0], intrinsics[0], scales[0], images[0].shape[1:3])
            else:
                n_sh = int(self.mesh.shape.get("view", 1))
                plan = self._plan_for(
                    poses[0], intrinsics[0], scales[0], images[0].shape[1:3],
                    mem_shards=n_sh, union_windows=True)
                if plan.ok:
                    key = plan
                else:
                    # MIXED under the view mesh: rect slices for the
                    # rectifiable affordable subset, exact gathers for the
                    # rest, per-shard [rect | exact] slot layout
                    pplan, rv = self._mixed_plan(
                        poses[0], intrinsics[0], scales[0],
                        images[0].shape[1:3], union_windows=True,
                        mem_shards=n_sh)
                    key = (pplan, rv) if pplan is not None else None
        if key is not None:
            self._last_path = ("mixed" if isinstance(key, tuple)
                               and len(key) == 2 and isinstance(key[1], tuple)
                               else "rectified")
        im = jnp.asarray(images.astype(jnp.bfloat16, copy=False))
        po = jnp.asarray(poses)
        k = jnp.asarray(intrinsics)
        s = jnp.asarray(np.asarray(scales, np.float32))
        fn = self._fn(tuple(im.shape[:4]), model, key)
        if self.row_mesh or self.grid_mesh:
            assert images.shape[0] == 1, "row sharding supports batch 1"
            n_sh = int(self.mesh.shape["row"])
            if q0 is None:
                q0 = np.zeros((n_sh, images.shape[1] - 1), np.int32)
            return fn(self.params, im, po, k, s, jnp.asarray(q0, jnp.int32))
        return fn(self.params, im, po, k, s)

    def _row_plan(self, poses, intrinsics, scales, images):
        """Row-mesh plan + band starts: ((plan, band_h), q0) or (None, None)
        when the exact construction must be used."""
        from cermvs_tpu.ops.rectify import plan_row_bands
        from cermvs_tpu.parallel.spatial import GHOST_RECT

        if not self.model.mean_volume:
            # banded rectified construction is mean-folded; per-view
            # aggregations run the exact row-sharded path (spatial.py
            # docstring / ROADMAP section 13)
            return None, None
        n_sh = int(self.mesh.shape["row"])
        f = self.model.stride_factor
        H, W = images[0].shape[1:3]
        h = H // f
        # per-shard block must hold the rect ghost margin
        if H % (8 * n_sh) != 0 or h // n_sh < GHOST_RECT:
            if not self._warned_fallback:
                import warnings

                warnings.warn(
                    f"row-mesh rectified bands unavailable (H={H} needs "
                    f"H%{8 * n_sh}==0 and >= {GHOST_RECT} feature "
                    f"rows/shard); using the exact row-sharded path")
                self._warned_fallback = True
            return None, None
        plan = self._plan_for(poses[0], intrinsics[0], scales[0], (H, W),
                              mem_shards=n_sh, union_windows=True)
        if not plan.ok:
            return None, None
        intr_feat = np.asarray(intrinsics[0], np.float64).copy()
        intr_feat[..., :2, :] /= f
        q0, band_h = plan_row_bands(
            np.asarray(poses[0], np.float64), intr_feat, h, W // f, plan,
            n_sh, GHOST_RECT)
        return (plan, band_h), q0

    def submit(self, images, poses, intrinsics, scale):
        return self.submit_batch(images[None], poses[None], intrinsics[None],
                                 [scale])

    @staticmethod
    def finalize_batch(disp_device) -> np.ndarray:
        """Fetch + convert submitted views' disparities to depth maps."""
        disp = np.asarray(disp_device)
        return np.where(disp == 0, 0,
                        1.0 / np.where(disp == 0, 1, disp)).astype(np.float32)

    @classmethod
    def finalize(cls, disp_device) -> np.ndarray:
        return cls.finalize_batch(disp_device)[0]

    def __call__(self, images, poses, intrinsics, scale) -> np.ndarray:
        """images (N,H,W,3) float32 [0,255] -> depth map (h, w) float32."""
        return self.finalize(self.submit(images, poses, intrinsics, scale))


@configurable("inference")
def inference(
    test_loader,
    ckpt=None,
    output_folder="results",
    rescale: float = 1,
    crop=None,
    do_report: bool = False,
    write_min_depth: Optional[str] = None,
    params=None,
    model_kwargs: Optional[dict] = None,
    mesh=None,
    view_batch: int = 1,
    construction: str = "auto",
    device_prefetch: bool = True,
):
    # NOTE view_batch > 1 amortizes fixed costs for SMALL scenes — measured
    # 4.30 maps/s (vb=4, auto->exact) vs 3.27 (vb=1 rectified) at 384x512
    # nf6 (benchmarks/profile_viewbatch_rect.py); at production sizes it
    # increases HBM pressure and measured 2.7x SLOWER per view on a 16 GB
    # chip (benchmarks/profile_viewbatch.py) — keep 1 unless images are
    # small.  Batched + rectified exists (construction="rectified", plan
    # unions) but measured slower than batched exact.
    """Run depth inference for every reference view of ``test_loader``.

    ``ckpt`` is an orbax params directory (see training.checkpoint); already
    restored ``params`` may be passed directly.
    """
    if params is None:
        if ckpt is None:
            raise ValueError("need ckpt path or params")
        if str(ckpt).endswith(".pth"):
            # the reference's released weights (train_DTU.pth /
            # train_BlendedMVS.pth, its README) load directly: the importer
            # maps the torch state_dict onto the flax tree
            # (utils/torch_import.py, golden-tested in
            # tests/test_torch_parity.py) — so demo.py runs the moment the
            # published checkpoints are dropped in.
            from cermvs_tpu.utils.torch_import import load_reference_checkpoint

            params = load_reference_checkpoint(ckpt)  # {'params': ...}
        else:
            from cermvs_tpu.training.checkpoint import load_params

            params = load_params(ckpt)
    runner = InferenceRunner(params, mesh=mesh, construction=construction,
                             **(model_kwargs or {}))

    output_folder = Path(output_folder)
    (output_folder / "depths").mkdir(exist_ok=True, parents=True)
    num_frames = test_loader.dataset.num_frames
    # row-sharded meshes need H divisible by 8*n_shards (shape_multiple);
    # otherwise the encoder stride
    factor = runner.shape_multiple

    def emit(name, depth, tic, compile_s=0.0):
        if do_report:
            # the reference's do_report probes peak memory at the
            # cost-volume high-water mark (core/corr.py:98-99 ->
            # utils/memory.py:4-11); the device peak_bytes stat covers that
            # mark since it tracks the whole forward's high water.
            # NOTE the reported time is PIPELINE-INCLUSIVE: the driver
            # dispatches batch i before draining batch i-1 (rotate()), so
            # this interval also covers the next batch's dispatch — and, on
            # a shape change, its jit trace/compile.  It matches the
            # reference's wall-clock-between-views semantics
            # (inference.py:52-56), not pure device latency; bench.py's
            # device-resident rows measure the latter.
            from cermvs_tpu.utils.memory import device_memory_stats

            peak = max((s["peak_bytes_in_use_mb"]
                        for s in device_memory_stats().values()), default=0.0)
            # a shape change makes this interval include the NEXT bucket's
            # jit trace+compile (the dispatch blocks on it) — report it
            # separately so steady-state latency reads clean
            note = (f"  [incl. {compile_s:.1f}s jit compile]"
                    if compile_s > 0 else "")
            print(f"per view time: {time.perf_counter() - tic:.3f}s  "
                  f"peak HBM: {peak:.0f} MB ({name}){note}")
        write_pfm(output_folder / "depths"
                  / f"{name}_scale{rescale}_nf{num_frames}.pfm", depth)
        if write_min_depth is not None:
            md_dir = Path(write_min_depth)
            md_dir.mkdir(exist_ok=True, parents=True)
            valid = depth[depth > 0]
            min_depth = float(np.quantile(valid, 0.1) / 2) if valid.size else 0.0
            (md_dir / f"{name}.txt").write_text(f"{min_depth}\n")

    # software pipeline: dispatch batch i (async under jax), then finalize
    # batch i-1 — host IO and device->host fetches overlap the next batch's
    # compute (the threaded loader already prefetches reads).  view_batch > 1
    # runs several reference views per forward, amortizing dispatch and
    # encoder fixed costs.
    pending = None
    buf = []

    def flush(buf):
        import jax
        import jax.numpy as jnp

        names = [b[0] for b in buf]
        ims = [b[1] for b in buf]
        if isinstance(ims[0], jax.Array):
            # prep already device_put the bf16 images (double-buffered
            # upload: the transfer overlapped the previous batch's compute)
            images = ims[0][None] if len(ims) == 1 else jnp.stack(ims)
        else:
            images = np.stack(ims)
        t_sub = time.perf_counter()
        fut = runner.submit_batch(
            images, np.stack([b[2] for b in buf]),
            np.stack([b[3] for b in buf]), [b[4] for b in buf])
        tic = time.perf_counter()
        # first dispatch of a shape bucket blocks on jit trace+compile —
        # report that interval so the PREVIOUS view's pipeline-inclusive
        # timer can name it (weak-spot: a shape change otherwise silently
        # charges a full compile to one view's latency)
        compile_s = (tic - t_sub
                     if getattr(runner, "last_dispatch_compiled", False)
                     else 0.0)
        return (names, fut, tic, compile_s)

    def drain(pending, compile_s=0.0):
        names, fut, tic, _own = pending
        depths = runner.finalize_batch(fut)
        for name, depth in zip(names, depths):
            emit(name, depth, tic, compile_s)

    def rotate(pending, buf):
        # dispatch batch i BEFORE fetching batch i-1: the dispatch is async
        # under jax, so the host->device upload and the ~25-30 ms dispatch
        # round-trip overlap batch i-1's device compute, and the i-1 fetch
        # then overlaps batch i's compute (measured 3.13 -> 3.55 maps/s in
        # bench.py with this schedule vs fetch-then-dispatch)
        nxt = flush(buf)
        if pending is not None:
            # batch i's compile (if any) falls inside batch i-1's
            # wall-clock-between-views interval
            drain(pending, compile_s=nxt[3])
        return nxt

    def prep(item):
        # host-side prep off the critical path: resample/crop/pad + the
        # fp32->bf16 conversion (~73 ms/view at DTU scale 1) run in the
        # prefetch thread and overlap device compute; submit_batch passes
        # bf16 images through untouched.  device_prefetch additionally
        # starts the host->device upload here (async under jax), so the
        # transfer itself double-buffers against the previous batch's
        # compute instead of serializing into the dispatch.
        import jax
        import jax.numpy as jnp

        images, poses, intrinsics, image_names, scale = item
        images, intrinsics = scale_operation(images, intrinsics, rescale)
        if crop is not None:
            images, intrinsics = crop_operation(images, intrinsics, *crop)
        # static-shape requirement: trim to the encoder stride
        images, intrinsics = pad_to_multiple(images, intrinsics, factor)
        images = np.asarray(images).astype(jnp.bfloat16)
        if device_prefetch and view_batch <= 1 and mesh is None:
            images = jax.device_put(images)
        return (images, poses, intrinsics, image_names, scale)

    for images, poses, intrinsics, image_names, scale in _prefetched(
            test_loader, prep):
        if buf and buf[0][1].shape != images.shape:
            pending = rotate(pending, buf)
            buf = []
        buf.append((image_names[0], images, poses, intrinsics, scale))
        if len(buf) >= max(1, view_batch):
            pending = rotate(pending, buf)
            buf = []
    if buf:
        pending = rotate(pending, buf)
    if pending is not None:
        drain(pending)
